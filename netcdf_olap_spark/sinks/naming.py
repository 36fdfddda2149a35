"""Filename-component validation shared by the artifact sinks.

The vendored readers (sources/hdf5.py, sources/netcdf3.py) accept
arbitrary bytes as variable names — they parse what's in the file and
do not enforce NetCDF naming rules. Sink filenames and zip entry
names interpolate dataset/variable names verbatim, so a crafted .nc
file with a variable named ``../../x`` could otherwise write outside
the output directory (and put path-traversal entries into result.zip
— zip-slip for extracting clients). Every sink path component goes
through :func:`safe_component` before touching a filesystem or zip.
"""

from __future__ import annotations

import re

# control chars and both path separators; '..' is rejected separately
_BAD = re.compile(r"[\x00-\x1f/\\]")


def safe_component(name: str, what: str = "name") -> str:
    """Validate a single filename component (no separators, no
    traversal, no control characters). Returns the name unchanged or
    raises ``ValueError`` — sinks reject rather than mangle, so a
    hostile file fails loudly instead of writing somewhere surprising.
    """
    if not isinstance(name, str) or not name:
        raise ValueError(f"{what} must be a non-empty string, got {name!r}")
    if _BAD.search(name):
        raise ValueError(f"{what} {name!r} contains a path separator or control character")
    if ".." in name:
        raise ValueError(f"{what} {name!r} contains '..'")
    if name != name.strip() or name.startswith("."):
        raise ValueError(f"{what} {name!r} has leading/trailing whitespace or a leading dot")
    return name
