#!/usr/bin/env bash
# One-command interop run for the vendored NetCDF-3/HDF5 format stack.
#
# tests/test_interop.py cross-checks the vendored readers/writers
# against the reference C libraries in BOTH directions (our writer ->
# netCDF4/h5py read; their writers -> our reader) across every chunk
# index family, dense storage, compound data, and DIMENSION_LIST
# resolution. The suite is env-gated because the build container has
# no network and no netCDF4/h5py wheels — run THIS script in any
# environment that has (or can fetch) them, and paste the summary
# line it prints into README.md's format-matrix verification note.
#
# Usage:
#   tools/run_interop.sh            # venv in /tmp, pip-installs wheels
#   SKIP_VENV=1 tools/run_interop.sh  # current env already has them
set -euo pipefail
cd "$(dirname "$0")/.."

if [ -z "${SKIP_VENV:-}" ]; then
    VENV="${INTEROP_VENV:-/tmp/interop-venv}"
    if [ ! -x "$VENV/bin/python" ]; then
        python3 -m venv --system-site-packages "$VENV"
    fi
    # system-site-packages keeps the container's pyspark/numpy/pytest;
    # only the C-library bindings (+ scipy for the pure-Python classic
    # cross-read, which needs no C library at all) are added.
    "$VENV/bin/pip" install --quiet netCDF4 h5py scipy
    PY="$VENV/bin/python"
else
    PY=python3
fi

VERSIONS=$("$PY" - <<'EOF'
import netCDF4, h5py, numpy
print(f"netCDF4 {netCDF4.__version__} (libnetcdf {netCDF4.getlibversion().split()[0]}), "
      f"h5py {h5py.__version__} (libhdf5 {h5py.version.hdf5_version}), numpy {numpy.__version__}")
EOF
)

SPARK_GRAFT_INTEROP=1 "$PY" -m pytest tests/test_interop.py -q --tb=short
echo
echo "INTEROP RUN RECORD: $(date -u +%F) — $VERSIONS"
echo "(paste the pytest summary + this line into README.md's format matrix)"
