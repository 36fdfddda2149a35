"""Remote object-store ingest (s3a/hdfs/abfs/gs) — the reference
reads S3 directly through patched NetCDF-Java (reference README.md:10);
this engine reads any Hadoop FileSystem URI through the SAME
``ingest_directory`` code path that the local tests exercise, because
``binaryFile`` delegates scheme resolution to Hadoop.

The build container has no network and no connector jars, so the
integration test is GATED on ``SPARK_GRAFT_REMOTE_URI`` and skips here
with instructions; on a real cluster it runs unchanged:

    export SPARK_GRAFT_REMOTE_URI=s3a://my-bucket/nc-staging
    # credentials per object_store_session_confs (env chain / instance
    # profile for s3a; kinit for kerberized hdfs)
    python -m pytest tests/test_remote_ingest.py -q

What IS testable locally: the URI plumbing itself (file:// is a bona
fide Hadoop FileSystem URI resolved through the exact same stack), and
the conf helper's shape.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from netcdf_olap_spark.sources.netcdf import ingest_directory, object_store_session_confs
from netcdf_olap_spark.sources.netcdf3 import write_netcdf3

REMOTE_URI = os.environ.get("SPARK_GRAFT_REMOTE_URI")


def _write_fixture(dirpath) -> int:
    """One tiny classic .nc; returns its cell count."""
    nt, ny, nx = 2, 3, 4
    content = write_netcdf3(
        dimensions={"time": None, "lat": ny, "lon": nx},
        variables={
            "time": (("time",), (np.arange(nt) * 24).astype(np.int32), {}),
            "lat": (("lat",), 40.0 + np.arange(ny), {"long_name": "latitude"}),
            "lon": (("lon",), -90.0 + np.arange(nx), {"long_name": "longitude"}),
            "t2m": (("time", "lat", "lon"), np.arange(nt * ny * nx, dtype=np.float64).reshape(nt, ny, nx), {}),
        },
    )
    with open(os.path.join(dirpath, "remote_probe.nc"), "wb") as fh:
        fh.write(content)
    return nt * ny * nx


def test_conf_helper_shapes():
    from netcdf_olap_spark.sources.netcdf import runtime_hadoop_version

    s3 = object_store_session_confs("s3a")
    assert "spark.jars.packages" in s3 and "hadoop-aws" in s3["spark.jars.packages"]
    # connector version tracks the RUNTIME's bundled Hadoop (this
    # container ships pyspark with hadoop-client-api jars), and no
    # credentials-provider class is pinned — the s3a default chain
    # applies per Hadoop version
    hv = runtime_hadoop_version()
    assert s3["spark.jars.packages"].endswith(f":{hv}")
    assert not any("credentials.provider" in k for k in s3)
    assert object_store_session_confs("s3a", hadoop_version="3.3.6")[
        "spark.jars.packages"
    ] == "org.apache.hadoop:hadoop-aws:3.3.6"
    assert any(k.startswith("spark.hadoop.fs.s3a.") for k in s3)
    assert object_store_session_confs("hdfs") == {}
    assert "hadoop-azure" in object_store_session_confs("abfs")["spark.jars.packages"]
    assert "gcs-connector" in object_store_session_confs("gs")["spark.jars.packages"]
    with pytest.raises(ValueError):
        object_store_session_confs("ftp")


def test_ingest_via_hadoop_uri_matches_bare_path(spark, tmp_path):
    """file:// resolves through the same Hadoop FileSystem stack every
    remote scheme does — the local proof that ingest is URI-driven,
    not path-string-driven."""
    n_cells = _write_fixture(tmp_path)
    bare = ingest_directory(spark, str(tmp_path), ds="probe")
    uri = ingest_directory(spark, f"file://{tmp_path}", ds="probe")
    rows_bare = sorted(tuple(r) for r in bare.collect())
    rows_uri = sorted(tuple(r) for r in uri.collect())
    assert rows_bare == rows_uri
    assert len(rows_bare) == n_cells


@pytest.mark.skipif(
    not REMOTE_URI,
    reason=(
        "no remote object store reachable from this container; set "
        "SPARK_GRAFT_REMOTE_URI=s3a://bucket/prefix (plus credentials — see "
        "object_store_session_confs) to run this against a real endpoint"
    ),
)
def test_ingest_from_remote_object_store(tmp_path):
    """End-to-end against a real endpoint: upload one .nc via the
    Hadoop FileSystem API, ingest the prefix, check the cell count.
    Uses its OWN session so connector jars/credentials attach at
    build time (FileSystem instances are cached per scheme)."""
    from pyspark.sql import SparkSession

    scheme = REMOTE_URI.split("://", 1)[0]
    builder = SparkSession.builder.master(
        os.environ.get("SPARK_GRAFT_REMOTE_MASTER", "local[4]")
    ).appName("remote-ingest-probe")
    for k, v in object_store_session_confs(scheme).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        n_cells = _write_fixture(tmp_path)
        local = os.path.join(str(tmp_path), "remote_probe.nc")
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        conf = jsc.hadoopConfiguration()
        dst = f"{REMOTE_URI.rstrip('/')}/spark_graft_probe/remote_probe.nc"
        path = jvm.org.apache.hadoop.fs.Path(dst)
        fs = path.getFileSystem(conf)
        fs.copyFromLocalFile(jvm.org.apache.hadoop.fs.Path(local), path)
        try:
            df = ingest_directory(spark, f"{REMOTE_URI.rstrip('/')}/spark_graft_probe", ds="remote")
            assert df.count() == n_cells
        finally:
            fs.delete(path, False)
    finally:
        spark.stop()
