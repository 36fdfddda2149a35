"""Compaction manifest protocol (streaming/rollup_maint.py, r11
advice): a crash between the merged batch_id=-1 commit and the
consumed-partition cleanup used to DOUBLE-COUNT silently on the next
merge-on-read.  The manifest closes the window — these tests simulate
every crash point and assert the store reads back exactly-once at
each of them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.streaming import rollup_maint as rm

ROWS = [
    # (ts_us, event_type, value) — two 10-min buckets, two types
    (0, "click", 1.0),
    (1_000_000, "click", 2.0),
    (1_000_000, "view", 10.0),
    (700_000_000, "click", 4.0),
    (700_000_000, "view", 20.0),
]


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(ROWS, "ts_us long, event_type string, value double")


def _snapshot(spark, out):
    return sorted(
        tuple(r)
        for r in rm.read_rollup_store(spark, out)
        .select("bucket_us", "event_type", "p_count", "p_sum", "p_min", "p_max")
        .collect()
    )


def _write_batches(spark, events, out):
    splits = (F.col("value") < 2.0, F.col("value").between(2.0, 9.0), F.col("value") > 9.0)
    for bid, pred in enumerate(splits):
        rm.write_rollup_batch(events.where(pred), out, bid)


def test_compaction_roundtrip_and_cleanup(spark, events, tmp_path):
    out = str(tmp_path / "store")
    _write_batches(spark, events, out)
    want = _snapshot(spark, out)
    rm.compact_rollup_store(spark, out)
    assert _snapshot(spark, out) == want
    assert rm._list_fragment_partitions(spark, out) == []
    m = rm._read_manifest(spark, out)
    assert m == {"epoch": 1, "consumed": [0, 1, 2]}


def test_crash_before_cleanup_does_not_double_count(spark, events, tmp_path, monkeypatch):
    """THE advice scenario: merged write committed, process died
    before deleting the consumed partitions — both copies exist on
    disk, the read must count one."""
    out = str(tmp_path / "store")
    _write_batches(spark, events, out)
    want = _snapshot(spark, out)
    monkeypatch.setattr(rm, "_delete_partitions", lambda *a, **k: None)
    rm.compact_rollup_store(spark, out)  # dies before cleanup
    monkeypatch.undo()
    assert rm._list_fragment_partitions(spark, out) == [0, 1, 2]  # survivors
    assert _snapshot(spark, out) == want  # NOT doubled
    # next compaction repairs: leftovers removed, store unchanged
    rm.compact_rollup_store(spark, out)
    assert rm._list_fragment_partitions(spark, out) == []
    assert _snapshot(spark, out) == want


def test_crash_between_manifest_and_commit_is_inert(spark, events, tmp_path):
    """Manifest published, merged write never landed: the manifest's
    epoch is nowhere in batch_id=-1, so readers ignore it (skipping
    would LOSE the named partitions)."""
    out = str(tmp_path / "store")
    _write_batches(spark, events, out)
    want = _snapshot(spark, out)
    rm._write_manifest(spark, out, {"epoch": 7, "consumed": [0, 1, 2]})
    assert rm._effective_consumed(spark, out) == []
    assert _snapshot(spark, out) == want


def test_second_compaction_with_fresh_fragments(spark, events, tmp_path):
    out = str(tmp_path / "store")
    _write_batches(spark, events, out)
    rm.compact_rollup_store(spark, out)
    # late fragments arrive after the first compaction
    rm.write_rollup_batch(events.where(F.col("value") > 3.0), out, 3)
    want = _snapshot(spark, out)
    rm.compact_rollup_store(spark, out)
    assert _snapshot(spark, out) == want
    assert rm._read_manifest(spark, out)["epoch"] == 2
    assert rm._list_fragment_partitions(spark, out) == []


def test_compact_noop_when_no_fragments(spark, events, tmp_path):
    out = str(tmp_path / "store")
    _write_batches(spark, events, out)
    rm.compact_rollup_store(spark, out)
    want = _snapshot(spark, out)
    rm.compact_rollup_store(spark, out)  # nothing to consume
    assert _snapshot(spark, out) == want
    assert rm._read_manifest(spark, out)["epoch"] == 1  # unchanged
