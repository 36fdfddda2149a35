"""Streaming corpus ingestion — the unbounded-stream twin of the
batch training-data pipeline (queries/text.py doc_corpus_prep):
documents arrive continuously, get quality-gated map-side, and are
exact-deduped by content fingerprint with BOUNDED state.

Scale design: ``dropDuplicatesWithinWatermark`` keys state on the
fingerprint and evicts each key once the watermark passes its arrival
window — so state holds only the recent-horizon fingerprint set, not
the full corpus history. For corpus-lifetime dedup at 100 TB the
horizon state pairs with the periodic compaction join against the
at-rest fingerprint index (``compact_into_fingerprint_index`` below);
the stream stage's job is to stop duplicate floods *within* the
horizon before they hit storage. The quality gate is a pure column expression — pushed
map-side, filtered docs never enter dedup state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import fingerprint, tokens


def corpus_ingest(
    df: DataFrame,
    watermark: str | None = None,
    min_tokens: int = 10,
    min_chars: int = 50,
) -> DataFrame:
    """Quality gate + first-arrival fingerprint dedup.

    Works on any documents-shaped frame ``(doc_id, ts, text, ...)`` —
    batch (``dropDuplicates``) or streaming (bounded-state
    ``dropDuplicatesWithinWatermark``). Returns
    ``(doc_id, ts, fp, n_tokens, len_chars)`` of the surviving docs.
    """
    gated = df.select(
        "doc_id",
        "ts",
        fingerprint("text").alias("fp"),
        F.size(tokens("text")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
    ).where((F.col("n_tokens") >= min_tokens) & (F.col("len_chars") >= min_chars))
    if watermark:
        return gated.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])
    return gated.dropDuplicates(["fp"])


# ---------------------------------------------------------------------------
# streaming NEAR-duplicate gate (MinHash band keys, bounded state)
# ---------------------------------------------------------------------------


def minhash_band_rows(df: DataFrame, k: int = 16, bands: int = 8, n: int = 3) -> DataFrame:
    """(doc_id, ts, band, key) — one row per LSH band, computed
    entirely MAP-SIDE (per-row higher-order functions, no shuffle, no
    state), which is what makes MinHash signatures streaming-legal:
    the batch formulation (explode shingles → groupBy doc) would be a
    stateful aggregation on an unbounded stream.

    Hash family is the engine-portable md5-52 (same as
    ``minhash_lsh_pairs_portable``), so every stage is replayable in
    DuckDB SQL and the streaming query can sit behind a value-level
    oracle. Docs with fewer than ``n`` tokens have no shingles and
    produce no rows (identical to the batch operators)."""
    from netcdf_olap_spark.operators.text import shingles_from_tokens, tokens

    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands
    toks = df.select("doc_id", "ts", tokens("text").alias("_t"))
    shing = toks.select(
        "doc_id", "ts", shingles_from_tokens(F.col("_t"), n).alias("_sh")
    ).where(F.size("_sh") > 0)

    def hmin(j: int):
        # min over shingles of the 52-bit md5 prefix — duplicates in
        # the shingle array cannot change a min, so no distinct pass
        return F.array_min(
            F.transform(
                F.col("_sh"),
                lambda s: F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(str(j)), s)), 1, 13), 16, 10
                ).cast("long"),
            )
        )

    mins = shing.select("doc_id", "ts", *[hmin(j).alias(f"_h{j}") for j in range(k)])
    from netcdf_olap_spark.operators.dedup import md5_band_key_cols

    band_cols = md5_band_key_cols(bands, r, lambda j: F.col(f"_h{j}"))
    return mins.select("doc_id", "ts", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", "ts", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def band_owner_stream(rows: DataFrame, watermark: str, state_ttl_ms: int = 7_200_000) -> DataFrame:
    """Stateful band-key ownership over a stream: the first-arriving
    document to present a (band, key) OWNS it; every later presenter
    of the same key within the state horizon emits ``owned=false``.
    Within one micro-batch the owner is min(ts, doc_id) — replay-
    deterministic when micro-batches are (files are staged in order).

    State per key is 16 bytes (owner ts + id) and is EVICTED by an
    event-time timeout ``state_ttl_ms`` past the key's last sighting,
    so state holds only the recent-horizon key set — the same bounded-
    state contract as ``dropDuplicatesWithinWatermark``, with the
    ownership semantics that near-dup filtering needs (the built-in
    dedup keeps first rows, but cannot say WHICH doc owned the key)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("band", IntegerType()),
            StructField("key", StringType()),
            StructField("owned", BooleanType()),
        ]
    )
    state_schema = StructType(
        [StructField("ts_us", LongType()), StructField("doc_id", LongType())]
    )
    ttl = state_ttl_ms

    def update(key, pdfs, state):  # noqa: ANN001 (Spark-dictated signature)
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["ts_epoch_us", "doc_id"])
        # TRUE epoch µs, computed JVM-side (unix_micros) before the
        # stateful operator: the pandas `ts` column arrives localized
        # to the SESSION time zone and tz-stripped, so deriving epoch
        # from it shifts by the tz offset — west-of-UTC sessions could
        # then set a timeout BEHIND the (true-epoch) watermark and
        # kill the query, east-of-UTC ones silently stretch the
        # horizon (review finding).  The long column dodges both; it
        # also avoids the pandas ns-domain ceiling that far-future
        # stamps overflow (the r10 stream-staging lesson).
        ts_us = batch["ts_epoch_us"].astype("int64")
        if state.exists:
            owner_us, owner_id = state.get
        else:
            owner_us, owner_id = int(ts_us.iloc[0]), int(batch["doc_id"].iloc[0])
            state.update((owner_us, owner_id))
        state.setTimeoutTimestamp(int(ts_us.max() // 1000) + ttl)
        out = batch[["doc_id", "ts", "band", "key"]].copy()
        out["owned"] = (batch["doc_id"].astype("int64") == owner_id) & (
            ts_us == owner_us
        )
        yield out

    return (
        rows.withColumn("ts_epoch_us", F.unix_micros("ts"))
        .withWatermark("ts", watermark)
        .groupBy("band", "key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def near_dup_filter(
    df: DataFrame,
    watermark: str | None = None,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    state_ttl_ms: int = 7_200_000,
) -> DataFrame:
    """Near-duplicate gate: a document is KEPT iff it owns ALL of its
    ``bands`` MinHash band keys (no earlier document shared any band —
    the LSH candidate test of ``minhash_lsh_pairs``, applied as a
    first-arrival filter instead of a pair join).

    Streaming (``watermark`` set): returns the per-band ownership
    stream from :func:`band_owner_stream` — drain it, then reduce
    ``groupBy(doc_id).count_if(owned) == bands`` batch-side (the same
    drain-then-reduce shape as the streaming sketch queries); the
    stateful part holds only the horizon's band keys. Precision is
    the LSH curve (a kept doc may still be a near-dup that collided in
    no band — recall loss, never false drops of unique docs); exact
    verification stays a batch/at-rest concern.

    Batch (``watermark=None``): the deterministic min-owner twin —
    owner of a band key is min(ts, doc_id) — fully reduced to
    (doc_id, n_owned, is_kept), and SQL-replayable (the md5-52 family;
    oracle in queries/streaming.py)."""
    rows = minhash_band_rows(df, k=k, bands=bands, n=n)
    if watermark is not None:
        return band_owner_stream(rows, watermark, state_ttl_ms=state_ttl_ms)
    # cut the band rows ONCE before the two consumers (owners agg +
    # join): exchange reuse does not fire across these subtrees under
    # AQE, so without the cut the k·md5-per-shingle minhash pass runs
    # twice — measured 39 s/evaluation at sf1.0 (r10 drain probe)
    rows = rows.localCheckpoint(eager=True)
    owners = rows.groupBy("band", "key").agg(F.min(F.struct("ts", "doc_id")).alias("o"))
    owned = rows.join(owners, ["band", "key"]).select(
        "doc_id", (F.col("o.doc_id") == F.col("doc_id")).alias("owned")
    )
    return near_dup_reduce(owned, bands)


def near_dup_reduce(owned: DataFrame, bands: int = 8) -> DataFrame:
    """Per-document reduction of a drained band-ownership stream:
    (doc_id, n_owned, is_kept) with kept = owns all ``bands`` bands.
    One definition shared by the registry query and the tests."""
    return (
        owned.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("owned"), 1).otherwise(0)).cast("long").alias("n_owned"))
        .select("doc_id", "n_owned", (F.col("n_owned") == bands).alias("is_kept"))
    )


def compact_into_fingerprint_index(
    spark,
    survivors: DataFrame,
    index_path: str,
    fp_col: str = "fp",
) -> DataFrame:
    """Corpus-LIFETIME dedup closure for the streaming ingest: the
    stream's bounded state only suppresses duplicates inside its
    watermark horizon (the module docstring's contract), so a
    duplicate of something ingested LAST MONTH sails through. This
    periodic compaction closes that gap: horizon survivors are
    anti-joined against the at-rest fingerprint index — docs whose
    fingerprint is already indexed drop — and the genuinely-new
    fingerprints are APPENDED to the index for the next cycle.

    100 TB shape: the index stores one small row per distinct
    fingerprint ever ingested (the minimum any lifetime-dedup scheme
    must remember), partitioned by a fingerprint prefix so the append
    touches every partition evenly and the anti-join shuffles only on
    the fingerprint hash; the survivors side is one horizon's worth of
    rows, never the corpus. Returns the kept (genuinely new) rows.

    SINGLE-WRITER contract: read-then-append is not atomic. Exactly
    one compaction may run against an index path at a time (the
    natural deployment — one compaction job per ingest stream,
    scheduled after each horizon). Two concurrent compactions could
    both miss the other's in-flight fingerprints and each admit a
    duplicate; serialize them (or layer a table format with optimistic
    concurrency, e.g. Delta/Iceberg, over the same layout) if the
    schedule cannot guarantee it.
    """

    # the drained span can EXCEED the stream's watermark horizon (that
    # is exactly when this compaction is needed), so the same fp may
    # appear twice WITHIN one survivors batch — neither copy is in the
    # index yet, and the anti-join alone would keep both. First-arrival
    # keeper within the batch, deterministic on (ts, doc_id)
    order = [c for c in ("ts", "doc_id") if c in survivors.columns]
    if order:
        from pyspark.sql.window import Window

        w = Window.partitionBy(fp_col).orderBy(*order)
        survivors = (
            survivors.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        survivors = survivors.dropDuplicates([fp_col])

    # Probe the at-rest index through the Spark reader itself — NOT
    # os.path (r7 advice: a driver-local check is always False for
    # s3a:// / hdfs:// paths, silently skipping the anti-join and
    # leaking cross-horizon duplicates into the index). ONLY a missing
    # or empty path (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA — the two
    # conditions an absent index raises on any Hadoop filesystem
    # scheme) means "first cycle, nothing to anti-join against"; any
    # OTHER analysis error (e.g. an index written under a different
    # fingerprint column, or the path pointing at an unrelated
    # dataset) re-raises — swallowing it would silently disable
    # lifetime dedup AND append a second schema into the index.
    from pyspark.errors import AnalysisException

    new_rows = survivors
    try:
        at_rest = spark.read.parquet(index_path).select(F.col(fp_col))
        at_rest.schema  # force analysis so a missing path raises HERE
    except AnalysisException as e:
        cond = e.getCondition() or ""
        if cond.split(".")[0] not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        at_rest = None
    if at_rest is not None:
        new_rows = survivors.join(at_rest, fp_col, "left_anti")
    # cut once: the keep-set feeds BOTH the caller's sink and the index
    # append; without it the anti-join recomputes per consumer
    new_rows = new_rows.localCheckpoint(eager=True)
    (
        new_rows.select(fp_col)
        .distinct()
        .withColumn("fp_prefix", F.substring(F.col(fp_col), 1, 2))
        .repartition("fp_prefix")
        .write.mode("append")
        .partitionBy("fp_prefix")
        .parquet(index_path)
    )
    return new_rows
