"""Deduplication operators (SURVEY.md §2.11): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the point of these at 100 TB):

- **exact**: one shuffle on the fingerprint hash; keeper chosen by
  min(id) — deterministic, no window-over-everything.
- **jaccard pairs**: shingle-inverted-index self-join — pairs are
  generated only for docs sharing a shingle (never an O(n²) cross
  join); hot shingles are the skew risk → AQE skew-join handles it,
  and ``max_shingle_df`` drops degenerate ultra-frequent shingles
  exactly like search engines drop stopwords.
- **MinHash+LSH**: k seeded xxhash64 min-hashes per doc (one
  groupBy), banded into b buckets; candidate pairs only within a
  (band, signature) bucket → the classic sub-quadratic near-dup path;
  candidates then verified with exact Jaccard so the output is
  precision-1.0 (recall bounded by the LSH curve).
- **SimHash**: 64-bit signature from token hashes via bit-vote
  aggregation; near-dup = Hamming distance ≤ k over 8 × 8-bit-chunk
  blocked candidates (a chunk must match exactly → 8 blocking keys;
  pigeonhole gives recall 1.0 up to Hamming distance 7, same
  sub-quadratic shape).

Everything is native Spark expressions (xxhash64, bit ops,
higher-order lambdas) — no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netcdf_olap_spark.operators.text import fingerprint, shingles_from_tokens, tokens


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: fingerprint → (keeper, n_copies).
    ``keeper_id = min(id)`` keeps the result deterministic where
    ``dropDuplicates`` would be partition-order-dependent."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_index(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) inverted index, one row per distinct shingle per
    doc. Tokenization is materialized in its own projection so the
    shingle lambda slices a computed array instead of re-running
    split+filter per shingle position (O(tokens) vs O(tokens²))."""
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    return toks.select(
        "id", F.explode(F.array_distinct(shingles_from_tokens(F.col("t"), n))).alias("sh")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index join.

    Threshold test is the integer cross-multiplication
    ``shared * t_den >= t_num * (|A| + |B| - shared)`` with
    ``t_num/t_den = round(threshold·1000)/1000`` — exact rational
    arithmetic, no float boundary flakiness. NOTE: the requested
    threshold is therefore quantized to the nearest 1/1000 (1/3 →
    0.333); pass an exact multiple of 0.001 to get it verbatim.
    ``jaccard`` output column is a single double division
    (engine-deterministic).
    """
    idx = _shingle_index(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = idx.groupBy("sh").count().where(F.col("count") > max_shingle_df).select("sh")
        idx = idx.join(F.broadcast(hot), "sh", "left_anti")
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = idx.alias("a")
    b = idx.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    # No broadcast hint: `sizes` is one row PER DOCUMENT — forcing a
    # broadcast is a driver OOM at corpus scale. AQE picks broadcast
    # at runtime whenever the side actually is small.
    j = shared.join(sz1, "id1").join(sz2, "id2")
    union_sz = F.col("sz1") + F.col("sz2") - F.col("shared")
    # threshold as exact rational: shared / union >= threshold
    t_num, t_den = _as_fraction(threshold)
    return (
        j.where(F.col("shared") * t_den >= F.lit(t_num) * union_sz)
        .select(
            "id1",
            "id2",
            "shared",
            union_sz.alias("union_sz"),
            (F.col("shared").cast("double") / union_sz).alias("jaccard"),
        )
    )


def _as_fraction(t: float, den: int = 1000) -> tuple[int, int]:
    return round(t * den), den


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 32, n: int = 3
) -> DataFrame:
    """k MinHash values per doc: min over shingles of
    xxhash64(seed_i, xxhash64(shingle)). The variable-length shingle
    string is hashed ONCE; the k "permutations" re-hash the resulting
    fixed 8-byte long — ~k× less string-hashing work for identical
    collision behavior.

    Shingle hashes are built WITHOUT materializing shingle strings:
    each token is hashed once (O(tokens) string work), then a shingle
    hash is xxhash64 over its n token-hashes — no concat_ws, no
    n-word string allocation, no string array_distinct. Explode +
    groupBy(k mins) keeps the whole stage codegen'd with map-side
    partial aggregation, so shuffle volume is k longs per doc
    regardless of doc length. (An array-only ``array_min(transform)``
    formulation was measured 60% SLOWER here: higher-order lambdas
    are interpreted, not codegen'd — see PLANS.md.)
    Docs with < n tokens have no shingles and produce no signature
    row, matching the string-shingle formulation."""
    idx = _hashed_shingle_index(df, id_col, text_col, n)
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("h0_"))).alias(f"h{i}") for i in range(k)]
    return idx.groupBy("id").agg(*aggs)


def md5_band_key_cols(bands: int, r: int, h_col) -> list:
    """The portable band-key encoding shared by every md5-52 LSH site
    (batch portable pairs, the streaming near-dup gate, and the DuckDB
    oracles that replay it): band bi's key is the comma-joined decimal
    mins h[bi*r] .. h[bi*r+r-1]. ``h_col(j)`` returns the j-th min-hash
    column. One definition so the key format cannot drift between
    engines or sites."""
    return [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(",", *[h_col(bi * r + j).cast("string") for j in range(r)]).alias("key"),
        )
        for bi in range(bands)
    ]


def minhash_lsh_pairs_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Engine-portable MinHash+LSH twin of ``minhash_lsh_pairs``.

    Same pipeline shape — k min-hashes, b bands × r rows, band-bucket
    self-join for candidates, exact-Jaccard verify restricted to the
    candidate set — but every stage uses the engine-portable hash
    family (md5 hex, 13-digit/52-bit prefix, the same trick as
    SimHash's ``md5_52`` mode) over STRING shingles, and band keys are
    comma-joined decimal strings. That makes the full LSH pipeline
    replayable in DuckDB SQL, so it can sit behind a value-level
    oracle (queries/text.py doc_minhash_portable) instead of a
    rows-only check. xxhash64 ``minhash_lsh_pairs`` stays the fast
    default for production runs — this twin re-hashes the shingle
    string k times.

    Output: (id1, id2, shared, union_sz) — integer columns only, so
    the cross-engine hash cannot drift on float division.
    """
    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands
    # the index feeds signatures, the verify self-join (both sides),
    # and sizes — cut once so tokenize+shingle computes one time
    idx = _shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)

    def h(j: int):
        hex13 = F.substring(F.md5(F.concat_ws("|", F.lit(str(j)), F.col("sh"))), 1, 13)
        return F.conv(hex13, 16, 10).cast("long")

    sigs = idx.groupBy("id").agg(*[F.min(h(j)).alias(f"h{j}") for j in range(k)])
    band_cols = md5_band_key_cols(bands, r, lambda j: F.col(f"h{j}"))
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # same rationale as the fast path: don't re-derive the signature
    # subtree for the second side of the self-join
    banded = banded.localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
        # feeds three consumers (ids union + two semi-joins) — cut so the
        # signature subtree computes once (same rationale as the fast path)
        .localCheckpoint(eager=True)
    )

    ids = cand.select(F.col("id1").alias("id")).union(cand.select("id2")).distinct()
    sub = idx.join(ids, "id", "left_semi")
    # sizes only for candidate docs (the fast path makes the same
    # restriction) — never a full-corpus aggregate for a verify join
    sizes = sub.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # pair-oriented shared counts (same rationale as the fast path:
    # work bounded by candidate pairs × doc length, no hot-shingle
    # co-occurrence blowup)
    s1 = sub.select(F.col("id").alias("id1"), "sh")
    s2 = sub.select(F.col("id").alias("id2"), "sh")
    shared = (
        cand.join(s1, "id1")
        .join(s2, ["id2", "sh"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    jn = shared.join(sz1, "id1").join(sz2, "id2")
    union_sz = F.col("sz1") + F.col("sz2") - F.col("shared")
    t_num, t_den = _as_fraction(threshold)
    return jn.where(F.col("shared") * t_den >= F.lit(t_num) * union_sz).select(
        "id1", "id2", "shared", union_sz.alias("union_sz")
    )


def minhash_calibration_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Sketch-CALIBRATION audit for MinHash (the text-side analog of
    the ANN recall report): for every LSH candidate pair, the
    signature-agreement estimate of Jaccard (matching mins / k — the
    estimator the sketch exists to provide) NEXT TO the exact value,
    both in integer basis points, plus the absolute error.  The
    number that says whether k is large enough for the thresholds a
    pipeline runs at — measured on the production candidate set, not
    a synthetic benchmark.  md5-52 hash family end to end, integer
    outputs only → fully DuckDB-replayable.

    100 TB shape: identical to minhash_lsh_pairs_portable (banded
    candidate generation, pair-oriented verify bounded by candidate
    pairs × doc length) plus one broadcast-sized join of the k-column
    signature table onto the candidate pairs."""
    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands
    idx = _shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)

    def h(j: int):
        hex13 = F.substring(F.md5(F.concat_ws("|", F.lit(str(j)), F.col("sh"))), 1, 13)
        return F.conv(hex13, 16, 10).cast("long")

    # feeds banding AND the per-pair agreement join — cut once
    sigs = idx.groupBy("id").agg(*[F.min(h(j)).alias(f"h{j}") for j in range(k)])
    sigs = sigs.localCheckpoint(eager=True)
    band_cols = md5_band_key_cols(bands, r, lambda j: F.col(f"h{j}"))
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # estimator: #matching signature slots (integer, order-free sum
    # of k comparisons in fixed j-order)
    s1 = sigs.select(F.col("id").alias("id1"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(k)])
    s2 = sigs.select(F.col("id").alias("id2"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(k)])
    est_matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(k)
    ).cast("long")
    est = cand.join(s1, "id1").join(s2, "id2").select("id1", "id2", est_matches.alias("est_matches"))

    # exact Jaccard on the candidate set (the verify machinery)
    ids = cand.select(F.col("id1").alias("id")).union(cand.select("id2")).distinct()
    sub = idx.join(ids, "id", "left_semi")
    sizes = sub.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    i1 = sub.select(F.col("id").alias("id1"), "sh")
    i2 = sub.select(F.col("id").alias("id2"), "sh")
    shared = (
        cand.join(i1, "id1")
        .join(i2, ["id2", "sh"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    union_sz = (F.col("sz1") + F.col("sz2") - F.col("shared")).cast("long")
    return (
        est.join(shared, ["id1", "id2"])
        .join(sz1, "id1")
        .join(sz2, "id2")
        .select(
            "id1",
            "id2",
            "est_matches",
            F.expr(f"(est_matches * 10000) DIV {k}").cast("long").alias("est_bp"),
            union_sz.alias("union_sz"),
            F.expr("(shared * 10000) DIV (sz1 + sz2 - shared)").cast("long").alias("exact_bp"),
            F.abs(
                F.expr(f"(est_matches * 10000) DIV {k}")
                - F.expr("(shared * 10000) DIV (sz1 + sz2 - shared)")
            )
            .cast("long")
            .alias("err_bp"),
        )
    )


def _hashed_shingle_index(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, h0_) inverted index of 64-bit shingle HASHES — the
    string-free twin of ``_shingle_index``: one xxhash64 per token,
    shingle hash = xxhash64 of its n token-hashes. Used by MinHash
    signatures and verification, where distinct-shingle IDENTITY is
    all that matters (a 64-bit collision merging two shingles of one
    doc is vanishingly rare and only perturbs a near-dup score by one
    shingle). ``jaccard_pairs`` keeps true string shingles — its
    oracle computes exact string Jaccard."""
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    th = toks.select("id", F.transform("t", lambda x: F.xxhash64(x)).alias("th"))
    shingle_h = F.transform(
        F.sequence(F.lit(1), F.size("th") - (n - 1)),
        lambda i: F.xxhash64(*[F.element_at(F.col("th"), i + j) for j in range(n)]),
    )
    return (
        th.where(F.size("th") >= n)
        .select("id", F.explode(F.array_distinct(shingle_h)).alias("h0_"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate pairs, optionally exact-verified.

    b bands × r=k/b rows; docs collide in a band iff their r mins all
    match → band signature = xxhash64(band, h_j..h_{j+r}). Candidates
    are generated by a self-join on (band, sig) — sub-quadratic, no
    cartesian product. With ``verify_threshold`` set, candidates are
    confirmed with exact Jaccard (inverted-index, restricted to the
    candidate set via semi-joins), so output precision is 1.0.
    """
    if k % bands != 0:
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(F.lit(bi), *[F.col(f"h{bi * r + j}") for j in range(r)]).alias("sig"),
        )
        for bi in range(bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_cols)).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    # Both sides of the candidate self-join read `banded`; without a cut
    # each side re-derives the FULL signature subtree (tokenize + shingle
    # + k min-aggs over the whole corpus — ReusedExchange is not
    # guaranteed under AQE). Materializing bands×1 long per doc is tiny
    # next to re-scanning the corpus, at any scale.
    banded = banded.localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    if verify_threshold is None:
        return cand

    # `cand` feeds three consumers (the ids union, the docs semi-join,
    # and the final pair semi-join) — without a cut, Catalyst re-derives
    # the whole MinHash signature subtree for each. localCheckpoint
    # materializes the candidate set once (it is tiny relative to the
    # corpus: near-dup pairs only) and truncates lineage.
    cand = cand.localCheckpoint(eager=True)

    # Exact-verify candidates: compute shared-shingle counts only for
    # docs appearing in any candidate pair. The semi-join runs BEFORE
    # shingling so non-candidate docs are never exploded (Catalyst
    # won't push a semi-join below a Generate on its own).
    ids = cand.select(F.col("id1").alias("id")).union(cand.select("id2")).distinct()
    docs_cand = df.join(ids.withColumnRenamed("id", id_col), id_col, "left_semi")
    # Same cut for the candidate shingle index: it is read by the sizes
    # agg AND both sides of the shared self-join (3 scans of the same
    # explode). Restricted to candidate docs it is small by construction.
    # Hashed shingles (no string building) — identity is all the
    # Jaccard arithmetic needs.
    idx = _hashed_shingle_index(docs_cand, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # PAIR-oriented shared counts: route each candidate pair through
    # id1's shingles then hash-join on (id2, shingle). Work is
    # Σ_pairs |shingles| — linear in candidate pairs × doc length —
    # where the co-shingle SELF-join alternative generates a row for
    # every co-occurring doc pair per shingle (quadratic in the
    # docs-per-hot-shingle tail) before the candidate filter prunes it.
    i1 = idx.select(F.col("id").alias("id1"), "h0_")
    i2 = idx.select(F.col("id").alias("id2"), "h0_")
    shared = (
        cand.join(i1, "id1")
        .join(i2, ["id2", "h0_"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    # No broadcast hint on per-doc size tables (AQE decides; see
    # jaccard_pairs above).
    j = shared.join(sz1, "id1").join(sz2, "id2")
    union_sz = F.col("sz1") + F.col("sz2") - F.col("shared")
    t_num, t_den = _as_fraction(verify_threshold)
    return j.where(F.col("shared") * t_den >= F.lit(t_num) * union_sz).select(
        "id1", "id2", (F.col("shared").cast("double") / union_sz).alias("jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per doc: per token hash, vote +1/-1 on each bit,
    signature bit = sign of the vote sum. NOTE an intentional edge
    divergence from the shingle-based operators: tokenization here is
    a plain whitespace split, so an empty/whitespace-only doc gets the
    single empty token (and thus hash("")'s signature) where
    jaccard/minhash produce no shingles and drop the doc entirely —
    pinned by the DuckDB twin (DOC_SIMHASH_PORTABLE_SQL), which must
    change in lockstep if this ever does. The ±1 vote sum is computed
    arithmetically as ``2·ones_b − n`` (ones_b = sum of bit b across
    token hashes, n = token count) — identical result to 64
    conditional sums but a much smaller codegen unit (measured ~2×
    faster end-to-end on the cold path). Partial aggregation runs
    map-side; shuffle volume is 65 longs per doc.

    ``hash_mode='md5_52'`` swaps the token hash for the engine-
    portable md5-hex family (52-bit: 13 hex digits — the widest prefix
    that fits a signed long exactly): bits 52-63 are always zero, so
    the signature is effectively 52-bit, the pigeonhole blocking
    contract is unchanged, and the WHOLE pipeline — votes, signature,
    Hamming distances — replays in any SQL engine (the DuckDB oracle
    of doc_simhash_portable). xxhash64 stays the fast default."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    if hash_mode == "md5_52":
        toks = toks.withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 1, 13), 16, 10).cast("long")
        )
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))

    def bitmask(bit: int) -> int:
        # signed-long bit pattern (1 << 63 overflows LongType)
        return (1 << bit) if bit < 63 else -(1 << 63)

    aggs = [
        F.sum(F.shiftrightunsigned("h", bit).bitwiseAND(F.lit(1))).alias(f"o{bit}")
        for bit in range(64)
    ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    voted = toks.groupBy("id").agg(*aggs)
    sig = None
    for bit in range(64):
        # vote sum = ones - (n - ones) = 2*ones - n; bit set iff > 0
        b = F.when(2 * F.col(f"o{bit}") > F.col("n"), F.lit(bitmask(bit))).otherwise(
            F.lit(0).cast("long")
        )
        sig = b if sig is None else sig.bitwiseOR(b)
    return voted.select("id", sig.alias("simhash"))


def hamming_blocked_pairs(
    sigs: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 7,
) -> DataFrame:
    """Pairs of 64-bit signatures within Hamming distance
    ``max_hamming``, via 8 × 8-bit-chunk pigeonhole blocking:
    distance ≤ 7 guarantees an exact chunk match, so recall is 1.0 up
    to max_hamming=7 (beyond that it degrades — raise the chunk count
    if you raise the budget). Candidates join on (chunk_idx, chunk),
    verified with bit_count(xor). Works for ANY 64-bit signature
    column — text SimHash, image perceptual hash, …"""
    base = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
    chunks = base.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright("sig", 8 * i).bitwiseAND(F.lit(0xFF)).alias("chunk"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("c"),
    ).select("id", "sig", F.col("c.ci").alias("ci"), F.col("c.chunk").alias("chunk"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming (see
    ``hamming_blocked_pairs`` for the blocking/recall contract)."""
    sigs = simhash_signatures(df, id_col, text_col, hash_mode)
    return hamming_blocked_pairs(sigs, "id", "simhash", max_hamming)
