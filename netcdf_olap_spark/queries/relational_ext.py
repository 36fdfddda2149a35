"""Extended relational coverage: subquery planning, frame windows,
reshapes, higher-order array/map functions, exact order statistics.

These widen SURVEY.md §2.3-2.8 beyond the first relational module:

- Catalyst subquery surfaces: correlated scalar subquery (TPC-H Q17
  shape), IN-subquery with HAVING (Q18), null-aware NOT IN anti join,
  correlated LATERAL (per-key top-k without a window).
- RANGE window frames (value-based, not row-based): the time-series
  "last 30 days" rolling aggregate the reference's daily cubes imply.
- unpivot/melt — the inverse of the pivot reshape.
- Higher-order lambdas over array columns (§2.8 F6) and map-typed
  key/value analytics (F4/F6) — the array-cube functions the
  reference applies imperatively (Gddp.scala:224-228 flattened
  reads), re-expressed as declarative column expressions.
- Exact median / interpolated percentile (§2.4 A2's exact analog;
  the sketch version lives in agg_approx_sketches).

Scale notes: every join here is either broadcast (part, the
IN-subquery result, nation) or shuffles once on its group key; the
correlated subqueries decorrelate to aggregates + joins under
Catalyst (no per-row re-execution); RANGE frames sort within the
partition only. Decimal casts keep double sums bit-identical to the
DuckDB oracles (see functions/deterministic.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from netcdf_olap_spark.functions import decimal_sum
from netcdf_olap_spark.session import load_events


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _sql_on_views(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    """Run the oracle SQL text on Spark itself: register each table as
    an ``ext_``-prefixed temp view and rewrite whole-word table names
    (word-boundary regex — identifiers like ``l_partkey`` contain
    ``part`` but have no word boundary around it, so they are safe)."""
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(f"ext_{t}")
        sql = re.sub(rf"\b{t}\b", f"ext_{t}", sql)
    return spark.sql(sql)


# --- TPC-H classics exercising new plan shapes ------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio over a broadcast dim
    join. part is the small side (broadcast at any scale where the
    dim fits an executor); the ratio divides two decimal-exact sums
    of the same rows, so no extra shuffle beyond the scalar agg."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            decimal_sum(promo, 6).alias("promo_rev"),
            decimal_sum(disc_price, 6).alias("total_rev"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
            "promo_rev",
            "total_rev",
        )
    )


Q14_SQL = """
WITH s AS (
  SELECT
    CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS promo_rev,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01')
SELECT 100.0 * promo_rev / total_rev AS promo_pct, promo_rev, total_rev FROM s
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery with an aggregate.
    Catalyst decorrelates this into (per-partkey avg) ⋈ lineitem —
    one aggregate + one equi-join, not a per-row re-execution; the
    same rewrite DuckDB applies. Inner avg is decimal-exact so the
    `<` comparison cannot flip on a last-ulp difference."""
    return _sql_on_views(spark, sf_dir, Q17_SQL, ["lineitem", "part"])


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery whose body is a grouped HAVING.
    Catalyst plans the IN as a left-semi hash join against the
    aggregated (and therefore small — broadcastable) key set; the
    outer 3-way join then groups once on the order key."""
    return _sql_on_views(spark, sf_dir, Q18_SQL, ["orders", "lineitem"])


Q18_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
GROUP BY o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate riding a broadcast join.
    The shared p_partkey = l_partkey equi-condition keeps it a hash
    join (not a nested loop); the disjunction is a post-join filter
    Catalyst can partially push (common p_size bound) to the scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(branch)
        .agg(
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- subquery planning surfaces ---------------------------------------------


def notin_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → Catalyst's null-aware anti join (distinct
    from NOT EXISTS: a NULL in the subquery would empty the result;
    keys here are non-null so semantics coincide, but the plan node —
    BroadcastNestedLoopJoin with a null-aware condition — is the
    operator under test). Nations with customers but no high-balance
    supplier."""
    return _sql_on_views(spark, sf_dir, NOTIN_SQL, ["customer", "supplier"])


NOTIN_SQL = """
SELECT DISTINCT c_nationkey
FROM customer
WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
ORDER BY c_nationkey
"""


def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2
    customers by balance per nation. The window-free formulation of
    per-group top-k; Catalyst rewrites it to a ranked join, so the
    big side still shuffles only once on the correlation key."""
    return _sql_on_views(spark, sf_dir, LATERAL_SQL, ["nation", "customer"])


LATERAL_SQL = """
SELECT n_name, c.c_custkey, c.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2) c
ORDER BY n_name, c_acctbal DESC, c_custkey
"""


def q21_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + correlated NOT EXISTS self-joins on
    the fact table — suppliers who were the *only* late shipper
    (>90 days after order date) on a multi-supplier order, counted by
    nation. The testdata lacks receipt/commit dates, so lateness is
    ship-vs-order delay (same join topology as the original).

    Catalyst plans both correlated predicates as semi/anti joins on
    l_orderkey — three passes over lineitem co-partitioned on the same
    key, so at 100 TB this is one shuffle-key family, not three
    independent shuffles (AQE reuses the exchange)."""
    for t in ("lineitem", "orders", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"ext_{t}")
    return spark.sql(
        """
        SELECT s_nationkey, COUNT(*) AS n_lone_late
        FROM (
          SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
          FROM ext_lineitem l1 JOIN ext_orders o ON l1.l_orderkey = o.o_orderkey
          WHERE datediff(l1.l_shipdate, o.o_orderdate) > 90
            AND EXISTS (SELECT 1 FROM ext_lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM ext_lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND datediff(l3.l_shipdate, o.o_orderdate) > 90))
        JOIN ext_supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
        ORDER BY n_lone_late DESC, s_nationkey
        """
    )


Q21_SQL = """
SELECT s_nationkey, COUNT(*) AS n_lone_late
FROM (
  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
  WHERE DATE_DIFF('day', o.o_orderdate, l1.l_shipdate) > 90
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND DATE_DIFF('day', o.o_orderdate, l3.l_shipdate) > 90))
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY n_lone_late DESC, s_nationkey
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (above-average
    balance, decimal-exact so the comparison can't flip on ulps) +
    NOT EXISTS anti join (no order in the data's FINAL year — the
    r10 zero-row audit found the old 1997 cutoff matched nobody:
    every fixture customer orders into 2001), grouped by segment. The
    scalar subquery is a broadcast single-row cross; the anti join
    shuffles on custkey."""
    return _sql_on_views(spark, sf_dir, Q22_SQL, ["customer", "orders"])


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- outer joins ------------------------------------------------------------


def join_outer_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving customers with no
    orders, then the order-count distribution. Two shuffles (custkey,
    then n_orders); COUNT(o_orderkey) — not COUNT(*) — so the
    unmatched NULL rows count as zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.col("n_custs").desc(), F.col("n_orders").desc())
    )


JOIN_OUTER_SQL = """
SELECT n_orders, COUNT(*) AS n_custs
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY n_orders
ORDER BY n_custs DESC, n_orders DESC
"""


def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (customer count vs supplier
    count per nation) — either side may be missing; COALESCE merges
    the keys. Both inputs pre-aggregate to ≤ |nations| rows, so the
    outer join itself is trivially broadcastable at any scale."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.ck == s.sk, "full_outer")
        .select(
            F.coalesce("ck", "sk").alias("nationkey"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nationkey")
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c.ck, s.sk) AS nationkey, n_cust, n_supp
FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier
      WHERE s_acctbal > 5000 GROUP BY 1) s
ON c.ck = s.sk
ORDER BY nationkey
"""


# --- value-based window frames ----------------------------------------------


def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): per-customer rolling 30-day order
    total. Unlike a ROWS frame, the bound is a value distance —
    orders on the same day are peers and always aggregate together,
    so the result is deterministic without a unique tie-break. One
    shuffle on the partition key; the frame scan is a sliding
    two-pointer within each sorted partition."""
    o = _t(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-29, 0)
    return (
        o.withColumn("day_no", day_no)
        .select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_30d"),
        )
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       DATE_DIFF('day', DATE '1990-01-01', o_orderdate) AS day_no,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY DATE_DIFF('day', DATE '1990-01-01', o_orderdate)
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_30d
FROM orders
"""


# --- reshapes ---------------------------------------------------------------


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt (wide→long, the inverse of pivot_status_priority):
    part's numeric measures as (measure, val) rows, then profiled.
    Narrow transform — no shuffle until the final 2-group agg."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    long = p.unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "val")
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("val", 2).alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("measure")
    )


UNPIVOT_SQL = """
SELECT measure, COUNT(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(30,2))) AS DOUBLE) AS sum_val,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM (
  SELECT 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT 'p_retailprice' AS measure, p_retailprice AS val FROM part)
GROUP BY measure
ORDER BY measure
"""


# --- higher-order array / map functions (§2.8 F6, F4) -----------------------


def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas over array columns — the declarative form
    of the reference's flattened-array loops (Gddp.scala:224-228,
    geopy.py:64-71): filter (positive-component count), sequential
    aggregate fold (L1 norm — bit-identical to DuckDB's list_sum
    fold, see similarity.py), slice + fold (prefix sum), array_max.
    All JVM-side codegen; no UDF."""
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = F.col("embedding")
    l1 = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double")))
    head_sum = F.aggregate(F.slice(emb, 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        l1.alias("l1_norm"),
        head_sum.alias("head8_sum"),
        F.array_max(emb).cast("double").alias("max_val"),
    ).orderBy("vec_id")


SCALAR_ARRAY_SQL = """
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       list_sum([abs(CAST(embedding[i] AS DOUBLE)) FOR i IN generate_series(1, len(embedding))]) AS l1_norm,
       list_sum([CAST(embedding[i] AS DOUBLE) FOR i IN generate_series(1, 8)]) AS head8_sum,
       CAST(list_max(embedding) AS DOUBLE) AS max_val
FROM embeddings
ORDER BY vec_id
"""


def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (§2.8 F2's integer-ops corner, made
    load-bearing by the Bloom operators): AND / OR / XOR, left/right
    shifts, and popcount over order keys, rolled up per priority so
    the result is a small checked table.  Two's-complement semantics
    are identical in both engines for non-negative BIGINTs; shifts
    stay < 63 so no sign bit is ever touched (the 63-bit-word rule
    from doc_bloom_probe)."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            F.expr("o_orderkey & 255").alias("band"),
            F.expr("(o_orderkey ^ 1234567) & 1048575").alias("xr"),
            F.expr("(o_orderkey << 3) % 1000003").alias("shl"),
            F.expr("o_orderkey >> 4").alias("shr"),
            F.bit_count(k).alias("pc"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("band").cast("long").alias("sum_band"),
            F.sum("xr").cast("long").alias("sum_xor"),
            F.sum("shl").cast("long").alias("sum_shl"),
            F.sum("shr").cast("long").alias("sum_shr"),
            F.sum("pc").cast("long").alias("sum_popcount"),
            F.max("pc").cast("int").alias("max_popcount"),
        )
        .orderBy("o_orderpriority")
    )


SCALAR_BITWISE_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_band,
       CAST(SUM(xor(o_orderkey, 1234567) & 1048575) AS BIGINT) AS sum_xor,
       CAST(SUM((o_orderkey << 3) % 1000003) AS BIGINT) AS sum_shl,
       CAST(SUM(o_orderkey >> 4) AS BIGINT) AS sum_shr,
       CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS sum_popcount,
       CAST(MAX(bit_count(o_orderkey)) AS INT) AS max_popcount
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (§2.8 F4/F6): parse the events' JSON props
    into map<string,long>, explode key/value pairs, aggregate per
    key. The generic property-bag analytics pattern (the reference
    round-trips its query descriptor as JSON, main.py:21-89)."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select(F.explode(m).alias("map_key", "map_val"))
        .groupBy("map_key")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sum("map_val").alias("sum_val"),
            F.min("map_val").alias("min_val"),
            F.max("map_val").alias("max_val"),
        )
        .orderBy("map_key")
    )


SCALAR_MAP_SQL = """
SELECT k AS map_key, COUNT(*) AS n_entries,
       CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_val,
       MIN(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS min_val,
       MAX(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS max_val
FROM (SELECT unnest(json_keys(props)) AS k, props FROM events)
GROUP BY k
ORDER BY map_key
"""


# --- exact order statistics -------------------------------------------------


def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + interpolated percentile per group (§2.4 A2's
    exact form; the mergeable-sketch form is agg_approx_sketches).
    Both engines use the same (n-1)·q linear-interpolation formula —
    verified bit-identical. Exact percentile is a sort-based
    aggregate: fine per-group; at 100 TB prefer the sketch variant
    for single-pass merge."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.median("o_totalprice").alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


EXACT_QUANTILES_SQL = """
SELECT o_orderpriority,
       median(o_totalprice) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def agg_quantile_sketch_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile SKETCH with a hard oracle (the portable
    counterpart of agg_approx_sketches' percentile_approx, whose
    KLL-style internals are Spark-private): the sketch state is a
    DETERMINISTIC ~10 % md5-keyed row sample — merge of two sketches
    is the union of their samples (hash sampling commutes with
    partition/union by construction, the mergeability that makes a
    sketch a sketch), and the estimate is the exact interpolated
    quantile OF the sample.  Every stage is engine-portable: the draw
    is a lowercase-hex string compare (substr(md5('qs:'||key)) <
    '199a' ≈ 6554/65536), the quantile is the shared (n−1)·q
    interpolation.  Estimator quality is pinned against the exact
    per-group quantiles in pytest.

    100 TB shape: the sample predicate is map-side (no shuffle to
    draw); only ~10 % of rows reach the per-group sort, and the
    sketch table at rest is small enough to broadcast-merge."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.lit("qs"),
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        4,
    )
    return (
        li.where(key < "199a")
        .groupBy("l_returnflag")
        .agg(
            F.median("l_extendedprice").alias("est_median"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("est_p90"),
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
        )
        .orderBy("l_returnflag")
    )


QUANTILE_SKETCH_SQL = """
SELECT l_returnflag,
       median(l_extendedprice) AS est_median,
       quantile_cont(l_extendedprice, 0.9) AS est_p90,
       CAST(COUNT(*) AS BIGINT) AS n_sampled
FROM lineitem
WHERE substr(md5('qs:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 4) < '199a'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "agg_quantile_sketch_portable": (agg_quantile_sketch_portable, QUANTILE_SKETCH_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q21_lone_late_supplier": (q21_lone_late_supplier, Q21_SQL),
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
    "notin_nations": (notin_nations, NOTIN_SQL),
    "join_outer_custdist": (join_outer_custdist, JOIN_OUTER_SQL),
    "join_full_outer_nations": (join_full_outer_nations, JOIN_FULL_OUTER_SQL),
    "lateral_topk_per_nation": (lateral_topk_per_nation, LATERAL_SQL),
    "window_range_30d": (window_range_30d, WINDOW_RANGE_SQL),
    "unpivot_part_measures": (unpivot_part_measures, UNPIVOT_SQL),
    "scalar_array_funcs": (scalar_array_funcs, SCALAR_ARRAY_SQL),
    "scalar_map_funcs": (scalar_map_funcs, SCALAR_MAP_SQL),
    "scalar_bitwise_funcs": (scalar_bitwise_funcs, SCALAR_BITWISE_SQL),
    "agg_exact_quantiles": (agg_exact_quantiles, EXACT_QUANTILES_SQL),
}
