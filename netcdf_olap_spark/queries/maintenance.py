"""Data-maintenance surfaces: CDC upsert (MERGE shape) and SCD2
validity-interval history.

A table-format layer (Delta/Iceberg) is out of scope offline, but the
EXECUTION shapes a maintenance pipeline needs are engine work and are
covered here:

- ``cdc_merge_orders`` — apply a changeset (inserts/updates/deletes,
  one row per key, delete-wins precedence) to a base table via one
  FULL OUTER join + conditional projection: exactly the physical plan
  MERGE INTO lowers to. The changeset is derived deterministically
  from the base so the query is self-contained and oracle-checkable.
- ``scd2_user_history`` — slowly-changing-dimension type 2: collapse
  each user's consecutive same-value runs into versioned rows with
  [valid_from, valid_to) intervals via lag/lead — the
  value-change-run twin of the gap-based sessionize query.

Scale: the merge shuffles base and changes once on the key (changes
are usually ≪ base → AQE broadcasts them); SCD2 is one shuffle on the
entity key with two window passes over the same sort. Decimal casts
keep the money sums engine-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from netcdf_olap_spark.functions import decimal_sum
from netcdf_olap_spark.session import load_events

INSERT_OFFSET = 100_000_000


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO execution shape. Changeset (per base key, delete
    wins): D where key%37=0; U (+100 price) where key%10=3 and not D;
    I (new key = key+1e8, price 42, status 'N') seeded from key%53=0.
    Plan: one full-outer hash join on the key + a CASE projection —
    no second pass over the base; final rollup by status proves the
    applied state."""
    k = F.col("o_orderkey")
    base = _orders(spark, sf_dir).select(
        k.alias("key"), "o_orderstatus", "o_totalprice"
    )
    d = base.where(F.col("key") % 37 == 0).select(
        "key", F.lit(None).cast("string").alias("c_status"),
        F.lit(None).cast("double").alias("c_price"), F.lit("D").alias("op"))
    u = base.where((F.col("key") % 10 == 3) & (F.col("key") % 37 != 0)).select(
        "key", F.lit(None).cast("string").alias("c_status"),
        (F.col("o_totalprice") + 100.0).alias("c_price"), F.lit("U").alias("op"))
    i = base.where(F.col("key") % 53 == 0).select(
        (F.col("key") + INSERT_OFFSET).alias("key"), F.lit("N").alias("c_status"),
        F.lit(42.0).alias("c_price"), F.lit("I").alias("op"))
    changes = d.unionByName(u).unionByName(i)
    merged = (
        base.join(changes, "key", "full_outer")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("c_status", "o_orderstatus").alias("status"),
            F.when(F.col("op") == "U", F.col("c_price"))
            .when(F.col("op") == "I", F.col("c_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
    )
    return (
        merged.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"), decimal_sum("price", 2).alias("total_price"))
        .orderBy("status")
    )


CDC_MERGE_SQL = f"""
WITH base AS (SELECT o_orderkey AS key, o_orderstatus, o_totalprice FROM orders),
changes AS (
  SELECT key, CAST(NULL AS VARCHAR) AS c_status, CAST(NULL AS DOUBLE) AS c_price, 'D' AS op
  FROM base WHERE key % 37 = 0
  UNION ALL
  SELECT key, NULL, o_totalprice + 100.0, 'U' FROM base WHERE key % 10 = 3 AND key % 37 <> 0
  UNION ALL
  SELECT key + {INSERT_OFFSET}, 'N', 42.0, 'I' FROM base WHERE key % 53 = 0),
merged AS (
  SELECT COALESCE(c.c_status, b.o_orderstatus) AS status,
         CASE WHEN c.op IN ('U', 'I') THEN c.c_price ELSE b.o_totalprice END AS price
  FROM base b FULL OUTER JOIN changes c USING (key)
  WHERE c.op IS NULL OR c.op <> 'D')
SELECT status, COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS total_price
FROM merged GROUP BY status ORDER BY status
"""


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: one versioned row per run of consecutive
    identical event_types per user, valid over [valid_from_us,
    valid_to_us) (NULL = current). lag marks run starts, a running
    sum numbers versions, lead over run starts closes intervals —
    all three windows share one (user_id, ts) sort."""
    e = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns DIV 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    is_new = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = e.select("user_id", "event_id", "ts_us", "event_type", is_new.alias("is_new"))
    runs = runs.withColumn(
        "version_n", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).where(F.col("is_new") == 1)
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        runs.select(
            "user_id",
            "version_n",
            "event_type",
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w2).alias("valid_to_us"),
        )
        .orderBy("user_id", "version_n")
    )


SCD2_SQL = """
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
runs AS (
  SELECT user_id, event_id, ts_us, event_type, is_new,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version_n
  FROM marked)
SELECT user_id, CAST(version_n AS BIGINT) AS version_n, event_type,
       ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
FROM runs
WHERE is_new = 1
ORDER BY user_id, version_n
"""


def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD2 dimension — the classic
    warehouse temporal-join shape ("which version was current at
    instant t"): each user probed at the midpoint of their activity
    span, matched to the single version whose
    [valid_from_us, valid_to_us) interval covers it (NULL valid_to =
    still current).  Deterministic probe: the midpoint is exact
    integer µs arithmetic ((min+max) DIV 2).

    100 TB shape: the equi-key (user_id) carries the join — the
    interval predicate is a residual on the matched key's few
    versions, never a range-only join; version history per key is
    small by construction (it's a dimension)."""
    hist = scd2_user_history(spark, sf_dir)
    e = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns DIV 1000"))
    probe = e.groupBy("user_id").agg(
        F.expr("(MIN(ts_us) + MAX(ts_us)) DIV 2").alias("probe_us")
    )
    j = probe.join(hist, "user_id").where(
        (F.col("valid_from_us") <= F.col("probe_us"))
        & (F.col("valid_to_us").isNull() | (F.col("probe_us") < F.col("valid_to_us")))
    )
    return j.select(
        "user_id", "probe_us", "version_n", F.col("event_type").alias("state_at_probe")
    ).orderBy("user_id")


JOIN_SCD2_PIT_SQL = """
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
runs AS (
  SELECT user_id, event_id, ts_us, event_type, is_new,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version_n
  FROM marked),
hist AS (
  SELECT user_id, CAST(version_n AS BIGINT) AS version_n, event_type,
         ts_us AS valid_from_us,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
  FROM runs
  WHERE is_new = 1),
probe AS (
  SELECT user_id, (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS probe_us
  FROM events GROUP BY user_id)
SELECT p.user_id, p.probe_us, h.version_n, h.event_type AS state_at_probe
FROM probe p JOIN hist h ON p.user_id = h.user_id
WHERE h.valid_from_us <= p.probe_us
  AND (h.valid_to_us IS NULL OR p.probe_us < h.valid_to_us)
ORDER BY p.user_id
"""


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-DIFF between two snapshots — the data-versioning audit
    (what changed between yesterday's and today's table?) every
    lakehouse maintenance story needs.  Snapshot A = the base orders;
    snapshot B = the CDC-merged state (cdc_merge_orders' exact
    changeset: deletes at key%37, price updates at key%10=3, inserts
    at key%53 — one definition shared, so the diff op is checked
    against a KNOWN edit script).  One full-outer join on the key
    classifies every row added / removed / changed / unchanged; the
    rollup also carries the exact total |Δprice| of changed rows as
    DECIMAL (order-free sum).

    100 TB shape: one key-keyed full-outer hash join (the diff is
    inherently one co-partitioning of both snapshots), then a 4-row
    rollup; no second pass, no collect."""
    k = F.col("o_orderkey")
    base = _orders(spark, sf_dir).select(k.alias("key"), "o_totalprice")
    # snapshot B per cdc_merge_orders' changeset (kept inline so the
    # expected diff is analytically known)
    deleted = F.col("key") % 37 == 0
    updated = (F.col("key") % 10 == 3) & ~deleted
    b_kept = base.where(~deleted).select(
        "key",
        F.when(updated, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price_b"),
    )
    b_ins = base.where(F.col("key") % 53 == 0).select(
        (F.col("key") + INSERT_OFFSET).alias("key"), F.lit(42.0).alias("price_b")
    )
    snap_b = b_kept.unionByName(b_ins)
    j = base.select("key", F.col("o_totalprice").alias("price_a")).join(
        snap_b, "key", "full_outer"
    )
    cls = (
        F.when(F.col("price_a").isNull(), F.lit("added"))
        .when(F.col("price_b").isNull(), F.lit("removed"))
        .when(F.col("price_a") != F.col("price_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    delta = F.abs(
        F.coalesce(F.col("price_b"), F.lit(0.0)) - F.coalesce(F.col("price_a"), F.lit(0.0))
    )
    return (
        j.select(cls.alias("diff_class"), delta.alias("d"))
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("d").cast("decimal(18,2)")).cast("double").alias("total_abs_delta"),
        )
        .orderBy("diff_class")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH base AS (SELECT o_orderkey AS key, o_totalprice FROM orders),
b_kept AS (
  SELECT key,
         CASE WHEN key % 10 = 3 AND key % 37 != 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS price_b
  FROM base WHERE key % 37 != 0),
b_ins AS (
  SELECT key + {INSERT_OFFSET} AS key, 42.0 AS price_b
  FROM base WHERE key % 53 = 0),
snap_b AS (SELECT * FROM b_kept UNION ALL SELECT * FROM b_ins),
j AS (
  SELECT COALESCE(a.key, b.key) AS key, a.o_totalprice AS price_a, b.price_b
  FROM base a FULL OUTER JOIN snap_b b ON a.key = b.key)
SELECT CASE WHEN price_a IS NULL THEN 'added'
            WHEN price_b IS NULL THEN 'removed'
            WHEN price_a != price_b THEN 'changed'
            ELSE 'unchanged' END AS diff_class,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ABS(COALESCE(price_b, 0.0) - COALESCE(price_a, 0.0)) AS DECIMAL(18,2)))
            AS DOUBLE) AS total_abs_delta
FROM j
GROUP BY 1
ORDER BY diff_class
"""


def maintenance_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN deletion audit: given a deterministic
    forget set (customers whose md5-hex leads with '0' — ~1/16 of
    accounts, the daily GDPR/CCPA batch shape), propagate the
    deletion through the relational graph (orders via o_custkey,
    lineitem via those orders' keys, events via user_id matching a
    forgotten account) and report, per table, rows before / deleted /
    after plus the distinct principals touched — the audit record a
    compliance pipeline must emit alongside the deletes.

    100 TB shape: the forget set and its order keys are semi-join
    probes (broadcast when small, shuffle otherwise — Catalyst's
    call); each table is scanned once; no row data moves anywhere,
    only counts.  The actual rewrite would be the same anti-joins
    feeding the table writers."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ev = load_events(spark, sf_dir)

    forget = cust.where(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) == "0"
    ).select(F.col("c_custkey").alias("fk")).localCheckpoint(eager=True)
    fo = orders.join(forget, orders.o_custkey == forget.fk, "left_semi")
    fo_keys = fo.select(F.col("o_orderkey").alias("fok")).localCheckpoint(eager=True)

    def audit(name: str, total_df: DataFrame, deleted_df: DataFrame, principals) -> DataFrame:
        t = total_df.agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        d = deleted_df.agg(
            F.count(F.lit(1)).cast("long").alias("n_deleted"),
            F.countDistinct(principals).cast("long").alias("n_principals"),
        )
        return t.crossJoin(d).select(
            F.lit(name).alias("table_name"),
            "n_before",
            "n_deleted",
            (F.col("n_before") - F.col("n_deleted")).cast("long").alias("n_after"),
            "n_principals",
        )

    fl = li.join(fo_keys, li.l_orderkey == fo_keys.fok, "left_semi")
    fe = ev.join(forget, ev.user_id == forget.fk, "left_semi")
    out = (
        audit("customer", cust, cust.join(forget, cust.c_custkey == forget.fk, "left_semi"), "c_custkey")
        .unionByName(audit("orders", orders, fo, "o_custkey"))
        .unionByName(audit("lineitem", li, fl, "l_orderkey"))
        .unionByName(audit("events", ev.select("event_id", "user_id"), fe, "user_id"))
    )
    return out.orderBy("table_name")


MAINT_FORGET_SQL = """
WITH forget AS (
  SELECT c_custkey AS fk FROM customer
  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'),
fo AS (SELECT * FROM orders WHERE o_custkey IN (SELECT fk FROM forget)),
fl AS (SELECT * FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM fo)),
fe AS (SELECT * FROM events WHERE user_id IN (SELECT fk FROM forget))
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_before,
       CAST((SELECT COUNT(*) FROM forget) AS BIGINT) AS n_deleted,
       CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget) AS BIGINT) AS n_after,
       CAST((SELECT COUNT(*) FROM forget) AS BIGINT) AS n_principals
UNION ALL
SELECT 'events',
       CAST((SELECT COUNT(*) FROM events) AS BIGINT),
       CAST((SELECT COUNT(*) FROM fe) AS BIGINT),
       CAST((SELECT COUNT(*) FROM events) - (SELECT COUNT(*) FROM fe) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT user_id) FROM fe) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM fl) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM fl) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT l_orderkey) FROM fl) AS BIGINT)
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM fo) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM fo) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT o_custkey) FROM fo) AS BIGINT)
ORDER BY table_name
"""


def maintenance_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-QUALITY CONTRACT AUDIT — the Deequ/Great-Expectations
    capability class: declarative warehouse checks emitted as one
    (check, violations, checked) report row each.  Primary-key
    uniqueness, referential integrity both directions, required-column
    completeness, value-domain bounds, a business rule (non-negative
    balances), and a cross-table temporal invariant (no line shipped
    before its order date).  On the driver's synthetic data two checks
    carry real violations (ship-before-order, negative balances) and
    five prove cleanliness — the report is informative, not a row of
    zeros.

    Exactness: every metric is an integer COUNT (conditional counts
    via count(when)/FILTER, NULLs counted as violations through the
    count(*)−count(passing) form), so hashes cannot drift.

    100 TB shape: each intra-table check is ONE scan with map-side
    partial aggregation; the three referential/temporal checks are
    single equi-joins on their natural keys (distinct key sides are
    dimension-sized → AQE broadcasts them); the report is 7 rows."""
    orders = _orders(spark, sf_dir)
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    def report(name: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(name).alias("check"),
            F.col("violations").cast("long").alias("violations"),
            F.col("checked").cast("long").alias("checked"),
        )

    pk = report(
        "orders_pk_unique",
        orders.agg(
            (F.count("o_orderkey") - F.count_distinct(F.col("o_orderkey"))).alias(
                "violations"
            ),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    okeys = orders.select("o_orderkey").distinct()
    fk_li = report(
        "lineitem_fk_orders",
        lineitem.join(okeys, lineitem["l_orderkey"] == okeys["o_orderkey"], "left").agg(
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    ckeys = customer.select("c_custkey").distinct()
    fk_ord = report(
        "orders_fk_customer",
        orders.join(ckeys, orders["o_custkey"] == ckeys["c_custkey"], "left").agg(
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    qty = report(
        "lineitem_qty_domain",
        lineitem.agg(
            (
                F.count(F.lit(1))
                - F.count(F.when(F.col("l_quantity").between(1.0, 50.0), 1))
            ).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    ship = report(
        "lineitem_ship_after_order",
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        ).agg(
            F.count(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)).alias(
                "violations"
            ),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    bal = report(
        "customer_acctbal_nonneg",
        customer.agg(
            F.count(F.when(F.col("c_acctbal") < 0.0, 1)).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    complete = report(
        "customer_required_complete",
        customer.agg(
            (
                F.count(F.lit(1))
                - F.count(
                    F.when(
                        F.col("c_name").isNotNull() & F.col("c_acctbal").isNotNull(), 1
                    )
                )
            ).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        ),
    )
    return (
        pk.unionAll(fk_li)
        .unionAll(fk_ord)
        .unionAll(qty)
        .unionAll(ship)
        .unionAll(bal)
        .unionAll(complete)
        .orderBy("check")
    )


MAINT_DQ_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'orders_pk_unique' AS "check",
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations,
         CAST(COUNT(*) AS BIGINT) AS checked
  FROM orders
  UNION ALL
  SELECT 'lineitem_fk_orders',
         CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders_fk_customer',
         CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM orders ord
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON ord.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem_qty_domain',
         CAST(COUNT(*) - COUNT(*) FILTER (WHERE l_quantity BETWEEN 1.0 AND 50.0) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_ship_after_order',
         CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'customer_acctbal_nonneg',
         CAST(COUNT(*) FILTER (WHERE c_acctbal < 0.0) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'customer_required_complete',
         CAST(COUNT(*) - COUNT(*) FILTER (WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM customer
) ORDER BY "check"
"""


QUERIES = {
    "maintenance_forget_users": (maintenance_forget_users, MAINT_FORGET_SQL),
    "maintenance_dq_audit": (maintenance_dq_audit, MAINT_DQ_AUDIT_SQL),
    "maintenance_snapshot_diff": (snapshot_diff, SNAPSHOT_DIFF_SQL),
    "cdc_merge_orders": (cdc_merge_orders, CDC_MERGE_SQL),
    "scd2_user_history": (scd2_user_history, SCD2_SQL),
    "join_scd2_pit": (join_scd2_pit, JOIN_SCD2_PIT_SQL),
}
