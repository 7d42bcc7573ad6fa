"""Data-quality audit (q98) — the constraint/integrity report every
production pipeline runs against its warehouse (the dbt-test /
expectation-suite shape), expressed as one Spark job.

The reference enforces these invariants transactionally in Postgres
— FK constraints and ON CONFLICT guards (salim/tables.sql) — which a
lake has to CHECK instead of enforce. Each check is either:

- a referential-integrity anti-join (orphan orders/lineitems): at
  100 TB the small side broadcasts or rides a runtime bloom filter
  (the q89 pattern) — never a full shuffle of the fact just to find
  violations;
- a constraint scan (non-positive quantities/prices, out-of-range
  discounts): conditional sums folded into one pass, partial-
  aggregatable, bytes of state;
- a key-uniqueness aggregation (duplicate order keys): one groupBy
  on the key with a HAVING>1 count — map-side combinable.

Output is one row per check (check, violations, checked) so the
report is itself a tiny queryable table — the audit history a
deployment appends each run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

_ORACLE_Q98 = """
WITH oo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders o
    WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)
),
ol AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem l
    WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)
),
nq AS (
    SELECT CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
    FROM lineitem
),
dr AS (
    SELECT CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v
    FROM lineitem
),
np AS (
    SELECT CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
    FROM orders
),
dk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
    )
),
n_orders AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
n_lines  AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
n_keys   AS (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n FROM orders)
SELECT '1_orphan_orders' AS check_name, oo.v AS violations, n_orders.n AS checked
    FROM oo, n_orders
UNION ALL SELECT '2_orphan_lineitems', ol.v, n_lines.n FROM ol, n_lines
UNION ALL SELECT '3_nonpos_quantity', nq.v, n_lines.n FROM nq, n_lines
UNION ALL SELECT '4_discount_range', dr.v, n_lines.n FROM dr, n_lines
UNION ALL SELECT '5_nonpos_totalprice', np.v, n_orders.n FROM np, n_orders
UNION ALL SELECT '6_dup_orderkey', dk.v, n_keys.n FROM dk, n_keys
"""


@register(
    "q98_data_quality_audit",
    oracle=_ORACLE_Q98,
    doc="Warehouse audit: referential-integrity anti-joins (orphan "
    "orders/lineitems — broadcast/bloom-prunable at scale), "
    "single-pass constraint scans (non-positive quantity/price, "
    "discount range), and key-uniqueness — one row per check, the "
    "lake-side replacement for the reference's Postgres FK/conflict "
    "enforcement.",
    tags=("quality", "audit", "join"),
)
def q98_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders, lineitem, customer = cat.orders, cat.lineitem, cat.customer

    orphan_orders = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v1"))
    orphan_lines = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v2"))
    line_scan = lineitem.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("v3"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("v4"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    order_scan = orders.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v5"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("v6"))
    )
    one = (
        orphan_orders.crossJoin(orphan_lines)
        .crossJoin(line_scan)
        .crossJoin(order_scan)
        .crossJoin(dup_keys)
    )
    rows = (
        ("1_orphan_orders", "v1", "n_orders"),
        ("2_orphan_lineitems", "v2", "n_lines"),
        ("3_nonpos_quantity", "v3", "n_lines"),
        ("4_discount_range", "v4", "n_lines"),
        ("5_nonpos_totalprice", "v5", "n_orders"),
        ("6_dup_orderkey", "v6", "n_keys"),
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(v).cast("bigint").alias("violations"),
                        F.col(n).cast("bigint").alias("checked"),
                    )
                    for name, v, n in rows
                ]
            )
        ).alias("r")
    ).select("r.check_name", "r.violations", "r.checked")


# -------- q168: shuffle-skew diagnostics for a join/agg key
#
# The pre-flight check run before every big shuffle: how skewed is
# the key? A hot key turns one reducer into the stage's critical
# path (the problem q49's salting and AQE skew-join solve) — this
# query produces the evidence that decides whether to bother:
# per-key count distribution (max, exact p99 order statistic) and
# the top-10 hottest keys with their traffic share, every figure
# exact integer arithmetic (max/mean ratio as max*n_keys*1e6/total,
# no float division). Scale shape: per-key counts partial-aggregate
# map-side; the p99 comes from a cumulative sum over the COUNT
# HISTOGRAM (cnt -> #keys), whose size is bounded by the distinct
# per-key counts — never a rank window over the billion-key frame;
# top-10 is a partial top-k.

SKEW_TOP_K = 10

_ORACLE_Q168 = """
WITH counts AS (
    SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
stats AS (
    SELECT COUNT(*) AS n_keys, SUM(cnt) AS total, MAX(cnt) AS max_cnt
    FROM counts
),
hist AS (
    SELECT cnt, COUNT(*) AS freq FROM counts GROUP BY cnt
),
cum AS (
    SELECT cnt,
           SUM(freq) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS below
    FROM hist
),
p99 AS (
    SELECT MIN(c.cnt) AS p99_cnt
    FROM cum c CROSS JOIN stats s
    WHERE c.below >= (99 * s.n_keys + 99) // 100
)
SELECT CAST(row_number() OVER (ORDER BY c.cnt DESC, c.user_id) AS BIGINT)
           AS rank,
       c.user_id,
       CAST(c.cnt AS BIGINT) AS cnt,
       CAST(c.cnt * 1000000 // s.total AS BIGINT) AS share_ppm,
       CAST(s.n_keys AS BIGINT) AS n_keys,
       CAST(p.p99_cnt AS BIGINT) AS p99_cnt,
       CAST(s.max_cnt * s.n_keys * 1000000 // s.total AS BIGINT)
           AS max_over_mean_ppm
FROM counts c CROSS JOIN stats s CROSS JOIN p99 p
ORDER BY c.cnt DESC, c.user_id
LIMIT 10
"""


@register(
    "q168_key_skew_diagnostics",
    oracle=_ORACLE_Q168,
    doc="Shuffle-skew pre-flight for the user_id key: top-10 hot "
    "keys with traffic share, exact p99 per-key count and the "
    "max/mean ratio in ppm — the evidence that decides between a "
    "plain shuffle, salting (q49) and AQE skew handling; all "
    "integer arithmetic, partial top-k plan.",
    tags=("quality", "skew", "diagnostics"),
)
def q168_key_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    counts = cat.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    hist = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
    wr = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("cnt", F.sum("freq").over(wr).alias("below"))
    p99 = (
        cum.crossJoin(F.broadcast(stats))
        .where(F.col("below") >= F.expr("(99 * n_keys + 99) div 100"))
        .agg(F.min("cnt").alias("p99_cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "user_id").limit(SKEW_TOP_K)
    wt = Window.orderBy(F.col("cnt").desc(), "user_id")
    return (
        top.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(p99))
        .select(
            F.row_number().over(wt).cast("bigint").alias("rank"),
            "user_id",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("CAST(cnt * 1000000 div total AS BIGINT)").alias("share_ppm"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("p99_cnt").cast("bigint").alias("p99_cnt"),
            F.expr(
                "CAST(max_cnt * n_keys * 1000000 div total AS BIGINT)"
            ).alias("max_over_mean_ppm"),
        )
        .orderBy("rank")
    )
