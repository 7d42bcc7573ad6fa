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
from ..functions.money import dec
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


# ------ q175: skew-ADAPTIVE aggregation (closing the q168 loop)
#
# q168 produces the skew evidence; this query USES it to choose the
# physical aggregation strategy — the same decision-closure shape as
# q171's sketch-driven join order. Two candidate grouping keys over
# events: event_type (5 values → each key is ~20% of all rows: at
# 100 TB one reducer drags the stage) and user_id (the hottest user
# holds ~0.1%). The criterion is FAIR-SHARE, not max/mean — both
# keys here are near-uniform by max/mean (~1.0-1.5x), yet
# event_type still hot-spots because |keys| << parallelism: a key
# whose hottest value exceeds HOT_FACTOR times the fair 1/P
# per-reducer share becomes the critical path, so
#     salted  iff  max_share_ppm * P >= HOT_FACTOR * 1_000_000.
# The decision is VALUE-CHECKED: both physical strategies (plain
# one-shuffle groupBy and q49's deterministic-salt two-phase) run
# for each key, their per-key results are full-outer compared, and
# the emitted mismatch_rows must be 0 — proving the chooser selects
# between provably-identical plans on exact-integer cents. All
# statistics in exact integer ppm, same as q168.
SKEW_PARALLELISM = 32  # the fleet's shuffle width (session.py)
SKEW_HOT_FACTOR = 4  # hottest key > 4x fair share => salt
_SKEW_SALT = 16


def _q175_branch_sql(key: str) -> str:
    return f"""
    SELECT '{key}' AS key_name,
           CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(s.max_cnt AS BIGINT) AS max_cnt,
           CAST(s.max_cnt * 1000000 // s.total AS BIGINT) AS max_share_ppm,
           CAST(s.max_cnt * s.n_keys * 1000000 // s.total AS BIGINT)
               AS max_over_mean_ppm,
           CASE WHEN s.max_cnt * 1000000 // s.total * {SKEW_PARALLELISM}
                     >= {SKEW_HOT_FACTOR} * 1000000
                THEN 'salted' ELSE 'plain' END AS decision,
           (SELECT COUNT(*) FROM (
                SELECT {key} FROM events GROUP BY {key})) AS groups_plain,
           (SELECT COUNT(*) FROM (
                SELECT {key} FROM events GROUP BY {key})) AS groups_salted,
           (SELECT COUNT(*) FROM
                (SELECT {key} AS k, COUNT(*) AS n,
                        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c
                 FROM events GROUP BY {key}) p
                FULL JOIN
                (SELECT {key} AS k, COUNT(*) AS n,
                        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c
                 FROM events GROUP BY {key}) q
                ON p.k IS NOT DISTINCT FROM q.k
            WHERE p.n IS DISTINCT FROM q.n
               OR p.c IS DISTINCT FROM q.c) AS mismatch_rows
    FROM (SELECT COUNT(*) AS n_keys, SUM(cnt) AS total, MAX(cnt) AS max_cnt
          FROM (SELECT {key}, COUNT(*) AS cnt FROM events GROUP BY {key})) s
    """


_ORACLE_Q175 = (
    _q175_branch_sql("event_type")
    + " UNION ALL "
    + _q175_branch_sql("user_id")
    + " ORDER BY key_name"
)


@register(
    "q175_skew_adaptive_agg",
    oracle=_ORACLE_Q175,
    doc="Skew-adaptive aggregation chooser: per candidate key, the "
    "q168 statistics pick plain groupBy vs q49 salted two-phase by "
    "the fair-share criterion (hottest key > 4x the 1/32 reducer "
    "share => salt); both physical strategies execute and are "
    "full-outer value-compared (mismatch_rows must be 0) — the "
    "skew analog of q171's sketch-driven join-order closure.",
    tags=("quality", "skew", "adaptive", "agg"),
)
def q175_skew_adaptive_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cents = (dec("value") * 100).cast("bigint")
    ev = cat.events.select(
        "event_type", "user_id", "event_id", cents.alias("cents")
    )

    def branch(key: str) -> DataFrame:
        counts = ev.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total"),
            F.max("cnt").alias("max_cnt"),
        )
        # strategy A: direct one-shuffle groupBy
        plain = ev.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
        )
        # strategy B: q49's deterministic-salt two-phase (partials
        # per (key, salt) spread a hot key over _SKEW_SALT reducers,
        # then a tiny merge shuffle)
        partial = (
            ev.withColumn(
                "_salt", (F.col("event_id") % _SKEW_SALT).cast("int")
            )
            .groupBy(key, "_salt")
            .agg(F.count(F.lit(1)).alias("pn"), F.sum("cents").alias("pc"))
        )
        salted = partial.groupBy(key).agg(
            F.sum("pn").alias("n"), F.sum("pc").alias("c")
        )
        p, s = plain.alias("p"), salted.alias("s")
        cmpjoin = p.join(
            s, F.col(f"p.{key}").eqNullSafe(F.col(f"s.{key}")), "full_outer"
        )
        mism = cmpjoin.agg(
            F.sum(
                F.when(
                    F.col("p.n").eqNullSafe(F.col("s.n"))
                    & F.col("p.c").eqNullSafe(F.col("s.c")),
                    0,
                ).otherwise(1)
            ).alias("mismatch_rows")
        )
        gp = plain.agg(F.count(F.lit(1)).alias("groups_plain"))
        gs = salted.agg(F.count(F.lit(1)).alias("groups_salted"))
        return (
            stats.crossJoin(F.broadcast(gp))
            .crossJoin(F.broadcast(gs))
            .crossJoin(F.broadcast(mism))
            .select(
                F.lit(key).alias("key_name"),
                F.col("n_keys").cast("bigint").alias("n_keys"),
                F.col("max_cnt").cast("bigint").alias("max_cnt"),
                F.expr("CAST(max_cnt * 1000000 div total AS BIGINT)").alias(
                    "max_share_ppm"
                ),
                F.expr(
                    "CAST(max_cnt * n_keys * 1000000 div total AS BIGINT)"
                ).alias("max_over_mean_ppm"),
                F.expr(
                    f"CASE WHEN max_cnt * 1000000 div total * {SKEW_PARALLELISM}"
                    f" >= {SKEW_HOT_FACTOR} * 1000000"
                    " THEN 'salted' ELSE 'plain' END"
                ).alias("decision"),
                F.col("groups_plain").cast("bigint").alias("groups_plain"),
                F.col("groups_salted").cast("bigint").alias("groups_salted"),
                F.col("mismatch_rows").cast("bigint").alias("mismatch_rows"),
            )
        )

    return branch("event_type").unionByName(branch("user_id")).orderBy(
        "key_name"
    )


# --------- q189: histogram selectivity estimation (round 5)
#
# The third leg of the optimizer-statistics trilogy: q171 chooses
# JOIN ORDER from KMV sketches, q175 chooses the SKEW strategy from
# key statistics, q189 estimates single-table PREDICATE SELECTIVITY
# from an equi-width histogram — the Selinger estimate every CBO
# (and Spark's own ANALYZE TABLE column stats) computes, with the
# estimate emitted NEXT TO the exact actual so the uniform-
# within-bucket assumption's error is itself a checked value.
#
# Scale shape: pass 1 is a min/max bounds aggregate (bytes of
# state); pass 2 folds the 32-bucket histogram AND the three exact
# conditional counts into ONE fact scan (map-side combinable, O(32)
# state); every estimate then runs on the 32-row frame crossed with
# 3 threshold rows — pure integer algebra (div floors identically),
# products widened to DECIMAL(38,0)/HUGEINT so count x range fits at
# any scale. Reference anchor: Postgres's pg_stats histogram_bounds
# driving the very plans the reference's queries rely on
# (salim/tables.sql index choices).
_SEL_BUCKETS = 32

_ORACLE_Q189 = f"""
WITH c AS (
    SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
    FROM lineitem
),
bounds AS (SELECT MIN(c) AS mn, MAX(c) AS mx, MAX(c) - MIN(c) + 1 AS w FROM c),
hist AS (
    SELECT ((c.c - b.mn) * {_SEL_BUCKETS}) // b.w AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CASE WHEN c.c < b.mn + (b.w * 1) // 4 THEN 1 ELSE 0 END) AS BIGINT) AS act1,
           CAST(SUM(CASE WHEN c.c < b.mn + (b.w * 2) // 4 THEN 1 ELSE 0 END) AS BIGINT) AS act2,
           CAST(SUM(CASE WHEN c.c < b.mn + (b.w * 3) // 4 THEN 1 ELSE 0 END) AS BIGINT) AS act3
    FROM c, bounds b GROUP BY 1
),
per AS (
    SELECT k, h.bucket, h.cnt,
           CASE k WHEN 1 THEN h.act1 WHEN 2 THEN h.act2 ELSE h.act3 END AS act,
           b.mn + (b.w * k) // 4 AS t,
           ((b.mn + (b.w * k) // 4 - b.mn) * {_SEL_BUCKETS}) // b.w AS bt,
           b.mn + (h.bucket * b.w + {_SEL_BUCKETS} - 1) // {_SEL_BUCKETS} AS lo,
           b.mn + ((h.bucket + 1) * b.w + {_SEL_BUCKETS} - 1) // {_SEL_BUCKETS} - 1 AS hi
    FROM hist h CROSS JOIN bounds b
    CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
),
agg AS (
    SELECT k, MAX(t) AS threshold_cents,
           CAST(SUM(CASE WHEN bucket < bt THEN CAST(cnt AS HUGEINT)
                         WHEN bucket = bt THEN (CAST(cnt AS HUGEINT) * (t - lo)) // (hi - lo + 1)
                         ELSE 0 END) AS BIGINT) AS est_rows,
           CAST(SUM(act) AS BIGINT) AS actual_rows,
           CAST(SUM(cnt) AS BIGINT) AS total_rows
    FROM per GROUP BY k
)
SELECT CAST(k AS BIGINT) AS quartile,
       threshold_cents,
       est_rows,
       actual_rows,
       CAST((CAST(abs(est_rows - actual_rows) AS HUGEINT) * 1000000)
            // total_rows AS BIGINT) AS abs_err_ppm
FROM agg
ORDER BY quartile
"""


@register(
    "q189_selectivity_estimate",
    oracle=_ORACLE_Q189,
    doc="Histogram-based predicate selectivity estimation (the "
    "Selinger/pg_stats estimate): a 32-bucket equi-width histogram "
    "over price cents estimates rows under three range predicates "
    "with the uniform-within-bucket assumption, emitted beside the "
    "exact actual counts and the error in ppm — the third "
    "optimizer-statistics loop next to q171 (join order) and q175 "
    "(skew strategy). One bounds pass + one fact scan; all integer "
    "algebra on the 32-row frame.",
    tags=("cbo", "histogram", "statistics"),
)
def q189_selectivity_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _SEL_BUCKETS
    cat = Catalog(spark, sf_dir)
    c = cat.lineitem.select(
        (dec("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    bounds = c.agg(
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
        (F.max("c") - F.min("c") + 1).alias("w"),
    )
    hist = (
        c.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((c - mn) * {B}) div w").alias("bucket"),
            *[
                F.expr(f"CASE WHEN c < mn + (w * {k}) div 4 THEN 1 ELSE 0 END")
                .alias(f"f{k}")
                for k in (1, 2, 3)
            ],
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(f"f{k}").cast("bigint").alias(f"act{k}") for k in (1, 2, 3)],
        )
    )
    per = (
        hist.crossJoin(F.broadcast(bounds))
        .select(
            "*", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
        )
        .select(
            "k",
            "bucket",
            "cnt",
            F.expr(
                "CASE k WHEN 1 THEN act1 WHEN 2 THEN act2 ELSE act3 END"
            ).alias("act"),
            F.expr("mn + (w * k) div 4").alias("t"),
            F.expr(f"((mn + (w * k) div 4 - mn) * {B}) div w").alias("bt"),
            F.expr(f"mn + (bucket * w + {B} - 1) div {B}").alias("lo"),
            F.expr(f"mn + ((bucket + 1) * w + {B} - 1) div {B} - 1").alias("hi"),
        )
    )
    agg = per.groupBy("k").agg(
        F.max("t").alias("threshold_cents"),
        F.expr(
            "CAST(SUM(CASE WHEN bucket < bt THEN CAST(cnt AS DECIMAL(38,0)) "
            "WHEN bucket = bt THEN (CAST(cnt AS DECIMAL(20,0)) * (t - lo)) div (hi - lo + 1) "
            "ELSE 0 END) AS BIGINT)"
        ).alias("est_rows"),
        F.sum("act").cast("bigint").alias("actual_rows"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
    )
    return agg.select(
        F.col("k").cast("bigint").alias("quartile"),
        "threshold_cents",
        "est_rows",
        "actual_rows",
        F.expr(
            "CAST((CAST(abs(est_rows - actual_rows) AS DECIMAL(26,0)) * 1000000)"
            " div total_rows AS BIGINT)"
        ).alias("abs_err_ppm"),
    ).orderBy("quartile")
