"""Set operations, hierarchical rollups, and sessionization —
engine capabilities beyond the reference's literal surface (its only
set-like logic is the processed-files diff, SURVEY.md §2.7) that any
replacement analytics engine must carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, dec_lit, money_out, to_double
from ..registry import register

# ------------- bucketed exclusive prefix aggregate (q109 / q143)
#
# A cumulative window ordered over a distinct-value dictionary
# (price dictionary, cents histogram) is bounded by the DOMAIN, not
# the data — but at 100 TB a cents dictionary can still reach
# 10^7-10^8 rows, all funneled through ONE task by an unpartitioned
# window. Round-4 verdict watch item #1; fixed with the q164
# value-range-bucket two-pass pattern, exact for any associative
# aggregate:
#
#   1. bucket = ((key - min) * B) div (max - min + 1) — monotone
#      per-row algebra from one broadcast min/max scalar row;
#   2. the in-bucket exclusive prefix runs as a window PARTITIONED
#      BY bucket (parallel, each task sees ~1/B of the dictionary);
#   3. per-bucket totals (B rows, constant — B is a literal) are
#      prefix-combined with a tiny window and broadcast back;
#   4. prefix(row) = combine(in-bucket prefix, previous buckets'
#      total) — running MAX combines with greatest() (null-skipping)
#      and running SUM with coalesce+plus, both exactly equal to the
#      sequential unbounded-preceding window.
PREFIX_AGG_BUCKETS = 32


def bucketed_prefix_agg(
    frame: DataFrame, key: str, val: str, agg: str
) -> DataFrame:
    """Append ``prev_agg`` = aggregate of ``val`` over all rows with
    strictly smaller ``key`` (the rowsBetween(unboundedPreceding, -1)
    window) without any data-sized single-task window. ``key`` must
    be a unique-per-row BIGINT (a distinct-value dictionary);
    ``agg`` is 'max' (prev_agg null on the first row) or 'sum'
    (prev_agg 0 on the first row)."""
    fmax = {"max": F.max, "sum": F.sum}[agg]
    stats = frame.agg(
        F.min(key).alias("__kmin"), F.max(key).alias("__kmax")
    )
    b = frame.crossJoin(F.broadcast(stats)).withColumn(
        "__bucket",
        F.expr(
            f"(({key} - __kmin) * {PREFIX_AGG_BUCKETS})"
            f" div (__kmax - __kmin + 1)"
        ),
    )
    win = Window.partitionBy("__bucket").orderBy(key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = b.withColumn("__in_prev", fmax(val).over(win))
    btot = b.groupBy("__bucket").agg(fmax(val).alias("__btot"))
    wprev = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # constant-size frame (<= PREFIX_AGG_BUCKETS rows): the only
    # unpartitioned window left, bounded by a literal, not the data.
    offsets = btot.select(
        "__bucket", fmax("__btot").over(wprev).alias("__prev_btot")
    )
    joined = b.join(F.broadcast(offsets), "__bucket")
    if agg == "max":
        prev = F.greatest("__in_prev", "__prev_btot")  # null-skipping
    else:
        prev = F.coalesce("__in_prev", F.lit(0)) + F.coalesce(
            "__prev_btot", F.lit(0)
        )
    return joined.withColumn("prev_agg", prev).drop(
        "__bucket", "__kmin", "__kmax", "__in_prev", "__prev_btot"
    )

_ORACLE_Q27 = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT
    (SELECT COUNT(*) FROM a)                                   AS active_1995,
    (SELECT COUNT(*) FROM b)                                   AS active_1996,
    (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS retained,
    (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))    AS churned,
    (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))     AS either_year
"""


@register(
    "q27_set_operations",
    oracle=_ORACLE_Q27,
    doc="UNION / INTERSECT / EXCEPT cohort arithmetic (yearly active "
    "customers, retention/churn) — §2.7 set-op capability.",
    tags=("setops",),
)
def q27_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UNION/INTERSECT/EXCEPT cohort arithmetic folded into ONE plan:
    # per-customer membership flags (one groupBy) then one final
    # aggregate — five set-op cardinalities, one job, one shuffle.
    # (Round 1 ran five separate .count() actions — five scans.)
    cat = Catalog(spark, sf_dir)
    yr = F.year("o_orderdate")
    flags = (
        cat.orders.where(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.max((yr == 1995).cast("int")).alias("in_a"),
            F.max((yr == 1996).cast("int")).alias("in_b"),
        )
    )
    in_a, in_b = F.col("in_a") == 1, F.col("in_b") == 1
    return flags.agg(
        F.sum(in_a.cast("bigint")).alias("active_1995"),
        F.sum(in_b.cast("bigint")).alias("active_1996"),
        F.sum((in_a & in_b).cast("bigint")).alias("retained"),
        F.sum((in_a & ~in_b).cast("bigint")).alias("churned"),
        F.count(F.lit(1)).alias("either_year"),
    )


_ORACLE_Q28 = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
            AS DOUBLE) AS revenue_d,
       COUNT(*) AS line_count,
       GROUPING(r_name)::BIGINT * 2 + GROUPING(n_name)::BIGINT AS grouping_level
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY grouping_level, r_name, n_name
"""


@register(
    "q28_revenue_rollup",
    oracle=_ORACLE_Q28,
    doc="Hierarchical ROLLUP(region, nation) with grouping level — "
    "subtotals + grand total in one pass (partial-agg friendly).",
    tags=("rollup", "agg"),
)
def q28_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    price = dec("l_extendedprice")
    disc = dec("l_discount", 6, 4)
    one = dec_lit("1.0000")
    joined = (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            money_out(F.sum(price * (one - disc))).alias("revenue_d"),
            F.count(F.lit(1)).alias("line_count"),
            (
                F.grouping("r_name").cast("bigint") * 2
                + F.grouping("n_name").cast("bigint")
            ).alias("grouping_level"),
        )
        .orderBy("grouping_level", "r_name", "n_name")
    )


_ORACLE_Q58 = """
SELECT c_mktsegment, o_orderpriority,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_d,
       GROUPING(c_mktsegment)::BIGINT * 2 + GROUPING(o_orderpriority)::BIGINT AS gl
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
ORDER BY gl, c_mktsegment, o_orderpriority
"""


@register(
    "q58_order_cube",
    oracle=_ORACLE_Q58,
    doc="CUBE over (segment, priority): all four grouping-set "
    "combinations in one pass.",
    tags=("cube", "agg"),
)
def q58_order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_out(F.sum(dec("o_totalprice"))).alias("total_d"),
            (
                F.grouping("c_mktsegment").cast("bigint") * 2
                + F.grouping("o_orderpriority").cast("bigint")
            ).alias("gl"),
        )
        .select("c_mktsegment", "o_orderpriority", "n", "total_d", "gl")
        .orderBy("gl", "c_mktsegment", "o_orderpriority")
    )


_ORACLE_Q59 = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


@register(
    "q59_semi_join_urgent",
    oracle=_ORACLE_Q59,
    doc="EXISTS / left-semi join: customers with at least one urgent "
    "order (the dual of q19's anti-join).",
    tags=("join", "semi"),
)
def q59_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    urgent = cat.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cat.customer.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_ORACLE_Q49 = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_d,
       CAST(MAX(CAST(value AS DECIMAL(12,2))) AS DOUBLE)           AS max_d
FROM events
GROUP BY event_type
ORDER BY event_type
"""

SALT_BUCKETS = 16


@register(
    "q49_salted_skew_agg",
    oracle=_ORACLE_Q49,
    doc="Skew-safe two-phase aggregation: salt the hot grouping key "
    "(events has only 5 event_types → 5 giant reducers at 100 TB), "
    "partial-agg per (key, salt), then merge. Result is provably "
    "identical to the direct groupBy (same oracle).",
    tags=("agg", "skew", "salting"),
)
def q49_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    v = dec("value")
    # phase 1: spread each hot key over SALT_BUCKETS reducers.
    # Deterministic salt (not rand()) so retried tasks agree.
    salted = cat.events.withColumn(
        "_salt", (F.col("event_id") % SALT_BUCKETS).cast("int")
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(v).alias("psum"),
        F.max(v).alias("pmax"),
    )
    # phase 2: merge the ≤16 partials per key (tiny shuffle).
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            money_out(F.sum("psum")).alias("total_d"),
            to_double(F.max("pmax")).alias("max_d"),
        )
        .orderBy("event_type")
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

_ORACLE_Q29 = f"""
WITH ordered AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER w AS prev_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
    SELECT user_id, event_id, us,
           CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
sessions AS (
    SELECT user_id, event_id, us,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       COUNT(*)            AS events,
       MAX(us) - MIN(us)   AS duration_us
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register(
    "q29_sessionization",
    oracle=_ORACLE_Q29,
    doc="Gap-based sessionization (lag → new-session flag → running "
    "sum session id → per-session rollup); 30-minute idle gap.",
    tags=("events", "window", "session"),
)
def q29_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = cat.events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > SESSION_GAP_US), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wrun = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(wrun))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


# ------------------------------------------- q102: equi-width histogram
#
# Distribution profiling as a first-class operator: an equi-width
# histogram of lineitem extended price in exact integer cents
# ($5,000 buckets), with per-bucket share and cumulative share in
# integral ppm. Scale shape: ONE map-side-combinable groupBy on the
# bucket id (a pure function of the row — no pre-shuffle), output
# bounded by the value range, and the share/cumulative window runs
# over that tiny grouped frame. The same shape serves any numeric
# profiling pass (token counts, doc lengths, price spreads) at
# 100 TB: the scan is embarrassingly parallel, the state is O(buckets).

_BUCKET_CENTS = 500_000  # $5,000 per bucket

_ORACLE_Q102 = f"""
WITH b AS (
    SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           // {_BUCKET_CENTS} AS bucket
    FROM lineitem
),
h AS (
    SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
)
SELECT CAST(bucket AS BIGINT)                                   AS bucket,
       CAST(bucket * {_BUCKET_CENTS} AS DOUBLE) / 100           AS lo_d,
       CAST((bucket + 1) * {_BUCKET_CENTS} AS DOUBLE) / 100     AS hi_d,
       CAST(n AS BIGINT)                                        AS n,
       CAST((n * 1000000) // SUM(n) OVER () AS BIGINT)          AS share_ppm,
       CAST((SUM(n) OVER (ORDER BY bucket) * 1000000)
            // SUM(n) OVER () AS BIGINT)                        AS cum_share_ppm
FROM h
ORDER BY bucket
"""


@register(
    "q102_price_histogram",
    oracle=_ORACLE_Q102,
    doc="Equi-width histogram of l_extendedprice in exact integer "
    "cents ($5k buckets): counts, share and cumulative share in "
    "integral ppm. One map-side-combinable groupBy; O(buckets) "
    "state; the generic numeric-profiling shape.",
    tags=("histogram", "profiling", "lineitem"),
)
def q102_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cents = (dec("l_extendedprice") * 100).cast("bigint")
    h = (
        cat.lineitem.select(cents.alias("_cents"))
        .select(F.expr(f"CAST(_cents DIV {_BUCKET_CENTS} AS BIGINT)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    wcum = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        h.select(
            "bucket",
            ((F.col("bucket") * _BUCKET_CENTS).cast("double") / 100).alias("lo_d"),
            (((F.col("bucket") + 1) * _BUCKET_CENTS).cast("double") / 100).alias(
                "hi_d"
            ),
            "n",
            F.sum("n").over(wall).alias("_tot"),
            F.sum("n").over(wcum).alias("_cum"),
        )
        .select(
            "bucket",
            "lo_d",
            "hi_d",
            "n",
            F.expr("CAST((n * 1000000) DIV _tot AS BIGINT)").alias("share_ppm"),
            F.expr("CAST((_cum * 1000000) DIV _tot AS BIGINT)").alias(
                "cum_share_ppm"
            ),
        )
        .orderBy("bucket")
    )


# ------------------------------- q106: native session windows (batch)
#
# The same gap-based sessionization as q29, but via Spark's NATIVE
# session_window operator — the one the streaming path can run with
# watermarked state — oracle-checked in batch. Semantics note vs
# q29: session_window starts a NEW session when the gap is >= the
# timeout (the session covers [ts, ts+gap)); q29's hand-rolled lag
# splits only when gap > timeout. The oracle mirrors the >= rule.
# Scale shape: one shuffle on user_id; per-session merge state is
# bounded by the gap (exactly what streaming needs to expire state).

_SESSION_GAP_MIN = 30

_ORACLE_Q106 = f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        >= {_SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts)                                          AS session_start,
       MAX(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE      AS session_end,
       CAST(COUNT(*) AS BIGINT)                         AS events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                                                        AS total_value_d
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register(
    "q106_session_window_native",
    oracle=_ORACLE_Q106,
    doc="Gap-based sessionization via Spark's NATIVE session_window "
    "(30-min gap, >=-split semantics mirrored in the oracle): "
    "session bounds, event counts, exact money sums. One user_id "
    "shuffle; the operator shape streaming runs with bounded, "
    "expirable state.",
    tags=("events", "window", "session"),
)
def q106_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            money_out(F.sum(dec("value"))).alias("total_value_d"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "events",
            "total_value_d",
        )
        .orderBy("user_id", "session_start")
    )


# ----------------------------------- q109: skyline (Pareto frontier)
#
# Skyline query: the Pareto-optimal parts under (minimize retail
# price, maximize size). The ORACLE states the naive O(n^2)
# NOT-EXISTS domination definition; the Spark plan computes the same
# frontier the scalable way — one price-keyed aggregation (max size
# per price, map-side combinable over the full table), then a
# running-max window over the O(|distinct prices|) grouped frame
# (bounded dictionary — same tiny-frame window as q102's cumulative
# share), and one equi-join back. A point survives iff it has the
# max size at its price AND strictly beats the best size among all
# cheaper prices. Prices compare as exact decimals so the two
# engines agree on every <=.

_ORACLE_Q109 = """
WITH pts AS (
    SELECT p_partkey,
           CAST(p_retailprice AS DECIMAL(12,2)) AS price,
           p_size AS sz
    FROM part
)
SELECT CAST(p.p_partkey AS BIGINT) AS partkey,
       CAST(p.price AS DOUBLE)     AS price_d,
       CAST(p.sz AS BIGINT)        AS size
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.price <= p.price AND q.sz >= p.sz
      AND (q.price < p.price OR q.sz > p.sz)
)
ORDER BY partkey
"""


@register(
    "q109_pareto_frontier",
    oracle=_ORACLE_Q109,
    doc="Skyline / Pareto frontier (min price, max size): oracle is "
    "the O(n^2) NOT-EXISTS domination definition; the plan is the "
    "scalable sort-based frontier — per-price max aggregation, "
    "running-max window over the bounded price dictionary, one "
    "equi-join back.",
    tags=("skyline", "window", "part"),
)
def q109_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pts = cat.part.select(
        "p_partkey", dec("p_retailprice").alias("price"), F.col("p_size").alias("sz")
    )
    groups = pts.groupBy("price").agg(F.max("sz").alias("pmax"))
    # running max over the price dictionary: bucket-parallel exact
    # prefix (bucketed_prefix_agg) — cents as the bigint order key
    # (ordering by cents == ordering by the exact decimal price).
    groups = (
        bucketed_prefix_agg(
            groups.withColumn(
                "cents", (F.col("price") * 100).cast("bigint")
            ),
            "cents",
            "pmax",
            "max",
        )
        .withColumnRenamed("prev_agg", "prevmax")
        .drop("cents")
    )
    return (
        pts.join(groups, "price")
        .where(
            (F.col("sz") == F.col("pmax"))
            & (F.col("prevmax").isNull() | (F.col("sz") > F.col("prevmax")))
        )
        .select(
            F.col("p_partkey").cast("bigint").alias("partkey"),
            to_double(F.col("price")).alias("price_d"),
            F.col("sz").cast("bigint").alias("size"),
        )
        .orderBy("partkey")
    )


# ---------------------------- q112: decorrelated per-group threshold
# The TPC-H Q17 shape (reference analog: "items priced below X% of
# their product's average", the per-key-threshold filter every
# curation pipeline runs). The textbook plan runs the fact twice —
# once to build per-part averages, once to probe — i.e. two shuffles
# on l_partkey plus a join. Here the per-part mean and the threshold
# test ride ONE window over ONE exchange on l_partkey: at 100 TB
# that halves the dominant shuffle and removes the join entirely.
# The threshold compare is exact integer arithmetic
# (5*qty*cnt < sum_qty ⇔ qty < 0.2*avg; quantities are integral),
# so both engines agree bit-for-bit — no float-mean epsilon.
_ORACLE_Q112 = """
WITH stats AS (
    SELECT l_partkey,
           CAST(l_quantity AS BIGINT)  AS qty,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
           SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sum_qty,
           COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
    FROM lineitem
)
SELECT p.p_brand,
       COUNT(*) AS small_lines,
       CAST(ROUND(SUM(s.price), 2) AS DOUBLE) AS small_revenue_d
FROM stats s
JOIN part p ON s.l_partkey = p.p_partkey
WHERE 5 * s.qty * s.cnt < s.sum_qty
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register(
    "q112_small_qty_revenue",
    oracle=_ORACLE_Q112,
    doc="Per-part below-20-percent-of-average quantity filter (TPC-H Q17 "
    "shape) as ONE window over ONE l_partkey exchange — no second "
    "fact scan, no fact-to-aggregate join; part dim broadcast; "
    "threshold compared in exact integers.",
    tags=("agg", "window", "join", "decorrelation"),
)
def q112_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("l_partkey")
    stats = cat.lineitem.select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        dec("l_extendedprice").alias("price"),
    ).select(
        "l_partkey",
        "qty",
        "price",
        F.sum("qty").over(w).alias("sum_qty"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    small = stats.where(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    )
    return (
        small.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("small_lines"),
            money_out(F.sum("price")).alias("small_revenue_d"),
        )
        .orderBy("p_brand")
    )


# ------------------------------ q113: gaps-and-islands activity streaks
# Consecutive-active-day streaks per user — the classic
# gaps-and-islands operator (engagement/retention reporting). The
# island key is day_index - dense_rank (pure integer arithmetic on
# the epoch-day), so islands fall out of ONE window + ONE groupBy,
# both on user_id: a single exchange end-to-end, no self-join, no
# sequence generation. Output is bounded by (users x streaks), and
# only top streaks per user survive.
_ORACLE_Q113 = """
WITH days AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
    FROM events
),
isl AS (
    SELECT user_id, d,
           d - CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY d) AS BIGINT) AS grp
    FROM days
),
streaks AS (
    SELECT user_id, grp, COUNT(*) AS len, MIN(d) AS start_d, MAX(d) AS end_d
    FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       CAST(len AS BIGINT) AS streak_days,
       DATE '1970-01-01' + CAST(start_d AS INTEGER) AS streak_start,
       DATE '1970-01-01' + CAST(end_d AS INTEGER) AS streak_end
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_d) AS rk
    FROM streaks
)
WHERE rk = 1
ORDER BY user_id
"""


@register(
    "q113_activity_streaks",
    oracle=_ORACLE_Q113,
    doc="Longest consecutive-active-day streak per user: "
    "gaps-and-islands via day_index - dense_rank — one user_id "
    "exchange shared by the distinct-grid, both windows, and the "
    "island groupBy; no self-join, no calendar generation.",
    tags=("events", "window", "gaps-islands"),
)
def q113_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    days = cat.events.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    wd = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.col("d") - F.dense_rank().over(wd).cast("bigint")
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("start_d")
    )
    epoch = F.lit("1970-01-01").cast("date")
    return (
        streaks.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            "streak_days",
            F.date_add(epoch, F.col("start_d").cast("int")).alias("streak_start"),
            F.date_add(epoch, F.col("end_d").cast("int")).alias("streak_end"),
        )
        .orderBy("user_id")
    )


# -------- q122: per-priority ship-lag quantiles via bounded histogram
#
# Exact p50/p90/p99 of order→ship lag per order priority. The
# naive exact plan windows over each priority group — 5 giant
# partitions at 100 TB (the classic low-cardinality-group quantile
# trap). The scalable exact shape for an INTEGER-VALUED metric with
# bounded range (lag in days): aggregate to (priority, lag) counts —
# one map-side-combinable shuffle into an O(priorities × lags) frame
# — then read quantiles off cumulative counts with the q80
# ceil(p·n) integer index. No per-group sort of fact rows, ever.
_ORACLE_Q122 = """
WITH lag AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS d
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
hist AS (
    SELECT priority, d, COUNT(*) AS c FROM lag GROUP BY priority, d
),
cum AS (
    SELECT priority, d, c,
           SUM(c) OVER (PARTITION BY priority ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
           SUM(c) OVER (PARTITION BY priority) AS n
    FROM hist
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cc * 2  >= n      THEN d END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cc * 10 >= n * 9  THEN d END) AS BIGINT) AS p90_days,
       CAST(MIN(CASE WHEN cc * 100 >= n * 99 THEN d END) AS BIGINT) AS p99_days
FROM cum
GROUP BY priority
ORDER BY priority
"""


@register(
    "q122_ship_lag_quantiles",
    oracle=_ORACLE_Q122,
    doc="Exact per-priority ship-lag p50/p90/p99 via the bounded "
    "integer histogram: one combinable (priority, lag) aggregation, "
    "quantile indices read off cumulative counts over the tiny "
    "frame — no per-group sort of fact rows.",
    tags=("agg", "quantiles", "histogram"),
)
def q122_ship_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lag = cat.orders.select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    ).join(
        cat.lineitem.select("l_orderkey", "l_shipdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "priority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("d"),
    )
    hist = lag.groupBy("priority", "d").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("priority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "d",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    return (
        cum.groupBy("priority")
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("d")))
            .cast("bigint")
            .alias("p50_days"),
            F.min(F.when(F.col("cc") * 10 >= F.col("n") * 9, F.col("d")))
            .cast("bigint")
            .alias("p90_days"),
            F.min(F.when(F.col("cc") * 100 >= F.col("n") * 99, F.col("d")))
            .cast("bigint")
            .alias("p99_days"),
        )
        .orderBy("priority")
    )


# -------- q138: percentile_cont with exact integer interpolation
#
# The INTERPOLATED quantile (SQL percentile_cont), the semantic the
# exact-index family (q80/q122) deliberately avoids because naive
# float interpolation breaks cross-engine bit-identity. Here it is
# exact: order totals are integer cents, the quartile positions are
# p·(n−1) with p ∈ {¼,½,¾} — denominator 4 — so the interpolated
# value is (v_k·(4−r) + v_{k+1}·r) / 400 dollars with every term an
# integer and ONE final division. Both engines run the identical
# explicit formula (the oracle does NOT trust DuckDB's native
# percentile_cont, which interpolates in floats).
# Scale caveat (documented, fundamental): exact continuous
# quantiles of an UNBOUNDED metric need per-group order statistics
# — a per-segment sort. When the metric is bounded-integer use
# q122's histogram; when approximation is acceptable use q95's
# mergeable sample. This operator is the exact-answer fallback.
_ORACLE_Q138 = """
WITH v AS (
    SELECT c.c_mktsegment AS seg,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
    SELECT seg, cents,
           CAST(row_number() OVER (PARTITION BY seg ORDER BY cents) AS BIGINT) AS rk,
           CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
    FROM v
),
parts AS (
    SELECT seg, n, p.p4,
           (p.p4 * (n - 1)) // 4 AS k,
           (p.p4 * (n - 1)) % 4  AS frac4,
           MAX(CASE WHEN rk = (p.p4 * (n - 1)) // 4 + 1 THEN cents END) AS v_lo,
           MAX(CASE WHEN rk = (p.p4 * (n - 1)) // 4 + 2 THEN cents END) AS v_hi
    FROM r CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS p4) p
    GROUP BY seg, n, p.p4
)
SELECT seg,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN p4 = 1 THEN (v_lo * (4 - frac4) + COALESCE(v_hi, 0) * frac4) END)
            AS DOUBLE) / 400 AS p25_d,
       CAST(MAX(CASE WHEN p4 = 2 THEN (v_lo * (4 - frac4) + COALESCE(v_hi, 0) * frac4) END)
            AS DOUBLE) / 400 AS p50_d,
       CAST(MAX(CASE WHEN p4 = 3 THEN (v_lo * (4 - frac4) + COALESCE(v_hi, 0) * frac4) END)
            AS DOUBLE) / 400 AS p75_d
FROM parts
GROUP BY seg
ORDER BY seg
"""


@register(
    "q138_percentile_cont_exact",
    oracle=_ORACLE_Q138,
    doc="SQL percentile_cont quartiles of order totals per segment "
    "with EXACT integer interpolation (cents × quarter positions — "
    "one final division, bit-identical cross-engine; the oracle "
    "runs the same explicit formula, not DuckDB's float-"
    "interpolating native).",
    tags=("agg", "quantiles", "interpolation"),
)
def q138_percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    v = cat.orders.join(
        F.broadcast(cat.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("seg").orderBy("cents")
    wn = Window.partitionBy("seg")
    r = v.select(
        "seg",
        "cents",
        F.row_number().over(wr).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    parts = r.select(
        "seg",
        "n",
        "rk",
        "cents",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("p4"),
    ).select(
        "seg",
        "n",
        "p4",
        F.expr("(p4 * (n - 1)) div 4").alias("k"),
        ((F.col("p4") * (F.col("n") - 1)) % 4).alias("frac4"),
        "rk",
        "cents",
    )
    grouped = parts.groupBy("seg", "n", "p4", "k", "frac4").agg(
        F.max(F.when(F.col("rk") == F.col("k") + 1, F.col("cents"))).alias("v_lo"),
        F.max(F.when(F.col("rk") == F.col("k") + 2, F.col("cents"))).alias("v_hi"),
    )
    interp = (
        F.col("v_lo") * (F.lit(4) - F.col("frac4"))
        + F.coalesce(F.col("v_hi"), F.lit(0)) * F.col("frac4")
    ).cast("double") / 400
    return (
        grouped.groupBy("seg")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("p4") == 1, interp)).alias("p25_d"),
            F.max(F.when(F.col("p4") == 2, interp)).alias("p50_d"),
            F.max(F.when(F.col("p4") == 3, interp)).alias("p75_d"),
        )
        .orderBy("seg")
    )


# -------------------- q139: explicit GROUPING SETS (not rollup/cube)
#
# The third grouping-set form: an EXPLICIT set list — per-region
# totals and per-priority totals in ONE pass, WITHOUT the pairwise
# combinations CUBE would add or the hierarchy ROLLUP implies. The
# shape matters at scale: grouping-set expansion multiplies the
# aggregation input by the number of sets (2 here), each partial-
# aggregatable — one shuffle, no second scan.
_ORACLE_Q139 = """
SELECT r_name, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_d,
       GROUPING(r_name)::BIGINT * 2 + GROUPING(o_orderpriority)::BIGINT AS gl
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (o_orderpriority))
ORDER BY gl, r_name, o_orderpriority
"""


@register(
    "q139_grouping_sets",
    oracle=_ORACLE_Q139,
    doc="Explicit GROUPING SETS ((region), (priority)) — two "
    "independent rollups in one pass/one shuffle, neither CUBE's "
    "cross products nor ROLLUP's hierarchy; dims broadcast.",
    tags=("agg", "grouping-sets"),
)
def q139_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "o_orderpriority", dec("o_totalprice").alias("tp"))
    )
    return (
        joined.groupingSets(
            [[F.col("r_name")], [F.col("o_orderpriority")]],
            "r_name",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_out(F.sum("tp")).alias("total_d"),
            (
                F.grouping("r_name").cast("bigint") * 2
                + F.grouping("o_orderpriority").cast("bigint")
            ).alias("gl"),
        )
        .orderBy("gl", "r_name", "o_orderpriority")
    )


# ----------------- q143: equi-DEPTH histogram (exact decile buckets)
#
# The partner of q102's equi-WIDTH histogram: 10 buckets holding
# (as nearly as possible) equal row counts, boundaries at the exact
# deciles. The integer trick that avoids any quantile lookup: for a
# distinct value v with cb rows strictly below it, the number of
# already-complete deciles is floor(10·cb / n) — so bucket_id =
# least((10·cb) div n, 9), pure integer arithmetic over the
# (value, count) frame. Scale shape: one combinable (cents, count)
# aggregation; the cumulative window and bucket rollup run over the
# O(distinct cents) frame — bounded by the PRICE DOMAIN, not the
# row count (the same domain-bounded argument as q122; an unbounded
# continuous metric would use q138's order statistics instead).
_ORACLE_Q143 = """
WITH h AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY cents
),
c AS (
    SELECT cents, cnt,
           CAST(SUM(cnt) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
                AS BIGINT) AS cb,
           CAST(SUM(cnt) OVER () AS BIGINT) AS n
    FROM h
)
SELECT CAST(least((10 * cb) // n, 9) AS BIGINT) AS bucket,
       CAST(SUM(cnt) AS BIGINT) AS rows_in_bucket,
       CAST(MIN(cents) AS DOUBLE) / 100 AS lo_d,
       CAST(MAX(cents) AS DOUBLE) / 100 AS hi_d
FROM c
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q143_equidepth_histogram",
    oracle=_ORACLE_Q143,
    doc="Exact equi-depth decile histogram of order totals: "
    "bucket_id = (10·rows_below) div n over the (cents, count) "
    "frame — pure integer arithmetic, one combinable aggregation, "
    "windows over the domain-bounded distinct-value frame.",
    tags=("agg", "histogram", "quantiles"),
)
def q143_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    h = (
        cat.orders.select(
            (dec("o_totalprice") * 100).cast("bigint").alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # exclusive prefix count over the cents dictionary: bucket-
    # parallel exact prefix sum (bucketed_prefix_agg) replaces the
    # unpartitioned cumulative window; the grand total n arrives as
    # one broadcast scalar row.
    total = h.agg(F.sum("cnt").alias("n"))
    c = (
        bucketed_prefix_agg(h, "cents", "cnt", "sum")
        .withColumnRenamed("prev_agg", "cb")
        .crossJoin(F.broadcast(total))
    )
    return (
        c.select(
            F.least(F.expr("(10 * cb) div n"), F.lit(9)).alias("bucket"),
            "cnt",
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("rows_in_bucket"),
            (F.min("cents").cast("double") / 100).alias("lo_d"),
            (F.max("cents").cast("double") / 100).alias("hi_d"),
        )
        .orderBy("bucket")
    )
