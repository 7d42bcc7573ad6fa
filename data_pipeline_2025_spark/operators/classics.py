"""TPC-H classic shapes, second batch (q183-q187).

Round 4 covered Q3/Q10/Q17/Q18/Q21/Q22 shapes (joins.py, events.py).
This module adds the remaining public classics expressible on the
driver's tables (no partsupp exists, so Q2/Q20 are out of scope):

- q183 (Q11 shape)  group-share HAVING vs a scalar global aggregate
- q184 (Q15 shape)  max-of-aggregate selection (ties kept)
- q185 (Q14 shape)  conditional-sum revenue share per month
- q186 (Q19 shape)  disjunctive mixed-side join predicate
- q187 (Q7 shape)   bilateral flows through a 5-table join

Third batch (q194-q197) closes the set — after it, every TPC-H
query expressible on these tables has a registered shape (absent
columns rule out the rest: partsupp → Q2/Q9/Q16/Q20,
l_commitdate/l_receiptdate/l_shipmode → Q12, o_comment → Q13's
exact filter, adapted):

- q194 (Q4 shape)   correlated EXISTS → co-keyed left-semi join
- q195 (Q6 shape)   zero-shuffle scan-and-aggregate forecast
- q196 (Q8 shape)   national market share through 6 tables
- q197 (Q13 shape)  zero-inclusive order-count distribution

All money math uses functions/money.py exact decimals; every ratio
is integral ppm (`div` floors identically in both engines on
non-negative operands), so outputs are bit-identical cross-engine.

Reference basis: the reference's analytics endpoints compose the
same shapes over Postgres (salim/app/server/routes/products.py
aggregation endpoints; tables.sql:44-48 ordered index scans); these
are their lake-side, shuffle-conscious equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, dec_lit, money_out
from ..registry import register


def _rev() -> F.Column:
    """Exact line revenue: extendedprice * (1 - discount), decimal(20,6)."""
    return dec("l_extendedprice") * (dec_lit("1.0000") - dec("l_discount", 6, 4))


# ---------------- q183: TPC-H Q11 shape — group share vs global scalar
#
# "Parts whose revenue exceeds 1.3x the average part's" — the HAVING
# SUM(...) > (SELECT fraction * SUM(...) ...) correlated pattern.
# Scale shape: the global total is re-aggregated FROM the per-part
# frame (O(parts), never a second fact scan) and broadcast as ONE
# row; the selection is exact integer arithmetic on micros —
# avg_floor = s div n, multiple_ppm = (r*1e6) div avg_floor — both
# floor identically in DuckDB. The part-name join runs against the
# already-aggregated O(parts) frame, partkey co-keyed.
_ORACLE_Q183 = """
WITH pp AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS r
    FROM lineitem GROUP BY l_partkey
),
pm AS (
    SELECT l_partkey, r,
           CAST(r * 1000000 AS DECIMAL(28,0)) AS r_micros
    FROM pp
),
tot AS (
    SELECT CAST(SUM(r_micros) AS DECIMAL(38,0)) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pm
)
SELECT p.l_partkey AS partkey,
       CAST(ROUND(p.r, 2) AS DOUBLE) AS part_rev_d,
       CAST((CAST(p.r_micros AS HUGEINT) * 1000000)
            // (CAST(t.s AS HUGEINT) // t.n) AS BIGINT) AS avg_multiple_ppm
FROM pm p CROSS JOIN tot t
WHERE (CAST(p.r_micros AS HUGEINT) * 1000000)
      // (CAST(t.s AS HUGEINT) // t.n) > 1300000
ORDER BY avg_multiple_ppm DESC, partkey
"""


@register(
    "q183_important_parts",
    oracle=_ORACLE_Q183,
    doc="TPC-H Q11 shape: parts whose revenue share exceeds 1.3x "
    "the average part's — the HAVING-vs-global-scalar pattern. The "
    "global total re-aggregates the per-part frame (no second fact "
    "scan) and broadcasts as one row; selection is exact integer "
    "micros arithmetic (div floors identically in both engines).",
    tags=("agg", "decorrelation", "tpch"),
)
def q183_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pp = (
        cat.lineitem.groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("r"))
        .withColumn(
            "r_micros", (F.col("r") * F.lit(1000000)).cast("decimal(28,0)")
        )
    )
    tot = pp.agg(
        F.sum("r_micros").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    multiple = F.expr(
        "(r_micros * CAST(1000000 AS DECIMAL(7,0))) div (s div n)"
    ).cast("bigint")
    return (
        pp.crossJoin(F.broadcast(tot))
        .withColumn("avg_multiple_ppm", multiple)
        .where(F.col("avg_multiple_ppm") > 1300000)
        .select(
            F.col("l_partkey").alias("partkey"),
            money_out(F.col("r")).alias("part_rev_d"),
            "avg_multiple_ppm",
        )
        .orderBy(F.col("avg_multiple_ppm").desc(), "partkey")
    )


# ---------------- q184: TPC-H Q15 shape — max-of-aggregate selection
#
# "The top revenue supplier(s) for 1996Q1" — WHERE total_revenue =
# (SELECT MAX(total_revenue) ...). Scale shape: the max is ONE
# broadcast row re-aggregated from the O(suppliers) frame; equality
# compares exact decimals so ties are kept deterministically (the
# classic Q15 footnote). The date filter pushes into the fact scan;
# supplier is a bounded dim (catalog.BROADCAST_TABLES).
_ORACLE_Q184 = """
WITH sr AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS r
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
),
mx AS (SELECT MAX(r) AS m FROM sr)
SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
       CAST(ROUND(sr.r, 2) AS DOUBLE) AS total_rev_d
FROM sr CROSS JOIN mx JOIN supplier s ON sr.l_suppkey = s.s_suppkey
WHERE sr.r = mx.m
ORDER BY suppkey
"""


@register(
    "q184_top_supplier",
    oracle=_ORACLE_Q184,
    doc="TPC-H Q15 shape: supplier(s) with the maximum 1996Q1 "
    "revenue — max-of-aggregate as ONE broadcast row against the "
    "already-aggregated O(suppliers) frame; exact-decimal equality "
    "keeps ties; shipdate range pushed to the fact scan.",
    tags=("agg", "decorrelation", "tpch"),
)
def q184_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    sr = (
        cat.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("r"))
    )
    mx = sr.agg(F.max("r").alias("m"))
    return (
        sr.crossJoin(F.broadcast(mx))
        .where(F.col("r") == F.col("m"))
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            money_out(F.col("r")).alias("total_rev_d"),
        )
        .orderBy("suppkey")
    )


# ---------------- q185: TPC-H Q14 shape — promo revenue share
#
# Monthly promo-type revenue share. Scale shape: lineitem is
# pre-aggregated to (partkey, month) BEFORE the part join, so the
# join input is O(parts x months) whatever the fact size — part is
# order-of-rows-proportional (NOT broadcastable at 100 TB), so the
# join is partkey co-keyed against the pre-aggregated frame. Share
# in integral ppm: micros preserved exactly through both groupBys.
_ORACLE_Q185 = """
WITH pm AS (
    SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS r
    FROM lineitem GROUP BY 1, 2
),
m AS (
    SELECT pm.month,
           SUM(CASE WHEN p.p_type = 'PROMO' THEN pm.r ELSE 0 END) AS promo_rev,
           SUM(pm.r) AS tot_rev,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(pm.r * 1000000 AS DECIMAL(28,0)) ELSE 0 END)
                AS DECIMAL(31,0)) AS promo_micros,
           CAST(SUM(CAST(pm.r * 1000000 AS DECIMAL(28,0)))
                AS DECIMAL(31,0)) AS tot_micros
    FROM pm JOIN part p ON pm.l_partkey = p.p_partkey
    GROUP BY pm.month
)
SELECT month,
       CAST(ROUND(promo_rev, 2) AS DOUBLE) AS promo_rev_d,
       CAST(ROUND(tot_rev, 2) AS DOUBLE) AS total_rev_d,
       CAST((CAST(promo_micros AS HUGEINT) * 1000000)
            // CAST(tot_micros AS HUGEINT) AS BIGINT) AS promo_share_ppm
FROM m
ORDER BY month
"""


@register(
    "q185_promo_revenue_share",
    oracle=_ORACLE_Q185,
    doc="TPC-H Q14 shape: monthly promo-part revenue share in "
    "integral ppm. Lineitem pre-aggregated to (partkey, month) "
    "before the part join (part is not broadcastable at scale), "
    "conditional sums in exact integer micros.",
    tags=("agg", "join", "tpch"),
)
def q185_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pm = (
        cat.lineitem.select(
            "l_partkey",
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            _rev().alias("rev"),
        )
        .groupBy("l_partkey", "month")
        .agg(F.sum("rev").alias("r"))
        .withColumn(
            "r_micros", (F.col("r") * F.lit(1000000)).cast("decimal(28,0)")
        )
    )
    is_promo = F.col("p_type") == "PROMO"
    m = (
        pm.join(
            cat.part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("month")
        .agg(
            F.sum(F.when(is_promo, F.col("r")).otherwise(F.lit(0))).alias(
                "promo_rev"
            ),
            F.sum("r").alias("tot_rev"),
            F.sum(F.when(is_promo, F.col("r_micros")).otherwise(F.lit(0)))
            .cast("decimal(31,0)")
            .alias("promo_micros"),
            F.sum("r_micros").cast("decimal(31,0)").alias("tot_micros"),
        )
    )
    return m.select(
        "month",
        money_out(F.col("promo_rev")).alias("promo_rev_d"),
        money_out(F.col("tot_rev")).alias("total_rev_d"),
        F.expr("(promo_micros * CAST(1000000 AS DECIMAL(7,0))) div tot_micros")
        .cast("bigint")
        .alias("promo_share_ppm"),
    ).orderBy("month")


# ---------------- q186: TPC-H Q19 shape — disjunctive join predicate
#
# Revenue under an OR of three (brand, size, quantity) conjunctions
# spanning BOTH join sides. Catalyst cannot push a cross-side OR, so
# the scalable plan states the per-side IMPLIED superset predicates
# explicitly — brand IN (...) AND size <= 50 on part, quantity
# BETWEEN 1 AND 50 on lineitem — which DO push into both parquet
# scans (plan-asserted), and evaluates the exact disjunction as the
# join residual. Part joins partkey co-keyed (never broadcast at
# scale); output is one exact-decimal row.
_Q19_DISJUNCTION = """
    (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 15)
 OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 30)
 OR (p_brand = 'Brand#3' AND p_size <= 50 AND l_quantity BETWEEN 25 AND 50)
"""

_ORACLE_Q186 = f"""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
           AS DOUBLE) AS revenue_d,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q19_DISJUNCTION}
"""


@register(
    "q186_disjunctive_pred_join",
    oracle=_ORACLE_Q186,
    doc="TPC-H Q19 shape: revenue under an OR of three mixed-side "
    "(brand, size, quantity) conjunctions. Per-side implied superset "
    "predicates are stated explicitly so they push into both parquet "
    "scans; the exact disjunction runs as the join residual.",
    tags=("join", "pushdown", "tpch"),
)
def q186_disjunctive_pred_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # Implied single-side supersets of the disjunction — these push
    # into the scans; the residual OR below is exact.
    li = cat.lineitem.where(F.col("l_quantity").between(1, 50)).select(
        "l_partkey", "l_quantity", _rev().alias("rev")
    )
    pt = cat.part.where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") <= 50)
    ).select("p_partkey", "p_brand", "p_size")
    joined = li.join(
        pt,
        (F.col("l_partkey") == F.col("p_partkey")) & F.expr(_Q19_DISJUNCTION),
    )
    return joined.agg(
        money_out(F.sum("rev")).alias("revenue_d"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------- q187: TPC-H Q7 shape — bilateral trade volume
#
# Yearly revenue flows between two nations, in both directions.
# Scale shape: the tiny supplier-in-nation list broadcasts FIRST and
# prunes the fact scan to the two nations' suppliers (~2/25 of
# lines) before the one big orderkey co-keyed fact join; the
# customer side is pre-aggregated to (custkey, supp_nation, year) —
# O(customers x 2 x years) — before the custkey-keyed customer join
# (customer is order-of-rows-proportional, never broadcast); nation
# broadcasts twice.
_ORACLE_Q187 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
           AS DOUBLE) AS revenue_d
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register(
    "q187_bilateral_trade",
    oracle=_ORACLE_Q187,
    doc="TPC-H Q7 shape: yearly revenue flows between NATION_1 and "
    "NATION_2 in both directions. Broadcast supplier-nation filter "
    "prunes the fact before the orderkey co-keyed orders join; "
    "custkey rollup precedes the customer join.",
    tags=("join", "broadcast", "tpch"),
)
def q187_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    nations = ("NATION_1", "NATION_2")
    nat = cat.nation.select("n_nationkey", "n_name")
    supp_n = (
        cat.supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin(*nations))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    lf = cat.lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("bigint").alias("year"),
        _rev().alias("rev"),
    ).join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
    pre = (
        lf.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "supp_nation", "year")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        pre.join(
            cat.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"),
                                   F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .where(
            F.col("cust_nation").isin(*nations)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", "year")
        .agg(money_out(F.sum("rev")).alias("revenue_d"))
        .orderBy("supp_nation", "cust_nation", "year")
    )


# ---------------- q194: TPC-H Q4 shape — correlated EXISTS priority count
#
# "Orders placed in 1996Q1 with at least one late shipment, counted
# by priority" — Q4's correlated-EXISTS pattern. The driver's
# lineitem has no commitdate/receiptdate, so the Q4 predicate
# (l_commitdate < l_receiptdate) is adapted to the expressible
# late-shipment condition l_shipdate > o_orderdate + 60 days; the
# SHAPE (quarter-filtered outer, correlated EXISTS with an
# outer-referencing inequality, priority rollup) is Q4's exactly.
# Scale shape: the EXISTS compiles to ONE left-semi join co-keyed on
# orderkey, with the date inequality as the join residual (an
# outer-referencing predicate can never be pushed below the join);
# the quarter filter pushes into the orders scan so the semi-join's
# build input is ~1/28 of orders. Priority rollup is a 5-row frame.
_ORACLE_Q194 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q194_priority_late_exists",
    oracle=_ORACLE_Q194,
    doc="TPC-H Q4 shape: 1996Q1 orders having at least one lineitem "
    "shipped >60 days after the order date, counted by priority. "
    "Correlated EXISTS compiled to one orderkey co-keyed left-semi "
    "join with the date inequality as the join residual; the quarter "
    "filter pushes into the orders scan.",
    tags=("join", "exists", "tpch"),
)
def q194_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & F.expr("l_shipdate > o_orderdate + INTERVAL '60' DAY"),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------- q195: TPC-H Q6 shape — forecast revenue change
#
# The pure scan-and-aggregate classic: discount revenue that WOULD
# have been earned in 1997 had discounts in [0.05, 0.07] on
# small-quantity lines been eliminated. Scale shape: zero shuffles —
# all three predicates push into the parquet scan (plan-asserted)
# and the aggregate is a map-side-combinable single row; at 100 TB
# this is a pure scan whose cost is row-group pruning + one
# partial-agg exchange of ONE row per task. The double literals
# 0.05/0.07 parse to identical IEEE values in both engines and the
# parquet doubles are shared bits, so the filter is cross-engine
# consistent; revenue math is exact decimal micros.
_ORACLE_Q195 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
           AS forecast_rev_d,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q195_forecast_revenue",
    oracle=_ORACLE_Q195,
    doc="TPC-H Q6 shape: revenue forecast from eliminating small "
    "discounts on low-quantity 1997 lines. Zero-shuffle scan-and-"
    "aggregate — all three predicates push into the parquet scan, "
    "the sum is map-side combinable exact decimal.",
    tags=("scan", "pushdown", "tpch"),
)
def q195_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_out(
                F.sum(dec("l_extendedprice") * dec("l_discount", 6, 4))
            ).alias("forecast_rev_d"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------- q196: TPC-H Q8 shape — national market share
#
# NATION_7's share of ECONOMY-part revenue delivered to ASIA
# customers, per 1996/1997 order year. Scale shape (the most
# join-heavy classic on these tables): the p_type filter runs
# partkey co-keyed against lineitem (part is order-of-rows-
# proportional, never broadcast); supplier+nation broadcast to tag
# each line's supplier nation BEFORE any shuffle; the year filter
# pushes into the orders scan; the fact side is pre-aggregated to
# (custkey, year) — O(customers x 2) — BEFORE the custkey co-keyed
# customer join, with the ASIA membership a broadcast nation-region
# row set. Share in integral ppm from exact decimal micros.
_ORACLE_Q196 = """
WITH asia AS (
    SELECT n_nationkey FROM nation
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
),
li AS (
    SELECT l.l_orderkey, l.l_suppkey,
           CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4))) AS rev
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'ECONOMY'
),
fl AS (
    SELECT o.o_custkey,
           CAST(year(o.o_orderdate) AS BIGINT) AS year,
           li.rev,
           CASE WHEN n.n_name = 'NATION_7' THEN 1 ELSE 0 END AS is_target
    FROM li
    JOIN orders o ON li.l_orderkey = o.o_orderkey
    JOIN supplier s ON li.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
),
yr AS (
    SELECT fl.year,
           SUM(CASE WHEN fl.is_target = 1 THEN fl.rev ELSE 0 END) AS target_rev,
           SUM(fl.rev) AS tot_rev
    FROM fl
    JOIN customer c ON fl.o_custkey = c.c_custkey
    WHERE c.c_nationkey IN (SELECT n_nationkey FROM asia)
    GROUP BY fl.year
)
SELECT year,
       CAST(ROUND(target_rev, 2) AS DOUBLE) AS target_rev_d,
       CAST(ROUND(tot_rev, 2) AS DOUBLE) AS total_rev_d,
       CAST((CAST(CAST(target_rev * 1000000 AS DECIMAL(38,0)) AS HUGEINT) * 1000000)
            // CAST(CAST(tot_rev * 1000000 AS DECIMAL(38,0)) AS HUGEINT) AS BIGINT)
           AS market_share_ppm
FROM yr
ORDER BY year
"""


@register(
    "q196_market_share",
    oracle=_ORACLE_Q196,
    doc="TPC-H Q8 shape: NATION_7's share of ECONOMY-part revenue "
    "delivered to ASIA customers per 1996/1997 order year. Partkey "
    "co-keyed part filter, broadcast supplier-nation tagging, year "
    "filter pushed to the orders scan, (custkey, year) pre-"
    "aggregation before the customer join; share in exact ppm.",
    tags=("join", "broadcast", "tpch"),
)
def q196_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pt = cat.part.where(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp_n = (
        cat.supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey",
            (F.col("n_name") == "NATION_7").cast("int").alias("is_target"),
        )
    )
    li = (
        cat.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", _rev().alias("rev")
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    o = cat.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("year"),
    )
    pre = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "year")
        .agg(
            F.sum(
                F.when(F.col("is_target") == 1, F.col("rev")).otherwise(
                    F.lit(0)
                )
            ).alias("target_rev"),
            F.sum("rev").alias("tot_rev"),
        )
    )
    asia = (
        cat.nation.join(
            F.broadcast(cat.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    asia_cust = cat.customer.join(
        F.broadcast(asia), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("c_custkey")
    yr = (
        pre.join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("year")
        .agg(
            F.sum("target_rev").alias("target_rev"),
            F.sum("tot_rev").alias("tot_rev"),
        )
    )
    share = F.expr(
        "(CAST(target_rev * 1000000 AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(7,0)))"
        " div CAST(tot_rev * 1000000 AS DECIMAL(38,0))"
    ).cast("bigint")
    return yr.select(
        "year",
        money_out(F.col("target_rev")).alias("target_rev_d"),
        money_out(F.col("tot_rev")).alias("total_rev_d"),
        share.alias("market_share_ppm"),
    ).orderBy("year")


# ---------------- q197: TPC-H Q13 shape — customer order-count distribution
#
# How many customers placed 0, 1, 2, ... orders (excluding
# '4-NOT SPECIFIED' priority — the expressible analog of Q13's
# comment NOT-LIKE filter). Scale shape: orders pre-aggregate to
# (custkey, count) BEFORE the customer join — the left join's right
# side is O(customers-with-orders), custkey co-keyed with the
# customer scan (customer is order-of-rows-proportional, never
# broadcast); zero-order customers surface via the left join's
# null → 0. The second groupBy is a count-of-counts over a frame
# bounded by the max per-customer order count — tiny at any scale.
_ORACLE_Q197 = """
WITH oc AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY o_custkey
)
SELECT CAST(COALESCE(oc.cnt, 0) AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q197_order_count_distribution",
    oracle=_ORACLE_Q197,
    doc="TPC-H Q13 shape: distribution of per-customer order counts "
    "(priority '4-NOT SPECIFIED' excluded), zero-order customers "
    "included via the left join. Orders pre-aggregated to (custkey, "
    "count) before the custkey co-keyed customer join; the final "
    "count-of-counts frame is bounded by the max order count.",
    tags=("agg", "join", "tpch"),
)
def q197_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    oc = (
        cat.orders.where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cat.customer.select("c_custkey")
        .join(oc, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
