"""Join strategies — the reference's join inventory (SURVEY.md §2.3
J1-J5 + the implicit anti-join of S10's get-or-create) expressed the
way a 100 TB Spark job should:

- bounded dimensions (supplier/nation/region) broadcast → the fact
  scan never shuffles for the join (J1);
- the one-to-many rollup (J3's json_agg) is a groupBy with
  collect_list on the already-joined rows — one shuffle by the
  group key;
- the anti-join (get-or-create / processed-files diff, §2.7) is a
  broadcast-able left_anti;
- argmin-per-key (A9's min_by) is a rank window, tie-broken
  deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, dec_lit, money_out, to_double
from ..registry import register

_ORACLE_Q17 = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
            AS DOUBLE) AS revenue_d,
       COUNT(*) AS line_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@register(
    "q17_revenue_by_nation",
    oracle=_ORACLE_Q17,
    doc="Fact ⋈ three broadcast dimensions → revenue rollup (J1; "
    "TPC-H Q5 shape).",
    tags=("join", "broadcast", "agg"),
)
def q17_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    price = dec("l_extendedprice")
    disc = dec("l_discount", 6, 4)
    one = dec_lit("1.0000")
    return (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            money_out(F.sum(price * (one - disc))).alias("revenue_d"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("r_name", "n_name")
    )


_ORACLE_Q18 = """
SELECT o.o_orderkey,
       o.o_orderstatus,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price_d,
       COUNT(l.l_orderkey) AS line_count,
       CAST(COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_qty_d,
       COALESCE(string_agg(
           l.l_linenumber || ':' || CAST(CAST(l.l_quantity AS DECIMAL(12,2)) AS VARCHAR),
           ',' ORDER BY l.l_linenumber || ':' || CAST(CAST(l.l_quantity AS DECIMAL(12,2)) AS VARCHAR)),
           '') AS lines_s
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey < 200
GROUP BY o.o_orderkey, o.o_orderstatus, o.o_totalprice
ORDER BY o.o_orderkey
"""


@register(
    "q18_order_lines_rollup",
    oracle=_ORACLE_Q18,
    doc="Left-join + per-key nested rollup — the json_agg(…) FILTER "
    "pattern (J3, fastapi-server/app.py:31-52) via sorted "
    "collect_list.",
    tags=("join", "rollup"),
)
def q18_order_lines_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_orderkey") < 200)
    li = cat.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        dec("l_quantity").alias("qty"),
    )
    joined = o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    # Null-guarded so unmatched orders collect an empty list (mirrors
    # json_agg(...) FILTER (WHERE matched) — SURVEY J3). Sorted by
    # the rendered string itself: l_linenumber is NOT unique within
    # an order in this data, so it can't be the (deterministic) key.
    line_str = F.when(
        F.col("l_orderkey").isNotNull(),
        F.concat(
            F.col("l_linenumber").cast("string"),
            F.lit(":"),
            F.col("qty").cast("string"),
        ),
    )
    return (
        joined.groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
        .agg(
            F.count("l_orderkey").alias("line_count"),
            to_double(F.coalesce(F.sum("qty"), F.lit(0))).alias("total_qty_d"),
            F.array_join(F.array_sort(F.collect_list(line_str)), ",").alias(
                "lines_s"
            ),
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            to_double(dec("o_totalprice")).alias("total_price_d"),
            "line_count",
            "total_qty_d",
            "lines_s",
        )
        .orderBy("o_orderkey")
    )


_ORACLE_Q56 = """
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
            AS DOUBLE) AS revenue_d,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_d DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register(
    "q56_shipping_priority",
    oracle=_ORACLE_Q56,
    doc="Three-way join + filtered agg + top-k by revenue (TPC-H Q3 "
    "shape): segment filter pushes to the customer scan, date "
    "filters to orders/lineitem scans.",
    tags=("join", "topk", "agg"),
)
def q56_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    d = F.lit("1998-03-15 00:00:00").cast("timestamp")
    price = dec("l_extendedprice")
    disc = dec("l_discount", 6, 4)
    one = dec_lit("1.0000")
    return (
        cat.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(cat.orders.where(F.col("o_orderdate") < d), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            cat.lineitem.where(F.col("l_shipdate") > d),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_out(F.sum(price * (one - disc))).alias("revenue_d"))
        .select("l_orderkey", "revenue_d", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_d").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_ORACLE_Q57 = """
SELECT c_name, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price_d,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty_d
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
ORDER BY total_qty_d DESC, o_orderkey
LIMIT 20
"""


@register(
    "q57_large_volume_orders",
    oracle=_ORACLE_Q57,
    doc="HAVING over a joined agg + top-k (TPC-H Q18 shape) — the "
    "group-filter-rank pipeline at fact×fact join scale.",
    tags=("join", "having", "topk"),
)
def q57_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    qty = dec("l_quantity")
    return (
        cat.customer.join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(qty).alias("qty_sum"))
        .where(F.col("qty_sum") > 150)
        .select(
            "c_name",
            "o_orderkey",
            to_double(dec("o_totalprice")).alias("total_price_d"),
            to_double(F.col("qty_sum")).alias("total_qty_d"),
        )
        .orderBy(F.col("total_qty_d").desc(), "o_orderkey")
        .limit(20)
    )


_ORACLE_Q19 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


@register(
    "q19_customers_without_orders",
    oracle=_ORACLE_Q19,
    doc="Anti-join — the reference's processed-files set diff / "
    "get-or-create miss path (§2.7, S10) as left_anti.",
    tags=("join", "anti"),
)
def q19_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_ORACLE_Q20 = """
SELECT l_partkey AS partkey,
       MAX(CASE WHEN rn = 1 THEN l_suppkey END) AS cheapest_supplier,
       CAST(ROUND(MIN(eff), 4) AS DOUBLE)       AS best_price_d
FROM (
    SELECT l_partkey, l_suppkey,
           CAST(l_extendedprice AS DECIMAL(12,2)) *
           (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) AS eff,
           row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))),
                        l_suppkey, l_orderkey, l_linenumber
           ) AS rn
    FROM lineitem
)
GROUP BY l_partkey
ORDER BY l_partkey
"""


@register(
    "q20_cheapest_supplier_per_part",
    oracle=_ORACLE_Q20,
    doc="argmin-per-key (A9's min_by / cheapest_store) with full "
    "deterministic tie-break.",
    tags=("window", "argmin"),
)
def q20_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    price = dec("l_extendedprice")
    disc = dec("l_discount", 6, 4)
    one = dec_lit("1.0000")
    li = cat.lineitem.withColumn("eff", price * (one - disc))
    w = Window.partitionBy("l_partkey").orderBy(
        "eff", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("l_suppkey"))).alias(
                "cheapest_supplier"
            ),
            to_double(F.round(F.min("eff"), 4)).alias("best_price_d"),
        )
        .orderBy("partkey")
    )


# ------------------------------------ q104: co-purchase lift (top-20)
#
# Market-basket pair mining — the A-priori first pass as one job:
# distinct (order, part) pairs self-joined WITHIN each order (fan-out
# bounded by basket size, ~C(7,2) pairs per order — never a corpus
# cross join), pair counts map-side combinable, and lift computed
# against per-part order frequencies in exact integral ppm:
# lift = P(a,b)/(P(a)P(b)) = (n_ab * N * 1e6) DIV (n_a * n_b).
# The frequency dimension is per-part counts — a broadcast-sized
# table at any corpus scale (bounded by the part dictionary). Output
# is top-20 by lift with full deterministic tie-breaks.
_ORACLE_Q104 = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
freq AS (SELECT l_partkey, COUNT(*) AS nf FROM op GROUP BY l_partkey),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
    FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
)
SELECT CAST(p.part_a AS BIGINT) AS part_a,
       CAST(p.part_b AS BIGINT) AS part_b,
       CAST(p.n_ab AS BIGINT)   AS n_ab,
       CAST((p.n_ab * o.n * 1000000) // (fa.nf * fb.nf) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN freq fa ON fa.l_partkey = p.part_a
JOIN freq fb ON fb.l_partkey = p.part_b
CROSS JOIN n_orders o
ORDER BY lift_ppm DESC, n_ab DESC, part_a, part_b
LIMIT 20
"""


@register(
    "q104_copurchase_lift",
    oracle=_ORACLE_Q104,
    doc="Market-basket co-purchase mining: within-order pair "
    "generation (fan-out bounded by basket size), map-side "
    "combinable pair counts, lift vs per-part frequencies in exact "
    "integral ppm; top-20 with deterministic tie-breaks.",
    tags=("join", "basket-mining", "lineitem"),
)
def q104_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    op = cat.lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n"))
    freq = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("nf"))
    pairs = (
        op.alias("a")
        .join(op.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("nf").alias("nf_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("nf").alias("nf_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("part_a").cast("bigint").alias("part_a"),
            F.col("part_b").cast("bigint").alias("part_b"),
            "n_ab",
            F.expr("CAST((n_ab * n * 1000000) DIV (nf_a * nf_b) AS BIGINT)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(
            F.col("lift_ppm").desc(), F.col("n_ab").desc(), "part_a", "part_b"
        )
        .limit(20)
    )


# --------------- q132: TPC-H Q10 shape — returned-revenue ranking
#
# "Which customers returned the most revenue last quarter" — the
# returns-analysis join: returnflag-filtered lineitems rolled up to
# customers with their nation, top-20. Scale shape: the returnflag +
# date predicates push to the scans; nation broadcasts; the
# customer rollup is one exchange on custkey; top-20 is a partial
# top-k.
_ORACLE_Q132 = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (CAST('1.0000' AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
            AS DOUBLE) AS lost_revenue_d,
       CAST(COUNT(*) AS BIGINT) AS returned_lines
FROM customer c
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue_d DESC, c_custkey
LIMIT 20
"""


@register(
    "q132_returned_revenue",
    oracle=_ORACLE_Q132,
    doc="TPC-H Q10 shape: returned-lineitem revenue per customer "
    "with nation, top-20 — returnflag predicate pushed to the fact "
    "scan, nation broadcast, one custkey rollup exchange, partial "
    "top-k.",
    tags=("join", "agg", "topk", "tpch"),
)
def q132_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    returned = cat.lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            dec("l_extendedprice")
            * (dec_lit("1.0000") - dec("l_discount", 6, 4))
        ).alias("rev"),
    )
    # Roll up to custkey BEFORE touching the customer dim: customer
    # is order-of-rows-proportional (not a broadcastable dim at
    # 100 TB), so the name join runs custkey-co-keyed against the
    # already-aggregated O(customers) frame; only nation broadcasts.
    per_cust = (
        returned.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            money_out(F.sum("rev")).alias("lost_revenue_d"),
            F.count(F.lit(1)).alias("returned_lines"),
        )
    )
    return (
        per_cust.join(
            cat.customer.select("c_custkey", "c_name", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_name", "lost_revenue_d", "returned_lines")
        .orderBy(F.col("lost_revenue_d").desc(), "c_custkey")
        .limit(20)
    )


# ---------------- q133: TPC-H Q22 shape — global-avg + anti-join
#
# "Positive-balance customers above the average balance who never
# ordered" — the classic correlated-subquery pair Catalyst must
# DECORRELATE: a scalar aggregate subquery (the global average)
# and a NOT EXISTS. Scale shape: the scalar avg is ONE broadcast
# row against the customer scan (never a self-join); the NOT
# EXISTS is a left-anti on custkey against the orders key stream;
# output is a per-prefix rollup (O(prefixes) rows). Exact decimal
# average: compare c_acctbal·count > sum (integer-decimal cross
# multiply) instead of dividing — no float mean anywhere.
_ORACLE_Q133 = """
WITH pos AS (
    SELECT c_custkey, c_name,
           substr(c_name, 10, 1) AS prefix,
           CAST(c_acctbal AS DECIMAL(12,2)) AS bal
    FROM customer WHERE c_acctbal > 0
),
tot AS (
    SELECT CAST(SUM(bal) AS DECIMAL(20,2)) AS s, CAST(COUNT(*) AS BIGINT) AS n
    FROM pos
),
rich AS (
    SELECT p.prefix, p.c_custkey, p.bal
    FROM pos p CROSS JOIN tot t
    WHERE p.bal * t.n > t.s
),
never AS (
    SELECT r.* FROM rich r
    ANTI JOIN orders o ON o.o_custkey = r.c_custkey
)
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS total_bal_d
FROM never
GROUP BY prefix
ORDER BY prefix
"""


@register(
    "q133_rich_never_ordered",
    oracle=_ORACLE_Q133,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "orders, rolled up by name prefix — scalar-avg subquery as ONE "
    "broadcast row (exact decimal cross-multiply, no float mean), "
    "NOT EXISTS as a left-anti on custkey.",
    tags=("join", "anti", "decorrelation", "tpch"),
)
def q133_rich_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    pos = cat.customer.where(F.col("c_acctbal") > 0).select(
        "c_custkey",
        F.substring("c_name", 10, 1).alias("prefix"),
        dec("c_acctbal").alias("bal"),
    )
    tot = pos.agg(
        F.sum("bal").cast("decimal(20,2)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rich = pos.crossJoin(F.broadcast(tot)).where(
        F.col("bal") * F.col("n") > F.col("s")
    )
    never = rich.join(
        cat.orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_out(F.sum("bal")).alias("total_bal_d"),
        )
        .orderBy("prefix")
    )


# ------------- q156: TPC-H Q21 shape — chained EXISTS/NOT EXISTS
#
# "Suppliers who kept multi-supplier orders waiting": a supplier was
# LATE on an order (shipped > 60 days after the order date), the
# order involved at least one OTHER supplier (EXISTS), and no other
# supplier on that order was late (NOT EXISTS) — the classic
# double-existence subquery Catalyst must turn into one semi- and
# one anti-join. Scale shape: the late set is the orderkey-co-keyed
# orders ⋈ lineitem join with the date predicate applied at the
# join (both scans prune to 3 columns); the EXISTS/NOT EXISTS are
# self-joins on the SAME orderkey key — one exchange feeds all
# three joins; supplier names broadcast; numwait top-20 is a
# partial top-k. No correlated re-execution anywhere.
_ORACLE_Q156 = """
WITH late AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register(
    "q156_waiting_supplier",
    oracle=_ORACLE_Q156,
    doc="TPC-H Q21 shape: suppliers solely late on multi-supplier "
    "orders — EXISTS as a left-semi and NOT EXISTS as a left-anti, "
    "all three joins co-keyed on orderkey (one exchange), supplier "
    "broadcast, partial top-20.",
    tags=("join", "semi", "anti", "decorrelation", "tpch"),
)
def q156_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lines = cat.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        lines.join(
            cat.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # r10: `late` anchors the probe AND is the NOT-EXISTS build
        # side — lazily the lineitem ⋈ orders + distinct subtree ran
        # twice (guide §5). One materialization of the (orderkey,
        # suppkey) late set; the set is late-lineitems-sized, far
        # smaller than lineitem.
        .localCheckpoint()
    )
    l1 = late.alias("l1")
    other_line = lines.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = l1.join(
        other_line,
        (F.col("l1.l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (F.col("l1.l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# -------- q171: sketch-driven join-order choice (the CBO loop)
#
# q145 estimates one join's cardinality from KMV sketches; this
# closes the loop a cost-based optimizer actually runs: two
# candidate orders for the 3-table join urgent-orders ⋈ lineitem ⋈
# customer, each step's cardinality estimated from per-table KMV
# sketches of its join key with the textbook formula
# |R ⋈ S| = |R|·|S| / max(ndv_R(k), ndv_S(k)), the cheaper order
# chosen by total estimated intermediate rows — and every estimate
# printed NEXT TO the exact actual, so the decision's quality is
# itself value-checked. Everything is exact integer arithmetic: the
# KMV ndv estimate (K-1)/u_K is computed as (63·2^48) div h_K (h_K
# the 64th-smallest 48-bit hash — no doubles anywhere), estimates
# with BIGINT div. Scale shape: sketches are K-row aggregates
# (map-side combinable, the ANALYZE TABLE pass); the estimation
# itself touches only sketch outputs; the actuals here are the
# audit, not part of the optimizer's cost.

CBO_K = 64
_CBO_SCALE = 63 << 48


def _kmv_ndv_sql(table_expr: str, key: str, name: str) -> str:
    """DuckDB CTE producing (n, ndv) for a table's join key."""
    return f"""
{name}_h AS (
    SELECT DISTINCT CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 12))
                         AS UBIGINT) AS h
    FROM {table_expr}
),
{name}_r AS (
    SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
    FROM {name}_h
),
{name} AS (
    SELECT (SELECT COUNT(*) FROM {table_expr}) AS n,
           CASE WHEN MAX(nd) < {CBO_K} THEN MAX(nd)
                ELSE {_CBO_SCALE} // MAX(CASE WHEN rn = {CBO_K} THEN h END)
           END AS ndv
    FROM {name}_r
)"""


_ORACLE_Q171 = f"""
WITH of AS (
    SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
),
{_kmv_ndv_sql("of", "o_orderkey", "sk_ook").lstrip()},
{_kmv_ndv_sql("lineitem", "l_orderkey", "sk_lok").lstrip()},
{_kmv_ndv_sql("of", "o_custkey", "sk_ock").lstrip()},
{_kmv_ndv_sql("customer", "c_custkey", "sk_cck").lstrip()},
est AS (
    SELECT
        of.n * l.n // GREATEST(ook.ndv, lok.ndv) AS est_a1,
        (of.n * l.n // GREATEST(ook.ndv, lok.ndv)) * c.n
            // GREATEST(ock.ndv, cck.ndv) AS est_a2,
        of.n * c.n // GREATEST(ock.ndv, cck.ndv) AS est_b1,
        (of.n * c.n // GREATEST(ock.ndv, cck.ndv)) * l.n
            // GREATEST(ook.ndv, lok.ndv) AS est_b2
    FROM sk_ook ook, sk_lok lok, sk_ock ock, sk_cck cck,
         (SELECT n FROM sk_ook) of, (SELECT n FROM sk_lok) l,
         (SELECT n FROM sk_cck) c
),
act AS (
    SELECT
        (SELECT COUNT(*) FROM of o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
            AS act_a1,
        (SELECT COUNT(*) FROM of o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey) AS act_a2,
        (SELECT COUNT(*) FROM of o JOIN customer c ON c.c_custkey = o.o_custkey)
            AS act_b1,
        (SELECT COUNT(*) FROM of o JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS act_b2
),
rows_out AS (
    SELECT 'lineitem_first' AS ord, 1 AS step, est_a1 AS est_rows, act_a1 AS act_rows,
           est_a1 + est_a2 AS ord_total FROM est, act
    UNION ALL
    SELECT 'lineitem_first', 2, est_a2, act_a2, est_a1 + est_a2 FROM est, act
    UNION ALL
    SELECT 'customer_first', 1, est_b1, act_b1, est_b1 + est_b2 FROM est, act
    UNION ALL
    SELECT 'customer_first', 2, est_b2, act_b2, est_b1 + est_b2 FROM est, act
)
SELECT ord, CAST(step AS BIGINT) AS step,
       CAST(est_rows AS BIGINT) AS est_rows,
       CAST(act_rows AS BIGINT) AS act_rows,
       CAST(CASE WHEN ord_total = MIN(ord_total) OVER () THEN 1 ELSE 0 END
            AS BIGINT) AS chosen
FROM rows_out
ORDER BY ord, step
"""


def _kmv_ndv_df(df, key):
    """(n, ndv) for a DataFrame's join key — exact integer KMV:
    ndv = (63*2^48) div h_64. The K smallest hashes come from a
    partial top-k (orderBy+limit -> TakeOrderedAndProject), never a
    rank window over the full distinct-key stream — the sketch is
    the ANALYZE pass and must itself be scale-clean."""
    n = df.count()
    hashed = (
        df.select(
            F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 12), 16, 10)
            .cast("bigint")
            .alias("h")
        )
        .distinct()
    )
    smallest = hashed.orderBy("h").limit(CBO_K).agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("hk")
    ).collect()[0]
    ndv = (
        smallest["k"]
        if smallest["k"] < CBO_K
        else _CBO_SCALE // smallest["hk"]
    )
    return n, ndv


@register(
    "q171_cbo_join_order",
    oracle=_ORACLE_Q171,
    doc="The cost-based-optimizer loop on KMV sketches: two join "
    "orders for urgent-orders x lineitem x customer, per-step "
    "cardinalities estimated as |R|*|S| div max(ndv) from exact-"
    "integer KMV sketches ((63*2^48) div h_64 — no doubles), the "
    "cheaper order flagged, and every estimate emitted next to the "
    "exact actual so the decision quality is value-checked.",
    tags=("join", "cbo", "sketches"),
)
def q171_cbo_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    of = cat.orders.where(F.col("o_orderpriority") == "1-URGENT")
    li = cat.lineitem
    cu = cat.customer
    vals = {
        "ook": _kmv_ndv_df(of, "o_orderkey"),
        "lok": _kmv_ndv_df(li, "l_orderkey"),
        "ock": _kmv_ndv_df(of, "o_custkey"),
        "cck": _kmv_ndv_df(cu, "c_custkey"),
    }  # 4 (n, ndv) sketches — the CBO stats lookup
    n_of, n_li, n_cu = vals["ook"][0], vals["lok"][0], vals["cck"][0]
    d_ok = max(vals["ook"][1], vals["lok"][1])
    d_ck = max(vals["ock"][1], vals["cck"][1])
    est_a1 = n_of * n_li // d_ok
    est_a2 = est_a1 * n_cu // d_ck
    est_b1 = n_of * n_cu // d_ck
    est_b2 = est_b1 * n_li // d_ok
    a1 = of.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    act_a1 = a1.count()
    act_a2 = a1.join(cu, F.col("c_custkey") == F.col("o_custkey")).count()
    b1 = of.join(cu, F.col("c_custkey") == F.col("o_custkey"))
    act_b1 = b1.count()
    act_b2 = b1.join(li, F.col("l_orderkey") == F.col("o_orderkey")).count()
    tot_a, tot_b = est_a1 + est_a2, est_b1 + est_b2
    rows = [
        ("lineitem_first", 1, est_a1, act_a1, tot_a),
        ("lineitem_first", 2, est_a2, act_a2, tot_a),
        ("customer_first", 1, est_b1, act_b1, tot_b),
        ("customer_first", 2, est_b2, act_b2, tot_b),
    ]
    best = min(tot_a, tot_b)
    return spark.createDataFrame(
        [
            (ordn, step, est, act, 1 if tot == best else 0)
            for ordn, step, est, act, tot in rows
        ],
        "ord STRING, step LONG, est_rows LONG, act_rows LONG, chosen LONG",
    ).orderBy("ord", "step")


# ------------- q200: Zipf hot/cold split join (skewed dictionary join)
#
# THE token-pipeline join bottleneck at 100 TB: corpus tokens joined
# to a per-token dictionary. Token frequencies are Zipfian, so a
# plain co-keyed shuffle join funnels the head of the distribution
# ("the", "of", ...) through single reducers — the JOIN analog of the
# aggregation skew q49/q175 solve. The classic fix decomposes the
# dictionary around an explicit HOT-KEY LIST (how production skew
# hints work): the top-H most frequent tokens — under Zipf a handful
# of keys absorbing a large share of all occurrences — join by
# BROADCAST, while the cold tail (the multi-million-row body a
# 100 TB vocabulary makes un-broadcastable) stays a co-keyed shuffle
# join whose per-key fan-in is bounded by the H-th frequency. The
# union is value-identical to the plain join because (hot, rest)
# is an exact partition of the dictionary; the tail is a broadcast
# anti-join against the hot rows. The cold side carries an explicit
# merge hint so the plan KEEPS the two-strategy shape at any tier
# (at test scale Catalyst would happily broadcast the whole tail and
# hide the technique the plan test pins).
#
# Round 6 (verdict item): the hot list is no longer a fixed top-8 —
# it is DRIVEN BY THE q168 STATISTICS via the fair-share criterion
# q175 established for aggregation, closing the skew-JOIN loop the
# same way q175 closed aggregation and q171 closed join order. A
# dictionary key is hot iff its occurrence share exceeds
# JOIN_HOT_FACTOR times the fair 1/P per-reducer share:
#     hot  iff  (n * 1e6 div occ_total) * P >= JOIN_HOT_FACTOR * 1e6
# with JOIN_HOT_FACTOR = 1 for joins (any key above the fair share
# makes one reducer the critical path, because join fan-in
# MULTIPLIES the key's probe rows by its build rows — aggregation
# tolerates 4x via partial aggregation, a join does not). The
# criterion itself bounds the broadcast set: at most
# P / JOIN_HOT_FACTOR keys can each hold >= JOIN_HOT_FACTOR/P of
# the mass, so the hot dictionary is <= 32 rows at ANY corpus size
# — always broadcastable, no cap parameter needed. The decision is
# a pure predicate over per-key counts (no top-k, no global sort);
# it is value-checked because the oracle is the PLAIN join.
#
# Output: per source, token count and total "commonness mass"
# (sum of each token's corpus frequency — the quantity a dictionary
# join materializes), plus the measured split statistics (data-driven
# hot-list size, share of occurrences the broadcast head absorbs).

JOIN_HOT_FACTOR = 1
JOIN_PARALLELISM = 32  # the fleet's shuffle width (session.py)

_ORACLE_Q200 = f"""
WITH tok AS (
    SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
    FROM documents
),
d AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS occ_total FROM d),
hotset AS (
    SELECT t, n FROM d, tot
    WHERE n * 1000000 // tot.occ_total * {JOIN_PARALLELISM}
          >= {JOIN_HOT_FACTOR} * 1000000
),
hot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hot,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS hot_occ
    FROM hotset
)
SELECT tok.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(d.n) AS BIGINT) AS commonness,
       hot.n_hot,
       CAST(hot.hot_occ * 1000000 // tot.occ_total AS BIGINT) AS hot_share_ppm
FROM tok JOIN d USING (t), tot, hot
GROUP BY tok.source, hot.n_hot, hot.hot_occ, tot.occ_total
ORDER BY tok.source
"""


@register(
    "q200_zipf_split_join",
    oracle=_ORACLE_Q200,
    doc="Skewed dictionary join with a STATISTICS-DRIVEN hot-key "
    "list (round 6): a key joins by BROADCAST iff its occurrence "
    "share exceeds the fair 1/32 per-reducer share (the q175 "
    "fair-share criterion at JOIN_HOT_FACTOR=1 — the criterion "
    "itself caps the hot set at 32 rows, always broadcastable); "
    "the un-broadcastable tail stays a co-keyed shuffle join. "
    "Exact dictionary partition, union value-identical to the "
    "plain join (the oracle). Closes the skew-JOIN loop the way "
    "q175 closed aggregation and q171 closed join order; "
    "plan-asserted to keep both join strategies.",
    tags=("join", "skew", "text", "scale"),
)
def q200_zipf_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import fan_out
    from .text import tokens_col

    cat = Catalog(spark, sf_dir)
    tok = fan_out(cat.documents, "doc_id").select(
        "source", F.explode(tokens_col()).alias("t")
    )
    d = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    tot = d.agg(F.sum("n").cast("bigint").alias("occ_total"))
    # data-driven hot-key list: a pure predicate over the per-key
    # counts (q168's statistics) — no top-k, no global sort; the
    # fair-share criterion bounds it at JOIN_PARALLELISM rows
    hot_dict = (
        d.crossJoin(F.broadcast(tot))
        .where(
            F.expr(
                f"n * 1000000 div occ_total * {JOIN_PARALLELISM}"
                f" >= {JOIN_HOT_FACTOR} * 1000000"
            )
        )
        .select("t", "n")
    )
    cold_dict = d.join(F.broadcast(hot_dict.select("t")), "t", "left_anti")
    stats = (
        hot_dict.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hot"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("hot_occ"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n_hot",
            F.expr("CAST(hot_occ * 1000000 div occ_total AS BIGINT)").alias(
                "hot_share_ppm"
            ),
        )
    )
    # Round 9: the cold PROBE is pre-filtered by a broadcast
    # anti-join against the (≤ P-row) hot list — without it every
    # hot occurrence would still be shuffled and sorted into the
    # merge join's hot partition just to match nothing, and AQE
    # cannot split that partition because the dictionary side rides
    # its own aggregation exchange (tools/audit_skew_joinback.py).
    cold_tok = tok.join(F.broadcast(hot_dict.select("t")), "t", "left_anti")
    joined = tok.join(F.broadcast(hot_dict), "t").unionByName(
        cold_tok.join(cold_dict.hint("merge"), "t")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n").cast("bigint").alias("commonness"),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "source", "n_tokens", "commonness", "n_hot", "hot_share_ppm"
        )
        .orderBy("source")
    )
