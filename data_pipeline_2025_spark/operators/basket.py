"""Shopping-basket optimization — the reference's find_best_basket
MCP tool (SURVEY.md §2.4 A6-A9/A12, §2.6 O3; salim/app/server/
routes/mcp.py:319-447, simple-proxy.js:329-703).

Pipeline: for a fixed basket of barcodes, pick the cheapest offer
per (store, barcode) (argmin by effective price, ties broken by
product_id), aggregate per store (sum price / effective / savings,
count), flag complete baskets (the reference's "HAVING count == N"
A7), and produce the best/worst summary (A8/A12). The mcp.py
convention savings=0-when-no-promo applies here (A10's second
convention).

Scale: one shuffle by (supermarket_id, barcode) for the argmin, one
partial-agg shuffle by supermarket_id — both on pre-filtered data
(barcode IN basket pushes to the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import to_double
from ..mapping import domain_sql, products, supermarkets
from ..registry import register

BASKET = ("3", "7", "11", "19", "23")
_BASKET_SQL = ", ".join(f"'{b}'" for b in BASKET)

_PER_STORE_CTE = f"""
offers AS (
    SELECT *, COALESCE(promo_price, price) AS eff
    FROM products
    WHERE barcode IN ({_BASKET_SQL})
),
best_offer AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY supermarket_id, barcode
            ORDER BY eff, product_id
        ) AS rn
        FROM offers
    ) WHERE rn = 1
),
store_totals AS (
    SELECT b.supermarket_id,
           s.name AS supermarket_name,
           SUM(b.price)         AS total_price,
           SUM(b.eff)           AS total_effective,
           SUM(b.price - b.eff) AS total_savings,
           COUNT(*)             AS product_count
    FROM best_offer b
    JOIN supermarkets s USING (supermarket_id)
    GROUP BY b.supermarket_id, s.name
)"""

_ORACLE_Q09 = domain_sql(f""",{_PER_STORE_CTE}
SELECT supermarket_id, supermarket_name,
       CAST(total_price AS DOUBLE)     AS total_price_d,
       CAST(total_effective AS DOUBLE) AS total_effective_d,
       CAST(total_savings AS DOUBLE)   AS total_savings_d,
       product_count,
       product_count = {len(BASKET)}   AS is_complete
FROM store_totals
""")


def _store_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import basket_store_totals

    cat = Catalog(spark, sf_dir)
    return basket_store_totals(products(cat), supermarkets(cat), list(BASKET))


@register(
    "q09_basket_totals",
    oracle=_ORACLE_Q09,
    doc="Per-store basket totals + complete-basket flag "
    "(A6/A7/A10-mcp; argmin offer per store×product).",
    tags=("basket", "agg"),
)
def q09_basket_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _store_totals(spark, sf_dir)
    return t.select(
        "supermarket_id",
        "supermarket_name",
        to_double(F.col("total_price")).alias("total_price_d"),
        to_double(F.col("total_effective")).alias("total_effective_d"),
        to_double(F.col("total_savings")).alias("total_savings_d"),
        "product_count",
        (F.col("product_count") == len(BASKET)).alias("is_complete"),
    )


_ORACLE_Q10 = domain_sql(f""",{_PER_STORE_CTE},
complete AS (
    SELECT *, rank() OVER (ORDER BY total_effective, supermarket_id) AS rk_best,
              rank() OVER (ORDER BY total_effective DESC, supermarket_id) AS rk_worst
    FROM store_totals
    WHERE product_count = {len(BASKET)}
)
SELECT
    MAX(CASE WHEN rk_best = 1 THEN supermarket_id END)   AS best_store_id,
    MAX(CASE WHEN rk_best = 1 THEN supermarket_name END) AS best_store_name,
    CAST(MIN(total_effective) AS DOUBLE)                 AS best_total_d,
    MAX(CASE WHEN rk_worst = 1 THEN supermarket_id END)  AS worst_store_id,
    CAST(MAX(total_effective) AS DOUBLE)                 AS worst_total_d,
    CAST(MAX(total_effective) - MIN(total_effective) AS DOUBLE) AS max_savings_d,
    CAST(MAX(total_effective) - MIN(total_effective) AS DOUBLE) * 100
        / CAST(MAX(total_effective) AS DOUBLE)           AS savings_pct,
    COUNT(*)                                             AS complete_stores
FROM complete
""")


@register(
    "q10_best_basket_summary",
    oracle=_ORACLE_Q10,
    doc="Best vs worst complete basket: argmin/argmax store, max "
    "potential savings and %% (A8/A9/A12).",
    tags=("basket", "summary"),
)
def q10_best_basket_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _store_totals(spark, sf_dir).where(F.col("product_count") == len(BASKET))
    rk_b = F.rank().over(Window.orderBy("total_effective", "supermarket_id"))
    rk_w = F.rank().over(
        Window.orderBy(F.col("total_effective").desc(), "supermarket_id")
    )
    ranked = t.withColumn("rk_best", rk_b).withColumn("rk_worst", rk_w)
    best = F.max(F.when(F.col("rk_best") == 1, F.col("supermarket_id")))
    best_name = F.max(F.when(F.col("rk_best") == 1, F.col("supermarket_name")))
    worst = F.max(F.when(F.col("rk_worst") == 1, F.col("supermarket_id")))
    lo = F.min("total_effective")
    hi = F.max("total_effective")
    return ranked.agg(
        best.alias("best_store_id"),
        best_name.alias("best_store_name"),
        to_double(lo).alias("best_total_d"),
        worst.alias("worst_store_id"),
        to_double(hi).alias("worst_total_d"),
        to_double(hi - lo).alias("max_savings_d"),
        (to_double(hi - lo) * 100 / to_double(hi)).alias("savings_pct"),
        F.count(F.lit(1)).alias("complete_stores"),
    )
