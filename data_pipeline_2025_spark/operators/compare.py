"""Cross-store price comparison by barcode — the reference's
`GET /products/barcode/{barcode}/compare` (SURVEY.md §2.3 J1/J4,
§2.6 O2, §2.4 A10; salim/app/server/routes/products.py:162-226).

Key semantics preserved:
- barcode is the cross-store product identity (product_id is only a
  row id) — J4;
- the store dimension joins via broadcast (J1) — it is bounded, so
  at 100 TB the fact scan never shuffles for this join;
- savings = price - promo_price when promo else NULL (the
  products.py:214 convention; mcp.py uses 0 — A10 records BOTH, we
  expose the NULL one here and the 0 one in basket.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import to_double
from ..mapping import domain_sql, products, supermarkets
from ..registry import register

BARCODE = "50"

_ORACLE_Q06 = domain_sql(f"""
SELECT p.supermarket_id,
       s.name AS supermarket_name,
       s.city,
       p.product_id,
       CAST(p.price AS DOUBLE)                         AS price_d,
       CAST(p.promo_price AS DOUBLE)                   AS promo_price_d,
       CAST(COALESCE(p.promo_price, p.price) AS DOUBLE) AS effective_d,
       CAST(p.price - p.promo_price AS DOUBLE)         AS savings_d,
       p.collected_at
FROM products p
JOIN supermarkets s USING (supermarket_id)
WHERE p.barcode = '{BARCODE}'
""")


@register(
    "q06_barcode_compare",
    oracle=_ORACLE_Q06,
    doc="All offers for one barcode across stores, store dim "
    "broadcast-joined, with per-offer savings (J1/J4/O2/A10).",
    tags=("join", "compare"),
)
def q06_barcode_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import compare_offers

    cat = Catalog(spark, sf_dir)
    return compare_offers(products(cat), supermarkets(cat), BARCODE).select(
        "supermarket_id",
        F.col("name").alias("supermarket_name"),
        "city",
        "product_id",
        to_double(F.col("price")).alias("price_d"),
        to_double(F.col("promo_price")).alias("promo_price_d"),
        to_double(F.col("effective_price")).alias("effective_d"),
        to_double(F.col("savings")).alias("savings_d"),
        "collected_at",
    )
