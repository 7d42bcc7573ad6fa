"""Price history + trend — the reference's `GET /products/barcode/
{barcode}/price-history` (SURVEY.md §2.2 Q12, §2.5 W2, §2.4 A13-A14;
salim/app/server/routes/products.py:229-296).

Trend semantics (A13, products.py:283-296): order observations
newest-first, split in half (recent = first len//2 rows), compare
half averages: recent > older*1.05 → increasing, < older*0.95 →
decreasing, else stable. The reference leaves tie order unspecified;
we pin (collected_at DESC, product_id) — SURVEY §7 hard-part #2.

Scale: everything is windowed by barcode — one shuffle, partial
aggs, no data explosion; history per key is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import to_double
from ..mapping import domain_sql, products
from ..registry import register

BARCODE = "50"
CUTOFF = "2000-11-04 00:00:00"  # max shipdate - 365d (reference: now()-days)

_ORACLE_Q11 = domain_sql(f"""
SELECT barcode, supermarket_id, product_id, collected_at,
       CAST(price AS DOUBLE)                        AS price_d,
       CAST(promo_price AS DOUBLE)                  AS promo_price_d,
       CAST(COALESCE(promo_price, price) AS DOUBLE) AS effective_d
FROM products
WHERE barcode = '{BARCODE}' AND collected_at >= TIMESTAMP '{CUTOFF}'
""")


@register(
    "q11_price_history",
    oracle=_ORACLE_Q11,
    doc="Price history for one barcode within a look-back window "
    "(Q12/W2/O5).",
    tags=("history", "filter"),
)
def q11_price_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import price_history

    df = products(Catalog(spark, sf_dir))
    return price_history(df, BARCODE, CUTOFF).select(
        "barcode",
        "supermarket_id",
        "product_id",
        "collected_at",
        to_double(F.col("price")).alias("price_d"),
        to_double(F.col("promo_price")).alias("promo_price_d"),
        to_double(F.col("effective_price")).alias("effective_d"),
    )


_ORACLE_Q12 = domain_sql("""
,h AS (
    SELECT barcode,
           COALESCE(promo_price, price) AS eff,
           row_number() OVER (
               PARTITION BY barcode ORDER BY collected_at DESC, product_id
           ) AS rn,
           count(*) OVER (PARTITION BY barcode) AS cnt
    FROM products
),
agg AS (
    SELECT barcode,
           MAX(cnt) AS points,
           CAST(SUM(CASE WHEN rn <= cnt // 2 THEN eff END) AS DOUBLE)
               / SUM(CASE WHEN rn <= cnt // 2 THEN 1 ELSE 0 END) AS recent_avg,
           CAST(SUM(CASE WHEN rn > cnt // 2 THEN eff END) AS DOUBLE)
               / SUM(CASE WHEN rn > cnt // 2 THEN 1 ELSE 0 END) AS older_avg
    FROM h
    GROUP BY barcode
    HAVING MAX(cnt) >= 2
)
SELECT barcode, points, recent_avg, older_avg,
       CASE WHEN recent_avg > older_avg * 1.05 THEN 'increasing'
            WHEN recent_avg < older_avg * 0.95 THEN 'decreasing'
            ELSE 'stable' END AS trend
FROM agg
""")


@register(
    "q12_price_trend",
    oracle=_ORACLE_Q12,
    doc="Half-split trend classifier per barcode: recent-half avg vs "
    "older-half avg, ±5%% bands (A13, products.py:283-296).",
    tags=("history", "window", "trend"),
)
def q12_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import price_trend

    df = products(Catalog(spark, sf_dir))
    return price_trend(df).select(
        "barcode", "points", "recent_avg", "older_avg", "trend"
    )


_ORACLE_Q13 = domain_sql("""
,h AS (
    SELECT barcode,
           COALESCE(promo_price, price) AS eff,
           row_number() OVER (
               PARTITION BY barcode ORDER BY collected_at DESC, product_id
           ) AS rn
    FROM products
)
SELECT barcode,
       CAST(MAX(CASE WHEN rn = 1 THEN eff END) AS DOUBLE) AS current_d,
       CAST(MIN(eff) AS DOUBLE) AS low_d,
       CAST(MAX(eff) AS DOUBLE) AS high_d
FROM h
GROUP BY barcode
""")


@register(
    "q13_history_minmax",
    oracle=_ORACLE_Q13,
    doc="Current / lowest / highest effective price per barcode over "
    "its history (A14 + W2 latest-row).",
    tags=("history", "agg"),
)
def q13_history_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import history_minmax

    return history_minmax(products(Catalog(spark, sf_dir)))
