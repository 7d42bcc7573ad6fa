"""Product search surface — the reference's `GET /products` filter
chain (SURVEY.md §2.2 Q1-Q7, Q9-Q12; salim/app/server/routes/
products.py:20-64).

Each filter is a declarative `df.filter`, so Catalyst pushes every
predicate into the parquet scan (check `.explain` → PushedFilters);
at 100 TB a search touches only the row groups whose min/max stats
survive the pushed predicates. Pagination is the one inherently
global step (row_number over a total order) — acceptable because the
reference caps pages at 1,000 rows; at scale you'd paginate by
keyset (product_id > cursor) which this plan's total order enables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import to_double
from ..mapping import domain_sql, products
from ..registry import register

# Fixed parameters: the driver compares deterministic result sets, so
# each query pins the reference endpoint's parameters to one
# representative call (term/brand/price-range/pagination all active).
TERM = "widget"
BRAND_TERM = "1"
MIN_PRICE = 1_000
MAX_PRICE = 60_000
OFFSET = 10
LIMIT = 50

_ORACLE_Q02 = domain_sql(f"""
SELECT product_id, supermarket_id, barcode, canonical_name, brand, category,
       CAST(price AS DOUBLE)       AS price_d,
       CAST(promo_price AS DOUBLE) AS promo_price_d,
       collected_at
FROM (
    SELECT *, row_number() OVER (ORDER BY product_id) AS rn
    FROM products
    WHERE lower(canonical_name) LIKE '%{TERM}%'
      AND lower(brand) LIKE '%{BRAND_TERM}%'
      AND price >= {MIN_PRICE} AND price <= {MAX_PRICE}
)
WHERE rn > {OFFSET} AND rn <= {OFFSET + LIMIT}
""")


@register(
    "q02_product_search",
    oracle=_ORACLE_Q02,
    doc="GET /products filter chain: ILIKE name+brand, price range, "
    "deterministic pagination (SURVEY §2.2 Q1,Q3,Q5,Q7).",
    tags=("filter", "pagination"),
)
def q02_product_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import search_products

    df = products(Catalog(spark, sf_dir))
    # _price_raw range is a SUPERSET of the decimal-price range (±1
    # absorbs the cast rounding); it pushes into the parquet scan as
    # a min/max row-group filter while the exact decimal predicates
    # inside search_products keep oracle-identical semantics.
    df = df.where(F.col("_price_raw").between(MIN_PRICE - 1, MAX_PRICE + 1))
    return search_products(
        df,
        term=TERM,
        brand=BRAND_TERM,
        min_price=MIN_PRICE,
        max_price=MAX_PRICE,
        offset=OFFSET,
        limit=LIMIT,
    ).select(
        "product_id",
        "supermarket_id",
        "barcode",
        "canonical_name",
        "brand",
        "category",
        to_double(F.col("price")).alias("price_d"),
        to_double(F.col("promo_price")).alias("promo_price_d"),
        "collected_at",
    )


_ORACLE_Q03 = domain_sql("""
SELECT category,
       COUNT(*)                                     AS total,
       COUNT(promo_price)                           AS promo_count,
       CAST(COUNT(promo_price) AS DOUBLE) * 100 / COUNT(*) AS promo_pct
FROM products
GROUP BY category
ORDER BY category
""")


@register(
    "q03_promo_stats_by_category",
    oracle=_ORACLE_Q03,
    doc="Promo tri-state as conditional counts per category "
    "(SURVEY §2.2 Q4 + §2.4 A2-A3).",
    tags=("agg",),
)
def q03_promo_stats_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = products(Catalog(spark, sf_dir))
    total = F.count(F.lit(1))
    promo = F.count(F.col("promo_price"))
    return (
        df.groupBy("category")
        .agg(
            total.alias("total"),
            promo.alias("promo_count"),
            (promo.cast("double") * 100 / total).alias("promo_pct"),
        )
        .orderBy("category")
    )


_ORACLE_Q04 = domain_sql("""
SELECT supermarket_id,
       COUNT(*)                   AS no_promo_count,
       CAST(MIN(price) AS DOUBLE) AS min_price_d,
       CAST(MAX(price) AS DOUBLE) AS max_price_d
FROM products
WHERE promo_price IS NULL
GROUP BY supermarket_id
ORDER BY supermarket_id
""")


@register(
    "q04_non_promo_by_store",
    oracle=_ORACLE_Q04,
    doc="Promo tri-state False branch: promo_price IS NULL per store "
    "(SURVEY §2.2 Q4,Q6).",
    tags=("filter", "agg"),
)
def q04_non_promo_by_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = products(Catalog(spark, sf_dir))
    return (
        df.where(F.col("promo_price").isNull())
        .groupBy("supermarket_id")
        .agg(
            F.count(F.lit(1)).alias("no_promo_count"),
            to_double(F.min("price")).alias("min_price_d"),
            to_double(F.max("price")).alias("max_price_d"),
        )
        .orderBy("supermarket_id")
    )


# Last-30-days window anchored at the data's max shipdate (the
# reference anchors at now() — products.py:240-241; a fixed anchor
# keeps the query pure).
RANGE_LO = "2001-10-05 00:00:00"
RANGE_HI = "2001-11-04 00:00:00"

_ORACLE_Q05 = domain_sql(f"""
SELECT supermarket_id,
       COUNT(*) AS observations,
       CAST(SUM({'COALESCE(promo_price, price)'}) AS DOUBLE) / COUNT(*) AS avg_effective_d
FROM products
WHERE collected_at BETWEEN TIMESTAMP '{RANGE_LO}' AND TIMESTAMP '{RANGE_HI}'
GROUP BY supermarket_id
ORDER BY supermarket_id
""")


@register(
    "q05_recent_window",
    oracle=_ORACLE_Q05,
    doc="Time-range filter (collected_at BETWEEN now-30d AND now) + "
    "per-store average effective price (SURVEY §2.2 Q12, §2.4 A3).",
    tags=("filter", "time"),
)
def q05_recent_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..mapping import effective

    df = products(Catalog(spark, sf_dir))
    return (
        df.where(
            F.col("collected_at").between(
                F.lit(RANGE_LO).cast("timestamp"), F.lit(RANGE_HI).cast("timestamp")
            )
        )
        .groupBy("supermarket_id")
        .agg(
            F.count(F.lit(1)).alias("observations"),
            (to_double(F.sum(effective())) / F.count(F.lit(1))).alias(
                "avg_effective_d"
            ),
        )
        .orderBy("supermarket_id")
    )
