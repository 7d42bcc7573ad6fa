"""The domain operator library: the reference's query surface as
pure functions over (products, supermarkets) DataFrames.

Any frame with the products schema works — mapping.products() (the
driver's synthetic tables) and fixtures.build_products() (the
salim-shaped corpus with Hebrew names) both flow through the same
code, which is exactly the parity claim: one implementation, two
data worlds, oracle-checked in both (tests/test_correctness.py and
tests/test_domain.py).

Semantics ledger (SURVEY.md §2):
  search_products     Q1-Q7 incl. the id-0 falsy quirk
  compare_offers      Q8/J1/J4/O2/A10 (savings NULL convention)
  cheapest_per_store  J2/W1 — rank()==1 KEEPS ties
  lowest_prices_page  O1 (limit*3) + A11/W3 (page-local max)
  price_history       Q12/W2/O5
  price_trend         A13 (newest-first half-split, ±5% bands)
  history_minmax      A14 + W2 latest row
  basket_store_totals A6/A7 prerequisite (argmin offer per
                      store×product, mcp.py savings-0 convention)
  store_stats         A2/A3/A5
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .functions.money import to_double


def effective() -> Column:
    """coalesce(promo_price, price) — F4, the system's load-bearing
    expression (products.py:84 et al.)."""
    return F.coalesce(F.col("promo_price"), F.col("price"))


def search_products(
    products: DataFrame,
    *,
    term: str | None = None,
    category: str | None = None,
    brand: str | None = None,
    promo: bool | None = None,
    min_price=None,
    max_price=None,
    supermarket_id: int | None = None,
    offset: int = 0,
    limit: int = 100,
) -> DataFrame:
    """GET /products (products.py:20-64): lazily-composed filter
    chain + deterministic pagination by product_id.

    Quirks preserved: promo tri-state (Q4); `if supermarket_id:` is
    falsy — id 0 (and None) mean "no filter" (Q6, products.py:61-62);
    limit/offset bounds are the caller's job as in FastAPI.
    """
    df = products
    if term is not None:
        df = df.where(F.lower(F.col("canonical_name")).contains(term.lower()))
    if category is not None:
        df = df.where(F.col("category") == category)
    if brand is not None:
        df = df.where(F.lower(F.col("brand")).contains(brand.lower()))
    if promo is True:
        df = df.where(F.col("promo_price").isNotNull())
    elif promo is False:
        df = df.where(F.col("promo_price").isNull())
    if min_price is not None:
        df = df.where(F.col("price") >= min_price)
    if max_price is not None:
        df = df.where(F.col("price") <= max_price)
    if supermarket_id:  # deliberate falsy check — the Q6 quirk
        df = df.where(F.col("supermarket_id") == supermarket_id)
    # Pagination compiles to TakeOrderedAndProject(offset+limit, offset):
    # a parallel partial top-k per partition, merged on the driver —
    # never a single-partition row_number window (which would funnel
    # every filtered row through one task at scale). Keyset pagination
    # (WHERE product_id > last_seen ORDER BY product_id LIMIT n) is the
    # O(page) production path; see operators/search.py docstring.
    return df.orderBy("product_id").offset(offset).limit(limit)


def compare_offers(
    products: DataFrame, supermarkets: DataFrame, barcode: str
) -> DataFrame:
    """All offers for one barcode across stores (products.py:162-226):
    broadcast dimension join, savings = price - promo (NULL when no
    promo — the products.py:214 convention)."""
    return (
        products.where(F.col("barcode") == barcode)
        .join(F.broadcast(supermarkets), "supermarket_id")
        .withColumn("effective_price", effective())
        .withColumn("savings", F.col("price") - F.col("promo_price"))
    )


def cheapest_per_store(products: DataFrame) -> DataFrame:
    """Per-store argmin KEEPING ties (W1): the reference's
    min-subquery join matches every row at the min price, so this is
    rank()==1, never row_number."""
    w = Window.partitionBy("supermarket_id").orderBy(effective())
    return (
        products.withColumn("_rk", F.rank().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def lowest_prices_page(products: DataFrame, limit: int = 20) -> DataFrame:
    """ORDER BY effective LIMIT limit*3, then savings%% against the
    max of the returned page (O1 + A11/W3, products.py:115-126).
    Output adds eff / savings_pct columns."""
    page = (
        products.withColumn("eff", effective())
        .orderBy("eff", "product_id")
        .limit(limit * 3)
    )
    maxc = F.max("eff").over(Window.partitionBy())
    return page.withColumn(
        "savings_pct",
        F.when(
            F.col("eff") < maxc,
            to_double(maxc - F.col("eff")) * 100 / to_double(maxc),
        ),
    )


def price_history(products: DataFrame, barcode: str, cutoff) -> DataFrame:
    """History for one barcode since cutoff (products.py:229-260)."""
    return products.where(
        (F.col("barcode") == barcode)
        & (F.col("collected_at") >= F.lit(cutoff).cast("timestamp"))
    ).withColumn("effective_price", effective())


def _history_frame(products: DataFrame) -> DataFrame:
    wo = Window.partitionBy("barcode").orderBy(
        F.col("collected_at").desc(), "product_id"
    )
    wc = Window.partitionBy("barcode")
    return (
        products.withColumn("eff", effective())
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
    )


def price_trend(products: DataFrame) -> DataFrame:
    """A13 (products.py:283-296): newest-first ordering, first
    len//2 rows = recent half; recent > older*1.05 → increasing,
    < older*0.95 → decreasing, else stable. Requires ≥2 points."""
    h = _history_frame(products)
    half = F.floor(F.col("cnt") / 2)
    recent_sum = F.sum(F.when(F.col("rn") <= half, F.col("eff")))
    recent_n = F.sum(F.when(F.col("rn") <= half, 1).otherwise(0))
    older_sum = F.sum(F.when(F.col("rn") > half, F.col("eff")))
    older_n = F.sum(F.when(F.col("rn") > half, 1).otherwise(0))
    agg = (
        h.groupBy("barcode")
        .agg(
            F.max("cnt").alias("points"),
            (to_double(recent_sum) / recent_n).alias("recent_avg"),
            (to_double(older_sum) / older_n).alias("older_avg"),
        )
        .where(F.col("points") >= 2)
    )
    return agg.withColumn(
        "trend",
        F.when(F.col("recent_avg") > F.col("older_avg") * 1.05, "increasing")
        .when(F.col("recent_avg") < F.col("older_avg") * 0.95, "decreasing")
        .otherwise("stable"),
    )


def history_minmax(products: DataFrame) -> DataFrame:
    """current / lowest / highest effective per barcode (A14)."""
    h = _history_frame(products)
    return h.groupBy("barcode").agg(
        to_double(F.max(F.when(F.col("rn") == 1, F.col("eff")))).alias("current_d"),
        to_double(F.min("eff")).alias("low_d"),
        to_double(F.max("eff")).alias("high_d"),
    )


def basket_store_totals(
    products: DataFrame, supermarkets: DataFrame, barcodes: list[str]
) -> DataFrame:
    """Per-store basket totals (A6): cheapest offer per
    store×product (argmin w/ product_id tie-break), then sums.
    Caller applies the complete-basket filter (A7:
    product_count == len(barcodes))."""
    offers = products.where(F.col("barcode").isin(*barcodes)).withColumn(
        "eff", effective()
    )
    w = Window.partitionBy("supermarket_id", "barcode").orderBy("eff", "product_id")
    best = offers.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        best.join(F.broadcast(supermarkets), "supermarket_id")
        .groupBy("supermarket_id", F.col("name").alias("supermarket_name"))
        .agg(
            F.sum("price").alias("total_price"),
            F.sum("eff").alias("total_effective"),
            F.sum(F.col("price") - F.col("eff")).alias("total_savings"),
            F.count(F.lit(1)).alias("product_count"),
        )
    )


def store_stats(products: DataFrame, supermarkets: DataFrame) -> DataFrame:
    """Per-store profile (A2/A3/A5, mcp.py:531-556)."""
    total = F.count(F.lit(1))
    promo = F.count("promo_price")
    return (
        products.join(F.broadcast(supermarkets), "supermarket_id")
        .groupBy("supermarket_id", F.col("name").alias("supermarket_name"))
        .agg(
            total.alias("product_count"),
            promo.alias("promo_count"),
            (promo.cast("double") * 100 / total).alias("sale_pct"),
            (to_double(F.sum("price")) / total).alias("avg_price_d"),
            F.countDistinct("category").alias("category_count"),
            F.array_join(F.array_sort(F.collect_set("category")), ",").alias(
                "categories"
            ),
        )
    )
