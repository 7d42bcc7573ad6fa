"""The reference's LLM tool surface (SURVEY.md §2.10-§2.11) as
Python functions over DataFrames — the engine's "UDF registry".

Seven tools, mirroring salim/app/server/routes/mcp.py:58-142
(search_product, compare_results, find_best_basket, get_stores,
get_store_info) plus the two JS-layer tools
(simple-proxy.js:1243-1619: find_most_expensive_basket,
calculate_savings). Result dict shapes follow mcp.py:159-296.

Each tool composes the already-oracle-tested operators; collection
happens here (tools return JSON-able dicts, the reference's tool
contract), so every limit is applied BEFORE collect.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .functions.money import to_double
from .mapping import effective, products, supermarkets

SEARCH_LIMIT = 10  # mcp.py:155


def _offers(spark: SparkSession, sf_dir: str):
    cat = Catalog(spark, sf_dir)
    return products(cat), supermarkets(cat)


def search_product(spark: SparkSession, sf_dir: str, term: str) -> list[dict[str, Any]]:
    """Name search, top-10 by (effective price, product_id)."""
    prods, _ = _offers(spark, sf_dir)
    rows = (
        prods.where(F.lower(F.col("canonical_name")).contains(term.lower()))
        .orderBy(effective(), "product_id")
        .limit(SEARCH_LIMIT)
        .select(
            "product_id",
            "barcode",
            "canonical_name",
            "brand",
            "category",
            to_double(F.col("price")).alias("price"),
            to_double(F.col("promo_price")).alias("promo_price"),
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def compare_results(spark: SparkSession, sf_dir: str, barcode: str) -> dict[str, Any]:
    """Cross-store comparison for one barcode (mcp.py:197-296):
    offers sorted cheapest-first, best price + cheapest store,
    savings vs most expensive."""
    prods, dim = _offers(spark, sf_dir)
    offers = (
        prods.where(F.col("barcode") == barcode)
        .join(F.broadcast(dim), "supermarket_id")
        .select(
            "supermarket_id",
            F.col("name").alias("supermarket_name"),
            to_double(F.col("price")).alias("price"),
            to_double(F.col("promo_price")).alias("promo_price"),
            to_double(effective()).alias("effective_price"),
            "product_id",
        )
        .orderBy("effective_price", "product_id")
        .collect()
    )
    if not offers:
        return {"found": False, "barcode": barcode, "results": []}
    best = offers[0]
    worst = offers[-1]
    return {
        "found": True,
        "barcode": barcode,
        "results": [r.asDict() for r in offers],
        "best_price": best["effective_price"],
        "cheapest_store": best["supermarket_name"],
        # savings convention of mcp.py:280 — 0, not None (A10)
        "max_savings": round(worst["effective_price"] - best["effective_price"], 2),
    }


def resolve_basket_terms(
    spark: SparkSession, sf_dir: str, terms: list[str]
) -> tuple[list[str], list[str]]:
    """Resolve mixed barcode/name basket terms to barcodes.

    The reference's basket tool accepts product NAMES and resolves
    each one by re-running the product search (mcp.py:308-352); its
    "best match" rule — first hit whose name contains the term —
    always selects the ilike-search's top result, i.e. the cheapest
    matching offer. That is ``min_by((effective, product_id))`` per
    term, so the whole list resolves in ONE Spark job here instead
    of a search per term: explode each product row into the terms it
    matches, then a tiny groupBy on ≤|terms| keys.

    Returns (barcodes in term order, deduped; unresolved terms).
    All-digit terms are treated as already-barcodes (pass-through).
    """
    name_terms = sorted({t for t in terms if not t.isdigit()})
    resolved: dict[str, str] = {}
    if name_terms:
        prods, _ = _offers(spark, sf_dir)
        terms_arr = F.array(*[F.lit(t) for t in name_terms])
        hits = prods.select(
            "barcode",
            "product_id",
            effective().alias("_eff"),
            F.explode(
                F.filter(
                    terms_arr,
                    lambda t: F.lower(F.col("canonical_name")).contains(F.lower(t)),
                )
            ).alias("term"),
        )
        top = hits.groupBy("term").agg(
            F.min_by("barcode", F.struct("_eff", "product_id")).alias("barcode")
        )
        # Driver-side collect is bounded by |name_terms| rows (one
        # argmin per term — basket size caps it, same bound as the
        # reference's own per-term loop, mcp.py:379-419), never by
        # corpus size.
        resolved = {r["term"]: r["barcode"] for r in top.collect()}
    barcodes: list[str] = []
    unresolved: list[str] = []
    for t in terms:
        b = t if t.isdigit() else resolved.get(t)
        if b is None:
            unresolved.append(t)
        elif b not in barcodes:
            barcodes.append(b)
    return barcodes, unresolved


def _basket_totals(spark: SparkSession, sf_dir: str, barcodes: list[str]):
    from .domain import basket_store_totals

    prods, dim = _offers(spark, sf_dir)
    totals = basket_store_totals(prods, dim, barcodes)
    return totals.select(
        "supermarket_id",
        F.col("supermarket_name").alias("name"),
        to_double(F.round("total_price", 2)).alias("total_price"),
        to_double(F.round("total_effective", 2)).alias("total_promo_price"),
        to_double(F.round("total_savings", 2)).alias("total_savings"),
        "product_count",
    )


def find_best_basket(
    spark: SparkSession, sf_dir: str, barcodes: list[str]
) -> dict[str, Any]:
    """Cheapest complete basket (mcp.py:319-447): per-store totals,
    complete filter (A7), ascending rank, best/worst summary.
    Entries may be barcodes OR name terms — names are resolved the
    way the reference's tool resolves them (mcp.py:320-352)."""
    barcodes, unresolved = resolve_basket_terms(spark, sf_dir, barcodes)
    if not barcodes:
        return {
            "requested_products": 0,
            "complete_baskets": 0,
            "stores": [],
            "unresolved": unresolved,
        }
    totals = _basket_totals(spark, sf_dir, barcodes)
    complete = (
        totals.where(F.col("product_count") == len(barcodes))
        .orderBy("total_promo_price", "supermarket_id")
        .collect()
    )
    stores = [
        {
            "supermarket_id": r["supermarket_id"],
            "supermarket_name": r["name"],
            "total_price": r["total_price"],
            "total_promo_price": r["total_promo_price"],
            "total_savings": r["total_savings"],
            "product_count": r["product_count"],
        }
        for r in complete
    ]
    out: dict[str, Any] = {
        "requested_products": len(barcodes),
        "complete_baskets": len(stores),
        "stores": stores,
    }
    if unresolved:
        out["unresolved"] = unresolved
    if stores:
        best, worst = stores[0], stores[-1]
        out["best_store"] = best["supermarket_name"]
        out["best_total"] = best["total_promo_price"]
        out["max_potential_savings"] = round(
            worst["total_promo_price"] - best["total_promo_price"], 2
        )
    return out


def find_most_expensive_basket(
    spark: SparkSession, sf_dir: str, barcodes: list[str]
) -> dict[str, Any]:
    """The JS layer's descending variant (simple-proxy.js:1079-1110),
    top-5 slice (O3). Accepts barcodes or name terms."""
    barcodes, _ = resolve_basket_terms(spark, sf_dir, barcodes)
    if not barcodes:
        return {"stores": []}
    totals = _basket_totals(spark, sf_dir, barcodes)
    rows = (
        totals.where(F.col("product_count") == len(barcodes))
        .orderBy(F.col("total_promo_price").desc(), "supermarket_id")
        .limit(5)
        .collect()
    )
    return {
        "stores": [
            {
                "supermarket_name": r["name"],
                "total_promo_price": r["total_promo_price"],
                "product_count": r["product_count"],
            }
            for r in rows
        ]
    }


def calculate_savings(
    spark: SparkSession, sf_dir: str, barcodes: list[str]
) -> dict[str, Any]:
    """Cheapest vs most expensive complete basket: amount, pct
    (1-decimal string), recommendation (simple-proxy.js:625-703).
    Accepts barcodes or name terms."""
    barcodes, _ = resolve_basket_terms(spark, sf_dir, barcodes)
    if not barcodes:
        return {"comparable": False, "complete_baskets": 0}
    totals = _basket_totals(spark, sf_dir, barcodes)
    complete = (
        totals.where(F.col("product_count") == len(barcodes))
        .orderBy("total_promo_price", "supermarket_id")
        .collect()
    )
    if len(complete) < 2:
        return {"comparable": False, "complete_baskets": len(complete)}
    best, worst = complete[0], complete[-1]
    amount = round(worst["total_promo_price"] - best["total_promo_price"], 2)
    pct = amount * 100 / worst["total_promo_price"]
    return {
        "comparable": True,
        "cheapest_store": best["name"],
        "most_expensive_store": worst["name"],
        "savings_amount": amount,
        "savings_percent": f"{pct:.1f}",
        "price_range": f"{best['total_promo_price']} - {worst['total_promo_price']}",
        "recommendation": best["name"],
    }


def get_stores(
    spark: SparkSession, sf_dir: str, city: str | None = None, name: str | None = None
) -> list[dict[str, Any]]:
    """Store directory with optional ILIKE filters (mcp.py:475-483)."""
    _, dim = _offers(spark, sf_dir)
    if city:
        dim = dim.where(F.lower(F.col("city")).contains(city.lower()))
    if name:
        dim = dim.where(F.lower(F.col("name")).contains(name.lower()))
    return [
        r.asDict()
        for r in dim.orderBy("name", "supermarket_id").collect()
    ]


def get_store_info(
    spark: SparkSession, sf_dir: str, supermarket_id: int
) -> dict[str, Any]:
    """Per-store profile (mcp.py:531-556): counts, promo share,
    category roster."""
    prods, dim = _offers(spark, sf_dir)
    store = dim.where(F.col("supermarket_id") == supermarket_id).collect()
    if not store:
        return {"found": False, "supermarket_id": supermarket_id}
    stats = (
        prods.where(F.col("supermarket_id") == supermarket_id)
        .agg(
            F.count(F.lit(1)).alias("product_count"),
            F.count("promo_price").alias("promo_count"),
            F.array_join(F.array_sort(F.collect_set("category")), ",").alias(
                "categories"
            ),
        )
        .collect()[0]
    )
    pct = (
        stats["promo_count"] * 100 / stats["product_count"]
        if stats["product_count"]
        else 0.0
    )
    return {
        "found": True,
        **store[0].asDict(),
        "product_count": stats["product_count"],
        "products_on_sale": stats["promo_count"],
        "sale_percentage": round(pct, 1),
        "categories": stats["categories"].split(",") if stats["categories"] else [],
    }


ALL_TOOLS = {
    "search_product": search_product,
    "compare_results": compare_results,
    "find_best_basket": find_best_basket,
    "find_most_expensive_basket": find_most_expensive_basket,
    "calculate_savings": calculate_savings,
    "get_stores": get_stores,
    "get_store_info": get_store_info,
}
