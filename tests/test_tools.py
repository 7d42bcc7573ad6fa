"""Shape + invariant tests for the 7 MCP-shaped tools (mcp.py result
contracts). Value-level correctness of the underlying operators is
covered by the oracle suite; here we assert the tool contracts:
shapes, orderings, limits, and cross-tool consistency."""

from __future__ import annotations

from data_pipeline_2025_spark import tools

BASKET = ["3", "7", "11", "19", "23"]


def test_search_product_limit_and_order(spark, sf_smoke):
    res = tools.search_product(spark, sf_smoke, "widget")
    assert 0 < len(res) <= tools.SEARCH_LIMIT
    effs = [
        r["promo_price"] if r["promo_price"] is not None else r["price"] for r in res
    ]
    assert effs == sorted(effs)
    assert {"product_id", "barcode", "canonical_name"} <= set(res[0])


def test_compare_results_contract(spark, sf_smoke):
    res = tools.compare_results(spark, sf_smoke, "50")
    assert res["found"] is True
    assert res["results"]
    assert res["best_price"] == res["results"][0]["effective_price"]
    assert res["cheapest_store"] == res["results"][0]["supermarket_name"]
    assert res["max_savings"] >= 0
    missing = tools.compare_results(spark, sf_smoke, "no-such-barcode")
    assert missing == {"found": False, "barcode": "no-such-barcode", "results": []}


def test_best_basket_and_savings_consistency(spark, sf_smoke):
    best = tools.find_best_basket(spark, sf_smoke, BASKET)
    assert best["requested_products"] == len(BASKET)
    for s in best["stores"]:
        assert s["product_count"] == len(BASKET)  # complete only (A7)
    if best["complete_baskets"] >= 2:
        sav = tools.calculate_savings(spark, sf_smoke, BASKET)
        assert sav["comparable"] is True
        assert sav["cheapest_store"] == best["best_store"]
        assert sav["savings_amount"] == best["max_potential_savings"]
        worst = tools.find_most_expensive_basket(spark, sf_smoke, BASKET)
        assert worst["stores"][0]["supermarket_name"] == sav["most_expensive_store"]


def test_mcp_schema_covers_every_tool():
    from data_pipeline_2025_spark import mcp

    assert set(mcp.TOOL_SCHEMAS) == set(tools.ALL_TOOLS)
    assert set(mcp.RESULT_SHAPES) == set(tools.ALL_TOOLS)
    for schema in mcp.list_tools():
        s = schema["inputSchema"]
        assert s["type"] == "object"
        assert set(s["required"]) <= set(s["properties"])


SAMPLE_ARGS = {
    "search_product": {"term": "widget"},
    "compare_results": {"barcode": "50"},
    "find_best_basket": {"barcodes": BASKET},
    "find_most_expensive_basket": {"barcodes": BASKET},
    "calculate_savings": {"barcodes": BASKET},
    "get_stores": {},
    "get_store_info": {"supermarket_id": 1},
}


def test_mcp_results_match_declared_shapes(spark, sf_smoke):
    """Every tool result, dispatched through the protocol layer, must
    match its declared result contract — keys ⊇ always, ⊆ always ∪
    conditional (list tools: element keys exactly as declared)."""
    from data_pipeline_2025_spark import mcp

    for name, args in SAMPLE_ARGS.items():
        res = mcp.execute_tool(spark, sf_smoke, name, args)
        shape = mcp.RESULT_SHAPES[name]
        if shape.get("list"):
            assert isinstance(res, list) and res, name
            for el in res:
                assert set(el) == shape["element"], (name, el)
        else:
            keys = set(res)
            assert shape["always"] <= keys, (name, keys)
            assert keys <= shape["always"] | shape["conditional"], (name, keys)


def test_mcp_validation_rejects_bad_calls(spark, sf_smoke):
    import pytest as _pytest

    from data_pipeline_2025_spark import mcp

    with _pytest.raises(KeyError):
        mcp.execute_tool(spark, sf_smoke, "no_such_tool", {})
    with _pytest.raises(mcp.ToolValidationError):
        mcp.execute_tool(spark, sf_smoke, "search_product", {})  # missing term
    with _pytest.raises(mcp.ToolValidationError):
        mcp.execute_tool(spark, sf_smoke, "search_product", {"term": 7})
    with _pytest.raises(mcp.ToolValidationError):
        mcp.execute_tool(spark, sf_smoke, "get_store_info", {"supermarket_id": "x"})
    with _pytest.raises(mcp.ToolValidationError):
        mcp.execute_tool(
            spark, sf_smoke, "find_best_basket", {"barcodes": [1, 2]}
        )
    with _pytest.raises(mcp.ToolValidationError):
        mcp.execute_tool(spark, sf_smoke, "get_stores", {"zipcode": "x"})


def test_get_stores_and_info(spark, sf_smoke):
    stores = tools.get_stores(spark, sf_smoke)
    assert stores
    names = [s["name"] for s in stores]
    assert names == sorted(names)
    filtered = tools.get_stores(spark, sf_smoke, city=stores[0]["city"][:3].lower())
    assert filtered
    info = tools.get_store_info(spark, sf_smoke, stores[0]["supermarket_id"])
    assert info["found"] is True
    assert info["product_count"] >= info["products_on_sale"] >= 0
    assert info["categories"] == sorted(info["categories"])
    assert tools.get_store_info(spark, sf_smoke, 10**9)["found"] is False
