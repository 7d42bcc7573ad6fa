"""End-to-end REST parity tests: real HTTP round trips against the
stdlib server over sf0.001 — the engine's analog of hitting the
reference's FastAPI routes."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from data_pipeline_2025_spark.server import serve_background


@pytest.fixture(scope="module")
def base_url(spark, sf_smoke):
    srv, _ = serve_background(spark, sf_smoke)
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _post(url: str, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _status_of(err_url: str, payload=None):
    try:
        if payload is None:
            _get(err_url)
        else:
            _post(err_url, payload)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


def test_health(base_url):
    assert _get(f"{base_url}/health")[1] == {
        "status": "healthy",
        "service": "salim-api",
    }
    assert "Salim API" in _get(f"{base_url}/")[1]["message"]
    mcp_h = _get(f"{base_url}/api/mcp/health")[1]
    assert mcp_h["status"] == "healthy" and mcp_h["mcpConnected"] is True
    assert mcp_h["server"]["tools_count"] == len(mcp_h["server"]["capabilities"])


def test_products_filters_and_pagination(base_url):
    status, page = _get(
        f"{base_url}/products?q=widget&min_price=1000&limit=5&offset=2"
    )
    assert status == 200 and len(page) <= 5
    for p in page:
        assert "widget" in p["canonical_name"].lower()
        assert p["price"] >= 1000
    # offset shifts the window deterministically
    _, page0 = _get(f"{base_url}/products?q=widget&min_price=1000&limit=7")
    assert [p["product_id"] for p in page] == [
        p["product_id"] for p in page0[2:7]
    ]


def test_products_validation_422(base_url):
    assert _status_of(f"{base_url}/products?limit=0")[0] == 422
    assert _status_of(f"{base_url}/products?limit=1001")[0] == 422
    assert _status_of(f"{base_url}/products?offset=-1")[0] == 422
    assert _status_of(f"{base_url}/products?min_price=abc")[0] == 422


def test_barcode_compare_and_404(base_url):
    _, offers = _get(f"{base_url}/products/barcode/50")
    assert offers
    effs = [o["effective_price"] for o in offers]
    assert effs == sorted(effs)
    assert {"supermarket_name", "savings"} <= set(offers[0])
    assert _status_of(f"{base_url}/products/barcode/nope")[0] == 404


def test_history_trend_shape(base_url):
    _, hist = _get(f"{base_url}/products/barcode/50/history?days=365")
    assert hist["barcode"] == "50"
    # the reference's literal path (products.py:228) serves the same payload
    _, hist_ref = _get(f"{base_url}/products/price-history/50?days=365")
    assert hist_ref == hist
    assert hist["price_history"]
    assert hist["trend"] in ("increasing", "decreasing", "stable")
    assert hist["lowest_price"] <= hist["highest_price"]
    times = [e["collected_at"] for e in hist["price_history"]]
    assert times == sorted(times, reverse=True)
    assert _status_of(f"{base_url}/products/barcode/50/history?days=9999")[0] == 422


def test_lowest_prices_page(base_url):
    _, rows = _get(f"{base_url}/products/lowest-prices?limit=4")
    assert 0 < len(rows) <= 12  # limit*3 — O1's deliberate quirk
    effs = [r["eff"] for r in rows]
    assert effs == sorted(effs)


def test_product_by_id_and_404(base_url):
    """GET /products/{product_id} (products.py:148-160): single-row
    fetch by the engine's surrogate key, 404 on miss — and the
    literal sibling routes must still win over the id pattern."""
    _, page = _get(f"{base_url}/products?limit=1")
    pid = page[0]["product_id"]
    status, one = _get(f"{base_url}/products/{pid}")
    assert status == 200 and one["product_id"] == pid
    assert one == page[0]  # same row, same serialization
    assert _status_of(f"{base_url}/products/definitely-not-a-key")[0] == 404
    # literal segment still routes to the page handler, not the id fetch
    status, rows = _get(f"{base_url}/products/lowest-prices?limit=2")
    assert status == 200 and isinstance(rows, list)


def test_supermarket_by_id_and_404(base_url):
    """GET /supermarkets/{supermarket_id} (supermarkets.py:24-35)."""
    _, stores = _get(f"{base_url}/supermarkets")
    sid = stores[0]["supermarket_id"]
    status, one = _get(f"{base_url}/supermarkets/{sid}")
    assert status == 200 and one["supermarket_id"] == sid
    assert one == stores[0]
    assert _status_of(f"{base_url}/supermarkets/999999999")[0] == 404


def test_mcp_server_info(base_url):
    """GET /api/mcp/server/info (mcp.py:580-583)."""
    status, payload = _get(f"{base_url}/api/mcp/server/info")
    assert status == 200
    info = payload["server"]
    assert info["tools_count"] == len(info["capabilities"])
    assert "search_product" in info["capabilities"]
    assert info["protocol_version"] == "2024-11-05"
    # the tools listing and the info block agree on the tool set
    _, listing = _get(f"{base_url}/api/mcp/tools")
    assert sorted(t["name"] for t in listing["tools"]) == info["capabilities"]


def test_supermarkets_and_scoped_products(base_url):
    _, stores = _get(f"{base_url}/supermarkets")
    assert stores
    names = [s["name"] for s in stores]
    assert names == sorted(names)
    sid = stores[0]["supermarket_id"]
    _, prods = _get(f"{base_url}/supermarkets/{sid}/products?limit=5")
    assert prods and all(p["supermarket_id"] == sid for p in prods)


def test_catalog_endpoints(base_url):
    _, cats = _get(f"{base_url}/categories")
    assert cats == sorted(cats) and cats
    _, brands = _get(f"{base_url}/brands")
    assert brands == sorted(brands) and brands
    _, stats = _get(f"{base_url}/stats")
    assert stats["total_products"] >= stats["products_on_sale"]
    assert 0 <= stats["sale_percentage"] <= 100


def test_mcp_over_http(base_url):
    _, listing = _get(f"{base_url}/api/mcp/tools")
    assert {t["name"] for t in listing["tools"]} >= {
        "search_product",
        "find_best_basket",
    }
    _, res = _post(
        f"{base_url}/api/mcp/tools/search_product", {"arguments": {"term": "widget"}}
    )
    assert res["tool"] == "search_product" and res["result"]
    assert _status_of(f"{base_url}/api/mcp/tools/nope", {"arguments": {}})[0] == 404
    code, detail = _status_of(
        f"{base_url}/api/mcp/tools/search_product", {"arguments": {}}
    )
    assert code == 422 and "term" in detail["detail"]
