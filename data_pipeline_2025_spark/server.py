"""HTTP/REST parity shim — the reference's FastAPI surface served by
the engine (salim/app/server/main.py:68-76 root + routers). Every
@router route in the reference's four route files (products.py,
supermarkets.py, utils.py, mcp.py) has a matching entry in the route
table below, including the single-row fetches (/products/{id},
/supermarkets/{id}), /products/price-history/{barcode}, and the MCP
metadata/health endpoints.

FastAPI is not installed in this container, so the server is plain
stdlib (ThreadingHTTPServer + a regex route table): zero
dependencies, actually serves requests, and the handler functions
are plain (spark, sf_dir, params) callables any ASGI framework can
mount 1:1 if present. Parameter validation mirrors the reference's
FastAPI Query constraints (limit ∈ [1,1000] default 100, offset ≥ 0,
days ∈ [1,365] default 30 — products.py:22-31,239) including the
422 status FastAPI returns on violations, and 404 for an unknown
barcode (products.py:190-192).
"""

from __future__ import annotations

import datetime as _dt
import json
import re
import threading
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import domain, mcp
from .catalog import Catalog
from .mapping import products, supermarkets


class HttpError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _jsonable(v: Any) -> Any:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _rows(df) -> list[dict[str, Any]]:
    return [_jsonable(r.asDict()) for r in df.collect()]


def _int_param(params, name, default, lo=None, hi=None):
    raw = params.get(name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        raise HttpError(422, f"{name} must be an integer")
    if (lo is not None and val < lo) or (hi is not None and val > hi):
        raise HttpError(422, f"{name} out of range")
    return val


def _float_param(params, name):
    raw = params.get(name)
    if raw is None:
        return None
    try:
        return float(raw)
    except ValueError:
        raise HttpError(422, f"{name} must be a number")


def _bool_param(params, name):
    raw = params.get(name)
    if raw is None:
        return None
    if raw.lower() in ("true", "1"):
        return True
    if raw.lower() in ("false", "0"):
        return False
    raise HttpError(422, f"{name} must be a boolean")


# ------------------------------------------------------------ handlers

_PRODUCT_COLS = [
    "product_id",
    "supermarket_id",
    "barcode",
    "canonical_name",
    "brand",
    "category",
    "price",
    "promo_price",
    "collected_at",
]


def get_products(spark: SparkSession, sf_dir: str, params: dict) -> list[dict]:
    """GET /products (products.py:20-64)."""
    prods = products(Catalog(spark, sf_dir))
    page = domain.search_products(
        prods,
        term=params.get("q") or params.get("name"),
        category=params.get("category"),
        brand=params.get("brand"),
        promo=_bool_param(params, "on_promotion"),
        min_price=_float_param(params, "min_price"),
        max_price=_float_param(params, "max_price"),
        supermarket_id=_int_param(params, "supermarket_id", None),
        offset=_int_param(params, "offset", 0, lo=0),
        limit=_int_param(params, "limit", 100, lo=1, hi=1000),
    )
    return _rows(page.select(*_PRODUCT_COLS))


def get_barcode(spark: SparkSession, sf_dir: str, barcode: str) -> list[dict]:
    """GET /products/barcode/{barcode} (products.py:174-226): offers
    across stores sorted cheapest-first; 404 when unknown."""
    cat = Catalog(spark, sf_dir)
    offers = domain.compare_offers(products(cat), supermarkets(cat), barcode)
    out = _rows(
        offers.select(
            *_PRODUCT_COLS,
            F.col("name").alias("supermarket_name"),
            "effective_price",
            "savings",
        ).orderBy("effective_price", "product_id")
    )
    if not out:
        raise HttpError(404, f"no products with barcode {barcode}")
    return out


def get_product(spark: SparkSession, sf_dir: str, product_id: str) -> dict:
    """GET /products/{product_id} (products.py:148-160): fetch one
    row by primary key, 404 when absent. The reference key is a
    serial int; ours is the md5 surrogate the mapping layer derives
    (mapping.py:19), so the path segment is the hash string — same
    contract (exact-match single fetch), engine-native key."""
    row = (
        products(Catalog(spark, sf_dir))
        .where(F.col("product_id") == product_id)
        .limit(1)
        .select(*_PRODUCT_COLS)
        .collect()
    )
    if not row:
        raise HttpError(404, "Product not found")
    return _jsonable(row[0].asDict())


def get_supermarket(spark: SparkSession, sf_dir: str, supermarket_id: int) -> dict:
    """GET /supermarkets/{supermarket_id} (supermarkets.py:24-35):
    one dim row by id, 404 when absent."""
    row = (
        supermarkets(Catalog(spark, sf_dir))
        .where(F.col("supermarket_id") == supermarket_id)
        .limit(1)
        .collect()
    )
    if not row:
        raise HttpError(404, "Supermarket not found")
    return _jsonable(row[0].asDict())


def get_history(
    spark: SparkSession, sf_dir: str, barcode: str, params: dict
) -> dict:
    """GET /products/barcode/{barcode}/history (products.py:229-296):
    history window + trend + low/high. Anchored at the data's max
    collected_at (the reference anchors at now(); a data anchor keeps
    the response deterministic)."""
    days = _int_param(params, "days", 30, lo=1, hi=365)
    cat = Catalog(spark, sf_dir)
    prods = products(cat).where(F.col("barcode") == barcode)
    anchor_row = prods.agg(F.max("collected_at").alias("m")).collect()[0]
    if anchor_row["m"] is None:
        raise HttpError(404, f"no products with barcode {barcode}")
    cutoff = anchor_row["m"] - _dt.timedelta(days=days)
    hist = domain.price_history(prods, barcode, cutoff)
    entries = _rows(
        hist.select("product_id", "price", "promo_price", "effective_price", "collected_at")
        .orderBy(F.col("collected_at").desc(), "product_id")
    )
    trend = domain.price_trend(hist).collect()
    minmax = domain.history_minmax(hist).collect()
    return {
        "barcode": barcode,
        "days": days,
        "price_history": entries,
        "trend": trend[0]["trend"] if trend else "stable",
        "lowest_price": minmax[0]["low_d"] if minmax else None,
        "highest_price": minmax[0]["high_d"] if minmax else None,
    }


def get_lowest_prices(spark: SparkSession, sf_dir: str, params: dict) -> list[dict]:
    """GET /products/lowest-prices (products.py:82-143)."""
    limit = _int_param(params, "limit", 20, lo=1, hi=1000)
    cat = Catalog(spark, sf_dir)
    page = domain.lowest_prices_page(products(cat), limit=limit)
    return _rows(page.select(*_PRODUCT_COLS, "eff", "savings_pct"))


def get_supermarkets(spark: SparkSession, sf_dir: str, params: dict) -> list[dict]:
    """GET /supermarkets (+ city/name filters, mcp.py:475-483)."""
    dim = supermarkets(Catalog(spark, sf_dir))
    if params.get("city"):
        dim = dim.where(F.lower(F.col("city")).contains(params["city"].lower()))
    if params.get("name"):
        dim = dim.where(F.lower(F.col("name")).contains(params["name"].lower()))
    return _rows(dim.orderBy("name", "supermarket_id"))


def get_supermarket_products(
    spark: SparkSession, sf_dir: str, supermarket_id: int, params: dict
) -> list[dict]:
    """GET /supermarkets/{id}/products (supermarkets.py:38-58)."""
    prods = products(Catalog(spark, sf_dir)).where(
        F.col("supermarket_id") == supermarket_id
    )
    if params.get("category"):
        prods = prods.where(F.col("category") == params["category"])
    if params.get("q"):
        prods = prods.where(
            F.lower(F.col("canonical_name")).contains(params["q"].lower())
        )
    limit = _int_param(params, "limit", 100, lo=1, hi=1000)
    return _rows(
        prods.orderBy("product_id").limit(limit).select(*_PRODUCT_COLS)
    )


def get_categories(spark: SparkSession, sf_dir: str) -> list[str]:
    """GET /categories (utils.py:17-18): sorted distinct, nulls out."""
    df = products(Catalog(spark, sf_dir))
    return [
        r["category"]
        for r in df.select("category").dropna().distinct().orderBy("category").collect()
    ]


def get_brands(spark: SparkSession, sf_dir: str) -> list[str]:
    """GET /brands (utils.py:28-29)."""
    df = products(Catalog(spark, sf_dir))
    return [
        r["brand"]
        for r in df.select("brand").dropna().distinct().orderBy("brand").collect()
    ]


def get_stats(spark: SparkSession, sf_dir: str) -> dict:
    """GET /stats (utils.py:40-50): counts, on-sale share, avg price
    (percentages as Python-float math — A3)."""
    cat = Catalog(spark, sf_dir)
    row = (
        products(cat)
        .agg(
            F.count(F.lit(1)).alias("total_products"),
            F.countDistinct("supermarket_id").alias("total_supermarkets"),
            F.count("promo_price").alias("products_on_sale"),
            F.avg(F.col("price").cast("double")).alias("avg_price"),
        )
        .collect()[0]
    )
    total = row["total_products"]
    on_sale = row["products_on_sale"]
    return {
        "total_products": total,
        "total_supermarkets": row["total_supermarkets"],
        "products_on_sale": on_sale,
        "sale_percentage": round(on_sale * 100 / total, 1) if total else 0.0,
        "average_price": round(row["avg_price"], 2) if row["avg_price"] else None,
    }


# ------------------------------------------------------------- routing

_ROUTES: list[tuple[str, re.Pattern[str], Any]] = []


def _route(method: str, pattern: str):
    def deco(fn):
        _ROUTES.append((method, re.compile(f"^{pattern}$"), fn))
        return fn

    return deco


@_route("GET", r"/")
def _root(ctx, m, params, body):
    # main.py:68-70 welcome banner
    return {"message": "Welcome to Salim API - Israeli Supermarket Price Comparison"}


@_route("GET", r"/health")
def _health(ctx, m, params, body):
    # utils.py:56-59
    return {"status": "healthy", "service": "salim-api"}


@_route("GET", r"/products")
def _products(ctx, m, params, body):
    return get_products(ctx["spark"], ctx["sf_dir"], params)


@_route("GET", r"/products/lowest-prices")
def _lowest(ctx, m, params, body):
    return get_lowest_prices(ctx["spark"], ctx["sf_dir"], params)


@_route("GET", r"/products/price-history/(?P<barcode>[^/]+)")
def _price_history(ctx, m, params, body):
    # the reference's literal path (products.py:228)
    return get_history(ctx["spark"], ctx["sf_dir"], m["barcode"], params)


@_route("GET", r"/products/barcode/(?P<barcode>[^/]+)/history")
def _history(ctx, m, params, body):
    # engine-native alias of /products/price-history/{barcode}
    return get_history(ctx["spark"], ctx["sf_dir"], m["barcode"], params)


@_route("GET", r"/products/barcode/(?P<barcode>[^/]+)")
def _barcode(ctx, m, params, body):
    return get_barcode(ctx["spark"], ctx["sf_dir"], m["barcode"])


@_route("GET", r"/products/(?P<pid>[^/]+)")
def _product(ctx, m, params, body):
    # registered AFTER /products/lowest-prices and the barcode routes
    # so the literal segments win, as FastAPI's router resolves them
    return get_product(ctx["spark"], ctx["sf_dir"], m["pid"])


@_route("GET", r"/supermarkets")
def _supermarkets(ctx, m, params, body):
    return get_supermarkets(ctx["spark"], ctx["sf_dir"], params)


@_route("GET", r"/supermarkets/(?P<sid>\d+)")
def _supermarket(ctx, m, params, body):
    return get_supermarket(ctx["spark"], ctx["sf_dir"], int(m["sid"]))


@_route("GET", r"/supermarkets/(?P<sid>\d+)/products")
def _super_products(ctx, m, params, body):
    return get_supermarket_products(
        ctx["spark"], ctx["sf_dir"], int(m["sid"]), params
    )


@_route("GET", r"/categories")
def _categories(ctx, m, params, body):
    return get_categories(ctx["spark"], ctx["sf_dir"])


@_route("GET", r"/brands")
def _brands(ctx, m, params, body):
    return get_brands(ctx["spark"], ctx["sf_dir"])


@_route("GET", r"/stats")
def _stats(ctx, m, params, body):
    return get_stats(ctx["spark"], ctx["sf_dir"])


@_route("GET", r"/api/mcp/health")
def _mcp_health(ctx, m, params, body):
    # mcp.py:637-643
    return {"status": "healthy", "mcpConnected": True, "server": mcp.server_info()}


@_route("GET", r"/api/mcp/server/info")
def _mcp_info(ctx, m, params, body):
    return {"server": mcp.server_info()}


@_route("GET", r"/api/mcp/tools")
def _mcp_list(ctx, m, params, body):
    return {"tools": mcp.list_tools()}


@_route("POST", r"/api/mcp/tools/(?P<name>[^/]+)")
def _mcp_exec(ctx, m, params, body):
    name = m["name"]
    try:
        result = mcp.execute_tool(
            ctx["spark"], ctx["sf_dir"], name, (body or {}).get("arguments", {})
        )
    except KeyError:
        raise HttpError(404, f"unknown tool {name}")
    except mcp.ToolValidationError as exc:
        raise HttpError(422, str(exc))
    return {"tool": name, "result": _jsonable(result)}


def _dispatch(ctx, method, path, params, body):
    for m, pattern, fn in _ROUTES:
        match = pattern.match(path)
        if match and m == method:
            return fn(ctx, match.groupdict(), params, body)
    raise HttpError(404, f"no route for {method} {path}")


def create_server(
    spark: SparkSession, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 = ephemeral.
    Call .serve_forever() in a thread; .server_address[1] is the
    bound port."""
    ctx = {"spark": spark, "sf_dir": sf_dir}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test output
            pass

        def _respond(self, status: int, payload: Any) -> None:
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _handle(self, method: str) -> None:
            parsed = urlparse(self.path)
            params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
            body = None
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                try:
                    body = json.loads(self.rfile.read(length))
                except json.JSONDecodeError:
                    self._respond(422, {"detail": "invalid JSON body"})
                    return
            try:
                result = _dispatch(ctx, method, parsed.path.rstrip("/") or "/", params, body)
            except HttpError as exc:
                self._respond(exc.status, {"detail": exc.detail})
            except Exception as exc:  # parity with FastAPI's 500
                self._respond(500, {"detail": f"{type(exc).__name__}: {exc}"})
            else:
                self._respond(200, result)

        def do_GET(self):
            self._handle("GET")

        def do_POST(self):
            self._handle("POST")

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(
    spark: SparkSession, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    srv = create_server(spark, sf_dir, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
