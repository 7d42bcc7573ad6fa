"""Property tests (SURVEY.md §5 tier 4) for the load-bearing
identities, via hypothesis-generated product frames checked against
plain-Python reference computations:

- effective_price = coalesce(promo, price) and promo ≤ price ⇒
  effective ≤ price;
- basket store total = Σ of per-product cheapest effective prices,
  complete-basket count invariant (A6/A7);
- pagination partitions the ordered result set (disjoint + covering,
  Q7);
- cheapest_per_store returns exactly the argmin set with ties (W1);
- salted aggregation ≡ direct aggregation (q49's identity).
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

SCHEMA = (
    "product_id long, supermarket_id int, barcode string, canonical_name string, "
    "brand string, category string, price decimal(12,2), promo_price decimal(12,2), "
    "collected_at timestamp"
)

prices = st.decimals(
    min_value=Decimal("0.01"), max_value=Decimal("500.00"), places=2
)


@st.composite
def product_rows(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        price = draw(prices)
        has_promo = draw(st.booleans())
        promo = (
            min(draw(prices), price) if has_promo else None
        )  # promo never exceeds price
        rows.append(
            (
                i + 1,
                draw(st.integers(min_value=1, max_value=3)),
                str(draw(st.integers(min_value=1, max_value=6))),
                f"product {i}",
                None,
                draw(st.sampled_from(["a", "b"])),
                price,
                promo,
                None,
            )
        )
    return rows


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@settings(max_examples=8, deadline=None)
@given(rows=product_rows())
def test_effective_price_identity(spark, rows):
    from data_pipeline_2025_spark.domain import effective

    df = _mkdf(spark, rows).withColumn("eff", effective())
    for r in df.collect():
        expect = r["promo_price"] if r["promo_price"] is not None else r["price"]
        assert r["eff"] == expect
        assert r["eff"] <= r["price"]


@settings(max_examples=6, deadline=None)
@given(rows=product_rows())
def test_cheapest_per_store_is_argmin_with_ties(spark, rows):
    from data_pipeline_2025_spark.domain import cheapest_per_store

    got = cheapest_per_store(_mkdf(spark, rows)).collect()
    # python reference: all rows at the per-store min effective
    eff = lambda r: r[7] if r[7] is not None else r[6]
    mins: dict[int, Decimal] = {}
    for r in rows:
        mins[r[1]] = min(mins.get(r[1], eff(r)), eff(r))
    expect = {(r[0]) for r in rows if eff(r) == mins[r[1]]}
    assert {r["product_id"] for r in got} == expect


@settings(max_examples=6, deadline=None)
@given(rows=product_rows(), offset=st.integers(0, 10), limit=st.integers(1, 10))
def test_pagination_partitions_order(spark, rows, offset, limit):
    from data_pipeline_2025_spark.domain import search_products

    df = _mkdf(spark, rows)
    page = search_products(df, offset=offset, limit=limit).collect()
    ordered = sorted(r[0] for r in rows)
    assert [r["product_id"] for r in page] == ordered[offset : offset + limit]


@settings(max_examples=6, deadline=None)
@given(rows=product_rows())
def test_basket_total_is_sum_of_cheapest(spark, rows):
    from data_pipeline_2025_spark.domain import basket_store_totals

    spark_df = _mkdf(spark, rows)
    dim = spark_df.sparkSession.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "supermarket_id int, name string"
    )
    barcodes = ["1", "2", "3"]
    got = {
        r["supermarket_id"]: r
        for r in basket_store_totals(spark_df, dim, barcodes).collect()
    }
    eff = lambda r: r[7] if r[7] is not None else r[6]
    by_store: dict[int, dict[str, Decimal]] = {}
    for r in rows:
        if r[2] not in barcodes:
            continue
        d = by_store.setdefault(r[1], {})
        d[r[2]] = min(d.get(r[2], eff(r)), eff(r))
    for sid, per_product in by_store.items():
        assert got[sid]["product_count"] == len(per_product)
        assert got[sid]["total_effective"] == sum(per_product.values())
    assert set(got) == set(by_store)


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["x", "y", "z"]), prices),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_direct(spark, vals):
    df = spark.createDataFrame(vals, "event_id long, event_type string, value decimal(12,2)")
    direct = {
        (r["event_type"]): (r["n"], r["s"])
        for r in df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = (
        df.withColumn("_salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "_salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps"))
        .groupBy("event_type")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
    )
    got = {(r["event_type"]): (r["n"], r["s"]) for r in salted.collect()}
    assert got == direct


@settings(max_examples=6, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "gg", "hhh", "iii"]),
        min_size=1,
        max_size=200,
    )
)
def test_cms_never_underestimates(spark, tokens):
    """Count-min property (q79's core): the sketch's point estimate
    is an UPPER bound of the true frequency for every token, on any
    corpus — one-sided error is what makes CMS usable for
    heavy-hitter screening."""
    from data_pipeline_2025_spark.operators.sketches import CMS_DEPTH, _cms_bucket

    tok = spark.createDataFrame([(t,) for t in tokens], "t string")
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), _cms_bucket(F.col("t"), r).alias("b"))
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    )
    sketch = {
        (row["r"], row["b"]): row["cnt"]
        for row in cells.groupBy("rb.r", "rb.b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    probes = tok.groupBy(F.col("t").alias("token")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    buckets = {
        row["token"]: (row["exact_n"], [row[f"b{r}"] for r in range(CMS_DEPTH)])
        for row in probes.select(
            "token",
            "exact_n",
            *[_cms_bucket(F.col("token"), r).alias(f"b{r}") for r in range(CMS_DEPTH)],
        ).collect()
    }
    for token, (exact, bs) in buckets.items():
        est = min(sketch[(r, b)] for r, b in enumerate(bs))
        assert est >= exact, token


def test_quantile_indices_monotone_and_bounded():
    """q80's integer ceil(p·n) index arithmetic: for every group size
    the three quantile indices are within [1, n] and ordered — the
    discrete-quantile contract, engine-independent."""
    from data_pipeline_2025_spark.operators.sketches import QUANTILES

    for n in range(1, 5000):
        idxs = [(num * n + den - 1) // den for num, den, _ in QUANTILES]
        assert all(1 <= i <= n for i in idxs), (n, idxs)
        assert idxs == sorted(idxs), (n, idxs)
