"""Degenerate-input robustness for the corpus-facing operator
families: empty corpus, single document, empty embedding set.

The oracle sweep proves correctness on the generated testdata; these
prove the same plans don't crash (divide-by-zero, empty aggregates,
None convergence sums, explode-of-empty) when a partition or an
entire input is empty — which at 100 TB is not an edge case, it's a
Tuesday (an empty ingest hour, a filtered-out shard).
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from data_pipeline_2025_spark import registry

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

DOC_QUERIES = (
    "q30_text_quality",
    "q31_lang_id_matrix",
    "q32_token_counts",
    "q33_doc_fingerprint",
    "q34_dedup_exact",
    "q35_ngram_jaccard_pairs",
    "q36_minhash_lsh_dedup",
    "q37_simhash",
    "q38_simhash_neardup",
    "q61_dedup_pipeline",
    "q68_vocab_coverage",
    "q69_duplicated_span_ratio",
    "q70_neardup_components",
    "q71_tfidf_keywords",
    "q86_context_chunks",
    "q87_sequence_packing",
    "q88_filter_funnel",
    "q92_stratified_sample",
    "q95_sampled_quantile_error",
    "q96_temperature_mixture",
    "q115_shingle_containment",
    "q118_token_gini",  # all-empty-text source: 0-token sum -> NULL gini (div 0), must not raise
    "q119_minhash_accuracy",
    "q121_threshold_sweep",
    "q124_corpus_pipeline",
    "q125_bm25_topk",
    "q129_skipgram_cooccurrence",
    "q130_dataset_card",
    "q123_token_lorenz_curve",
)

EMB_QUERIES = (
    "q40_ann_bruteforce",
    "q41_ivf_assign",
    "q42_ivf_cluster_stats",
    "q43_embedding_neardup",
    "q44_rp_lsh_buckets",
    "q72_ann_recall",
    "q114_pq_quantization",  # empty codebook row (collect_list over zero vecs) must not raise
)


def _write_sf(spark, path: str, docs: list, embs: list) -> str:
    spark.createDataFrame(docs, DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    spark.createDataFrame(embs, EMB_SCHEMA).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet"
    )
    return path


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory) -> str:
    return _write_sf(spark, str(tmp_path_factory.mktemp("sf_empty")), [], [])


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory) -> str:
    docs = [
        (0, "alpha beta gamma delta", "en", "src0", 22),
        (1, "x", "en", "src0", 1),  # below every n-gram window
        (2, "", "en", "src1", 0),  # empty text
    ]
    embs = [
        (0, [1.0] * 64, 0),
        (1, [0.5] * 64, 1),
    ]
    return _write_sf(spark, str(tmp_path_factory.mktemp("sf_tiny")), docs, embs)


SPECS = registry.load_all()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_queries_survive_empty_corpus(spark, empty_sf, name):
    rows = SPECS[name].spark_fn(spark, empty_sf).collect()
    if name == "q61_dedup_pipeline":
        # global-summary query: one row of zero counts (NULL char
        # sum — SUM over zero rows is NULL in both engines)
        assert len(rows) == 1
        assert rows[0]["input_docs"] == 0
    elif name == "q124_corpus_pipeline":
        # stage-funnel report: 6 rows of zero/NULL docs (COUNT over
        # zero rows is 0, SUM over zero rows is NULL in both engines)
        assert len(rows) == 6
        assert all((r["docs"] or 0) == 0 for r in rows)
    elif name == "q88_filter_funnel":
        # report query: one row per rule with zero/NULL counters
        # (SUM over zero rows is NULL in both engines)
        assert len(rows) == 6
        assert {r["rule"] for r in rows} >= {"0_total"}
    else:
        assert rows == []


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_queries_survive_tiny_corpus(spark, tiny_sf, name):
    # Must not raise; pair/near-dup queries legitimately return [].
    SPECS[name].spark_fn(spark, tiny_sf).collect()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_emb_queries_survive_empty_corpus(spark, empty_sf, name):
    rows = SPECS[name].spark_fn(spark, empty_sf).collect()
    assert rows == []


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_emb_queries_survive_tiny_corpus(spark, tiny_sf, name):
    SPECS[name].spark_fn(spark, tiny_sf).collect()


def test_cc_singletons_when_no_edges(spark, tiny_sf):
    """q70 on a corpus with no near-dup pairs: every doc is its own
    canonical singleton component."""
    rows = {
        r["doc_id"]: r
        for r in SPECS["q70_neardup_components"].spark_fn(spark, tiny_sf).collect()
    }
    assert set(rows) == {0, 1, 2}
    for doc_id, r in rows.items():
        assert r["component"] == doc_id
        assert r["cluster_size"] == 1
        assert r["is_canonical"] is True


def test_hot_shingle_cap_on_boilerplate_corpus(spark, tmp_path_factory):
    """Adversarial skew: 150 documents sharing one boilerplate
    sentence (df > SHINGLE_DF_CAP) with otherwise-disjoint content.
    The capped Jaccard must (a) drop the hot shingles from pair
    generation — so no pair survives on boilerplate alone — and
    (b) still agree exactly with the DF-capped oracle SQL on this
    corpus, proving the cap is mirrored, not approximated."""
    import duckdb

    from tests.oracle import _canon_rows

    boiler = "terms and conditions apply to this listing"
    docs = [
        (
            i,
            f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e",
            "en",
            f"src{i % 3}",
            80,
        )
        for i in range(150)
    ]
    sf = str(tmp_path_factory.mktemp("sf_boiler"))
    spark.createDataFrame(docs, DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )

    spec = SPECS["q35_ngram_jaccard_pairs"]
    sdf = spec.spark_fn(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    assert srows == []  # boilerplate alone must not create pairs

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert _canon_rows(sdf.columns, srows) == _canon_rows(ocols, orows)

    # LSH path on the same corpus: candidates may form (shared
    # signatures), but verification must reject them all — capped or
    # not, these docs are < 0.8 Jaccard.
    assert SPECS["q36_minhash_lsh_dedup"].spark_fn(spark, sf).count() == 0


def test_chunking_oracle_at_stride_boundaries(spark, tmp_path_factory):
    """q86/q87 hash-match their oracles on documents whose token
    counts sit exactly on the stride/window/ctx boundaries (1, 31,
    32, 33, 64, 65 tokens) — where off-by-one slicing or floor-div
    bugs would live."""
    import duckdb

    from tests.oracle import _canon_rows, run_spark

    path = str(tmp_path_factory.mktemp("sf_boundary"))
    docs = []
    for i, n in enumerate((1, 31, 32, 33, 64, 65)):
        text = " ".join(f"t{j}" for j in range(n))
        docs.append((i, text, "en", f"src{i % 2}", len(text)))
    _write_sf(spark, path, docs, [])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    for name in ("q86_context_chunks", "q87_sequence_packing"):
        s_cols, s_rows = run_spark(SPECS[name], spark, path)
        cur = con.execute(SPECS[name].oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
        assert _canon_rows(s_cols, s_rows) == _canon_rows(o_cols, o_rows), name


def test_snm_bucket_parallel_matches_sequential(spark):
    """q164's bucket-parallel SNM (snm_candidate_pairs) must emit the
    pair set of the sequential spec — one global sort by (skey,
    doc_id), each row paired with its SNM_WINDOW-1 successors — on
    key distributions that stress the chain replication: empty
    middle buckets, sparse (1-row) buckets, and the skewed
    pile-into-bucket-0 shape the 1-hash MinHash key actually has.
    The round-5 advisor found the previous replicate-one-bucket-back
    scheme silently dropped pairs whenever a following bucket held
    fewer than W-1 rows."""
    import random

    from data_pipeline_2025_spark.operators.dedup import (
        _SNM_BUCKET_DIV,
        SNM_BUCKETS,
        SNM_WINDOW,
        snm_candidate_pairs,
    )

    rng = random.Random(42)
    top = _SNM_BUCKET_DIV * SNM_BUCKETS - 1

    def sequential(keys):
        srt = sorted((skey, doc) for doc, skey in keys)
        pairs = set()
        for i, (_, d) in enumerate(srt):
            for _, e in srt[i + 1 : i + SNM_WINDOW]:
                pairs.add((min(d, e), max(d, e)))
        return pairs

    scenarios = {
        # heavy pile in bucket 0, one straggler at the very top,
        # every bucket in between empty
        "empty_middle": [(i, i * 7) for i in range(20)] + [(99, top)],
        # exactly one row per alternate bucket: every following
        # bucket is sparser than W-1
        "one_per_alternate_bucket": [
            (i, 2 * i * _SNM_BUCKET_DIV + 5) for i in range(SNM_BUCKETS // 2)
        ],
        # skewed: 80% of keys in the bottom 1/16 of the range,
        # duplicates included (ties share a bucket)
        "skewed_random": [
            (
                i,
                rng.randrange(_SNM_BUCKET_DIV)
                if rng.random() < 0.8
                else rng.randrange(top),
            )
            for i in range(60)
        ]
        + [(1000, 123), (1001, 123), (1002, 123)],
        # fewer rows than the window size
        "tiny": [(0, 5), (1, top)],
        "singleton": [(0, 42)],
    }
    from pyspark.sql import functions as F

    for name, keys in scenarios.items():
        df = spark.createDataFrame(keys, "doc_id BIGINT, skey BIGINT").select(
            "doc_id", "skey", F.expr(f"skey div {_SNM_BUCKET_DIV}").alias("bucket")
        )
        got = {
            (r["doc_a"], r["doc_b"]) for r in snm_candidate_pairs(df).collect()
        }
        assert got == sequential(keys), name


def test_length_bucketing_overflow_doc(spark, tmp_path_factory):
    """q151 with a document LONGER than the top bucket edge (1024):
    the overflow row pads to its own length (greatest(bucket, n)),
    so padded_tokens >= sum_tokens and waste_ppm >= 0 — and both
    engines hash-match. The old docs*bucket numerator went negative
    here, where DuckDB // floors but Spark div truncates: a
    cross-engine mismatch on the first long document."""
    import duckdb

    from tests.oracle import _canon_rows, run_spark

    path = str(tmp_path_factory.mktemp("sf_overflow"))
    long_text = " ".join(f"w{j}" for j in range(1500))
    docs = [
        (0, long_text, "en", "src0", len(long_text)),
        (1, "short doc here", "en", "src1", 14),
        (2, " ".join(f"x{j}" for j in range(1030)), "en", "src0", 9999),
    ]
    _write_sf(spark, path, docs, [])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    spec = SPECS["q151_length_bucketing"]
    s_cols, s_rows = run_spark(spec, spark, path)
    cur = con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    assert _canon_rows(s_cols, s_rows) == _canon_rows(o_cols, cur.fetchall())
    waste = dict(zip(s_cols, zip(*s_rows)))["waste_ppm"]
    assert all(w >= 0 for w in waste)


def test_hamming_pigeonhole_blocking_is_complete(spark, sf_smoke):
    """q182's docstring claims the segment blocking is COMPLETE for
    Hamming radius 2 (pigeonhole: <= 2 substitutions touch <= 2 of
    the 3 segments). Pin the blocked result against an O(n^2)
    brute-force all-pairs scan at the smoke tier — every true pair
    must survive the blocking, bit for bit."""
    import duckdb

    spec = registry.load_all()["q182_hamming_neardup"]
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in spec.spark_fn(spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    want = set(
        map(
            tuple,
            con.execute(
                """
                WITH keyed AS (
                    SELECT doc_id, rpad(substr(text,1,24),24,' ') AS k
                    FROM documents
                )
                SELECT a.doc_id, b.doc_id,
                       CAST(hamming(a.k, b.k) AS BIGINT)
                FROM keyed a JOIN keyed b ON a.doc_id < b.doc_id
                WHERE hamming(a.k, b.k) <= 2
                """
            ).fetchall(),
        )
    )
    assert got == want and want


def test_neardup_pair_tables_cached_per_session(spark, sf_smoke):
    """lsh_pairs_df / neardup_pairs_df must return the SAME persisted
    frame on repeated calls (one materialization per session+tier) —
    the regression this guards: a consumer quietly rebuilding the
    LSH join per invocation."""
    from data_pipeline_2025_spark.operators.dedup import lsh_pairs_df
    from data_pipeline_2025_spark.operators.similarity import neardup_pairs_df

    assert lsh_pairs_df(spark, sf_smoke) is lsh_pairs_df(spark, sf_smoke)
    assert neardup_pairs_df(spark, sf_smoke) is neardup_pairs_df(
        spark, sf_smoke
    )
