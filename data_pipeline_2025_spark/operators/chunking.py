"""Training-sequence preparation over the `documents` table — the
step between a curated corpus and a tokenized training run
(BASELINE.json's scale extras; the reference's closest analog is the
fixture generator's per-item assembly, salim/generate_products.py):

- context-window chunking (q86): split every document's token
  stream into fixed-size overlapping windows (size 64, stride 32) —
  the chunk table an embedding/indexing pass consumes;
- sequence packing (q87): concatenate documents into fixed-length
  training sequences (ctx 256) per deterministic shard and report
  packing efficiency — the concat-and-chop layout LLM trainers use
  so no padding token is wasted;
- filter-funnel attribution (q88): for an ordered Gopher-style rule
  chain, how many documents each rule would drop alone vs how many
  survive the chain cumulatively — the report that tells a data
  team WHICH rule is eating their corpus.

Scale design:
- q86 is per-row array algebra (sequence/posexplode/slice — JVM
  codegen, no UDF); the only data movement is the optional fan_out
  of the narrow input. Output is written partition-local; at 100 TB
  chunking is an embarrassingly parallel map.
- q87's window-cumsum runs PER SHARD (md5-derived, 8 here, one per
  task at scale): each shard's packing is an independent sequential
  scan, the standard way to parallelize greedy packing without a
  global order. One shuffle on the shard key, state = one running
  sum.
- q88 is a single full-scan aggregation of boolean columns —
  partial-aggregatable conditional sums, bytes of state, no
  shuffle beyond the 1-row combine.

md5 is the shared deterministic hash (identical hex in DuckDB), so
all three are value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog, fan_out
from ..registry import register
from .text import STOPWORDS, TOKENS_SQL, tokens_col

# --------------------------------------------------- q86: chunking

CHUNK_SIZE = 64
CHUNK_STRIDE = 32

_ORACLE_Q86 = f"""
WITH d AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
starts AS (
    SELECT doc_id, toks, n,
           unnest(generate_series(0, n - 1, {CHUNK_STRIDE})) AS start_tok
    FROM nz
),
c AS (
    SELECT doc_id, start_tok,
           start_tok // {CHUNK_STRIDE}                       AS chunk_idx,
           list_slice(toks, start_tok + 1,
                      least(start_tok + {CHUNK_SIZE}, n))    AS chunk
    FROM starts
)
SELECT CAST(doc_id AS BIGINT)            AS doc_id,
       CAST(chunk_idx AS BIGINT)         AS chunk_idx,
       CAST(start_tok AS BIGINT)         AS start_tok,
       CAST(len(chunk) AS BIGINT)        AS chunk_len,
       md5(array_to_string(chunk, ' '))  AS chunk_hash
FROM c
"""


@register(
    "q86_context_chunks",
    oracle=_ORACLE_Q86,
    doc="Context-window chunking: overlapping token windows (size "
    f"{CHUNK_SIZE}, stride {CHUNK_STRIDE}) per document with a "
    "content hash per chunk — pure array algebra, embarrassingly "
    "parallel at any corpus size.",
    tags=("chunking", "text"),
)
def q86_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    docs = (
        fan_out(cat.documents, "doc_id")
        .select("doc_id", tokens_col().alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    starts = docs.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("pos", "start_tok"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_SIZE)
    return starts.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# --------------------------------------------------- q87: packing

PACK_CTX = 256
PACK_SHARDS = 8

# Same md5-prefix integer idiom as curation.bucket_col, mod the
# shard count: the shard is a pure function of doc_id, so packing is
# reproducible on any engine and any partitioning of the input.
_SHARD_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    f" % {PACK_SHARDS}"
)


def _shard_col() -> Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % PACK_SHARDS
    )


_ORACLE_Q87 = f"""
WITH d AS (
    SELECT doc_id, {_SHARD_SQL} AS shard,
           CAST(len({TOKENS_SQL}) AS BIGINT) AS n
    FROM documents
),
nz AS (SELECT * FROM d WHERE n > 0),
c AS (
    SELECT shard, n,
           SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM nz
),
s AS (
    SELECT shard, n,
           (cum - n) // {PACK_CTX} AS seq_first,
           (cum - 1) // {PACK_CTX} AS seq_last
    FROM c
)
SELECT CAST(shard AS BIGINT)                       AS shard,
       CAST(COUNT(*) AS BIGINT)                    AS docs,
       CAST(SUM(n) AS BIGINT)                      AS tokens,
       CAST(MAX(seq_last) + 1 AS BIGINT)           AS sequences,
       CAST(SUM(CASE WHEN seq_first <> seq_last THEN 1 ELSE 0 END) AS BIGINT)
                                                   AS boundary_docs,
       CAST(SUM(n) AS DOUBLE) / ((MAX(seq_last) + 1) * {PACK_CTX})
                                                   AS fill_ratio
FROM s
GROUP BY shard
"""


@register(
    "q87_sequence_packing",
    oracle=_ORACLE_Q87,
    doc="Concat-and-chop sequence packing: documents stream into "
    f"ctx-{PACK_CTX} training sequences per deterministic md5 shard; "
    "reports sequences, boundary-crossing docs and fill ratio. The "
    "running sum is per-shard, so packing parallelizes across "
    "shards with one shuffle.",
    tags=("chunking", "packing"),
)
def q87_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    docs = (
        cat.documents.select(
            "doc_id",
            _shard_col().alias("shard"),
            F.size(tokens_col()).cast("bigint").alias("n"),
        )
        .where(F.col("n") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = docs.withColumn("cum", F.sum("n").over(w)).select(
        "shard",
        "n",
        F.expr(f"(cum - n) div {PACK_CTX}").alias("seq_first"),
        F.expr(f"(cum - 1) div {PACK_CTX}").alias("seq_last"),
    )
    return s.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n").alias("tokens"),
        (F.max("seq_last") + 1).alias("sequences"),
        F.sum(F.when(F.col("seq_first") != F.col("seq_last"), 1).otherwise(0)).alias(
            "boundary_docs"
        ),
        (
            F.sum("n").cast("double")
            / ((F.max("seq_last") + 1) * F.lit(PACK_CTX))
        ).alias("fill_ratio"),
    )


# --------------------------------------------------- q88: funnel

MIN_WORDS = 20
MAX_WORDS = 80
MIN_AVG_WL = 3.0
MAX_AVG_WL = 8.0
MIN_UNIQ = 0.3

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# The ordered rule chain. Names sort in chain order so the driver's
# name-sorted hash sees the funnel in sequence.
_ORACLE_Q88 = f"""
WITH d AS (
    SELECT {TOKENS_SQL} AS toks,
           length(replace(text, ' ', '')) AS chars_ns
    FROM documents
),
m AS (
    SELECT len(toks) AS words,
           CAST(chars_ns AS DOUBLE) / len(toks) AS avg_wl,
           len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS stop_cnt,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
    FROM d WHERE len(toks) > 0
),
p AS (
    SELECT CASE WHEN words >= {MIN_WORDS} THEN 1 ELSE 0 END AS p1,
           CASE WHEN words <= {MAX_WORDS} THEN 1 ELSE 0 END AS p2,
           CASE WHEN avg_wl >= {MIN_AVG_WL} AND avg_wl <= {MAX_AVG_WL}
                THEN 1 ELSE 0 END                           AS p3,
           CASE WHEN stop_cnt >= 1 THEN 1 ELSE 0 END        AS p4,
           CASE WHEN uniq_ratio >= {MIN_UNIQ} THEN 1 ELSE 0 END AS p5
    FROM m
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT)                    AS total,
           CAST(SUM(1 - p1) AS BIGINT)                 AS f1,
           CAST(SUM(1 - p2) AS BIGINT)                 AS f2,
           CAST(SUM(1 - p3) AS BIGINT)                 AS f3,
           CAST(SUM(1 - p4) AS BIGINT)                 AS f4,
           CAST(SUM(1 - p5) AS BIGINT)                 AS f5,
           CAST(SUM(p1) AS BIGINT)                     AS k1,
           CAST(SUM(p1 * p2) AS BIGINT)                AS k2,
           CAST(SUM(p1 * p2 * p3) AS BIGINT)           AS k3,
           CAST(SUM(p1 * p2 * p3 * p4) AS BIGINT)      AS k4,
           CAST(SUM(p1 * p2 * p3 * p4 * p5) AS BIGINT) AS k5
    FROM p
)
SELECT '0_total' AS rule, CAST(0 AS BIGINT) AS fail_solo, total AS kept FROM agg
UNION ALL SELECT '1_min_words', f1, k1 FROM agg
UNION ALL SELECT '2_max_words', f2, k2 FROM agg
UNION ALL SELECT '3_avg_word_len', f3, k3 FROM agg
UNION ALL SELECT '4_has_stopword', f4, k4 FROM agg
UNION ALL SELECT '5_uniq_ratio', f5, k5 FROM agg
"""


@register(
    "q88_filter_funnel",
    oracle=_ORACLE_Q88,
    doc="Filter-funnel attribution for an ordered Gopher-style rule "
    "chain: per rule, documents it would drop alone vs survivors of "
    "the cumulative chain — one full-scan aggregation of boolean "
    "conditional sums (partial-aggregatable, bytes of state).",
    tags=("curation", "quality"),
)
def q88_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    toks = tokens_col()
    m = (
        cat.documents.select(
            F.size(toks).alias("words"),
            (
                F.length(F.regexp_replace("text", " ", "")).cast("double")
                / F.size(toks)
            ).alias("avg_wl"),
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).alias("stop_cnt"),
            (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
                "uniq_ratio"
            ),
        )
        .where(F.col("words") > 0)
    )
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    p = m.select(
        flag(F.col("words") >= MIN_WORDS).alias("p1"),
        flag(F.col("words") <= MAX_WORDS).alias("p2"),
        flag(
            (F.col("avg_wl") >= MIN_AVG_WL) & (F.col("avg_wl") <= MAX_AVG_WL)
        ).alias("p3"),
        flag(F.col("stop_cnt") >= 1).alias("p4"),
        flag(F.col("uniq_ratio") >= MIN_UNIQ).alias("p5"),
    )
    agg = p.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(1 - F.col("p1")).alias("f1"),
        F.sum(1 - F.col("p2")).alias("f2"),
        F.sum(1 - F.col("p3")).alias("f3"),
        F.sum(1 - F.col("p4")).alias("f4"),
        F.sum(1 - F.col("p5")).alias("f5"),
        F.sum("p1").alias("k1"),
        F.sum(F.col("p1") * F.col("p2")).alias("k2"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3")).alias("k3"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3") * F.col("p4")).alias("k4"),
        F.sum(
            F.col("p1") * F.col("p2") * F.col("p3") * F.col("p4") * F.col("p5")
        ).alias("k5"),
    )
    rows = [("0_total", F.lit(0).cast("bigint"), F.col("total"))] + [
        (f"{i}_{n}", F.col(f"f{i}"), F.col(f"k{i}"))
        for i, n in (
            (1, "min_words"),
            (2, "max_words"),
            (3, "avg_word_len"),
            (4, "has_stopword"),
            (5, "uniq_ratio"),
        )
    ]
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        fail.cast("bigint").alias("fail_solo"),
                        kept.cast("bigint").alias("kept"),
                    )
                    for rule, fail, kept in rows
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.fail_solo", "r.kept")


# --------------------------------------- q92: stratified sampling
#
# Deterministic per-stratum uniform sampling: keep the K documents
# with the SMALLEST md5(doc_id) per source — the KMV trick (q77)
# applied to sampling. Because md5 is uniform on doc ids, the K
# minima are a uniform random K-subset of each stratum, yet the
# selection is a pure function of the data: any engine, any
# partitioning, any re-run draws the SAME sample (no RNG state, no
# seed plumbing). One shuffle on the stratum key; at 100 TB each
# task keeps a K-element heap per stratum (partial top-K combine),
# so driver output is O(strata * K).

STRAT_K = 10

_ORACLE_Q92 = f"""
WITH h AS (
    SELECT source, doc_id, n_chars,
           md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
),
r AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY hk, doc_id
           ) AS sample_rank
    FROM h
)
SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank,
       doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM r WHERE sample_rank <= {STRAT_K}
"""


@register(
    "q92_stratified_sample",
    oracle=_ORACLE_Q92,
    doc=f"Deterministic stratified sampling: the {STRAT_K} smallest "
    "md5(doc_id) per source form a uniform, RNG-free, re-run-stable "
    "K-sample per stratum (the KMV idea applied to sampling); "
    "rank()-limited window = partial top-K per task at scale.",
    tags=("curation", "sampling"),
)
def q92_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    h = cat.documents.select(
        "source",
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        h.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= STRAT_K)
        .select(
            "source",
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


# ---------------- q151: length-bucketed batching (padding overhead)
#
# The pad-vs-pack decision, quantified: dynamic-batching trainers
# that DON'T pack (q87) group sequences into power-of-two length
# buckets and pad each sequence to its bucket edge. This query
# reports, per bucket, how many tokens that padding wastes — the
# number you compare against q87's packing efficiency to choose a
# batching strategy. Bucket edges are a fixed literal ladder (16 ..
# 1024) written as the same CASE cascade in both engines — no
# log2()/float anywhere, so the bucketing is exact. Sequences
# LONGER than the top edge land in the 1024 bucket but pad to
# greatest(bucket, n) — i.e. to their own length, zero padding —
# so padded_tokens >= sum_tokens always holds and waste_ppm can
# never go negative (round-5 advisor fix: the old docs*bucket
# numerator went negative for overflow docs, where DuckDB's //
# floors toward -inf but Spark's div truncates toward zero — a
# cross-engine hash mismatch waiting for the first >1024-token
# document).
# Scale shape: one map-side-combinable groupBy on a tiny key domain
# (<= 8 buckets); the scan is the only full pass.
BUCKET_EDGES = (16, 32, 64, 128, 256, 512, 1024)


def _bucket_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} <= {e} THEN {e}" for e in BUCKET_EDGES
    )
    return f"CASE {cases} ELSE {BUCKET_EDGES[-1]} END"


_ORACLE_Q151 = f"""
WITH d AS (
    SELECT CAST(len({TOKENS_SQL}) AS BIGINT) AS n FROM documents
),
b AS (
    SELECT CAST({_bucket_sql('n')} AS BIGINT) AS bucket, n
    FROM d WHERE n > 0
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT)      AS docs,
       CAST(MAX(n) AS BIGINT)        AS max_len,
       CAST(SUM(n) AS BIGINT)        AS sum_tokens,
       CAST(SUM(GREATEST(bucket, n)) AS BIGINT) AS padded_tokens,
       CAST(((SUM(GREATEST(bucket, n)) - SUM(n)) * 1000000)
            // (SUM(GREATEST(bucket, n))) AS BIGINT) AS waste_ppm
FROM b
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q151_length_bucketing",
    oracle=_ORACLE_Q151,
    doc="Length-bucketed batching audit: documents grouped into "
    "power-of-two token-length buckets (exact CASE ladder, no "
    "floats), per-bucket padded-token waste in ppm — the padding "
    "cost you weigh against q87's packing efficiency when choosing "
    "a training batching strategy.",
    tags=("sequences", "training-prep", "histogram"),
)
def q151_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    d = cat.documents.select(
        F.size(tokens_col()).cast("bigint").alias("n")
    ).where(F.col("n") > 0)
    b = d.select(F.expr(_bucket_sql("n")).cast("bigint").alias("bucket"), "n")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.max("n").alias("max_len"),
            F.sum("n").alias("sum_tokens"),
            F.sum(F.greatest("bucket", "n")).alias("padded_tokens"),
        )
        .select(
            "bucket",
            "docs",
            "max_len",
            "sum_tokens",
            "padded_tokens",
            F.expr(
                "((padded_tokens - sum_tokens) * 1000000) div padded_tokens"
            ).alias("waste_ppm"),
        )
        .orderBy("bucket")
    )
