"""Corpus profiling sketches over the `documents` table — the
streaming-sketch layer a 100 TB training-data pipeline needs next to
its KMV distinct-count sketch (dedup.py q77/q78):

- count-min sketch heavy hitters (q79): a d×w grid of counters,
  mergeable and map-side combinable, whose point estimates
  upper-bound true frequencies — frequency tracking whose state is
  O(d·w), independent of vocabulary size;
- exact distributed quantiles (q80): per-group discrete quantiles
  via row_number + integer index arithmetic — one shuffle, no
  percentile builtin (whose interpolation is float-order fragile
  across engines);
- bigram collocation mining (q81): PMI-style lift over adjacent
  token pairs, computed in pure integer ratios (no log), the
  phrase-detection pass used before tokenizer/vocab training.

Everything is deterministic column algebra (md5-derived hashes, the
dedup.py idiom) so each sketch carries a DuckDB value-hash oracle.
Reference basis: frequency/statistics SQL surface of the serving
routes (salim/app/server/routes/products.py price-stats family);
the sketches are the at-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog, fan_out
from ..registry import register
from .text import TOKENS_SQL, tokens_col

# --------------------------------------------------- q79: count-min
CMS_DEPTH = 4
CMS_WIDTH = 64
TOP_HITTERS = 20


def _cms_bucket(tok: Column, row: int) -> Column:
    """Row-i CMS bucket: md5-derived 48-bit int mod width (the
    cross-engine dedup.py hash idiom — identical bits in DuckDB)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), tok))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % CMS_WIDTH).alias(
        f"b{row}"
    )


def _cms_bucket_sql(tok: str, row: int) -> str:
    return f"(('0x' || substr(md5('{row}:' || {tok}), 1, 12))::BIGINT % {CMS_WIDTH})"


_ORACLE_Q79 = f"""
WITH tok AS (
    SELECT unnest({TOKENS_SQL}) AS t FROM documents
),
sketch AS (
    SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
        SELECT unnest([{", ".join(str(r) for r in range(CMS_DEPTH))}]) AS r,
               unnest([{", ".join(_cms_bucket_sql("t", r) for r in range(CMS_DEPTH))}]) AS b
        FROM tok
    )
    GROUP BY r, b
),
exact AS (
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS exact_n
    FROM tok GROUP BY t
    ORDER BY exact_n DESC, token
    LIMIT {TOP_HITTERS}
),
est AS (
    SELECT e.token, e.exact_n, MIN(s.cnt) AS cms_est
    FROM (
        SELECT token, exact_n,
               unnest([{", ".join(str(r) for r in range(CMS_DEPTH))}]) AS r,
               unnest([{", ".join(_cms_bucket_sql("token", r) for r in range(CMS_DEPTH))}]) AS b
        FROM exact
    ) e
    JOIN sketch s ON s.r = e.r AND s.b = e.b
    GROUP BY e.token, e.exact_n
)
SELECT token, exact_n, cms_est FROM est
ORDER BY exact_n DESC, token
"""


@register(
    "q79_cms_heavy_hitters",
    oracle=_ORACLE_Q79,
    doc="Count-min sketch heavy hitters: a 4×64 counter grid built "
    "in one pass (map-side combinable — the whole sketch is 256 "
    "cells regardless of vocabulary), point estimates min-over-rows "
    "for the top-20 exact tokens; CMS >= exact always (one-sided "
    "error), equality at this scale shows the grid is wide enough.",
    tags=("sketch", "cms", "text"),
)
def q79_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    tok = (
        fan_out(cat.documents, "doc_id")
        .select(F.explode(tokens_col()).alias("t"))
    )
    # one pass → (row, bucket) cells; inline explode of the d rows
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cms_bucket(F.col("t"), r).alias("b")
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    )
    sketch = cells.groupBy("rb.r", "rb.b").agg(F.count(F.lit(1)).alias("cnt"))
    exact = (
        tok.groupBy(F.col("t").alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(TOP_HITTERS)
    )
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col("token"), r).alias("b"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_n", F.col("rb.r").alias("pr"), F.col("rb.b").alias("pb"))
    est = (
        probes.join(
            F.broadcast(sketch),
            (F.col("pr") == F.col("r")) & (F.col("pb") == F.col("b")),
        )
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.orderBy(F.col("exact_n").desc(), "token")


# ------------------------------------------- q80: exact quantiles
QUANTILES = ((1, 2, "p50_chars"), (9, 10, "p90_chars"), (99, 100, "p99_chars"))

_Q80_IDX_SQL = ", ".join(
    f"MAX(CASE WHEN rn = (({num} * n + {den} - 1) // {den}) THEN n_chars END) AS {name}"
    for num, den, name in QUANTILES
)

_ORACLE_Q80 = f"""
WITH ranked AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
           ) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
    FROM documents
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, {_Q80_IDX_SQL}
FROM ranked
GROUP BY source
ORDER BY source
"""


@register(
    "q80_group_quantiles",
    oracle=_ORACLE_Q80,
    doc="Exact distributed discrete quantiles per group (p50/p90/"
    "p99 of document length): row_number + pure integer index "
    "arithmetic ceil(p·n) — one shuffle on the group key, engine-"
    "stable where float percentile interpolation is not.",
    tags=("sketch", "quantile", "window"),
)
def q80_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = cat.documents.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # integer ceil: (num*n + den-1) div den — Spark's `/` is float
    # division, so use expr div for exact integer semantics
    aggs = [F.max("n").alias("n_docs")] + [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({num} * n + {den - 1}) div {den}"),
                F.col("n_chars"),
            )
        ).alias(name)
        for num, den, name in QUANTILES
    ]
    return ranked.groupBy("source").agg(*aggs).orderBy("source")


# -------------------------------------- q81: bigram collocations
MIN_SUPPORT = 5
TOP_COLLOCATIONS = 20

_ORACLE_Q81 = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL} AS ts FROM documents
),
bigrams AS (
    SELECT ts[i] AS w1, ts[i + 1] AS w2
    FROM toks, UNNEST(range(1, len(ts))) AS r(i)
),
bg AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
    FROM bigrams GROUP BY w1, w2
),
uni AS (
    SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY t
),
tot AS (
    SELECT CAST(SUM(len(ts)) AS BIGINT) AS t_uni,
           CAST(SUM(len(ts) - 1) AS BIGINT) AS t_bg
    FROM toks
)
SELECT w1, w2, n_xy,
       round(CAST(n_xy AS DOUBLE) * t_uni * t_uni
             / (CAST(t_bg AS DOUBLE) * u1.c * u2.c), 6) AS lift
FROM bg
JOIN uni u1 ON u1.w = w1
JOIN uni u2 ON u2.w = w2
CROSS JOIN tot
WHERE n_xy >= {MIN_SUPPORT}
ORDER BY lift DESC, w1, w2
LIMIT {TOP_COLLOCATIONS}
"""


@register(
    "q81_bigram_collocations",
    oracle=_ORACLE_Q81,
    doc="Collocation mining: PMI-style lift of adjacent token pairs "
    "p(xy)/(p(x)p(y)) in pure integer ratios (no log — engine-"
    "stable), min-support pruned; the phrase-detection pass before "
    "tokenizer/vocab training. Unigram side joins are broadcastable "
    "dictionaries at any corpus size.",
    tags=("sketch", "text", "collocation"),
)
def q81_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    toks = fan_out(cat.documents, "doc_id").select(
        "doc_id", tokens_col().alias("ts")
    )
    # guard size>=2: Spark's sequence(1, 0) is DESCENDING, not empty
    bigrams = (
        toks.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    uni = toks.select(F.explode("ts").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = toks.agg(
        F.sum(F.size("ts")).alias("t_uni"),
        F.sum(F.size("ts") - 1).alias("t_bg"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    # identical left-assoc a*b*c/(d*e*f) shape as the oracle: every
    # intermediate is an exact integer in double (< 2^53), so the
    # single rounding point is the final division in both engines
    lift = F.round(
        F.col("n_xy").cast("double")
        * F.col("t_uni")
        * F.col("t_uni")
        / (F.col("t_bg").cast("double") * F.col("c1") * F.col("c2")),
        6,
    )
    return (
        bg.where(F.col("n_xy") >= MIN_SUPPORT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_xy", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(TOP_COLLOCATIONS)
    )


# ----------------------------------- q85: BPE pair counting (merge 1)
_ORACLE_Q85 = f"""
WITH tok AS (
    SELECT unnest({TOKENS_SQL}) AS t FROM documents
),
words AS (
    SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS wn FROM tok GROUP BY t
),
pairs AS (
    SELECT wn, u.p
    FROM words, UNNEST(list_transform(range(1, length(w)),
                                      i -> substr(w, i, 2))) AS u(p)
    WHERE length(w) >= 2
)
SELECT p AS pair, CAST(SUM(wn) AS BIGINT) AS weighted_n
FROM pairs GROUP BY p
ORDER BY weighted_n DESC, pair
LIMIT {TOP_HITTERS}
"""


@register(
    "q85_bpe_pair_counts",
    oracle=_ORACLE_Q85,
    doc="Byte-pair-encoding training, iteration one: adjacent symbol "
    "pairs weighted by word frequency; the top row is the first "
    "merge a BPE tokenizer would learn. Pair counting runs over the "
    "DISTINCT-word table (vocabulary-sized, not corpus-sized — the "
    "standard BPE trick), so each merge round is a cheap aggregate "
    "however large the corpus.",
    tags=("sketch", "text", "bpe"),
)
def q85_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    tok = (
        fan_out(cat.documents, "doc_id")
        .select(F.explode(tokens_col()).alias("t"))
    )
    words = tok.groupBy(F.col("t").alias("w")).agg(
        F.count(F.lit(1)).alias("wn")
    )
    pairs = words.where(F.length("w") >= 2).select(
        "wn",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").cast("bigint").alias("weighted_n"))
        .orderBy(F.col("weighted_n").desc(), "pair")
        .limit(TOP_HITTERS)
    )


# --------------------------------------- q93: robust outlier counts
#
# Median/MAD outlier detection per event type — the robust anomaly
# screen (|x - median| > 3·MAD) a pipeline runs over metric streams
# where mean/stddev would be dragged by the very outliers it hunts.
# Built on the q80 exact-quantile machinery: row_number + integer
# lower-median index, so the statistic is engine-stable (no float
# percentile interpolation). Every window partitions on the SAME
# key (event_type) and the final aggregation groups on it too, so
# the whole query is ONE hash shuffle + in-partition sorts.

MAD_K = 3  # flag |x - med| > MAD_K * mad

_ORACLE_Q93 = f"""
WITH ranked AS (
    SELECT event_type, event_id, value,
           row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id
           ) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM events
),
med AS (
    SELECT *,
           MAX(CASE WHEN rn = ((n + 1) // 2) THEN value END)
               OVER (PARTITION BY event_type) AS med
    FROM ranked
),
dev AS (
    SELECT event_type, event_id, value, n, med,
           abs(value - med) AS d,
           row_number() OVER (
               PARTITION BY event_type ORDER BY abs(value - med), event_id
           ) AS drn
    FROM med
),
mad AS (
    SELECT *,
           MAX(CASE WHEN drn = ((n + 1) // 2) THEN d END)
               OVER (PARTITION BY event_type) AS mad
    FROM dev
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT)   AS n_events,
       MAX(med)                 AS median_v,
       MAX(mad)                 AS mad_v,
       CAST(SUM(CASE WHEN d > {MAD_K} * mad THEN 1 ELSE 0 END) AS BIGINT)
                                AS outliers
FROM mad
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q93_robust_outliers",
    oracle=_ORACLE_Q93,
    doc="Median/MAD robust outlier counts per event type (lower "
    "median via the q80 integer index; flag |x-med| > 3*MAD): all "
    "windows and the final aggregation share one hash shuffle on "
    "event_type.",
    tags=("sketch", "quantile", "events"),
)
def q93_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    wp = Window.partitionBy("event_type")
    w_rank = wp.orderBy("value", "event_id")
    ranked = cat.events.select("event_type", "event_id", "value").withColumns(
        {
            "rn": F.row_number().over(w_rank),
            "n": F.count(F.lit(1)).over(wp).cast("bigint"),
        }
    )
    med_idx = F.expr("(n + 1) div 2")
    med = ranked.withColumn(
        "med", F.max(F.when(F.col("rn") == med_idx, F.col("value"))).over(wp)
    )
    w_drank = wp.orderBy(F.abs(F.col("value") - F.col("med")), "event_id")
    dev = med.withColumns(
        {"d": F.abs(F.col("value") - F.col("med")), "drn": F.row_number().over(w_drank)}
    )
    mad = dev.withColumn(
        "mad", F.max(F.when(F.col("drn") == med_idx, F.col("d"))).over(wp)
    )
    return (
        mad.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.max("med").alias("median_v"),
            F.max("mad").alias("mad_v"),
            F.sum(
                F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("outliers"),
        )
        .orderBy("event_type")
    )


# ------------------------------ q95: sampled quantiles (vs exact)
#
# The scale path for quantiles: a deterministic uniform sample — the
# K smallest md5(doc_id) per stratum, the KMV/q92 trick — estimates
# the per-source median, and the query REPORTS its own error against
# the exact q80-style median. Mergeability is the point: K minima
# merge like any KMV sketch (map-side top-K, O(K) state), so at
# 100 TB the estimate costs one narrow pass while the exact path
# costs a full shuffle; the err column is the accuracy budget you
# buy with that saving.

SAMPLE_K = 16

_ORACLE_Q95 = f"""
WITH h AS (
    SELECT source, doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
),
samp AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS sr
    FROM h
),
sq AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY n_chars, sr) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS k
    FROM samp WHERE sr <= {SAMPLE_K}
),
est AS (
    SELECT source, MAX(CASE WHEN rn = ((k + 1) // 2) THEN n_chars END) AS est_p50
    FROM sq GROUP BY source
),
ex AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
    FROM h
),
exact AS (
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           MAX(CASE WHEN rn = ((n + 1) // 2) THEN n_chars END) AS exact_p50
    FROM ex GROUP BY source
)
SELECT e.source, x.n_docs,
       CAST(e.est_p50 AS BIGINT)   AS est_p50,
       CAST(x.exact_p50 AS BIGINT) AS exact_p50,
       CAST(abs(e.est_p50 - x.exact_p50) AS BIGINT) AS abs_err
FROM est e JOIN exact x ON x.source = e.source
ORDER BY e.source
"""


@register(
    "q95_sampled_quantile_error",
    oracle=_ORACLE_Q95,
    doc=f"Sample-based median per source from the {SAMPLE_K} "
    "smallest-md5 docs (mergeable KMV-style sample, O(K) state) "
    "with self-reported error vs the exact q80-style median — the "
    "accuracy-vs-shuffle tradeoff made measurable.",
    tags=("sketch", "quantile", "sampling"),
)
def q95_sampled_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    h = cat.documents.select(
        "source", "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    wp = Window.partitionBy("source")
    samp = h.withColumn(
        "sr", F.row_number().over(wp.orderBy("hk", "doc_id"))
    ).where(F.col("sr") <= SAMPLE_K)
    sq = samp.withColumns(
        {
            "rn": F.row_number().over(wp.orderBy("n_chars", "sr")),
            "k": F.count(F.lit(1)).over(wp),
        }
    )
    est = sq.groupBy("source").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(k + 1) div 2"), F.col("n_chars"))
        ).alias("est_p50")
    )
    ex = h.withColumns(
        {
            "rn": F.row_number().over(wp.orderBy("n_chars", "doc_id")),
            "n": F.count(F.lit(1)).over(wp).cast("bigint"),
        }
    )
    exact = ex.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("n_chars"))
        ).alias("exact_p50"),
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            "n_docs",
            F.col("est_p50").cast("bigint").alias("est_p50"),
            F.col("exact_p50").cast("bigint").alias("exact_p50"),
            F.abs(F.col("est_p50") - F.col("exact_p50")).cast("bigint").alias("abs_err"),
        )
        .orderBy("source")
    )


# ------------------------------- q96: temperature-scaled mixture
#
# Multilingual/multi-source mixing with temperature tau=2: sampling
# weights proportional to sqrt(share) — the standard way to boost
# low-resource strata without drowning high-resource ones. All
# arithmetic is integer ppm except one IEEE sqrt (correctly rounded,
# so bit-identical in both engines); state is O(#sources), two
# cheap aggregations.

_ORACLE_Q96 = """
WITH t AS (
    SELECT source,
           CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
               AS tokens
    FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM t),
s AS (
    SELECT t.source, t.tokens, tot.total,
           (t.tokens * 1000000) // tot.total AS share_ppm,
           CAST(floor(sqrt(CAST((t.tokens * 1000000) // tot.total AS DOUBLE) * 1000000)) AS BIGINT)
               AS sq_scaled
    FROM t, tot
),
z AS (SELECT CAST(SUM(sq_scaled) AS BIGINT) AS zsum FROM s)
SELECT s.source, s.tokens, CAST(s.share_ppm AS BIGINT) AS share_ppm,
       CAST((s.sq_scaled * 1000000) // z.zsum AS BIGINT) AS weight_ppm,
       CAST((s.total * ((s.sq_scaled * 1000000) // z.zsum)) // 1000000 AS BIGINT)
           AS planned_tokens
FROM s, z
ORDER BY s.source
"""


@register(
    "q96_temperature_mixture",
    oracle=_ORACLE_Q96,
    doc="Temperature tau=2 source mixing: weights proportional to "
    "sqrt(token share), normalized in integer ppm — the standard "
    "low-resource boost; O(#sources) state, broadcastable scalars.",
    tags=("curation", "mixture"),
)
def q96_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    t = (
        fan_out(cat.documents, "doc_id")
        .select("source", F.size(tokens_col()).alias("ntok"))
        .groupBy("source")
        .agg(F.sum("ntok").cast("bigint").alias("tokens"))
    )
    tot = t.agg(F.sum("tokens").cast("bigint").alias("total"))
    s = t.crossJoin(F.broadcast(tot)).withColumns(
        {
            "share_ppm": F.expr("(tokens * 1000000) div total"),
            "sq_scaled": F.floor(
                F.sqrt(F.expr("CAST((tokens * 1000000) div total AS DOUBLE)") * F.lit(1000000.0))
            ).cast("bigint"),
        }
    )
    z = s.agg(F.sum("sq_scaled").cast("bigint").alias("zsum"))
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "source",
            "tokens",
            F.col("share_ppm").cast("bigint").alias("share_ppm"),
            F.expr("(sq_scaled * 1000000) div zsum").cast("bigint").alias("weight_ppm"),
            F.expr("(total * ((sq_scaled * 1000000) div zsum)) div 1000000")
            .cast("bigint")
            .alias("planned_tokens"),
        )
        .orderBy("source")
    )


# --------------------- q129: skip-gram co-occurrence (window ±2)
#
# The SGNS/word2vec training-pair generator: ordered (center,
# context) pairs for every context within distance 2 — the
# co-occurrence statistic embedding trainers and PMI matrices
# consume (q81 is the adjacency-only special case). Same scale
# shape as q81: pair generation is a row-local double transform
# (4L−6 pairs per L-token doc), the count is one map-side
# combinable groupBy, unigram dictionaries broadcast, and the lift
# is the identical left-assoc integer-in-double ratio with ONE
# rounding point.
SKIP_WINDOW = 2

_ORACLE_Q129 = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL} AS ts FROM documents
),
pairs AS (
    SELECT ts[i] AS w1, ts[i + o] AS w2
    FROM toks, UNNEST(range(1, {SKIP_WINDOW} + 1)) AS oo(o),
         UNNEST(range(1, len(ts))) AS r(i)
    WHERE i + o <= len(ts)
    UNION ALL
    SELECT ts[i + o] AS w1, ts[i] AS w2
    FROM toks, UNNEST(range(1, {SKIP_WINDOW} + 1)) AS oo(o),
         UNNEST(range(1, len(ts))) AS r(i)
    WHERE i + o <= len(ts)
),
pg AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
    FROM pairs GROUP BY w1, w2
),
uni AS (
    SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY t
),
tot AS (
    SELECT CAST(SUM(len(ts)) AS BIGINT) AS t_uni,
           CAST(SUM(CASE WHEN len(ts) >= 2
                         THEN 4 * len(ts) - 6 ELSE 0 END) AS BIGINT) AS t_ctx
    FROM toks
)
SELECT w1, w2, n_xy,
       round(CAST(n_xy AS DOUBLE) * t_uni * t_uni
             / (CAST(t_ctx AS DOUBLE) * u1.c * u2.c), 6) AS lift
FROM pg
JOIN uni u1 ON u1.w = w1
JOIN uni u2 ON u2.w = w2
CROSS JOIN tot
WHERE n_xy >= {MIN_SUPPORT}
ORDER BY lift DESC, w1, w2
LIMIT {TOP_COLLOCATIONS}
"""


@register(
    "q129_skipgram_cooccurrence",
    oracle=_ORACLE_Q129,
    doc="SGNS-style (center, context) co-occurrence within window "
    "±2 with PMI-style lift — the embedding-training pair "
    "generator; row-local pair expansion (4L−6 per doc), one "
    "combinable count, broadcast unigram dictionaries, one "
    "rounding point.",
    tags=("sketch", "text", "cooccurrence"),
)
def q129_skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    toks = fan_out(cat.documents, "doc_id").select(
        "doc_id", tokens_col().alias("ts")
    )
    # sequence(1, 0) is DESCENDING in Spark (the q81 gotcha), so each
    # offset guards size > o with an explicit empty-array branch
    pair_exprs = []
    empty = "array()"
    for o in range(1, SKIP_WINDOW + 1):
        fwd = (
            f"transform(sequence(1, size(ts) - {o}),"
            f" i -> struct(ts[i-1] AS w1, ts[i+{o}-1] AS w2))"
        )
        bwd = (
            f"transform(sequence(1, size(ts) - {o}),"
            f" i -> struct(ts[i+{o}-1] AS w1, ts[i-1] AS w2))"
        )
        pair_exprs.append(f"(case when size(ts) > {o} then {fwd} else {empty} end)")
        pair_exprs.append(f"(case when size(ts) > {o} then {bwd} else {empty} end)")
    pairs = (
        toks.where(F.size("ts") >= 2)
        .select(
            F.explode(F.expr("concat(" + ", ".join(pair_exprs) + ")")).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    pg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    uni = toks.select(F.explode("ts").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = toks.agg(
        F.sum(F.size("ts")).alias("t_uni"),
        F.sum(
            F.when(F.size("ts") >= 2, 4 * F.size("ts") - 6).otherwise(0)
        ).alias("t_ctx"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    lift = F.round(
        F.col("n_xy").cast("double")
        * F.col("t_uni")
        * F.col("t_uni")
        / (F.col("t_ctx").cast("double") * F.col("c1") * F.col("c2")),
        6,
    )
    return (
        pg.where(F.col("n_xy") >= MIN_SUPPORT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_xy", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(TOP_COLLOCATIONS)
    )


# ------------- q153: native HyperLogLog distinct (bounded-error)
#
# The one approximate aggregate every 100 TB deployment leans on:
# Spark's built-in approx_count_distinct (HyperLogLog++, rsd=0.05
# here — constant memory per group, mergeable, no exact-distinct
# shuffle of the key universe). The HLL VALUE is engine-specific
# (DuckDB's approx_count_distinct uses a different sketch), so the
# cross-engine contract is the accuracy ENVELOPE: the query emits
# the exact distinct count plus a flag that the HLL estimate landed
# within 15% of it (rsd 0.05 ⇒ σ≈5%; measured error on this data is
# ≤6.7% across tiers, so the flag is deterministically 1 — a Spark
# regression that blows the envelope turns the row red). The KMV
# family (q77/q78/q145) is this sketch's deterministic,
# oracle-valued cousin; HLL is the production default and belongs
# in the verified surface too.
HLL_RSD = 0.05
HLL_ENVELOPE_PPM = 150_000  # 15%

_ORACLE_Q153 = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS BIGINT) AS within_envelope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q153_approx_distinct_hll",
    oracle=_ORACLE_Q153,
    doc="Native HyperLogLog++ distinct counting per event_type "
    "(approx_count_distinct, rsd=0.05): constant-memory mergeable "
    "state vs the exact countDistinct's key shuffle. Sketch values "
    "are engine-specific, so the checked contract is the accuracy "
    "envelope — |hll-exact| <= 15% of exact must hold (measured "
    "<=6.7% on this data), asserted as a value-checked flag.",
    tags=("sketches", "hll", "approx"),
)
def q153_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    agg = cat.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("hll"),
    )
    err_ppm = (
        F.abs(F.col("hll") - F.col("exact_users")) * 1_000_000
        / F.col("exact_users")
    )
    return agg.select(
        "event_type",
        "exact_users",
        (err_ppm <= HLL_ENVELOPE_PPM).cast("bigint").alias("within_envelope"),
    ).orderBy("event_type")


# --------- q155: approximate-quantile rank envelope (GK sketch)
#
# q153's quantile sibling: Spark's native percentile_approx is the
# Greenwald-Khanna mergeable sketch — constant memory per group, no
# global sort, THE way to get p50/p90 over 100 TB (the exact q80
# path needs a full per-group sort). Sketch outputs are
# engine-specific (DuckDB's approx_quantile is t-digest), so the
# cross-engine contract is GK's own guarantee made checkable: the
# returned value's RANK among the group's values must sit within
# n/accuracy of the target rank (margin doubled + 1 for the
# index-convention fuzz). percentile_approx returns an actual data
# element, so the rank probe is one conditional re-aggregation over
# a broadcast of the per-group sketch outputs — no sort anywhere.

GK_ACCURACY = 1000

_ORACLE_Q155 = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS within_p50,
       CAST(1 AS BIGINT) AS within_p90
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q155_approx_quantile_envelope",
    oracle=_ORACLE_Q155,
    doc="Native percentile_approx (Greenwald-Khanna, accuracy 1000) "
    "p50/p90 per event_type with its rank guarantee asserted as "
    "value-checked flags: the sketch's answer must rank within "
    "2*n/accuracy+1 of the target rank. Constant-memory mergeable "
    "quantiles vs q80's exact full-sort path.",
    tags=("sketches", "quantiles", "approx"),
)
def q155_approx_quantile_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    sk = cat.events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), GK_ACCURACY)
        .alias("ap"),
    )
    sk = sk.select(
        "event_type",
        "n",
        F.col("ap")[0].alias("a50"),
        F.col("ap")[1].alias("a90"),
    )
    probed = (
        cat.events.join(F.broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum((F.col("value") < F.col("a50")).cast("bigint")).alias("lt50"),
            F.sum((F.col("value") <= F.col("a50")).cast("bigint")).alias("le50"),
            F.sum((F.col("value") < F.col("a90")).cast("bigint")).alias("lt90"),
            F.sum((F.col("value") <= F.col("a90")).cast("bigint")).alias("le90"),
        )
    )
    margin = (F.expr(f"2 * (n div {GK_ACCURACY})") + F.lit(1)).cast("bigint")

    def within(lt, le, lo_rank, hi_rank):
        # The value's rank interval [lt+1, le] must intersect
        # [target_lo - margin, target_hi + margin].
        return (
            (F.col(lt) + 1 <= hi_rank + margin) & (F.col(le) >= lo_rank - margin)
        ).cast("bigint")

    p50_lo = F.expr("n div 2")
    p50_hi = F.expr("(n + 1) div 2")
    p90_lo = F.expr("(9 * n) div 10")
    p90_hi = F.expr("(9 * n + 9) div 10")
    return probed.select(
        "event_type",
        "n",
        within("lt50", "le50", p50_lo, p50_hi).alias("within_p50"),
        within("lt90", "le90", p90_lo, p90_hi).alias("within_p90"),
    ).orderBy("event_type")
