"""Bloom-filter join pruning — the runtime-filter technique that
makes selective fact⋈dim joins cheap at 100 TB, materialized as a
first-class measurable operator (q89).

Spark applies this automatically under
`spark.sql.optimizer.runtime.bloomFilter.enabled` (see SCALE.md) and
via dynamic partition pruning, but the engine-internal filter is
invisible to users and not portable across engines. This operator
builds the filter explicitly with deterministic md5-derived hashes,
so (a) the pruning effectiveness — candidate keys, false positives,
fact rows skipped — is itself a queryable result, and (b) a DuckDB
oracle replays the identical arithmetic bit for bit.

Shape (reference basis: the promo-filtered fact joins,
salim/app/server/routes/products.py — a selective dimension subset
pruning a large fact scan):

- build side: DISTINCT urgent-order keys → K md5 hashes each →
  bit positions in an m-bit filter stored as 64-bit words holding
  48 usable bits (masks stay below 2^48, so signed bigint algebra
  is overflow-free and identical in both engines);
- the filter is a `groupBy(word).agg(bit_or(mask))` — tiny
  (WORDS rows), mergeable, map-side combinable, then BROADCAST to
  the probe side: the whole point is that the shuffle-free probe
  replaces a full shuffle join for the non-qualifying majority;
- probe side: DISTINCT fact keys test all K bits via the broadcast
  word table; only keys passing every bit survive to the exact
  (semi-join) verification, exactly how a runtime filter fronts a
  real join.

At 100 TB the fact side streams once, the filter is O(WORDS) bytes
regardless of build cardinality beyond its sizing, and the exact
join runs over `bloom_pass / probe` of the data — the reported
false-positive count is the knob-tuning feedback (m, K).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

BLOOM_WORDS = 512
BITS_PER_WORD = 48  # masks <= 2^47: signed-bigint-safe in both engines
BLOOM_BITS = BLOOM_WORDS * BITS_PER_WORD
BLOOM_K = 2
BUILD_PRIORITY = "1-URGENT"


def _pos_col(key: Column, i: int) -> Column:
    """Hash-i bit position: md5-derived 48-bit int mod m (the
    sketches.py cross-engine hash idiom)."""
    h = F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % BLOOM_BITS


def _pos_sql(key: str, i: int) -> str:
    return (
        f"(('0x' || substr(md5('{i}:' || CAST({key} AS VARCHAR)), 1, 12))::BIGINT"
        f" % {BLOOM_BITS})"
    )


def _hash_rows_sql(key: str) -> str:
    return ", ".join(_pos_sql(key, i) for i in range(BLOOM_K))


_ORACLE_Q89 = f"""
WITH bkeys AS (
    SELECT DISTINCT o_orderkey AS k FROM orders
    WHERE o_orderpriority = '{BUILD_PRIORITY}'
),
bpos AS (
    SELECT unnest([{_hash_rows_sql("k")}]) AS pos FROM bkeys
),
bloom AS (
    SELECT pos // {BITS_PER_WORD} AS word,
           bit_or(1::BIGINT << CAST(pos % {BITS_PER_WORD} AS INTEGER)) AS bits
    FROM bpos GROUP BY 1
),
pkeys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
ppos AS (
    SELECT k, unnest([{_hash_rows_sql("k")}]) AS pos FROM pkeys
),
probe AS (
    SELECT p.k,
           CASE WHEN (COALESCE(b.bits, 0)
                      & (1::BIGINT << CAST(p.pos % {BITS_PER_WORD} AS INTEGER)))
                     <> 0
                THEN 1 ELSE 0 END AS hit
    FROM ppos p LEFT JOIN bloom b ON b.word = p.pos // {BITS_PER_WORD}
),
cand AS (SELECT k FROM probe GROUP BY k HAVING SUM(hit) = {BLOOM_K}),
truth AS (SELECT k FROM pkeys WHERE k IN (SELECT k FROM bkeys))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bkeys)  AS build_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pkeys)  AS probe_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)   AS bloom_pass_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)  AS true_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS false_positives,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS fact_rows_total,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IN (SELECT k FROM cand))     AS fact_rows_after_prune,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IN (SELECT k FROM truth))    AS fact_rows_true
"""


def _count1(df: DataFrame, name: str) -> DataFrame:
    return df.agg(F.count(F.lit(1)).alias(name))


@register(
    "q89_bloom_prune_join",
    oracle=_ORACLE_Q89,
    doc=f"Explicit bloom-filter join pruning: {BLOOM_K} md5 hashes "
    f"into a {BLOOM_BITS}-bit filter ({BLOOM_WORDS} words × "
    f"{BITS_PER_WORD} bits), built by bit_or aggregation and "
    "broadcast to the probe side; reports candidate/true/"
    "false-positive keys and the fact rows the prune skips — the "
    "runtime-filter pattern as a measurable, oracle-checked result.",
    tags=("join", "bloom", "scale"),
)
def q89_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bkeys = (
        cat.orders.where(F.col("o_orderpriority") == BUILD_PRIORITY)
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    pkeys = cat.lineitem.select(F.col("l_orderkey").alias("k")).distinct()

    def positions(keys: DataFrame) -> DataFrame:
        return keys.select(
            "k",
            F.explode(
                F.array(*[_pos_col(F.col("k"), i) for i in range(BLOOM_K)])
            ).alias("pos"),
        )

    word = F.expr(f"pos div {BITS_PER_WORD}").alias("word")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BITS_PER_WORD} AS INT))"
    ).alias("mask")
    bloom = (
        positions(bkeys)
        .select(word, mask)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probe = (
        positions(pkeys)
        .select("k", word, mask)
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "k",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0, 1
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    cand = probe.groupBy("k").agg(F.sum("hit").alias("hits")).where(
        F.col("hits") == BLOOM_K
    ).select("k")
    truth = pkeys.join(F.broadcast(bkeys), "k", "semi")
    pruned_rows = cat.lineitem.join(
        F.broadcast(cand), F.col("l_orderkey") == F.col("k"), "semi"
    )
    true_rows = cat.lineitem.join(
        F.broadcast(bkeys), F.col("l_orderkey") == F.col("k"), "semi"
    )

    out = (
        _count1(bkeys, "build_keys")
        .crossJoin(_count1(pkeys, "probe_keys"))
        .crossJoin(_count1(cand, "bloom_pass_keys"))
        .crossJoin(_count1(truth, "true_keys"))
        .crossJoin(_count1(cat.lineitem, "fact_rows_total"))
        .crossJoin(_count1(pruned_rows, "fact_rows_after_prune"))
        .crossJoin(_count1(true_rows, "fact_rows_true"))
    )
    return out.select(
        "build_keys",
        "probe_keys",
        "bloom_pass_keys",
        "true_keys",
        (F.col("bloom_pass_keys") - F.col("true_keys")).alias("false_positives"),
        "fact_rows_total",
        "fact_rows_after_prune",
        "fact_rows_true",
    )
