"""Edit-similarity near-dup via pigeonhole segment blocking (q182).

The dedup family so far prunes candidates by four principles:
shingle-DF caps (q35), LSH banding (q36), prefix filtering (q144)
and sorted-neighborhood blocking (q164). This module adds the
fifth classic principle — **pigeonhole segment blocking** (the
blocking step of PassJoin / Pigeonhole-based edit-similarity
joins): a fixed-length key split into D+1 contiguous segments; any
two keys within Hamming distance D differ in at most D segments, so
they agree EXACTLY on at least one segment at the same position.
Blocking on (segment_index, segment_value) is therefore COMPLETE —
unlike SNM or LSH, no true pair can be missed — and the verify step
runs only inside blocks.

Reference basis: the reference dedupes scraped products on a
normalized name key tolerating vendor typos (salim's
item-matching by name/barcode, salim/app/server/routes/
products.py; fixture near-dups in generate_products.py) — the
same fixed-key fuzzy-identity problem, here over the documents
table's 24-char content prefix.

Scale shape (100 TB):
- one scan emits 3 segment rows per document (constant fan-out,
  unlike shingling's O(tokens));
- the self-join shuffles on (segment_index, segment_value) — block
  sizes are bounded by SEG_DF_CAP exactly like q35's shingle cap
  (hot boilerplate prefixes are dropped IDENTICALLY in both
  engines, so the capped semantics stay cross-engine exact; the
  cap never binds at the test tiers where the largest block is
  ~23 docs);
- verification is O(candidates · KEY_LEN) column algebra — no
  UDFs, no all-pairs anywhere;
- the pair output is grouped-distinct (a pair agreeing on 2
  segments is generated twice, deduped by the final groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

KEY_LEN = 24  # fixed-length match key: first 24 chars, space-padded
HAMMING_D = 2  # tolerate up to 2 substitutions
SEGMENTS = HAMMING_D + 1  # pigeonhole: >= 1 segment must match
SEG_LEN = KEY_LEN // SEGMENTS
# Hot-block cap, applied identically in both engines (the q35
# SHINGLE_DF_CAP idiom): blocks larger than this are boilerplate
# prefixes whose quadratic in-block pair generation would dominate
# at scale; dropping them is a documented recall trade-off and
# never binds at the test tiers.
SEG_DF_CAP = 1024

_KEY_SQL = "rpad(substr(text, 1, 24), 24, ' ')"

_ORACLE_Q182 = f"""
WITH keyed AS (
    SELECT doc_id, {_KEY_SQL} AS k FROM documents
),
segs AS (
    SELECT doc_id, k, i, substr(k, 1 + {SEG_LEN} * i, {SEG_LEN}) AS seg
    FROM keyed, (SELECT unnest([0, 1, 2]) AS i)
),
hot AS (
    SELECT i, seg FROM segs GROUP BY i, seg
    HAVING COUNT(*) > {SEG_DF_CAP}
),
cold AS (
    SELECT s.* FROM segs s ANTI JOIN hot h USING (i, seg)
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           MAX(a.k) AS ka, MAX(b.k) AS kb
    FROM cold a JOIN cold b
      ON a.i = b.i AND a.seg = b.seg AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(hamming(ka, kb) AS BIGINT) AS dist
FROM cand
WHERE hamming(ka, kb) <= {HAMMING_D}
"""


@register(
    "q182_hamming_neardup",
    oracle=_ORACLE_Q182,
    doc="Edit-similarity near-dup pairs (Hamming <= 2 over the "
    "24-char content-prefix key) via pigeonhole segment blocking: "
    "3 position-aligned segments, block join, in-block verify. "
    "Blocking is provably COMPLETE for the Hamming radius (any "
    "pair differing in <= 2 positions shares a segment), the 5th "
    "candidate-pruning principle in the dedup family.",
    tags=("dedup", "editsim", "pigeonhole"),
)
def q182_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    keyed = cat.documents.select(
        "doc_id",
        F.rpad(F.substring("text", 1, KEY_LEN), KEY_LEN, " ").alias("k"),
    )
    segs = keyed.select(
        "doc_id",
        "k",
        F.posexplode(
            F.array(
                *[
                    F.substring("k", 1 + SEG_LEN * i, SEG_LEN)
                    for i in range(SEGMENTS)
                ]
            )
        ).alias("i", "seg"),
    )
    # Hot-block exclusion: the offending (i, seg) list is tiny
    # (<= total_rows / CAP entries) -> broadcast left_anti, so the
    # surviving stream never shuffles for the cap itself.
    hot = (
        segs.groupBy("i", "seg")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SEG_DF_CAP)
        .select("i", "seg")
    )
    cold = segs.join(F.broadcast(hot), ["i", "seg"], "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.max("a.k").alias("ka"), F.max("b.k").alias("kb"))
    )
    # Position-wise mismatch count — pure column algebra (no UDF),
    # O(KEY_LEN) per candidate, candidates bounded by the blocks.
    dist = F.expr(
        f"aggregate(sequence(1, {KEY_LEN}), 0, (acc, i) -> "
        "acc + IF(substr(ka, i, 1) = substr(kb, i, 1), 0, 1))"
    ).cast("bigint")
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") <= HAMMING_D)
        .select("doc_a", "doc_b", "dist")
    )
