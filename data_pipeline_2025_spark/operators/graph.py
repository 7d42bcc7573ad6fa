"""Graph analytics over the embedding near-dup graph — link-style
quality propagation (q91), completing the iterative-algorithm family
(q70 connected components, q82 Lloyd step) with the PageRank shape.

Training-data pipelines run exactly this pass over their duplicate /
citation / host-link graphs to propagate quality signals: a page
linked by many well-linked pages outranks an isolated one, and
near-dup cluster hubs surface as high-rank nodes worth canonical
status.

One deterministic propagation step in PURE INTEGER arithmetic
(rank and damping scaled to parts-per-million; every division an
integer floor-div identical in DuckDB), so the result — unlike a
float PageRank — is bit-stable across engines and partitionings:

    r0(v)   = SCALE                       for every node with edges
    send(v) = r0(v) // deg(v)             to each neighbor
    r1(v)   = BASE + ALPHA·Σ send(u) // 1000   over in-neighbors u

Scale design: edges come from the IVF-bucketed verified pair
generator (similarity.q43 — never all-pairs); degrees are one
groupBy over the edge list; the propagation is a single
shuffle-on-destination aggregation, partial-aggregatable. Real
multi-round runs iterate exactly this step with localCheckpoint
lineage truncation (the q70 pattern).

Reference basis: the reference has no graph layer; this is part of
the at-scale training-data surface BASELINE.json asks for beyond
reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog  # noqa: F401  (module convention)
from ..registry import register
from .similarity import _ORACLE_Q43, q43_embedding_neardup

RANK_SCALE = 1_000_000
ALPHA_MILLI = 850  # damping 0.85 in integer milli-units
RANK_BASE = RANK_SCALE * (1000 - ALPHA_MILLI) // 1000

_ORACLE_Q91 = f"""
WITH pairs AS (
    SELECT vec_a, vec_b FROM ({_ORACLE_Q43})
),
edges AS (
    SELECT vec_a AS src, vec_b AS dst FROM pairs
    UNION ALL
    SELECT vec_b AS src, vec_a AS dst FROM pairs
),
deg AS (
    SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
contrib AS (
    SELECT e.dst AS v, d.deg_send
    FROM edges e
    JOIN (SELECT v, {RANK_SCALE} // deg AS deg_send FROM deg) d ON d.v = e.src
)
SELECT CAST(d.v AS BIGINT) AS vec_id,
       d.deg,
       CAST({RANK_BASE} + ({ALPHA_MILLI} * SUM(c.deg_send)) // 1000 AS BIGINT)
           AS rank_ppm
FROM deg d JOIN contrib c ON c.v = d.v
GROUP BY d.v, d.deg
"""


@register(
    "q91_rank_propagation",
    oracle=_ORACLE_Q91,
    doc="One PageRank-shaped propagation step over the embedding "
    "near-dup graph in exact ppm-integer arithmetic (damping 0.85): "
    "degree groupBy + one shuffle-on-destination aggregation; "
    "iterate with localCheckpoint for multi-round runs.",
    tags=("graph", "dedup", "scale"),
)
def q91_rank_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q43_embedding_neardup(spark, sf_dir).select("vec_a", "vec_b")
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).unionAll(pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    send = deg.select("v", F.expr(f"{RANK_SCALE} div deg").alias("deg_send"))
    contrib = (
        edges.join(send.withColumnRenamed("v", "src"), "src")
        .groupBy(F.col("dst").alias("v"))
        .agg(F.sum("deg_send").alias("in_sum"))
    )
    return (
        deg.join(contrib, "v")
        .select(
            F.col("v").cast("bigint").alias("vec_id"),
            F.col("deg").cast("bigint").alias("deg"),
            F.expr(f"CAST({RANK_BASE} + ({ALPHA_MILLI} * in_sum) div 1000 AS BIGINT)").alias(
                "rank_ppm"
            ),
        )
    )
