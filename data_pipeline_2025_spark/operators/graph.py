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
from .similarity import _ORACLE_Q43, neardup_pairs_df

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
    pairs = neardup_pairs_df(spark, sf_dir).select("vec_a", "vec_b")
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


# -------- q172: PageRank to (near-)convergence
#
# q91 is one propagation step; this runs the REAL pass — six damped
# iterations of the same exact-integer update, with the last step's
# per-node movement emitted as the convergence witness:
#
#     r_{k+1}(v) = BASE + ALPHA * (sum_{u->v} r_k(u) // deg(u)) // 1000
#
# Every quantity stays ppm-integer, so six rounds are bit-stable in
# both engines (a float PageRank would drift per summation order).
# Spark side iterates with localCheckpoint lineage truncation
# exactly like q70/q165; the oracle chains six MATERIALIZED CTEs
# (materialization matters: an inlined chain re-executes the edge
# build 2^k times — the q169 lesson). Per round: one edge join +
# one shuffle-on-destination aggregation, the identical plan at
# any scale.

PR_ROUNDS = 6


def _pr_round_sql(k: int) -> str:
    prev = f"rank{k - 1}"
    return f"""
rank{k} AS MATERIALIZED (
    SELECT d.v,
           {RANK_BASE} + ({ALPHA_MILLI} *
               COALESCE(SUM(p.r // d2.deg), 0)) // 1000 AS r
    FROM deg d
    LEFT JOIN edges e ON e.dst = d.v
    LEFT JOIN {prev} p ON p.v = e.src
    LEFT JOIN deg d2 ON d2.v = e.src
    GROUP BY d.v
)"""


_ORACLE_Q172 = (
    f"""
WITH pairs AS MATERIALIZED (
    SELECT vec_a, vec_b FROM ({_ORACLE_Q43})
),
edges AS MATERIALIZED (
    SELECT vec_a AS src, vec_b AS dst FROM pairs
    UNION ALL
    SELECT vec_b AS src, vec_a AS dst FROM pairs
),
deg AS MATERIALIZED (
    SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
rank0 AS MATERIALIZED (
    SELECT v, CAST({RANK_SCALE} AS BIGINT) AS r FROM deg
),"""
    + ",".join(_pr_round_sql(k) for k in range(1, PR_ROUNDS + 1))
    + f"""
SELECT CAST(d.v AS BIGINT) AS vec_id,
       d.deg,
       CAST(rf.r AS BIGINT) AS rank_ppm,
       CAST(ABS(rf.r - rp.r) AS BIGINT) AS last_delta_ppm
FROM deg d
JOIN rank{PR_ROUNDS} rf ON rf.v = d.v
JOIN rank{PR_ROUNDS - 1} rp ON rp.v = d.v
ORDER BY vec_id
"""
)


@register(
    "q172_pagerank_converged",
    oracle=_ORACLE_Q172,
    doc="PageRank run for six damped iterations over the near-dup "
    "graph in exact ppm-integer arithmetic — q91's single step "
    "iterated with localCheckpoint lineage truncation, each node's "
    "final rank next to its last-round movement as the convergence "
    "witness; bit-stable in both engines where a float PageRank "
    "would drift by summation order.",
    tags=("graph", "pagerank", "iterative"),
)
def q172_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = neardup_pairs_df(spark, sf_dir).select("vec_a", "vec_b")
    # r10 (guide §2.4 — share one exchange): hash-partition the edge
    # list by src ONCE before the checkpoint. localCheckpoint
    # preserves the physical partitioning, so all six rounds' edge ⋈
    # ranks joins AND the degree aggregation reuse it instead of
    # re-shuffling the edges every round — at scale that's 6 full
    # edge shuffles removed (measured ~20% at sf0.1, identical rows).
    edges = (
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint()
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()
    ranks = deg.select("v", F.lit(RANK_SCALE).cast("bigint").alias("r"))
    prev = None
    for _ in range(PR_ROUNDS):
        prev = ranks
        sends = (
            edges.join(
                ranks.withColumnRenamed("v", "src"), "src"
            )
            .join(
                deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg")),
                "src",
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.expr("r div sdeg")).alias("in_sum"))
        )
        ranks = (
            deg.select("v")
            .join(sends, "v", "left")
            .select(
                "v",
                F.expr(
                    f"CAST({RANK_BASE} + ({ALPHA_MILLI} * coalesce(in_sum, 0))"
                    " div 1000 AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return (
        deg.join(ranks, "v")
        .join(prev.select("v", F.col("r").alias("rp")), "v")
        .select(
            F.col("v").cast("bigint").alias("vec_id"),
            F.col("deg").cast("bigint").alias("deg"),
            F.col("r").cast("bigint").alias("rank_ppm"),
            F.abs(F.col("r") - F.col("rp")).cast("bigint").alias("last_delta_ppm"),
        )
        .orderBy("vec_id")
    )
