"""In-session alternating A/B harness used for the r11 q225/q202
serve experiments (both DECLINED on these measurements — see
OPTIMIZATION_r11.md):

1. fused dual-leg serve vs per-leg chains: q202 2.198 s (per-leg)
   vs 2.902 s (fused) median; q225 5.93 s (fused) — reverted, the
   fused code no longer exists in the tree;
2. 3-thread early-untrained-leg schedule (reconstructed below as
   `q225_old_schedule`'s counterpart) vs the r10 2-thread schedule:
   4.93 vs 4.65 s median, flat within noise — reverted.

Post-revert, production q225 equals the "old schedule" below, so
re-running this compares identical shapes; kept as the measurement
record + harness. Results asserted identical before timing. Guide
§1: decisions under noise are made on interleaved same-session
medians, never cross-run bench deltas.

Usage: python tools/ab_q202_q225.py [--reps 7]
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_2025_spark import registry  # noqa: E402
from data_pipeline_2025_spark.operators import similarity as S  # noqa: E402
from data_pipeline_2025_spark.session import get_spark  # noqa: E402

reps = 7
if "--reps" in sys.argv:
    reps = int(sys.argv[sys.argv.index("--reps") + 1])
sf = "/root/testdata/sf0.1"

spark = get_spark("ab-q202-q225")
spark.sparkContext.setLogLevel("ERROR")
specs = registry.load_all()


def q225_old_schedule(spark, sf_dir):
    """r10 schedule: exact ∥ training, THEN both legs overlapped."""
    vecs = S._int_vecs(spark, sf_dir).localCheckpoint()
    subv = S._q225_sub_rows(vecs)
    c0, sc0 = S._q225_seed_codebooks(vecs)
    queries = S._q225_queries(vecs)
    with ThreadPoolExecutor(2) as pool:
        fex = pool.submit(
            lambda: S._q225_exact(vecs, queries).localCheckpoint()
        )
        ftr = pool.submit(lambda: S._q225_train(vecs, subv, c0, sc0))
        exact = fex.result()
        coarse_t, sub_t = ftr.result()
        fu = pool.submit(
            lambda: S._q225_leg(
                vecs, subv, queries, c0, sc0, exact
            ).localCheckpoint()
        )
        ft = pool.submit(
            lambda: S._q225_leg(
                vecs, subv, queries, coarse_t, sub_t, exact
            ).localCheckpoint()
        )
        u, t = fu.result(), ft.result()
    return (
        u.select(
            "query_id",
            F.col("cand").alias("cand_untrained"),
            F.expr(f"CAST(hits * 1000000 div {S.TOP_K} AS BIGINT)").alias(
                "recall_ppm_untrained"
            ),
        )
        .join(
            F.broadcast(
                t.select(
                    "query_id",
                    F.col("cand").alias("cand_trained"),
                    F.expr(
                        f"CAST(hits * 1000000 div {S.TOP_K} AS BIGINT)"
                    ).alias("recall_ppm_trained"),
                )
            ),
            "query_id",
        )
        .orderBy("query_id")
    )


new225 = specs["q225_trained_ivfpq"].spark_fn
q202 = specs["q202_ivfpq_search"].spark_fn

r_new = [tuple(r) for r in new225(spark, sf).collect()]
r_old = [tuple(r) for r in q225_old_schedule(spark, sf).collect()]
assert r_new == r_old, f"q225 result mismatch:\n{r_new}\n{r_old}"
print("q225 old/new rows identical:", r_new)
q202(spark, sf).collect()  # warm

t_old, t_new, t_202 = [], [], []
for i in range(reps):
    spark.sparkContext.setJobDescription(f"q225 OLD-SCHED rep{i}")
    t0 = time.perf_counter()
    q225_old_schedule(spark, sf).collect()
    t_old.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(f"q225 NEW-SCHED rep{i}")
    t0 = time.perf_counter()
    new225(spark, sf).collect()
    t_new.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(f"q202 rep{i}")
    t0 = time.perf_counter()
    q202(spark, sf).collect()
    t_202.append(time.perf_counter() - t0)
spark.sparkContext.setJobDescription(None)


def med(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


print(
    f"q225 OLD-SCHED median {med(t_old):.3f}s all {[round(t,3) for t in t_old]}"
)
print(
    f"q225 NEW-SCHED median {med(t_new):.3f}s all {[round(t,3) for t in t_new]}"
)
print(f"q202 median {med(t_202):.3f}s all {[round(t,3) for t in t_202]}")
