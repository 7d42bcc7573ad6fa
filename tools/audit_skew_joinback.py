"""Skew audit for survivor/flag JOIN-BACKS + the AQE limitation that
motivated their round-9 shapes.

FINDING (demonstrated by demo_aqe_limitation below): Spark's AQE
skew-join split ONLY fires when both join children are plain shuffle
stages. The moment the build side rides its own aggregation exchange
— exactly the `corpus.join(corpus.groupBy(key).agg(...), key)` shape
every survivor/flag join-back starts as — OptimizeSkewedJoin cannot
re-read the build partition per sub-split and the hot probe
partition stays ONE task. "AQE will save us" is therefore NOT a
valid scale story for join-backs; the engine's shapes must be
skew-proof by construction:

  * q229/q261/q263: join on the UNIQUE composite key
    (content_key, doc_id) — a hot content key spreads over distinct
    doc_ids, so no hot shuffle partition exists at all.
  * q251/q200: the flag applies to every occurrence (no unique key
    available), so the fair-share hot/cold decomposition is used —
    above-1/P keys (a self-bounding <= P-row set) join map-side via
    broadcast, the cold tail joins co-keyed behind a broadcast
    anti-filter that keeps hot occurrences out of the shuffle.

This audit (a) pins the AQE behavior both ways with minimal repros,
(b) oracle-checks q261 on a corpus where ONE text is duplicated
N_HOT times, and (c) reports the per-task distribution of q261's
heaviest stages — flat, because the composite key distributes the
hot fingerprint.

Usage: python tools/audit_skew_joinback.py [n_hot] [reps]
"""
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.catalog import TABLES, table_path
from data_pipeline_2025_spark.session import get_spark
from tests.oracle import compare
from tools.audit_skew_dedup import completed_stage_ids, task_time_summary

N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BASE = "/root/testdata/sf0.001"
OUT = Path("/tmp/dp2025_skew_joinback")

HOT_TEXT = " ".join(f"hot{j}" for j in range(24))


def build_corpus() -> str:
    OUT.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        dst = OUT / f"{t}.parquet"
        if t != "documents" and not dst.exists():
            shutil.copy(table_path(BASE, t), dst)
    doc_ids, texts = [], []
    for i in range(N_HOT):  # one fingerprint, N_HOT copies
        doc_ids.append(i)
        texts.append(HOT_TEXT)
    for i in range(N_HOT, N_HOT + 2_000):  # unique background
        doc_ids.append(i)
        texts.append(" ".join(f"b{i}t{j}" for j in range(16)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(doc_ids), pa.string()),
                "source": pa.array(["skew"] * len(doc_ids), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        OUT / "documents.parquet",
        row_group_size=8192,
    )
    return str(OUT)


def _final_plan(df) -> str:
    df.collect()  # executedPlan is only final on the acted-on frame
    return df._jdf.queryExecution().executedPlan().toString()


def demo_aqe_limitation(spark) -> dict:
    """Minimal repros: an 80%-hot probe joined to (a) an independent
    small frame — AQE splits; (b) its own aggregate — AQE does not."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # audit-scale thresholds; production defaults (256 MB, factor 5)
    # are the same mechanism in bigger units
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "128k",
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    a = spark.range(2_000_000).select(
        F.when(F.col("id") % 5 < 4, F.lit(0))
        .otherwise(F.col("id") % 5)
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("pay"),
    )
    b = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    independent = _final_plan(a.join(b, "k"))
    own_agg = _final_plan(
        a.join(a.groupBy("k").agg(F.min("pay").alias("sv")), "k")
    )
    out = {
        "independent_sides_split": "skew=true" in independent,
        "agg_fused_build_split": "skew=true" in own_agg,
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    return out


def main():
    sf_dir = build_corpus()
    spark = get_spark("skew-joinback-audit")

    demo = demo_aqe_limitation(spark)
    print("aqe_limitation_demo:", json.dumps(demo))

    spec = registry.load_all()["q261_domain_quality_rollup"]
    problems = compare(spec, spark, sf_dir)
    print("skewed-corpus oracle check:", "OK" if not problems else problems)

    spec.spark_fn(spark, sf_dir).count()  # warm
    before = completed_stage_ids(spark)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        spec.spark_fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    times.sort()
    summ = task_time_summary(spark, exclude=before)[:4]
    print("q261 heaviest stages:", json.dumps(summ))
    print(
        json.dumps(
            {
                "n_hot": N_HOT,
                "aqe_splits_independent_join": demo[
                    "independent_sides_split"
                ],
                "aqe_splits_aggfused_joinback": demo[
                    "agg_fused_build_split"
                ],
                "q261_wall_s": round(times[len(times) // 2], 3),
                "q261_worst_stage_skew": summ[0]["skew"] if summ else None,
            }
        )
    )


if __name__ == "__main__":
    main()
