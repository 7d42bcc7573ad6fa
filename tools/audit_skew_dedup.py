"""Skew audit for the corpus-dedup survival stage (round-8 rewrite).

Builds a DELIBERATELY skewed corpus — one 8-token boilerplate
segment duplicated across N_HOT documents (default 100_000) on top
of a unique background — then times the round-7 window form
(row_number over md5(segment)) against the round-8 partial-agg form
(groupBy(seg_h).min(struct) + unique-key join-back) and reports the
per-task duration distribution of each run's heaviest stage from the
Spark UI REST API. The window form funnels every hot-segment copy
into ONE task; the agg form's map-side combine keeps every reducer
bounded regardless of duplication.

Usage: python tools/audit_skew_dedup.py [n_hot] [reps]
"""
import json
import shutil
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.catalog import TABLES, table_path
from data_pipeline_2025_spark.session import get_spark
from tests.oracle import compare

N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BASE = "/root/testdata/sf0.001"
OUT = Path("/tmp/dp2025_skew")

HOT = "the quick brown fox jumps over the lazy"  # exactly 8 tokens


def build_corpus() -> str:
    OUT.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        dst = OUT / f"{t}.parquet"
        if t != "documents" and not dst.exists():
            shutil.copy(table_path(BASE, t), dst)
    # hot docs: boilerplate head + 8 unique tokens; background docs
    # entirely unique. Deterministic, no RNG needed.
    doc_ids, texts = [], []
    for i in range(N_HOT):
        doc_ids.append(i)
        texts.append(HOT + " " + " ".join(f"u{i}t{j}" for j in range(8)))
    for i in range(N_HOT, N_HOT + 2_000):
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
        row_group_size=8192,  # many input splits → real parallelism
    )
    return str(OUT)


def window_form(spark, sf_dir):
    """The round-7 shape, inlined for comparison only."""
    from data_pipeline_2025_spark.catalog import Catalog
    from data_pipeline_2025_spark.operators.dedup import SEG_W
    from data_pipeline_2025_spark.operators.text import tokens_col

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", tokens_col().alias("toks")
    )
    n_seg = F.ceil(F.size("toks") / F.lit(SEG_W)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                n_seg > 0,
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.slice(F.col("toks"), i * SEG_W + 1, SEG_W),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("seg_no", "seg_toks"),
    ).select(
        "doc_id",
        "seg_no",
        F.array_join("seg_toks", " ").alias("seg"),
        F.size("seg_toks").cast("bigint").alias("seg_len"),
    )
    w = Window.partitionBy(F.md5(F.col("seg").cast("binary"))).orderBy(
        "doc_id", "seg_no"
    )
    ranked = segs.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") == 1
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("segs_total"),
        F.sum(kept.cast("bigint")).cast("bigint").alias("segs_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("seg_len"))), F.lit(0))
        .cast("bigint")
        .alias("toks_after"),
    )


def completed_stage_ids(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    return {st["stageId"] for st in stages}


def task_time_summary(spark, exclude=frozenset()):
    """Max/median task duration of the heaviest completed stage
    (ignoring stage ids in ``exclude`` — earlier runs)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    rows = []
    for st in stages:
        if st["stageId"] in exclude:
            continue
        sid, att = st["stageId"], st["attemptId"]
        q = (
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}"
            "/taskSummary?quantiles=0.5,1.0"
        )
        try:
            ts = json.loads(urllib.request.urlopen(q, timeout=10).read())
        except Exception:
            continue
        med, mx = ts["duration"]
        rows.append(
            {
                "stage": sid,
                "tasks": st["numCompleteTasks"],
                "med_task_s": round(med / 1000, 3),
                "max_task_s": round(mx / 1000, 3),
                "skew": round(mx / max(med, 1.0), 1),
            }
        )
    rows.sort(key=lambda r: -r["max_task_s"])
    return rows[:6]


def main():
    sf_dir = build_corpus()
    spark = get_spark("skew-audit")
    spec = registry.load_all()["q229_segment_dedup_rebuild"]

    # correctness on the skewed corpus first (hash vs DuckDB oracle)
    problems = compare(spec, spark, sf_dir)
    print("skewed-corpus oracle check:", "OK" if not problems else problems)

    results = {}
    for label, fn in (
        ("window_r7", lambda: window_form(spark, sf_dir)),
        ("agg_r8", lambda: spec.spark_fn(spark, sf_dir)),
    ):
        fn().count()  # warm (file listing, code gen)
        before = completed_stage_ids(spark)
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn().count()
            times.append(time.time() - t0)
        times.sort()
        med = times[len(times) // 2]
        summ = task_time_summary(spark, exclude=before)
        results[label] = {"median_s": round(med, 3), "tasks": summ}
        print(label, json.dumps(results[label]))

    # Focused survival-stage micro-benchmark: cache the exploded
    # segments so the md5/explode scan cost is out of the picture,
    # then force ONLY the survival computation — the window must
    # sort every hot-key copy in one task; the agg's map-side
    # combine hands each reducer ≤ #map-partitions rows per key.
    from data_pipeline_2025_spark.catalog import Catalog
    from data_pipeline_2025_spark.operators.dedup import SEG_W
    from data_pipeline_2025_spark.operators.text import tokens_col

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", tokens_col().alias("toks")
    )
    n_seg = F.ceil(F.size("toks") / F.lit(SEG_W)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                n_seg > 0,
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.slice(F.col("toks"), i * SEG_W + 1, SEG_W),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("seg_no", "seg_toks"),
    ).select(
        "doc_id",
        "seg_no",
        F.md5(F.array_join("seg_toks", " ").cast("binary")).alias("seg_h"),
    ).cache()
    segs.count()  # materialize

    w = Window.partitionBy("seg_h").orderBy("doc_id", "seg_no")
    legs = {
        "survival_window": lambda: segs.withColumn(
            "rn", F.row_number().over(w)
        ).agg(F.sum("rn")),
        "survival_agg": lambda: segs.groupBy("seg_h").agg(
            F.min(F.struct("doc_id", "seg_no")).alias("m")
        ).agg(F.count(F.lit(1))),
    }
    micro = {}
    for label, fn in legs.items():
        fn().collect()
        before = completed_stage_ids(spark)
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn().collect()
            times.append(time.time() - t0)
        times.sort()
        micro[label] = {
            "median_s": round(times[len(times) // 2], 3),
            "tasks": task_time_summary(spark, exclude=before)[:3],
        }
        print(label, json.dumps(micro[label]))
    segs.unpersist()

    print(
        json.dumps(
            {
                "n_hot": N_HOT,
                "window_r7_s": results["window_r7"]["median_s"],
                "agg_r8_s": results["agg_r8"]["median_s"],
                "survival_window_s": micro["survival_window"]["median_s"],
                "survival_agg_s": micro["survival_agg"]["median_s"],
                "survival_speedup": round(
                    micro["survival_window"]["median_s"]
                    / micro["survival_agg"]["median_s"],
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
