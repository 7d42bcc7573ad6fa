"""Token-skew audit for q259_token_drift (round-10, r9 verdict #7).

q259's shape is explode(tokens) → groupBy(tok) with two conditional
SUMs → broadcast totals → partial top-k. The groupBy(tok) is the
q261/q263 join-back's cousin: a 10^6-duplicated token COULD funnel
through one reducer if the aggregation were not partial-aggregatable
(map-side combined). This audit builds a corpus with one token
duplicated N_HOT times (default 1_000_000) over a unique background,
runs q259, and reports the per-task duration distribution of every
completed stage from the Spark UI REST API plus the plan's
partial_sum evidence. Expected: the hot token collapses to ONE row
per map partition before the shuffle, so max/median task skew stays
flat at any duplication factor.

Usage: python tools/audit_skew_drift.py [n_hot] [reps]
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

from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.catalog import TABLES, table_path
from data_pipeline_2025_spark.session import get_spark

N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
BASE = "/root/testdata/sf0.001"
OUT = Path("/tmp/dp2025_skew_drift")

HOT_TOK = "zzhot"
PER_DOC = 1_000  # hot-token copies per hot doc


def build_corpus() -> str:
    OUT.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        dst = OUT / f"{t}.parquet"
        if t != "documents" and not dst.exists():
            shutil.copy(table_path(BASE, t), dst)
    n_hot_docs = N_HOT // PER_DOC
    doc_ids, texts, sources = [], [], []
    # hot docs all land in split A → the hot token is ALSO the
    # top-drift row, so its aggregated counts are value-checked in
    # the query output, not just timed
    for i in range(n_hot_docs):
        doc_ids.append(i)
        texts.append(" ".join([HOT_TOK] * PER_DOC))
        sources.append("src0")
    for i in range(n_hot_docs, n_hot_docs + 4_000):
        doc_ids.append(i)
        texts.append(" ".join(f"b{i}t{j}" for j in range(16)))
        sources.append(f"src{i % 2}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(doc_ids), pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        OUT / "documents.parquet",
        row_group_size=512,  # many input splits → real parallelism
    )
    return str(OUT)


def completed_stage_ids(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    return {st["stageId"] for st in stages}


def task_time_summary(spark, exclude=frozenset()):
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
    spark = get_spark("skew-drift-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spec = registry.load_all()["q259_token_drift"]

    # plan evidence: the hot-token agg must be map-side combined
    plan = spec.spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    print("partial_sum in plan:", "partial_sum" in plan)

    seen = completed_stage_ids(spark)
    for rep in range(REPS):
        t0 = time.perf_counter()
        rows = spec.spark_fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        hot = [r for r in rows if r["tok"] == HOT_TOK]
        print(
            f"rep{rep}: wall={wall:.2f}s rows={len(rows)} "
            f"hot_row={hot[0].asDict() if hot else None}"
        )
        for s in task_time_summary(spark, exclude=seen):
            print("  ", s)
        seen = completed_stage_ids(spark)


if __name__ == "__main__":
    main()
