"""Audit: the four-type CDF must stay O(delta) in HISTORY LENGTH.

q249's corpus-size tier audit (ROUND8.md) scales row volume; the
operator's OTHER scale axis is commit count — a long merge history.
This tool builds a sink with one base append plus M DV-backed merge
commits (each updating a fixed-size rotating key slice, so total
delta grows linearly with M) and times
``txn.read_changes_with_images`` over the full range at three
history lengths. Linear-or-better growth in M confirms the
classification aggregation is O(total delta): per-version work is
bounded by that version's own write set, with no O(table) or
O(history²) term.

Run on a QUIET box (the r6/r8 lesson): 3-rep medians, warm pass.

    python tools/audit_cdf_history.py [M1 M2 M3]   # default 10 30 100
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_pipeline_2025_spark.session import get_spark  # noqa: E402
from data_pipeline_2025_spark.streaming import txn  # noqa: E402

BASE_ROWS = 2000
MERGE_SLICE = 50  # keys touched per merge commit


def build(spark, sink: str, merges: int) -> None:
    base = spark.range(0, BASE_ROWS).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("day"),
        F.lit(0).cast("long").alias("rev"),
    )
    txn.commit_append(sink, txn.stage_append(base, sink, ("day",)))
    for m in range(merges):
        lo = (m * MERGE_SLICE) % BASE_ROWS
        upd = spark.range(lo, lo + MERGE_SLICE).select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("day"),
            F.lit(m + 1).cast("long").alias("rev"),
        )
        txn.merge_upsert_dv(spark, sink, upd, "id", ("day",))


def time_feed(spark, sink: str, head: int) -> float:
    def run() -> int:
        return txn.read_changes_with_images(spark, sink, 0, head, "id").count()

    run()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = run()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"    rows={n}")
    return ts[1]


def main() -> None:
    ms = [int(x) for x in sys.argv[1:]] or [10, 30, 100]
    spark = get_spark("audit-cdf-history")
    try:
        with open("/proc/loadavg") as f:
            print("loadavg:", f.read().strip())
    except OSError:
        pass
    results = []
    for m in ms:
        sink = tempfile.mkdtemp(prefix=f"cdf_hist_{m}_")
        t0 = time.perf_counter()
        build(spark, sink, m)
        built = time.perf_counter() - t0
        med = time_feed(spark, sink, m + 1)
        results.append((m, med))
        print(
            f"merges={m:4d} build={built:6.1f}s "
            f"feed_median={med:6.2f}s feed_per_commit={med / m * 1000:6.1f}ms"
        )
        shutil.rmtree(sink, ignore_errors=True)
    base_m, base_t = results[0]
    for m, t in results[1:]:
        print(
            f"  {m}/{base_m} = {m / base_m:.0f}x history -> "
            f"{t / base_t:.2f}x wall"
        )


if __name__ == "__main__":
    main()
