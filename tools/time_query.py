"""Time individual queries in isolation (guide §1: measure first).

Usage: python tools/time_query.py q215_incremental_matview [q...] \
           [--sf /root/testdata/sf0.1] [--reps 5] [--noop]

Methodology matches bench.py (timed action = .collect() on a warm
session, after one untimed warm pass builds any session-scoped
sinks/caches), so numbers are directly comparable to BENCH_*.json.
--noop switches the timed action to the noop sink (guide §1.4) for
plan-cost isolation; those numbers are NOT comparable to the bench
and are only used for before/after deltas on the same action.
Jobs are labelled via setJobDescription for UI reads.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_2025_spark import registry  # noqa: E402
from data_pipeline_2025_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.1"
    reps = 5
    noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        else:
            names.append(a)
            i += 1
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()
    for name in names:
        fn = specs[name].spark_fn
        # untimed warm pass (session sinks, codegen, caches)
        fn(spark, sf).collect()
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name}: median {med:.3f}s min {s[0]:.3f} max {s[-1]:.3f} "
            f"all {[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
