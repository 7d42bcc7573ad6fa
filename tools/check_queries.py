"""Spot-check a subset of registry queries against their DuckDB
oracles — the single-query iteration loop for drive_driver.py.

Usage: python tools/check_queries.py q229 q247 [--sf /root/testdata/sf0.01]
Name prefixes match (q229 → q229_segment_dedup_rebuild).
"""
import sys, time

sys.path.insert(0, "/root/repo")
from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.session import get_spark
from tests.oracle import compare

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    sf = args[i + 1]
    del args[i : i + 2]

specs = registry.load_all()
names = []
for a in args:
    hit = [n for n in specs if n == a or n.startswith(a)]
    if not hit:
        print(f"no query matches {a!r}")
        sys.exit(2)
    names.extend(hit)

spark = get_spark("check-queries")
fails = 0
for name in names:
    t0 = time.time()
    try:
        problems = compare(specs[name], spark, sf)
    except Exception as ex:
        problems = [f"EXCEPTION: {type(ex).__name__}: {str(ex)[:300]}"]
    dt = time.time() - t0
    if problems:
        fails += 1
    print(("OK " if not problems else "FAIL ") + f"{name} ({dt:.1f}s)"
          + ("" if not problems else "\n  " + "\n  ".join(problems[:3])))
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
