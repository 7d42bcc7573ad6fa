"""Driver simulation: run every queries() entry vs its oracle at the
given sf_dir (default the driver's correctness tier sf0.01).

Usage: python tests/drive_driver.py [/root/testdata/sf0.01]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.session import get_spark
from tests.oracle import compare

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark("driver-sim")
df = e.entry(spark)
assert len(df.collect()) >= 0 and df.columns
print("ENTRY ok")

fails = 0
for name, spec in sorted(registry.load_all().items()):
    t0 = time.time()
    try:
        problems = compare(spec, spark, sf)
    except Exception as ex:
        problems = [f"EXCEPTION: {type(ex).__name__}: {str(ex)[:300]}"]
    dt = time.time() - t0
    status = "OK" if not problems else "FAIL"
    if problems:
        fails += 1
    print(f"{status} {name} ({dt:.1f}s)" + ("" if not problems else "\n  " + "\n  ".join(problems[:3])))
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
