import sys, time, json
sys.path.insert(0, '/root/repo')
from data_pipeline_2025_spark import registry
from data_pipeline_2025_spark.session import get_spark

QUERIES = sys.argv[1].split(',')
TIERS = [("sf0.1", "/root/testdata/sf0.1"),
         ("sf1(10x)", "/tmp/dp2025_scaled/sf1"),
         ("sf3(30x)", "/tmp/dp2025_scaled/sf3")]
specs = registry.load_all()
spark = get_spark("tier-audit")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in QUERIES:
    fn = specs[name].spark_fn
    row = {}
    for label, d in TIERS:
        fn(spark, d).collect()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time(); fn(spark, d).collect(); ts.append(time.time()-t0)
        ts.sort(); row[label] = round(ts[1], 2)
    row["10x_ratio"] = round(row["sf1(10x)"]/max(row["sf0.1"],1e-9),1)
    row["30x_ratio"] = round(row["sf3(30x)"]/max(row["sf0.1"],1e-9),1)
    out[name] = row
    print(name, json.dumps(row), flush=True)
