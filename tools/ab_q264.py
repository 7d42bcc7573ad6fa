"""In-session alternating A/B for q264: the r10 form (sequential
bands/doc_sets checkpoints; three per-doc rollups joined back one by
one) vs the r11 form (overlapped checkpoints; one tagged-union
conditional agg). Results asserted identical.

Usage: python tools/ab_q264.py [--reps 7]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_2025_spark import registry  # noqa: E402
from data_pipeline_2025_spark.operators import dedup as D  # noqa: E402
from data_pipeline_2025_spark.session import get_spark  # noqa: E402

reps = 7
if "--reps" in sys.argv:
    reps = int(sys.argv[sys.argv.index("--reps") + 1])
sf = "/root/testdata/sf0.1"

spark = get_spark("ab-q264")
spark.sparkContext.setLogLevel("ERROR")
specs = registry.load_all()


def q264_old(spark, sf_dir):
    """The r10 assembly, verbatim."""
    bands = D.band_keys(D.minhash_df(spark, sf_dir)).localCheckpoint()
    delta_b = bands.where(F.col("doc_id") % D.INC_MOD == 0)
    base_b = bands.where(F.col("doc_id") % D.INC_MOD != 0)
    sh = D.shingles_df(spark, sf_dir)
    doc_sets = sh.groupBy("doc_id").agg(
        F.collect_list("sh").alias("shs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint()

    def probe(index_b):
        return (
            delta_b.alias("d")
            .join(
                index_b.alias("x"),
                (F.col("d.band") == F.col("x.band"))
                & (F.col("d.bkey") == F.col("x.bkey")),
            )
            .select(
                F.col("d.doc_id").alias("delta_doc"),
                F.col("x.doc_id").alias("idx_doc"),
            )
            .distinct()
        )

    cand1 = probe(base_b).localCheckpoint()
    dups1 = D._probe_counts(
        D._verified_dup_pairs(cand1, doc_sets), "n_dups_first"
    )
    firstpass = (
        delta_b.select("doc_id")
        .distinct()
        .join(dups1, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dups_first", F.lit(0))
            .cast("bigint")
            .alias("n_dups_first"),
            F.when(F.col("n_dups_first").isNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("admitted"),
        )
        .localCheckpoint()
    )
    admitted_b = delta_b.join(
        firstpass.where(F.col("admitted") == 1).select("doc_id"),
        "doc_id",
        "semi",
    )
    extra = probe(admitted_b)
    ncand1 = D._probe_counts(cand1, "nc1")
    ncand_x = D._probe_counts(extra, "ncx")
    dups_x = D._probe_counts(D._verified_dup_pairs(extra, doc_sets), "ndx")
    n_dups_replay = (
        F.col("n_dups_first") + F.coalesce("ndx", F.lit(0))
    ).cast("bigint")
    return (
        firstpass.join(ncand1, "doc_id", "left")
        .join(ncand_x, "doc_id", "left")
        .join(dups_x, "doc_id", "left")
        .select(
            "doc_id",
            "n_dups_first",
            "admitted",
            (F.coalesce("nc1", F.lit(0)) + F.coalesce("ncx", F.lit(0)))
            .cast("bigint")
            .alias("n_cand_replay"),
            n_dups_replay.alias("n_dups_replay"),
            F.when(n_dups_replay == 0, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("readmitted"),
        )
        .orderBy("doc_id")
    )


new264 = specs["q264_lsh_index_foldin"].spark_fn
r_new = [tuple(r) for r in new264(spark, sf).collect()]
r_old = [tuple(r) for r in q264_old(spark, sf).collect()]
assert r_new == r_old, "q264 result mismatch"
print(f"q264 old/new rows identical ({len(r_new)} rows)")

t_old, t_new = [], []
for i in range(reps):
    spark.sparkContext.setJobDescription(f"q264 OLD rep{i}")
    t0 = time.perf_counter()
    q264_old(spark, sf).collect()
    t_old.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(f"q264 NEW rep{i}")
    t0 = time.perf_counter()
    new264(spark, sf).collect()
    t_new.append(time.perf_counter() - t0)
spark.sparkContext.setJobDescription(None)


def med(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


print(f"q264 OLD median {med(t_old):.3f}s all {[round(t,3) for t in t_old]}")
print(f"q264 NEW median {med(t_new):.3f}s all {[round(t,3) for t in t_new]}")
