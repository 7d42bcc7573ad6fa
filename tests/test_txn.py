"""Unit tests for the manifest commit log (streaming/txn.py) — the
transaction boundary under every streaming sink. End-to-end crash
proofs live in test_ingest.py (silver) and test_streaming.py
(cagg/cms/dedupgate/ivf); these pin the primitive's own semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_2025_spark.streaming import txn


def _rows(spark, sink):
    df = txn.read_committed(spark, sink)
    return (
        set()
        if df is None
        else {(r["id"], r["day"]) for r in df.collect()}
    )


def _mk(spark, lo, hi, day):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(day).alias("day")
    )


def test_append_then_replace_partition_semantics(spark, tmp_path):
    sink = str(tmp_path / "t")
    # two appends accumulate
    txn.commit_append(sink, txn.stage_append(_mk(spark, 0, 3, "a"), sink, ("day",)))
    txn.commit_append(sink, txn.stage_append(_mk(spark, 3, 5, "b"), sink, ("day",)))
    assert _rows(spark, sink) == {(i, "a") for i in range(3)} | {
        (3, "b"),
        (4, "b"),
    }
    # replace rewrites ONLY the partitions present in the new data
    txn.commit_replace(
        sink, txn.stage_append(_mk(spark, 100, 101, "b"), sink, ("day",))
    )
    assert _rows(spark, sink) == {(i, "a") for i in range(3)} | {(100, "b")}
    # superseded + never-committed files are reclaimed by vacuum;
    # committed content survives
    orphan_files = txn.stage_append(_mk(spark, 999, 1000, "c"), sink, ("day",))
    assert orphan_files  # staged but never committed
    removed = txn.vacuum(sink)
    assert set(orphan_files) <= set(removed)  # crash orphans gone
    assert any("day=b" in f for f in removed)  # superseded old 'b' gone
    assert _rows(spark, sink) == {(i, "a") for i in range(3)} | {(100, "b")}


def test_partition_filters_prune_committed_reads(spark, tmp_path):
    """read_committed keeps hive partition columns (basePath), so a
    day filter still prunes at the file index — the property the
    partition-bounded ingest anti-join depends on."""
    sink = str(tmp_path / "t")
    txn.commit_append(sink, txn.stage_append(_mk(spark, 0, 3, "a"), sink, ("day",)))
    txn.commit_append(sink, txn.stage_append(_mk(spark, 3, 6, "b"), sink, ("day",)))
    df = txn.read_committed(spark, sink).where(F.col("day") == "a")
    assert df.count() == 3
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters")[1].split("]")[0]


def test_plain_directory_read_matches_committed_on_happy_path(spark, tmp_path):
    """On the no-crash path the _txn machinery is invisible: a plain
    spark.read.parquet over the sink dir sees exactly the committed
    rows (staging lives under _txn, hidden from discovery)."""
    sink = str(tmp_path / "t")
    txn.commit_append(sink, txn.stage_append(_mk(spark, 0, 4, "a"), sink, ("day",)))
    plain = {
        (r["id"], r["day"]) for r in spark.read.parquet(sink).collect()
    }
    assert plain == _rows(spark, sink)
    assert os.path.isdir(os.path.join(sink, "_txn"))


def test_time_travel_reads_frozen_snapshots(spark, tmp_path):
    """versionAsOf semantics: every commit appends a monotone
    manifest version; reading an old version returns EXACTLY the
    rows that commit published, unchanged by later appends AND by a
    later commit_replace of the same partition (data files are
    immutable; superseded files survive until vacuum)."""
    sink = str(tmp_path / "t")
    txn.commit_append(sink, txn.stage_append(_mk(spark, 0, 3, "a"), sink, ("day",)))
    txn.commit_append(sink, txn.stage_append(_mk(spark, 3, 5, "b"), sink, ("day",)))
    txn.commit_replace(sink, txn.stage_append(_mk(spark, 100, 101, "b"), sink, ("day",)))
    assert txn.versions(sink) == [1, 2, 3]
    v = lambda n: {  # noqa: E731
        (r["id"], r["day"]) for r in txn.read_version(spark, sink, n).collect()
    }
    assert v(1) == {(0, "a"), (1, "a"), (2, "a")}
    assert v(2) == v(1) | {(3, "b"), (4, "b")}
    assert v(3) == v(1) | {(100, "b")}
    assert v(3) == _rows(spark, sink)  # latest version == live table
    # vacuum keeps every still-referenced... no: vacuum deletes files
    # outside the LATEST snapshot, so after it only the live version
    # remains readable — the retention trade-off documented on vacuum.
    txn.vacuum(sink)
    assert v(3) == _rows(spark, sink)
