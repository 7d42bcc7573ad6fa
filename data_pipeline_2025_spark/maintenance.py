"""Table maintenance: small-file compaction for partitioned parquet
sinks.

Streaming sinks (streaming/ingest.py, streaming/cagg.py,
streaming/dedupgate.py) append one-or-more files per micro-batch;
after days of small batches a day partition holds hundreds of tiny
files and every read pays file-open + footer overhead (the classic
lakehouse small-file problem — Delta's OPTIMIZE, Hive's
concatenate). No Delta in this environment, so compaction is
staged-rewrite-and-atomic-swap per partition:

1. read the partition, coalesce toward TARGET_FILE_BYTES;
2. write to a staging dir BESIDE the partition (same filesystem);
3. atomically swap via two renames (partition -> trash, staging ->
   partition), then delete trash.

Readers that resolved the old directory keep their file handles
(POSIX rename semantics locally; on an object store this becomes a
manifest swap — the Delta/Iceberg seam documented in SCALE.md).
Only partitions whose file count exceeds the threshold are touched;
row identity is the invariant the test asserts.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024
MIN_FILES_TO_COMPACT = 4


def _partition_dirs(table_dir: str) -> list[str]:
    out = []
    for name in sorted(os.listdir(table_dir)):
        full = os.path.join(table_dir, name)
        if os.path.isdir(full) and "=" in name:
            out.append(full)
    return out


def _data_files(part_dir: str) -> list[str]:
    return [
        f
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def compact_partitioned_table(
    spark: SparkSession,
    table_dir: str,
    min_files: int = MIN_FILES_TO_COMPACT,
) -> dict[str, tuple[int, int]]:
    """Compact every hive-partitioned subdirectory of ``table_dir``
    whose small-file count is >= ``min_files``. Returns
    {partition_name: (files_before, files_after)} for the touched
    partitions only — untouched partitions are never rewritten
    (asserted by test via mtimes)."""
    results: dict[str, tuple[int, int]] = {}
    for part_dir in _partition_dirs(table_dir):
        files = _data_files(part_dir)
        if len(files) < min_files:
            continue
        total_bytes = sum(
            os.path.getsize(os.path.join(part_dir, f)) for f in files
        )
        n_out = max(1, (total_bytes + TARGET_FILE_BYTES - 1) // TARGET_FILE_BYTES)
        staging = part_dir + "._compacting"
        trash = part_dir + "._trash"
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        (
            spark.read.parquet(part_dir)
            .coalesce(int(n_out))
            .write.mode("overwrite")
            .parquet(staging)
        )
        # atomic-ish swap: two renames on the same filesystem
        os.rename(part_dir, trash)
        os.rename(staging, part_dir)
        shutil.rmtree(trash)
        results[os.path.basename(part_dir)] = (
            len(files),
            len(_data_files(part_dir)),
        )
    return results


def table_row_fingerprint(spark: SparkSession, table_dir: str) -> tuple[int, str]:
    """(row_count, order-insensitive content hash) of a parquet
    table — the before/after invariant for compaction."""
    df = spark.read.parquet(table_dir)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)]))
    agg = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return agg["n"], str(agg["s"])
