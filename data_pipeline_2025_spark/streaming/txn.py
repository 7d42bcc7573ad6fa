"""Transactional append for partitioned parquet sinks — the
reference's Postgres transaction analog, without Delta.

The reference's consumer gets multi-write atomicity for free from
Postgres (`BEGIN ... ON CONFLICT DO NOTHING ... COMMIT`,
examples/rabbitmq-to-postgres/app.py:158-176): a crash mid-batch
leaves NOTHING visible. A plain `df.write.mode("append")` parquet
sink has no such boundary — Spark's job commit moves task files into
the destination one by one, so a crash mid-commit leaves a SUBSET of
the batch's files visible, and (worse for this pipeline) the ingest
idempotence anti-join would then see those orphaned rows, absorb the
replayed batch, and the missing rows would never land: partial
visibility converts a transient crash into permanent data loss.

Fix: a manifest commit log, the minimal slice of the Delta/Iceberg
design that restores the transaction boundary on any filesystem with
atomic rename:

1. the micro-batch is written to a hidden staging dir
   (``<sink>/_txn/staging-*`` — leading underscore, invisible to
   Spark's partition discovery);
2. its data files are MOVED into their partition directories under
   collision-free names — still invisible, because committed readers
   go through the manifest;
3. one manifest file listing every committed data file is written
   and published by an atomic symlink swap (``os.replace`` of a
   symlink — the same primitive as artifacts.publish).

Readers resolve the symlink once and read exactly that snapshot:
old-or-new, never partial (snapshot isolation; superseded files are
never deleted except by vacuum). A crash between (2) and (3) leaves
orphaned data files that no manifest references — invisible to every
reader, re-written by the replayed batch (the checkpoint re-delivers
it), and reclaimed by :func:`vacuum`.

Adopted by EVERY streaming sink in this package (round 4): the
price ingest silver (ingest.py), the continuous-aggregate silver +
rollup (cagg.py — rollup day-partition rewrites go through
:func:`commit_replace`, making a multi-day refresh ONE transaction,
which Spark's native partitionOverwriteMode=dynamic cannot give),
the CMS sketch store (cms.py), the dedup gate's verdict + signature
stores (dedupgate.py), and the streaming IVF inverted lists
(ivf.py). In each, the idempotence anti-join reads the committed
snapshot, so a crash orphan can never absorb a replayed batch.

Scale note (100 TB): the manifest is a full listing, O(total files)
per commit — fine for a bounded replay window with periodic
compaction, and exactly the point where a real deployment swaps this
module for Delta/Iceberg (whose log + checkpoint files amortize the
listing). The READ path is unchanged in spirit: ``option("basePath")``
keeps hive partition columns, so partition pruning on ``ingest_date``
still skips unlisted files.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

TXN_DIR = "_txn"
LATEST = "LATEST"


def _txn_dir(sink_dir: str) -> str:
    return os.path.join(sink_dir, TXN_DIR)


def _latest_path(sink_dir: str) -> str:
    return os.path.join(_txn_dir(sink_dir), LATEST)


def is_transactional(sink_dir: str) -> bool:
    """True when the sink is managed by this commit log. Keyed on the
    ``_txn`` DIRECTORY, not the LATEST symlink: stage_append creates
    the directory before it moves a single data file, so a crash
    during the sink's FIRST-ever commit (files renamed into the
    partition layout, manifest never published) still reads as
    transactional. The committed snapshot is then empty — the
    legacy directory-scan fallback must never see those orphans, or
    the ingest idempotence anti-join would absorb the replayed batch
    against rows vacuum later deletes (permanent loss)."""
    return os.path.isdir(_txn_dir(sink_dir))


def committed_files(sink_dir: str) -> list[str]:
    """Relative paths of the data files in the current committed
    snapshot (empty list for a sink with no commits yet). Resolves
    the LATEST symlink once — concurrent publishes after this call
    don't tear the listing (snapshot isolation)."""
    latest = _latest_path(sink_dir)
    if not os.path.lexists(latest):
        return []
    version_file = os.path.realpath(latest)
    with open(version_file, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def read_committed(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """DataFrame over exactly the committed snapshot, or None when no
    data has ever been committed. ``basePath`` recovers the hive
    partition columns so downstream partition-column filters still
    prune (they filter the file list, same as directory reads)."""
    files = committed_files(sink_dir)
    if not files:
        return None
    return (
        spark.read.option("basePath", sink_dir)
        .parquet(*[os.path.join(sink_dir, f) for f in files])
    )


def stage_append(df: DataFrame, sink_dir: str, partition_by: tuple[str, ...]) -> list[str]:
    """Write ``df`` into the sink's partition layout WITHOUT making
    it visible: parquet into a hidden staging dir, then rename each
    data file into its partition directory under a collision-free
    name. Returns the new files' sink-relative paths — pass them to
    :func:`commit_append` to publish. A crash anywhere in here (or
    before the commit) leaves only manifest-invisible garbage."""
    os.makedirs(_txn_dir(sink_dir), exist_ok=True)
    staging = os.path.join(_txn_dir(sink_dir), f"staging-{uuid.uuid4().hex[:12]}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    batch_tag = uuid.uuid4().hex[:12]
    new_files: list[str] = []
    for root, _dirs, files in os.walk(staging):
        for fname in files:
            if not fname.endswith(".parquet") or fname.startswith(("_", ".")):
                continue
            rel_dir = os.path.relpath(root, staging)
            dest_dir = sink_dir if rel_dir == "." else os.path.join(sink_dir, rel_dir)
            os.makedirs(dest_dir, exist_ok=True)
            dest_name = f"{batch_tag}-{fname}"
            os.rename(os.path.join(root, fname), os.path.join(dest_dir, dest_name))
            new_files.append(os.path.relpath(os.path.join(dest_dir, dest_name), sink_dir))
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return sorted(new_files)


def versions(sink_dir: str) -> list[int]:
    """Ascending committed snapshot versions (the manifest history —
    Delta's DESCRIBE HISTORY analog). Retained manifest files are a
    few bytes each; a retention policy would prune them together
    with vacuum's superseded data files."""
    txn = _txn_dir(sink_dir)
    if not os.path.isdir(txn):
        return []
    out = []
    for fname in os.listdir(txn):
        if fname.startswith("v-") and fname.endswith(".txt"):
            seq = fname.split("-")[1]
            if seq.isdigit():
                out.append(int(seq))
    return sorted(out)


def _version_files(sink_dir: str, version: int) -> list[str]:
    txn = _txn_dir(sink_dir)
    for fname in os.listdir(txn):
        if fname.startswith(f"v-{version:08d}-") and fname.endswith(".txt"):
            with open(os.path.join(txn, fname), encoding="utf-8") as f:
                return [line.rstrip("\n") for line in f if line.strip()]
    raise FileNotFoundError(f"no manifest for version {version} in {sink_dir}")


def read_version(spark: SparkSession, sink_dir: str, version: int) -> DataFrame:
    """Time travel: DataFrame over exactly the snapshot a past commit
    published (Delta's ``versionAsOf``). Works because data files are
    immutable once committed and superseded files survive until
    vacuum — the manifest IS the table state."""
    files = _version_files(sink_dir, version)
    if not files:
        return spark.read.format("parquet").schema("__empty STRING").load()
    return (
        spark.read.option("basePath", sink_dir)
        .parquet(*[os.path.join(sink_dir, f) for f in files])
    )


def _publish_listing(sink_dir: str, listing: list[str]) -> None:
    """Write a new manifest version and swap it live atomically.
    Version numbers are monotone (max existing + 1); the uuid suffix
    keeps a concurrent duplicate-sequence write from colliding on
    the filename (last symlink swap wins, same as before)."""
    txn = _txn_dir(sink_dir)
    os.makedirs(txn, exist_ok=True)
    seq = (versions(sink_dir) or [0])[-1] + 1
    version_file = os.path.join(
        txn, f"v-{seq:08d}-{uuid.uuid4().hex[:12]}.txt"
    )
    with open(version_file, "w", encoding="utf-8") as f:
        f.write("\n".join(listing) + ("\n" if listing else ""))
    tmp_link = version_file + ".lnk"
    os.symlink(version_file, tmp_link)
    os.replace(tmp_link, _latest_path(sink_dir))  # atomic publish


def commit_append(sink_dir: str, new_files: list[str]) -> None:
    """Publish a new snapshot = current snapshot + ``new_files`` via
    one atomic symlink swap. Writers are serialized by the streaming
    checkpoint (one micro-batch at a time), so read-modify-write of
    the listing is safe here; a multi-writer deployment needs the
    Delta/Iceberg log this module deliberately stops short of."""
    _publish_listing(sink_dir, committed_files(sink_dir) + list(new_files))


def commit_replace(sink_dir: str, new_files: list[str]) -> None:
    """Publish a new snapshot with DYNAMIC-PARTITION-OVERWRITE
    semantics: every partition directory that ``new_files`` touches
    is replaced wholesale (its previously committed files drop out
    of the listing), untouched partitions carry over. One atomic
    symlink swap — so a rollup rewrite spanning several day
    partitions becomes ONE transaction, which Spark's native
    partitionOverwriteMode=dynamic (file deletes during job commit)
    cannot give. Superseded files stay on disk for in-flight readers
    until :func:`vacuum`."""
    replaced_dirs = {os.path.dirname(f) for f in new_files}
    _publish_listing(
        sink_dir,
        [
            f
            for f in committed_files(sink_dir)
            if os.path.dirname(f) not in replaced_dirs
        ]
        + list(new_files),
    )


def vacuum(sink_dir: str) -> list[str]:
    """Delete data files no manifest-committed snapshot references —
    the garbage a crash between stage and commit leaves behind.
    Returns the removed relative paths. Safe while readers run ONLY
    for crash orphans (nothing can hold a handle to a file that was
    never published); a deployment that also retires superseded
    snapshots needs a retention window, i.e. Delta's VACUUM."""
    committed = set(committed_files(sink_dir))
    removed: list[str] = []
    for root, dirs, files in os.walk(sink_dir):
        # never descend into the txn/staging machinery
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(root, fname), sink_dir)
            if rel not in committed:
                os.remove(os.path.join(root, fname))
                removed.append(rel)
    return sorted(removed)
