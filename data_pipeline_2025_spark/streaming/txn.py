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

Fix: a manifest commit log — the minimal slice of the Delta/Iceberg
design that restores the transaction boundary on any filesystem with
an atomic exclusive-create primitive:

1. the micro-batch is written to a hidden staging dir
   (``<sink>/_txn/staging-*`` — leading underscore, invisible to
   Spark's partition discovery);
2. its data files are MOVED into their partition directories under
   collision-free names — still invisible, because committed readers
   go through the manifest log;
3. ONE log entry is committed by atomically creating
   ``_txn/v-NNNNNNNN.{d,c}.txt``: content is fully written to a temp
   file first, then ``os.link`` publishes it under the deterministic
   version name. The link either fully succeeds or fails with
   EEXIST — creation IS the commit (no separate pointer swap, no
   claimed-but-unpublished limbo state).

**Commit cost is O(batch), not O(table)** (round-5): a normal commit
writes a DELTA entry listing only the files it adds (plus, for
replace commits, the partition directories it retires); every
``CHECKPOINT_EVERY``-th version is a CHECKPOINT holding the full
listing, so reconstructing any snapshot reads one checkpoint plus at
most ``CHECKPOINT_EVERY - 1`` deltas. This is the Delta-log shape
(JSON commits + parquet checkpoints) in two plain-text file kinds.

**Multi-writer safety** (round-5): the deterministic version name
makes the exclusive create a compare-and-swap — two writers that
both read version N race to create ``v-(N+1)``; exactly one link
succeeds, the loser re-reads the (now longer) log and retries on top
of the winner's commit, so no update is ever lost. On S3 the same
protocol is one conditional PUT with ``If-None-Match: *`` per
commit — exactly how Delta commits on S3 since conditional writes
landed; on HDFS/NFS/local it is the hard-link trick below.
tests/test_txn.py::test_two_writer_contention_one_loses_and_retries
pins the protocol.

Readers reconstruct a snapshot from immutable committed entries and
read exactly that file set: old-or-new, never partial (snapshot
isolation; superseded files are never deleted except by vacuum). A
crash between (2) and (3) leaves orphaned data files that no
manifest references — invisible to every reader, re-written by the
replayed batch (the checkpoint re-delivers it), and reclaimed by
:func:`vacuum`.

Adopted by EVERY streaming sink in this package (round 4): the
price ingest silver (ingest.py), the continuous-aggregate silver +
rollup (cagg.py — rollup day-partition rewrites go through
:func:`commit_replace`, making a multi-day refresh ONE transaction,
which Spark's native partitionOverwriteMode=dynamic cannot give),
the CMS sketch store (cms.py), the dedup gate's verdict + signature
stores (dedupgate.py), and the streaming IVF inverted lists
(ivf.py). In each, the idempotence anti-join reads the committed
snapshot, so a crash orphan can never absorb a replayed batch.

The READ path keeps ``option("basePath")`` so hive partition columns
survive, and partition pruning on ``ingest_date`` still skips
unlisted files.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

TXN_DIR = "_txn"
# Every Nth version is a full-listing checkpoint; the rest are
# O(batch) deltas. 10 bounds snapshot reconstruction at one
# checkpoint + 9 delta reads while keeping amortized commit cost at
# ~1/10th of a full listing per commit.
CHECKPOINT_EVERY = 10

_DELTA_SUFFIX = ".d.txt"
_CKPT_SUFFIX = ".c.txt"


def _txn_dir(sink_dir: str) -> str:
    return os.path.join(sink_dir, TXN_DIR)


def is_transactional(sink_dir: str) -> bool:
    """True when the sink is managed by this commit log. Keyed on the
    ``_txn`` DIRECTORY, not any committed version: stage_append
    creates the directory before it moves a single data file, so a
    crash during the sink's FIRST-ever commit (files renamed into the
    partition layout, no log entry yet) still reads as
    transactional. The committed snapshot is then empty — the
    legacy directory-scan fallback must never see those orphans, or
    the ingest idempotence anti-join would absorb the replayed batch
    against rows vacuum later deletes (permanent loss)."""
    return os.path.isdir(_txn_dir(sink_dir))


def _entry_name(seq: int, is_checkpoint: bool) -> str:
    return f"v-{seq:08d}" + (_CKPT_SUFFIX if is_checkpoint else _DELTA_SUFFIX)


def _scan_log(sink_dir: str) -> dict[int, str]:
    """Committed versions -> entry filename. Every entry file in the
    log IS committed (creation is the commit), so this is one
    O(#versions) directory listing of bytes-sized files — never a
    data scan."""
    txn = _txn_dir(sink_dir)
    if not os.path.isdir(txn):
        return {}
    out: dict[int, str] = {}
    for fname in os.listdir(txn):
        if not fname.startswith("v-"):
            continue
        if fname.endswith(_DELTA_SUFFIX) or fname.endswith(_CKPT_SUFFIX):
            seq = fname[2:10]
            if seq.isdigit():
                out[int(seq)] = fname
    return out


def versions(sink_dir: str) -> list[int]:
    """Ascending committed snapshot versions (the manifest history —
    Delta's DESCRIBE HISTORY analog). Entries are a few bytes each;
    a retention policy would prune them together with vacuum's
    superseded data files."""
    return sorted(_scan_log(sink_dir))


def _read_entry(sink_dir: str, fname: str) -> list[str]:
    with open(os.path.join(_txn_dir(sink_dir), fname), encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def _listing_at(sink_dir: str, version: int) -> list[str]:
    """Reconstruct the full file listing of snapshot ``version``:
    nearest checkpoint at-or-below it, then forward-apply the deltas
    — at most CHECKPOINT_EVERY-1 of them. Delta ops: ``+path`` adds
    a file, ``~dir`` retires every current file in partition ``dir``
    (the replace commit)."""
    log = _scan_log(sink_dir)
    if version not in log:
        raise FileNotFoundError(
            f"no manifest for version {version} in {sink_dir}"
        )
    ckpt = max(
        (s for s, f in log.items() if s <= version and f.endswith(_CKPT_SUFFIX)),
        default=None,
    )
    if ckpt is None:
        raise FileNotFoundError(
            f"no checkpoint at or below version {version} in {sink_dir}"
        )
    listing = _read_entry(sink_dir, log[ckpt])
    for seq in range(ckpt + 1, version + 1):
        ops = _read_entry(sink_dir, log[seq])
        drops = {op[1:] for op in ops if op.startswith("~")}
        if drops:
            listing = [f for f in listing if os.path.dirname(f) not in drops]
        listing += [op[1:] for op in ops if op.startswith("+")]
    return listing


def listing_at(sink_dir: str, version: int) -> list[str]:
    """Public snapshot listing (relative paths) at ``version`` — the
    read half of optimistic concurrency: a maintenance job records
    the version it read, derives its rewrite from exactly this
    listing, and commits with :func:`commit_replace_if` against that
    same version."""
    return _listing_at(sink_dir, version)


def committed_files(sink_dir: str) -> list[str]:
    """Relative paths of the data files in the current committed
    snapshot (empty list for a sink with no commits yet). The log
    scan pins a version once — entries are immutable, so concurrent
    commits after this call don't tear the listing (snapshot
    isolation)."""
    vs = versions(sink_dir)
    if not vs:
        return []
    return _listing_at(sink_dir, vs[-1])


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


def read_version(spark: SparkSession, sink_dir: str, version: int) -> DataFrame:
    """Time travel: DataFrame over exactly the snapshot a past commit
    published (Delta's ``versionAsOf``). Works because data files are
    immutable once committed and superseded files survive until
    vacuum — the log IS the table state."""
    files = _listing_at(sink_dir, version)
    if not files:
        return spark.read.format("parquet").schema("__empty STRING").load()
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


def _try_commit(sink_dir: str, seq: int, lines: list[str], is_checkpoint: bool) -> bool:
    """Atomically commit log entry ``seq``. The content is fully
    written (and flushed) to a temp file first; ``os.link`` then
    publishes it under the deterministic version name — an atomic
    exclusive create, so a reader can never observe a half-written
    entry and two writers can never both commit the same version.
    Returns False when a concurrent writer won this sequence number
    (the CAS failure — caller re-reads the log and retries). Maps
    1:1 to S3 ``If-None-Match: *`` conditional PUT."""
    txn = _txn_dir(sink_dir)
    os.makedirs(txn, exist_ok=True)
    tmp = os.path.join(txn, f".tmp-{uuid.uuid4().hex[:12]}")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, os.path.join(txn, _entry_name(seq, is_checkpoint)))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _commit(
    sink_dir: str,
    new_files: list[str],
    replace: bool,
    expected_version: int | None = None,
) -> bool:
    """Read-log → build-entry → CAS-create, retrying on contention.
    Appends commute, so a loser's retry on top of the winner's commit
    preserves both batches; a replace retried on a newer snapshot
    keeps last-replace-wins semantics for the touched partitions.

    With ``expected_version`` set, the commit is CONDITIONAL: it only
    publishes while the log head is exactly that version (0 = no
    commits yet) and returns False the moment any other writer lands
    first — blind retry would be a lost update for a rewrite derived
    from the old snapshot (Delta's ConcurrentModificationException)."""
    while True:
        vs = versions(sink_dir)
        head = vs[-1] if vs else 0
        if expected_version is not None and head != expected_version:
            return False
        seq = head + 1
        is_ckpt = seq % CHECKPOINT_EVERY == 1  # v1, v11, v21, ...
        replaced_dirs = (
            sorted({os.path.dirname(f) for f in new_files}) if replace else []
        )
        if is_ckpt:
            base = _listing_at(sink_dir, vs[-1]) if vs else []
            if replace:
                base = [
                    f for f in base if os.path.dirname(f) not in set(replaced_dirs)
                ]
            lines = base + list(new_files)
        else:
            lines = [f"~{d}" for d in replaced_dirs] + [
                f"+{f}" for f in new_files
            ]
        if _try_commit(sink_dir, seq, lines, is_ckpt):
            return True


def commit_append(sink_dir: str, new_files: list[str]) -> None:
    """Publish a new snapshot = current snapshot + ``new_files`` as
    ONE atomic log-entry create. O(batch) bytes written except at
    checkpoint versions; concurrent writers serialize through the
    CAS retry loop, no update lost."""
    _commit(sink_dir, list(new_files), replace=False)


def commit_replace(sink_dir: str, new_files: list[str]) -> None:
    """Publish a new snapshot with DYNAMIC-PARTITION-OVERWRITE
    semantics: every partition directory that ``new_files`` touches
    is replaced wholesale (its previously committed files drop out
    of the listing), untouched partitions carry over. One atomic
    log-entry create — so a rollup rewrite spanning several day
    partitions becomes ONE transaction, which Spark's native
    partitionOverwriteMode=dynamic (file deletes during job commit)
    cannot give. Superseded files stay on disk for in-flight readers
    until :func:`vacuum`."""
    _commit(sink_dir, list(new_files), replace=True)


def commit_replace_if(
    sink_dir: str, new_files: list[str], expected_version: int
) -> bool:
    """:func:`commit_replace` with OPTIMISTIC CONFLICT DETECTION —
    the maintenance-job commit (Delta OPTIMIZE's protocol): publish
    only if the log head is still ``expected_version`` (0 = empty
    log), else return False WITHOUT committing. A compaction derives
    its rewrite from the snapshot it read; blind replace after a
    concurrent append would silently drop that append's files from
    the touched partitions (a lost update). On False the caller
    re-reads the new head and re-derives; its staged files are
    manifest-invisible orphans until :func:`vacuum`."""
    return _commit(
        sink_dir, list(new_files), replace=True, expected_version=expected_version
    )


def vacuum(sink_dir: str) -> list[str]:
    """Delete data files the CURRENT committed snapshot does not
    reference — crash orphans and files superseded by replace
    commits. Returns the removed relative paths. Safe while readers
    run ONLY for crash orphans (nothing can hold a handle to a file
    that was never published); reclaiming superseded snapshot files
    breaks time travel to those versions — a deployment that wants
    both needs a retention window, i.e. Delta's VACUUM."""
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
    # leftover commit temp files from crashed writers
    txn = _txn_dir(sink_dir)
    if os.path.isdir(txn):
        for fname in os.listdir(txn):
            if fname.startswith(".tmp-"):
                os.remove(os.path.join(txn, fname))
    return sorted(removed)
