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

**Data-skipping statistics** (round-6): every committed file line
may carry the file's per-column min/max bounds, harvested from the
parquet FOOTER at commit time (O(batch) metadata reads — the bytes
Spark's writer already computed; Delta does exactly this in its
``add`` actions' ``stats`` JSON). Checkpoints carry the bounds
forward, so a snapshot's complete skipping index is readable from
one checkpoint + few deltas WITHOUT touching a single data file.
:func:`prune_files` / ``read_committed(..., prune=...)`` then skip
every file whose bounds provably exclude a predicate — min/max file
skipping on NON-partition columns, the engine's analog of the
reference's physical indexes (salim/tables.sql:44-48) and the
single biggest scan lever at 100 TB (a selective predicate over a
z-ordered layout reads a handful of files instead of the table).

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

**Retention** (round-6): :func:`vacuum` gates deletion on file AGE
(``retain_seconds`` — Delta's retention window), so a file another
writer has staged but not yet committed is never reclaimed from
under it, and can protect every version still reconstructible from
the log (``protect_log_versions=True``) so time travel keeps
working; :func:`prune_log` then retires manifest entries older than
the newest checkpoint needed for the retained horizon — time travel
WITHIN the window keeps working, BEYOND it fails cleanly with
FileNotFoundError (never a wrong answer).

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

import contextlib
import json
import os
import time
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

# Stats values longer than this are dropped rather than risk acting
# on parquet's truncated string statistics (a truncated max is not a
# valid upper bound for pruning).
_STATS_MAX_STR = 64


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
    :func:`prune_log` retires those older than the retained
    horizon."""
    return sorted(_scan_log(sink_dir))


def _read_entry(sink_dir: str, fname: str) -> list[str]:
    with open(os.path.join(_txn_dir(sink_dir), fname), encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def _split_stats(token: str) -> tuple[str, str | None]:
    """A manifest line's payload is ``path`` or ``path\\t{stats
    json}`` — the tab can't occur in either half. Round-5 entries
    (no stats) parse unchanged."""
    if "\t" in token:
        path, stats = token.split("\t", 1)
        return path, stats
    return token, None


def _snapshot_at(
    sink_dir: str, version: int
) -> tuple[
    dict[str, str | None],
    str | None,
    dict[str, list[int]],
    dict[str, str],
    str | None,
    dict[str, str],
    dict[str, dict[str, int]],
]:
    """Reconstruct snapshot ``version`` as ``({relative path ->
    stats json or None}, schema DDL or None, {relative path ->
    sorted deleted row positions}, {check name -> SQL expr},
    partition spec or None, {physical column -> logical name},
    {DV sidecar ref -> {relative path -> deleted-row count}})``:
    nearest checkpoint at-or-below it, then forward-apply the
    deltas — at most CHECKPOINT_EVERY-1 of them. Delta ops:
    ``+path[\tstats]`` adds a file, ``~dir`` retires every current
    file in partition ``dir`` (the replace commit),
    ``#schema\t<ddl>`` sets the snapshot's read schema from this
    version on (SCHEMA EVOLUTION — Delta's metaData action),
    ``#check\t<name>\t<expr>`` records a CHECK constraint enforced
    on every subsequent append (round 6 — Delta's table
    constraints), ``-path\t[positions]`` marks row positions of
    ``path`` deleted (DELETION VECTORS, round 6 — Delta's DV
    sidecars: row-level deletes without rewriting the file; unions
    accumulate across commits, and a retired file's DV retires with
    it), ``%dv\t<ref>\t{path: count}`` references an EXECUTOR-WRITTEN
    deletion-vector sidecar (round 7 — Delta's real DV shape: the
    position lists live in a parquet sidecar under ``_txn/<ref>``,
    the manifest carries only the ref plus O(#files) per-file
    counts, so a 10⁹-row erasure costs the manifest — and the
    driver — nothing proportional to deleted rows),
    ``#partspec\t<desc>`` records the ACTIVE partition spec
    from this version on (round 6 — Iceberg's partition-spec
    evolution: a spec change is ONE metadata line; files written
    under earlier specs are never rewritten, and reads/pruning stay
    correct because skipping is driven by per-file STATS, not by
    directory layout — hidden partitioning), ``#op\t<name>``
    records COMMIT INTENT (round 9 — Delta's ``operation`` field:
    write/merge/delete/optimize/replace/restore/meta; per-commit,
    never checkpoint-carried, read via :func:`commit_op`, ignored
    here). Checkpoints carry schema + checks + partspec + live DVs
    forward; later schema/partspec lines win."""
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
    listing: dict[str, str | None] = {}
    schema: str | None = None
    partspec: str | None = None
    colmap: dict[str, str] = {}
    dvs: dict[str, set[int]] = {}
    dvrefs: dict[str, dict[str, int]] = {}
    checks: dict[str, str] = {}

    def _apply(line: str) -> None:
        nonlocal schema, partspec, colmap
        if line.startswith("%dv\t"):
            _kind, ref, counts_json = line.split("\t", 2)
            with contextlib.suppress(ValueError):
                parsed = json.loads(counts_json)
                if isinstance(parsed, dict):
                    dvrefs[ref] = {
                        str(p): int(n) for p, n in parsed.items()
                    }
        elif line.startswith("%"):
            pass  # unknown sidecar line kinds: forward-compat
        elif line.startswith("#schema\t"):
            schema = line.split("\t", 1)[1]
        elif line.startswith("#partspec\t"):
            partspec = line.split("\t", 1)[1]
        elif line.startswith("#colmap\t"):
            # COLUMN MAPPING (round 6 — Delta's column-mapping
            # analog): {physical name -> logical name}. Physical
            # names are frozen at table creation; a RENAME is one
            # metadata line changing only the logical surface.
            with contextlib.suppress(ValueError):
                parsed = json.loads(line.split("\t", 1)[1])
                if isinstance(parsed, dict):
                    colmap = {str(k): str(v) for k, v in parsed.items()}
        elif line.startswith("#check\t"):
            _, name, expr = line.split("\t", 2)
            checks[name] = expr
        elif line.startswith("#"):
            pass  # unknown metadata line kinds: forward-compat
        elif line.startswith("-"):
            path, posjson = _split_stats(line[1:])
            if posjson:
                dvs.setdefault(path, set()).update(json.loads(posjson))
        elif line.startswith("+"):
            path, stats = _split_stats(line[1:])
            listing[path] = stats
        else:
            path, stats = _split_stats(line)
            listing[path] = stats

    for line in _read_entry(sink_dir, log[ckpt]):
        _apply(line)
    for seq in range(ckpt + 1, version + 1):
        ops = _read_entry(sink_dir, log[seq])
        drops = {op[1:] for op in ops if op.startswith("~")}
        if drops:
            listing = {
                p: s
                for p, s in listing.items()
                if os.path.dirname(p) not in drops
            }
            dvs = {
                p: v
                for p, v in dvs.items()
                if os.path.dirname(p) not in drops
            }
            dvrefs = {
                r: kept
                for r, c in dvrefs.items()
                if (kept := {
                    p: n
                    for p, n in c.items()
                    if os.path.dirname(p) not in drops
                })
            }
        for op in ops:
            if not op.startswith("~"):
                _apply(op)
    dvs = {p: v for p, v in dvs.items() if p in listing}
    dvrefs = {
        r: kept
        for r, c in dvrefs.items()
        if (kept := {p: n for p, n in c.items() if p in listing})
    }
    return (
        listing,
        schema,
        {p: sorted(v) for p, v in dvs.items()},
        checks,
        partspec,
        colmap,
        dvrefs,
    )


def _entries_at(sink_dir: str, version: int) -> dict[str, str | None]:
    return _snapshot_at(sink_dir, version)[0]


def schema_at(sink_dir: str, version: int | None = None) -> str | None:
    """The snapshot's recorded read-schema DDL (None when no commit
    ever declared one — pre-round-6 sinks read with parquet's own
    inferred schema, unchanged)."""
    vs = versions(sink_dir)
    if not vs:
        return None
    return _snapshot_at(sink_dir, vs[-1] if version is None else version)[1]


def partspec_at(sink_dir: str, version: int | None = None) -> str | None:
    """The snapshot's ACTIVE partition spec (None when no commit ever
    declared one). Spec history across still-reconstructible
    versions is ``[(v, partspec_at(sink, v)) for v in versions(...)]``
    — each lookup is manifest bytes only."""
    vs = versions(sink_dir)
    if not vs:
        return None
    return _snapshot_at(sink_dir, vs[-1] if version is None else version)[4]


def dv_at(sink_dir: str, version: int | None = None) -> dict[str, list[int]]:
    """The snapshot's deletion vectors MATERIALIZED: {relative path
    -> sorted deleted row positions}, merging manifest-inline
    position lists with executor-written sidecar refs (round 7).
    Inspection/test API — materializing is O(deleted rows) DRIVER
    memory by definition; production paths never call this (reads
    anti-join the sidecars as DataFrames via :func:`_apply_dv`,
    counting uses :func:`dv_counts_at` — O(#files))."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    v = vs[-1] if version is None else version
    snap = _snapshot_at(sink_dir, v)
    out: dict[str, set[int]] = {p: set(ps) for p, ps in snap[2].items()}
    for ref, counts in snap[6].items():
        for path, pos in _read_dv_sidecar(sink_dir, ref):
            if path in counts:
                out.setdefault(path, set()).add(pos)
    return {p: sorted(v) for p, v in out.items()}


def dvrefs_at(
    sink_dir: str, version: int | None = None
) -> dict[str, dict[str, int]]:
    """The snapshot's DV sidecar references: {sidecar ref ->
    {relative data-file path -> deleted-row count}} — manifest bytes
    only, O(#files) regardless of deleted-row count."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    return _snapshot_at(sink_dir, vs[-1] if version is None else version)[6]


def dv_counts_at(
    sink_dir: str, version: int | None = None
) -> dict[str, int]:
    """Per-file deleted-row COUNTS of the snapshot — inline position
    lists plus sidecar count maps, from manifest bytes alone
    (O(#files) driver memory at any deleted-row count; the scale-safe
    replacement for ``sum(len(v) for v in dv_at(...).values())``).
    Disjointness across sources is by construction: delete_where /
    merge_upsert_dv locate against the DV-applied snapshot, so a
    position is never deleted twice while dead."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    snap = _snapshot_at(sink_dir, vs[-1] if version is None else version)
    out: dict[str, int] = {p: len(ps) for p, ps in snap[2].items()}
    for counts in snap[6].values():
        for path, n in counts.items():
            out[path] = out.get(path, 0) + n
    return out


def _read_dv_sidecar(sink_dir: str, ref: str) -> list[tuple[str, int]]:
    """Driver-side sidecar read (pyarrow) for the inspection APIs —
    returns [(relative path, position)]. Production read paths go
    through Spark instead (:func:`_dv_pos_df`)."""
    import pyarrow.parquet as pq

    d = os.path.join(_txn_dir(sink_dir), ref)
    rows: list[tuple[str, int]] = []
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(d, fname), columns=["path", "pos"])
        rows.extend(
            zip(t.column("path").to_pylist(), t.column("pos").to_pylist())
        )
    return rows


def checks_at(sink_dir: str, version: int | None = None) -> dict[str, str]:
    """The snapshot's CHECK constraints: {name -> SQL expression}
    (empty for sinks that never declared one). Carried through
    checkpoints like the schema line; enforced by
    :func:`commit_append_checked` on every new batch."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    return _snapshot_at(sink_dir, vs[-1] if version is None else version)[3]


def commit_delete(sink_dir: str, dv: dict[str, list[int]]) -> None:
    """Row-level DELETE without rewriting any data file (round 6 —
    Delta's deletion vectors): publish ONE atomic log entry marking
    ``{relative path -> row positions}`` deleted. Readers anti-join
    the committed DVs against ``_metadata.row_index``, so the delete
    is metadata-only — the O(rewrite) cost a 100 TB point-delete
    cannot pay is replaced by O(deleted positions) manifest bytes.
    Positions accumulate across delete commits; a replace commit of
    the partition retires the file AND its DV. At production scale
    the position lists become roaring bitmaps in sidecar files (the
    Delta/Iceberg format seam); the protocol — versioned, CAS-
    committed, checkpoint-carried — is identical."""
    _commit(sink_dir, [], replace=False, delete_dv=dict(dv), op="delete")


def _dv_pos_df(
    spark,
    sink_dir: str,
    dvs: dict[str, list[int]],
    dvrefs: dict[str, dict[str, int]] | None = None,
    restrict: set[str] | None = None,
):
    """The deleted positions of a snapshot as a DataFrame
    ``(__dv_path string — ABSOLUTE, __dv_pos long)``: inline
    manifest position lists (driver-built, small by contract) union
    the executor-read sidecar parquets (never materialized on the
    driver). ``restrict`` limits output to those relative data-file
    paths (used by compaction and the change feed). Returns None
    when there is nothing deleted."""
    from functools import reduce

    from pyspark.sql import functions as F

    base = os.path.abspath(sink_dir)
    pieces = []
    inline = {
        p: ps
        for p, ps in (dvs or {}).items()
        if restrict is None or p in restrict
    }
    rows = [
        (os.path.join(base, p), int(i))
        for p, positions in inline.items()
        for i in positions
    ]
    if rows:
        pieces.append(
            spark.createDataFrame(rows, "__dv_path string, __dv_pos long")
        )
    for ref, counts in sorted((dvrefs or {}).items()):
        live = [
            p for p in counts if restrict is None or p in restrict
        ]
        if not live:
            continue
        side = spark.read.parquet(os.path.join(_txn_dir(sink_dir), ref))
        keep = spark.createDataFrame([(p,) for p in live], "path string")
        # the path filter is O(#files) rows — always broadcastable;
        # it also drops positions of files retired after the sidecar
        # was written (the manifest's count map is the live set)
        pieces.append(
            side.join(F.broadcast(keep), "path").select(
                F.concat(F.lit(base + os.sep), F.col("path")).alias(
                    "__dv_path"
                ),
                F.col("pos").cast("long").alias("__dv_pos"),
            )
        )
    if not pieces:
        return None
    return reduce(lambda a, b: a.unionByName(b), pieces)


def _apply_dv(
    spark,
    df,
    sink_dir: str,
    dvs: dict[str, list[int]],
    dvrefs: dict[str, dict[str, int]] | None = None,
):
    """Filter a snapshot DataFrame through its deletion vectors: an
    anti-join of (file, row position) against the DV set — inline
    lists broadcast, sidecar refs read executor-side (round 7: the
    positions of a 10⁹-row delete never touch the driver). No-op
    (and no plan change) for DV-free snapshots. Paths are normalized
    to absolute form on both sides (the reader reports
    file:-prefixed URIs)."""
    from pyspark.sql import functions as F

    dv_df = _dv_pos_df(spark, sink_dir, dvs, dvrefs)
    if dv_df is None:
        return df
    # inline-only DV sets are small by contract → force the
    # broadcast; sidecar-backed sets can be arbitrarily large → let
    # AQE choose (it still broadcasts the common small case)
    if not dvrefs:
        dv_df = F.broadcast(dv_df)
    cols = df.columns
    keyed = df.withColumn(
        "__p", F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/")
    ).withColumn("__i", F.col("_metadata.row_index"))
    return keyed.join(
        dv_df,
        (keyed["__p"] == dv_df["__dv_path"]) & (keyed["__i"] == dv_df["__dv_pos"]),
        "left_anti",
    ).select(*cols)



def _listing_at(sink_dir: str, version: int) -> list[str]:
    return list(_entries_at(sink_dir, version))


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


def commit_op(sink_dir: str, version: int) -> str | None:
    """The ``#op`` commit-intent tag of ``version``'s log entry
    (Delta's per-commit ``operation`` field analog), or None for a
    pre-tag entry / a version pruned from the log. O(1) manifest
    read — the tag lives in the version's own entry and is never
    checkpoint-carried (it describes one commit, not snapshot
    state)."""
    log = _scan_log(sink_dir)
    if version not in log:
        return None
    for line in _read_entry(sink_dir, log[version]):
        if line.startswith("#op\t"):
            return line.split("\t", 1)[1]
    return None


# ---------------------------------------------------------------
# Data-skipping statistics (round 6)


def _json_stat_value(v):
    """Parquet footer stat -> JSON-safe bound, or None when the type
    can't round-trip exactly (then the column simply isn't prunable
    for this file — correctness-safe)."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return None  # min/max on bool is useless for pruning
    if isinstance(v, int) or isinstance(v, float):
        return v
    if isinstance(v, str):
        return v if len(v) <= _STATS_MAX_STR else None
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return None  # lossy float conversion could fake a bound
    return None


def file_stats_json(path: str) -> str | None:
    """One parquet file's manifest statistics as a compact JSON
    string — ``{"n": row count, "c": {column: [min, max]}}`` — from
    the FOOTER only (no data read; the same bytes Delta snapshots
    into its add-action ``stats``, whose numRecords field is what
    makes metadata-only COUNT(*) answerable). A column is included
    only when EVERY row group reports trustworthy min/max for it;
    anything questionable (nested paths, truncation-length strings,
    decimals) is dropped — a missing bound merely disables pruning
    for that column, never a wrong skip. Round-6 entries written
    before the ``n`` field used a flat ``{column: [min, max]}``
    form; :func:`_parse_stats` accepts both."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            name = col.path_in_schema
            if name in bad or "." in name:
                bad.add(name)
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            try:
                # .min/.max themselves can raise for types pyarrow
                # can't cast statistics for (has_min_max lies)
                mn = _json_stat_value(st.min)
                mx = _json_stat_value(st.max)
            except Exception:
                bad.add(name)
                continue
            if mn is None or mx is None:
                bad.add(name)
                continue
            if name not in mins:
                mins[name], maxs[name] = mn, mx
            else:
                mins[name] = min(mins[name], mn)
                maxs[name] = max(maxs[name], mx)
    cols = {n: [mins[n], maxs[n]] for n in sorted(mins) if n not in bad}
    return json.dumps({"n": md.num_rows, "c": cols}, separators=(",", ":"))


def _parse_stats(stats: str | None) -> tuple[int | None, dict[str, tuple]]:
    """A manifest stats token -> (row count or None, {column ->
    (min, max)}). Accepts both the current ``{"n":…, "c":…}`` form
    and the earlier flat ``{column: [min, max]}`` form (those lines
    simply have no row count). Unparseable stats degrade to
    (None, {}) — no pruning, no metadata count, never an error."""
    if stats is None:
        return None, {}
    try:
        parsed = json.loads(stats)
    except ValueError:
        return None, {}
    if not isinstance(parsed, dict):
        return None, {}
    if {"n", "c", "b"} & parsed.keys():
        # current structured form: {"n": rows, "c": bounds, "b": blooms}
        cols = parsed.get("c")
        n = parsed.get("n")
        return (
            int(n) if isinstance(n, int) and not isinstance(n, bool) else None,
            {c: (b[0], b[1]) for c, b in cols.items()}
            if isinstance(cols, dict)
            else {},
        )
    return None, {c: (b[0], b[1]) for c, b in parsed.items()}


def _collect_stats(sink_dir: str, new_files: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for rel in new_files:
        s = file_stats_json(os.path.join(sink_dir, rel))
        if s is not None:
            out[rel] = s
    return out


def stats_at(
    sink_dir: str, version: int | None = None
) -> dict[str, dict[str, tuple]]:
    """The snapshot's skipping index: {relative path -> {column ->
    (min, max)}} read from the manifest alone (one checkpoint + few
    deltas of BYTES — no data-file access). Files committed before
    round 6 simply have no entry."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    v = vs[-1] if version is None else version
    return {
        path: _parse_stats(stats)[1]
        for path, stats in _entries_at(sink_dir, v).items()
    }


def metadata_agg(
    sink_dir: str, col: str | None = None, version: int | None = None
) -> dict:
    """Answer COUNT(*)/MIN/MAX from the manifest alone — Delta's
    metadata-only query optimization: a snapshot's row count is the
    sum of per-file footer counts minus its deletion-vector lengths
    (exact even after row-level deletes, since DV positions are
    per-file unique), and a column's global min/max is the fold of
    the per-file bounds. Returns ``{"count":…, "min":…, "max":…}``
    with None for anything the manifest cannot answer EXACTLY:
    count needs every file to carry a row count (pre-round-6 stats
    lines don't), min/max additionally need bounds for ``col`` in
    every file AND a DV-free snapshot — a deleted row could be the
    extremum, so any DV forces the caller back to a scan (the same
    rule Delta applies). Zero data files are opened at any size."""
    vs = versions(sink_dir)
    if not vs:
        return {"count": None, "min": None, "max": None}
    v = vs[-1] if version is None else version
    entries, _schema, dvs, _checks, _ps, _cm, dvrefs = _snapshot_at(sink_dir, v)
    total = 0
    count_ok = True
    mn = mx = None
    minmax_ok = col is not None and bool(entries) and not dvs and not dvrefs
    for path, stats in entries.items():
        n, cols = _parse_stats(stats)
        if n is None:
            count_ok = False
        else:
            total += n
        if col is not None:
            if col in cols:
                lo, hi = cols[col]
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            else:
                minmax_ok = False
    deleted = sum(len(p) for p in dvs.values()) + sum(
        n for counts in dvrefs.values() for n in counts.values()
    )
    return {
        "count": (total - deleted) if count_ok else None,
        "min": mn if minmax_ok else None,
        "max": mx if minmax_ok else None,
    }


def table_health(
    sink_dir: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """Maintenance-planning report from the MANIFEST alone (zero data
    files opened at any table size) — the numbers an OPTIMIZE/vacuum
    scheduler looks at before spending I/O:

    - ``files``: live file count; ``rows``: live rows (footer counts
      minus DV lengths, None if any file predates row-count stats);
    - ``small_files``: files under half the target row count — the
      compaction backlog; ``small_file_fraction`` of live files;
    - ``dv_files``: files carrying deletion-vector positions and
      ``deleted_rows`` total — when the fraction grows, a rewrite
      (compaction applies DVs) reclaims scan work;
    - ``partition_dirs``: distinct live directories — the replace
      grammar's drop-set size, i.e. what a full rewrite would cost
      in manifest lines;
    - ``versions``: log length since the last prune.

    This is the read side of the q235 incremental-OPTIMIZE loop:
    health says WHICH dirs are backlog; commit_replace_dirs retires
    exactly those."""
    vs = versions(sink_dir)
    if not vs:
        return {
            "files": 0, "rows": 0, "small_files": 0,
            "small_file_fraction": 0.0, "dv_files": 0, "deleted_rows": 0,
            "partition_dirs": 0, "versions": 0,
        }
    entries, _s, dvs, _c, _p, _cm, dvrefs = _snapshot_at(sink_dir, vs[-1])
    rows_ok = True
    rows = 0
    small = 0
    for _path, stats in entries.items():
        n, _cols = _parse_stats(stats)
        if n is None:
            rows_ok = False
            continue
        rows += n
        if n < target_rows_per_file // 2:
            small += 1
    dv_paths = set(dvs) | {
        p for counts in dvrefs.values() for p in counts
    }
    deleted = sum(len(p) for p in dvs.values()) + sum(
        n for counts in dvrefs.values() for n in counts.values()
    )
    nfiles = len(entries)
    return {
        "files": nfiles,
        "rows": (rows - deleted) if rows_ok else None,
        "small_files": small,
        "small_file_fraction": (small / nfiles) if nfiles else 0.0,
        "dv_files": len(dv_paths),
        "deleted_rows": deleted,
        "partition_dirs": len({os.path.dirname(p) for p in entries}),
        "versions": len(vs),
    }


def prune_files(
    sink_dir: str,
    predicate: dict[str, tuple],
    version: int | None = None,
) -> tuple[list[str], int]:
    """Min/max file skipping: return ``(kept_paths, total)`` for a
    conjunction of range predicates ``{col: (lo, hi)}`` (either bound
    may be None for one-sided ranges; timestamp bounds are ISO
    strings matching the manifest encoding). A file is skipped ONLY
    when its recorded bounds prove it cannot contain a matching row
    (file_max < lo or file_min > hi); files without bounds for a
    predicate column are always kept — pruning is an optimization,
    never a filter, so the caller still applies the exact predicate
    to the surviving rows (same contract as parquet row-group
    skipping)."""
    index = stats_at(sink_dir, version)
    kept: list[str] = []
    for path, cols in index.items():
        skip = False
        for col, (lo, hi) in predicate.items():
            if col not in cols:
                continue
            mn, mx = cols[col]
            if (lo is not None and mx < lo) or (hi is not None and mn > hi):
                skip = True
                break
        if not skip:
            kept.append(path)
    return kept, len(index)


# ---------------------------------------------------------------
# Bloom-filter file skipping (round 6)
#
# Min/max bounds cannot prune a POINT LOOKUP on a high-cardinality
# column whose values are spread across every file (each file's
# [min, max] spans the probe). Delta solves this with per-file bloom
# filter indexes; this is that feature on the manifest: an optional
# per-file, per-column bloom filter stored in the stats JSON under
# "b" — {col: {"m": bits, "k": hashes, "h": hex bitmap}} — built
# with ONE O(batch) aggregation over the staged files at commit
# time and carried through checkpoints like every other stat. The
# hash family is the repo's two-engine md5 convention
# (operators/dedup.py:306): a, b = first/second 48-bit halves of
# md5(CAST(value AS STRING)); position_i = (a + i*b) mod m — exact
# bigint arithmetic in Spark, DuckDB, and driver-side Python, so an
# oracle can re-derive the exact keep/skip decision. A membership
# test has NO false negatives (a file containing the value is
# always kept — pruning stays an optimization, never a filter);
# false positives only cost a wasted file read. Round 7: the
# bitmaps live in EXECUTOR-WRITTEN parquet sidecars under
# ``_txn/bloom/<uuid>`` (the manifest spec carries {"m","k","t",
# "r": ref} — O(#files) manifest bytes at any bitmap size); the
# driver loads a sidecar once per probe session (cached, immutable)
# — the index read every point lookup pays. Round-6 inline hex
# specs still parse.

BLOOM_K = 5
BLOOM_BITS_PER_KEY = 16  # fpp ≈ (1 - e^(-k·n/m))^k ≈ 1.4e-3


def _bloom_m(n_distinct: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """Filter size in bits for a file with ``n_distinct`` keys:
    bits_per_key·n rounded up to a 64-bit word, floor 64. The oracle
    replicates this exact formula (integer arithmetic only)."""
    return max(64, ((n_distinct * bits_per_key + 63) // 64) * 64)


def _bloom_positions(value, m: int, k: int) -> list[int]:
    """The k bit positions of ``value`` — driver-side half of the
    two-engine hash: md5 of the value's canonical string form (str()
    of a Python int == Spark CAST(bigint AS STRING) == DuckDB
    CAST(... AS VARCHAR))."""
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    a, b = int(h[0:12], 16), int(h[16:28], 16)
    return [(a + i * b) % m for i in range(k)]


def build_bloom(
    spark: SparkSession,
    sink_dir: str,
    new_files: list[str],
    col: str,
    k: int = BLOOM_K,
    bits_per_key: int = BLOOM_BITS_PER_KEY,
) -> dict[str, dict]:
    """Per-file bloom filters over ``col`` for a staged batch — pass
    the result to :func:`commit_append(bloom=...)`. Cost: one
    distinct-(file, value) aggregation plus one positions
    aggregation over the NEW files only (O(batch), never O(table));
    per-file driver state is bounded by m bits. Files where every
    value is null get no filter (conservative keep at read time).

    The spec records the column's LOGICAL TYPE class (``"t"``:
    ``"i"`` integral / ``"s"`` string / the Spark typeName
    otherwise) so the probe-time guard can require an exact match:
    the bloom hashed ``CAST(col AS STRING)``, and only for integral
    and string columns is that rendering canonical for a Python
    int/str probe (advisor round-6 medium: an int probe against a
    DOUBLE column would hash ``"5"`` while the filter holds
    ``"5.0"`` — every bit misses and a file holding the value would
    be WRONGLY skipped)."""
    from pyspark.sql import functions as F

    if not new_files:
        return {}
    base = os.path.abspath(sink_dir)
    paths = [os.path.join(sink_dir, f) for f in new_files]
    src = spark.read.option("basePath", sink_dir).parquet(*paths)
    dt = src.schema[col].dataType.typeName()
    tcode = (
        "i"
        if dt in ("byte", "short", "integer", "long")
        else ("s" if dt == "string" else dt)
    )
    distinct = (
        src
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/*", "/"
            ).alias("__p"),
            F.col(col).cast("string").alias("__v"),
        )
        .where(F.col("__v").isNotNull())
        .distinct()
    )
    counts = {
        r["__p"]: r["n"]
        for r in distinct.groupBy("__p").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return {}
    m_map = {p: _bloom_m(n, bits_per_key) for p, n in counts.items()}
    m_df = spark.createDataFrame(
        [(p, m) for p, m in m_map.items()], "__p string, __m long"
    )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _pack_fn(ps, m):
        # LSB-first bit layout: bit i lives at buf[i>>3], 1<<(i&7) —
        # chosen so two hex nibbles per byte (low first) reproduce
        # the round-6 nibble-hex layout exactly (blooms_at converts
        # back, so the probe math and the q213 oracle are unchanged)
        out = []
        for positions, mm in zip(ps, m):
            buf = bytearray(int(mm) // 8)
            for pos in positions:
                p = int(pos)
                buf[p >> 3] |= 1 << (p & 7)
            out.append(bytes(buf))
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations`
    # would stringify inline hints, breaking pandas_udf's inference
    _pack_fn.__annotations__ = {
        "ps": pd.Series,
        "m": pd.Series,
        "return": pd.Series,
    }
    _pack = pandas_udf(_pack_fn, "binary")

    # a + i·b with 48-bit halves and i < k stays well under 2^53 —
    # exact in every engine's bigint/double
    per_file = (
        distinct.select("__p", F.md5("__v").alias("h"))
        .select(
            "__p",
            F.conv(F.substring("h", 1, 12), 16, 10).cast("bigint").alias("a"),
            F.conv(F.substring("h", 17, 12), 16, 10).cast("bigint").alias("b"),
        )
        .join(F.broadcast(m_df), "__p")
        .select(
            "__p",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
            "a",
            "b",
            "__m",
        )
        .select(
            "__p",
            ((F.col("a") + F.col("i") * F.col("b")) % F.col("__m")).alias("pos"),
            "__m",
        )
        .groupBy("__p", "__m")
        .agg(F.collect_set("pos").alias("ps"))
        .select(
            F.expr(f"substring(__p, {len(base) + 2})").alias("path"),
            F.col("__m").alias("m"),
            F.lit(k).cast("long").alias("k"),
            _pack("ps", "__m").alias("bits"),
        )
    )
    # the bitmaps are built and written EXECUTOR-side (round 7 —
    # same sidecar discipline as the deletion vectors): the driver
    # holds only the O(#files) spec map; the manifest stats JSON
    # carries the ref, never the bitmap bytes
    ref = f"bloom/{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(_txn_dir(sink_dir), ref)
    per_file.write.mode("overwrite").parquet(out_dir)
    out: dict[str, dict] = {}
    for r in spark.read.parquet(out_dir).select("path").collect():
        out[r["path"]] = {
            col: {
                "m": m_map[os.path.join(base, r["path"])],
                "k": k,
                "t": tcode,
                "r": ref,
            }
        }
    if not out:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    return out


def _bloom_sidecar(abs_dir: str) -> dict[str, tuple[int, bytes]]:
    """Load one immutable bloom sidecar (driver-side pyarrow read —
    the INDEX read of a point lookup): {relative data-file path ->
    (m, bitmap bytes)}. Cached per directory (refs are uuid-named
    and never rewritten); a vacuumed/unreadable sidecar returns {}
    so pruning degrades to bounds-only — conservative, never a
    wrong skip."""
    if abs_dir in _BLOOM_CACHE:
        return _BLOOM_CACHE[abs_dir]
    out: dict[str, tuple[int, bytes]] = {}
    try:
        import pyarrow.parquet as pq

        for fname in sorted(os.listdir(abs_dir)):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(
                os.path.join(abs_dir, fname), columns=["path", "m", "bits"]
            )
            for p, m, b in zip(
                t.column("path").to_pylist(),
                t.column("m").to_pylist(),
                t.column("bits").to_pylist(),
            ):
                if isinstance(b, (bytes, bytearray)) and len(b) * 8 == m:
                    out[p] = (int(m), bytes(b))
    except OSError:
        out = {}
    if len(_BLOOM_CACHE) > 64:
        _BLOOM_CACHE.clear()
    _BLOOM_CACHE[abs_dir] = out
    return out


_BLOOM_CACHE: dict[str, dict[str, tuple[int, bytes]]] = {}


def blooms_at(
    sink_dir: str, version: int | None = None
) -> dict[str, dict[str, tuple[int, int, str, str | None]]]:
    """The snapshot's bloom index: {relative path -> {column ->
    (m, k, hex bitmap, type code or None)}} from the manifest plus
    (round 7) the referenced bloom SIDECARS — the manifest carries
    only ``{"m","k","t","r"}`` specs, O(#files) bytes; bitmaps load
    from ``_txn/bloom/<uuid>`` parquet on demand (cached — refs are
    immutable). Sidecar bytes convert to the round-6 nibble-hex
    layout so the probe math (and the q213 oracle) is storage-
    independent. Files committed without a bloom simply have no
    entry; a ``None`` type code marks a pre-type-guard spec
    (probe-time guard then falls back to the column's BOUNDS
    type)."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    v = vs[-1] if version is None else version
    out: dict[str, dict[str, tuple[int, int, str, str | None]]] = {}
    for path, stats in _entries_at(sink_dir, v).items():
        if stats is None:
            continue
        try:
            parsed = json.loads(stats)
        except ValueError:
            continue
        blooms = parsed.get("b") if isinstance(parsed, dict) else None
        if not isinstance(blooms, dict):
            continue
        per_col: dict[str, tuple[int, int, str, str | None]] = {}
        for c, spec in blooms.items():
            if not (
                isinstance(spec, dict)
                and isinstance(spec.get("m"), int)
                and isinstance(spec.get("k"), int)
            ):
                continue
            t = spec.get("t")
            t = t if isinstance(t, str) else None
            if isinstance(spec.get("h"), str) and len(spec["h"]) * 4 == spec["m"]:
                per_col[c] = (spec["m"], spec["k"], spec["h"], t)
            elif isinstance(spec.get("r"), str):
                side = _bloom_sidecar(
                    os.path.join(_txn_dir(sink_dir), spec["r"])
                )
                if path in side and side[path][0] == spec["m"]:
                    bits = side[path][1]
                    hx = "".join("%x%x" % (b & 15, b >> 4) for b in bits)
                    per_col[c] = (spec["m"], spec["k"], hx, t)
                # missing sidecar → no entry → conservative keep
        if per_col:
            out[path] = per_col
    return out


def prune_files_eq(
    sink_dir: str, col: str, value, version: int | None = None
) -> tuple[list[str], int]:
    """Point-lookup file skipping: ``(kept_paths, total)`` for the
    predicate ``col = value``, combining BOTH skip indexes the way a
    real engine does — a file is skipped when its min/max bounds
    exclude the value OR its bloom filter proves absence (any of the
    k bits unset). No false negatives by construction; files without
    stats/bloom for ``col`` are kept. The caller still applies the
    exact predicate to the survivors."""
    index = stats_at(sink_dir, version)
    blooms = blooms_at(sink_dir, version)
    kept: list[str] = []
    for path, cols in index.items():
        skip = False
        if col in cols:
            mn, mx = cols[col]
            try:
                skip = value < mn or value > mx
            except TypeError:
                skip = False  # incomparable bound types: keep
        # the bloom path requires the probe's string rendering to be
        # IDENTICAL to the Spark-side CAST(col AS STRING) used at
        # build time. That needs BOTH sides type-checked (advisor
        # round-6 medium): an int/str probe AND an integral/string
        # COLUMN — an int probe against a DOUBLE column hashes "5"
        # while the filter holds "5.0", every bit misses, and a file
        # holding the value would be wrongly skipped. The column's
        # type comes from the spec's recorded type code; legacy
        # specs without one fall back to the bounds' JSON type
        # (an int column's bounds parse as Python int, a string
        # column's as str). Any mismatch or unknown → bounds-only
        # pruning, never a wrong skip.
        spec = blooms.get(path, {}).get(col)
        if not skip and spec is not None and not isinstance(value, bool):
            m, k, h, t = spec
            if isinstance(value, int):
                want = "i"
                bounds_ok = col in cols and all(
                    isinstance(b, int) and not isinstance(b, bool)
                    for b in cols[col]
                )
            elif isinstance(value, str):
                want = "s"
                bounds_ok = col in cols and all(
                    isinstance(b, str) for b in cols[col]
                )
            else:
                want, bounds_ok = None, False
            if want is not None and (t == want if t is not None else bounds_ok):
                for pos in _bloom_positions(value, m, k):
                    if not (int(h[pos >> 2], 16) >> (pos & 3)) & 1:
                        skip = True
                        break
        if not skip:
            kept.append(path)
    return kept, len(index)


def prune_files_in(
    sink_dir: str,
    col: str,
    values,
    version: int | None = None,
) -> tuple[list[str], int]:
    """DYNAMIC file pruning for a key set (Delta's dynamic file
    pruning / Iceberg's join-pushdown analog): ``(kept_paths,
    total)`` for the predicate ``col IN values``, where the values
    come from a runtime source — typically a selective dimension
    filter on the probe side of a join — rather than a literal in
    the query text. A file is kept iff its recorded [min, max]
    bounds admit at least one key (one ``bisect`` over the sorted
    key list per file — O(#files · log #keys) driver work, pure
    metadata, no data file opened) AND, when the file carries a
    type-matched bloom sidecar for ``col``, at least one
    bounds-admitted key passes the bloom — the leg that makes DFP
    effective on an UNCLUSTERED column, where every file's range
    spans most keys but each file holds few of them (worst case
    O(#files · #keys · k) bit probes, still metadata-only). Files
    without bounds for ``col`` are always kept; incomparable or
    type-mismatched bound/key types keep the file — pruning is an
    optimization, NEVER a wrong skip, and the caller still applies
    the exact join/filter to the survivors (the
    :func:`prune_files` contract).

    An EMPTY key set keeps nothing: ``col IN ()`` provably matches
    no row, so reading zero files is the exact answer, not a
    heuristic.

    Scale: the key list is bounded by the DIMENSION filter's
    selectivity — the same cardinality a broadcast join ships to
    every executor, so collecting it once on the driver is strictly
    cheaper than the join that follows. When even that is too large,
    degrade to :func:`prune_files` with the key set's (min, max)
    envelope and let the per-file bloom sidecars absorb point
    selectivity."""
    import bisect

    index = stats_at(sink_dir, version)
    try:
        keys = sorted(set(values))
    except TypeError:
        # mixed incomparable key types: cannot order, cannot refute —
        # keep everything rather than crash or wrongly skip
        return list(index), len(index)
    if not keys:
        return [], len(index)
    blooms = blooms_at(sink_dir, version)
    kept: list[str] = []
    for path, cols in index.items():
        if col not in cols:
            kept.append(path)
            continue
        mn, mx = cols[col]
        try:
            i = bisect.bisect_left(keys, mn)
            j = bisect.bisect_right(keys, mx)
        except TypeError:
            kept.append(path)  # incomparable types: keep, never wrong-skip
            continue
        if i >= j:
            continue  # bounds exclude every key
        # bounds admit keys[i:j]; the per-file BLOOM (when present
        # and type-matched — the prune_files_eq guard) can refute
        # each candidate key individually: skip the file only when
        # EVERY candidate is provably absent. This is what makes DFP
        # effective on an UNCLUSTERED column, where one file's
        # [min, max] spans most of the key range.
        spec = blooms.get(path, {}).get(col)
        if spec is None:
            kept.append(path)
            continue
        m, k, h, t = spec
        bounds_int = all(
            isinstance(b, int) and not isinstance(b, bool) for b in cols[col]
        )
        bounds_str = all(isinstance(b, str) for b in cols[col])

        def _admits(v) -> bool:
            if isinstance(v, bool):
                return True
            if isinstance(v, int):
                ok = (t == "i") if t is not None else bounds_int
            elif isinstance(v, str):
                ok = (t == "s") if t is not None else bounds_str
            else:
                ok = False
            if not ok:
                return True  # type mismatch: cannot refute, keep
            return all(
                (int(h[pos >> 2], 16) >> (pos & 3)) & 1
                for pos in _bloom_positions(v, m, k)
            )

        if any(_admits(v) for v in keys[i:j]):
            kept.append(path)
    return kept, len(index)


def derive_partition_predicate(
    sink_dir: str,
    src_col: str,
    lo_ts: str,
    hi_ts: str,
    version: int | None = None,
) -> dict[str, tuple] | None:
    """Iceberg HIDDEN-PARTITIONING predicate translation: if the
    active partition spec declares a day transform on ``src_col`` —
    the partspec grammar ``days(src, YYYY-MM-DD) AS col`` — a
    timestamp range ``[lo_ts, hi_ts]`` (ISO strings) on the SOURCE
    column derives the inclusive day-number range on the generated
    column: ``[days(lo), days(hi)]``, floor on both ends, so every
    file that could hold an in-range row survives (a row at
    ``lo_ts``'s own day may precede ``lo_ts`` within the day — the
    exact predicate still applies to survivors). Returns None when
    the spec declares no day transform on ``src_col`` — the caller
    falls back to an unpruned read, never a wrong skip. Like
    Iceberg, only a FIXED transform catalog participates in
    translation (day here; Delta generated-column pruning has the
    same closed list) — arbitrary expressions can't be inverted
    safely."""
    import re as _re
    from datetime import date, datetime

    spec = partspec_at(sink_dir, version)
    if not spec:
        return None
    m = _re.search(
        rf"days\(\s*{_re.escape(src_col)}\s*,\s*(\d{{4}}-\d{{2}}-\d{{2}})\s*\)"
        rf"\s+AS\s+(\w+)",
        spec,
    )
    if not m:
        return None
    epoch = date.fromisoformat(m.group(1))
    col = m.group(2)
    lo_d = (datetime.fromisoformat(lo_ts).date() - epoch).days
    hi_d = (datetime.fromisoformat(hi_ts).date() - epoch).days
    return {col: (lo_d, hi_d)}


def read_committed(
    spark: SparkSession,
    sink_dir: str,
    prune: dict[str, tuple] | None = None,
    prune_eq: tuple | None = None,
    prune_in: tuple | None = None,
) -> DataFrame | None:
    """DataFrame over exactly the committed snapshot, or None when no
    data has ever been committed. ``basePath`` recovers the hive
    partition columns so downstream partition-column filters still
    prune (they filter the file list, same as directory reads).

    With ``prune={col: (lo, hi)}`` the manifest's per-file min/max
    bounds drop provably-excluded files BEFORE Spark ever sees them
    — manifest-driven data skipping on non-partition columns. With
    ``prune_eq=(col, value)`` the point-lookup path additionally
    consults the per-file bloom filters (:func:`prune_files_eq`).
    With ``prune_in=(col, values)`` a runtime KEY SET — typically a
    filtered dimension's join keys — prunes dynamically
    (:func:`prune_files_in`); an empty key set reads no files and
    returns None, which is the exact ``IN ()`` answer.
    The caller must still apply the exact predicate (kept files may
    contain non-matching rows)."""
    if prune_eq is not None:
        files, _total = prune_files_eq(sink_dir, prune_eq[0], prune_eq[1])
    elif prune_in is not None:
        files, _total = prune_files_in(sink_dir, prune_in[0], prune_in[1])
    elif prune:
        files, _total = prune_files(sink_dir, prune)
    else:
        files = committed_files(sink_dir)
    if not files:
        return None
    reader = spark.read.option("basePath", sink_dir)
    schema = schema_at(sink_dir)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*[os.path.join(sink_dir, f) for f in files])
    vs = versions(sink_dir)
    snap = _snapshot_at(sink_dir, vs[-1])
    df = _apply_dv(spark, df, sink_dir, snap[2], snap[6])
    return _apply_colmap(df, snap[5])


def read_version(spark: SparkSession, sink_dir: str, version: int) -> DataFrame:
    """Time travel: DataFrame over exactly the snapshot a past commit
    published (Delta's ``versionAsOf``). Works because data files are
    immutable once committed and superseded files survive until
    vacuum — the log IS the table state. After :func:`prune_log`,
    versions beyond the retained horizon raise FileNotFoundError
    (clean refusal, never a wrong snapshot)."""
    entries, schema, dvs, _checks, _ps, colmap, dvrefs = _snapshot_at(
        sink_dir, version
    )
    files = list(entries)
    if not files:
        return spark.read.format("parquet").schema("__empty STRING").load()
    reader = spark.read.option("basePath", sink_dir)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*[os.path.join(sink_dir, f) for f in files])
    return _apply_colmap(_apply_dv(spark, df, sink_dir, dvs, dvrefs), colmap)


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
    (the CAS failure — caller re-reads the log and retries), or when
    a concurrent vacuum reclaimed the temp file before the link
    (same recovery: the retry loop writes a fresh temp file). Maps
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
    except FileNotFoundError:
        # the temp file vanished between write and publish (an
        # over-eager concurrent vacuum) — nothing was committed
        return False
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)


def _commit(
    sink_dir: str,
    new_files: list[str],
    replace: bool,
    expected_version: int | None = None,
    schema_ddl: str | None = None,
    delete_dv: dict[str, list[int]] | None = None,
    add_check: tuple[str, str] | None = None,
    bloom: dict[str, dict] | None = None,
    partspec: str | None = None,
    colmap: dict[str, str] | None = None,
    dv_ref: tuple[str, dict[str, int]] | None = None,
    replace_all: bool = False,
    drop_dirs: list[str] | None = None,
    op: str | None = None,
) -> bool:
    """Read-log → build-entry → CAS-create, retrying on contention.

    ``op`` (round 9) records COMMIT INTENT as a ``#op\\t<name>``
    metadata line — the analog of Delta's ``operation`` field on
    each commit (``write`` / ``merge`` / ``delete`` / ``optimize`` /
    ``replace`` / ``restore`` / ``meta``). Unlike the other ``#``
    lines it describes THIS commit, not snapshot state, so
    checkpoints do NOT carry it forward; older readers skip it via
    the unknown-``#`` forward-compat rule. Consumers:
    :func:`read_changes_with_images` uses it to classify
    delete+insert pairs the way Delta's CDF does (a MERGE's pairs
    are updates even when a row was rewritten to its existing
    values; an OPTIMIZE emits nothing).

    ``dv_ref=(ref, {path: count})`` (round 7) publishes an
    executor-written deletion-vector SIDECAR: the manifest carries
    only the ref plus per-file counts (O(#files) bytes), the
    position lists live in parquet under ``_txn/<ref>``.
    Appends commute, so a loser's retry on top of the winner's commit
    preserves both batches; a replace retried on a newer snapshot
    keeps last-replace-wins semantics for the touched partitions.

    Each new file's line carries its footer min/max stats (collected
    ONCE, outside the retry loop — O(batch) metadata reads).

    With ``expected_version`` set, the commit is CONDITIONAL: it only
    publishes while the log head is exactly that version (0 = no
    commits yet) and returns False the moment any other writer lands
    first — blind retry would be a lost update for a rewrite derived
    from the old snapshot (Delta's ConcurrentModificationException)."""
    stats = _collect_stats(sink_dir, new_files)
    if bloom:
        for path, per_col in bloom.items():
            try:
                parsed = json.loads(stats[path]) if path in stats else {}
            except ValueError:
                parsed = {}
            if not isinstance(parsed, dict):
                parsed = {}
            elif parsed and not ({"n", "c", "b"} & parsed.keys()):
                parsed = {"c": parsed}  # legacy flat bounds form
            parsed["b"] = {**parsed.get("b", {}), **per_col}
            stats[path] = json.dumps(parsed, separators=(",", ":"))

    def _token(path: str) -> str:
        s = stats.get(path)
        return path if s is None else f"{path}\t{s}"

    while True:
        vs = versions(sink_dir)
        head = vs[-1] if vs else 0
        if expected_version is not None and head != expected_version:
            return False
        seq = head + 1
        is_ckpt = seq % CHECKPOINT_EVERY == 1  # v1, v11, v21, ...
        drop_set = {os.path.dirname(f) for f in new_files} if replace else set()
        if replace and drop_dirs:
            # explicit drop set (incremental OPTIMIZE: retire exactly
            # the directories whose files were rewritten, even though
            # the rewritten output lands in a different dir family)
            drop_set |= set(drop_dirs)
        if replace and replace_all and head:
            # full-snapshot replace: every dir the CURRENT head lists
            # drops too (recomputed per retry — the head may move)
            drop_set |= {
                os.path.dirname(f) for f in _listing_at(sink_dir, head)
            }
        replaced_dirs = sorted(drop_set)
        if is_ckpt:
            (
                base,
                cur_schema,
                cur_dvs,
                cur_checks,
                cur_partspec,
                cur_cm,
                cur_dvrefs,
            ) = (
                _snapshot_at(sink_dir, vs[-1])
                if vs
                else ({}, None, {}, {}, None, {}, {})
            )
            if replace:
                drops = set(replaced_dirs)
                base = {
                    p: s
                    for p, s in base.items()
                    if os.path.dirname(p) not in drops
                }
                cur_dvs = {
                    p: v
                    for p, v in cur_dvs.items()
                    if os.path.dirname(p) not in drops
                }
                cur_dvrefs = {
                    r: kept
                    for r, c in cur_dvrefs.items()
                    if (kept := {
                        p: n
                        for p, n in c.items()
                        if os.path.dirname(p) not in drops
                    })
                }
            if delete_dv:
                for p, v in delete_dv.items():
                    cur_dvs[p] = sorted(set(cur_dvs.get(p, [])) | set(v))
            if dv_ref:
                cur_dvrefs = {**cur_dvrefs, dv_ref[0]: dict(dv_ref[1])}
            if add_check:
                cur_checks = {**cur_checks, add_check[0]: add_check[1]}
            eff_schema = schema_ddl if schema_ddl is not None else cur_schema
            eff_partspec = partspec if partspec is not None else cur_partspec
            eff_cm = colmap if colmap is not None else cur_cm
            lines = (
                [f"#op\t{op}"] if op is not None else []
            ) + (
                [f"#schema\t{eff_schema}"] if eff_schema is not None else []
            ) + (
                [f"#partspec\t{eff_partspec}"]
                if eff_partspec is not None
                else []
            ) + (
                [f"#colmap\t{json.dumps(eff_cm, sort_keys=True)}"]
                if eff_cm
                else []
            ) + [
                f"#check\t{n}\t{e}" for n, e in sorted(cur_checks.items())
            ] + [
                p if s is None else f"{p}\t{s}" for p, s in base.items()
            ] + [_token(f) for f in new_files] + [
                f"-{p}\t{json.dumps(v)}" for p, v in sorted(cur_dvs.items())
            ] + [
                f"%dv\t{r}\t{json.dumps(c, sort_keys=True)}"
                for r, c in sorted(cur_dvrefs.items())
            ]
        else:
            lines = (
                [f"#op\t{op}"] if op is not None else []
            ) + (
                [f"#schema\t{schema_ddl}"] if schema_ddl is not None else []
            ) + (
                [f"#partspec\t{partspec}"] if partspec is not None else []
            ) + (
                [f"#colmap\t{json.dumps(colmap, sort_keys=True)}"]
                if colmap is not None
                else []
            ) + (
                [f"#check\t{add_check[0]}\t{add_check[1]}"] if add_check else []
            ) + [f"~{d}" for d in replaced_dirs] + [
                f"+{_token(f)}" for f in new_files
            ] + [
                f"-{p}\t{json.dumps(sorted(v))}"
                for p, v in sorted((delete_dv or {}).items())
            ] + (
                [
                    f"%dv\t{dv_ref[0]}\t"
                    f"{json.dumps(dv_ref[1], sort_keys=True)}"
                ]
                if dv_ref
                else []
            )
        if _try_commit(sink_dir, seq, lines, is_ckpt):
            return True


def commit_append(
    sink_dir: str,
    new_files: list[str],
    schema_ddl: str | None = None,
    bloom: dict[str, dict] | None = None,
    partspec: str | None = None,
) -> None:
    """Publish a new snapshot = current snapshot + ``new_files`` as
    ONE atomic log-entry create. O(batch) bytes written except at
    checkpoint versions; concurrent writers serialize through the
    CAS retry loop, no update lost.

    ``schema_ddl`` (round 6) records a new READ SCHEMA with this
    commit — Delta's add-column evolution: files committed under an
    earlier, narrower schema are null-filled for the new columns at
    read time (``read_version``/``read_committed`` apply the
    snapshot's schema), and time travel to pre-evolution versions
    still reads with THAT version's schema.

    ``bloom`` (round 6) merges per-file bloom filters from
    :func:`build_bloom` into the files' stats lines — the
    point-lookup half of the skipping index.

    ``partspec`` (round 6) records a new ACTIVE partition spec with
    this commit — Iceberg's partition-spec evolution: one metadata
    line, no rewrite of files written under earlier specs; pruning
    stays stats-driven so reads are layout-agnostic."""
    _commit(
        sink_dir,
        list(new_files),
        replace=False,
        schema_ddl=schema_ddl,
        bloom=bloom,
        partspec=partspec,
        op="write",
    )


def restore(sink_dir: str, version: int) -> int:
    """Delta's ``RESTORE TABLE ... VERSION AS OF``: publish ONE new
    commit whose snapshot is identical to ``version``'s — listing
    (with its stats), read schema, and deletion vectors all roll
    back — while HISTORY is preserved: the pre-restore head stays
    time-travelable, so a bad restore is itself restorable. No data
    file is touched; the target's files must still exist (i.e. the
    target is within the vacuum retention window) — a reclaimed
    file raises FileNotFoundError and nothing is committed. Two
    deliberate semantics, both Delta's: CHECK constraints are
    administrative metadata and stay at their CURRENT set, and when
    the target predates the first schema declaration the current
    (wider, backward-compatible) read schema remains. The delta
    entry is the existing grammar composed: ``~dir`` for every
    current-or-target partition (which also clears their DVs),
    ``+path\\tstats`` re-adds the target listing, ``-path [pos]``
    re-declares the target's DVs. Returns the new head version."""
    target, t_schema, t_dvs, _t_checks, t_partspec, t_cm, t_dvrefs = (
        _snapshot_at(sink_dir, version)
    )
    missing = [
        p for p in target if not os.path.exists(os.path.join(sink_dir, p))
    ] + [
        r
        for r in t_dvrefs
        if not os.path.isdir(os.path.join(_txn_dir(sink_dir), r))
    ]
    if missing:
        raise FileNotFoundError(
            f"restore to v{version} impossible: {len(missing)} data/DV "
            f"file(s) already vacuumed, e.g. {missing[0]}"
        )
    t_tokens = [p if s is None else f"{p}\t{s}" for p, s in target.items()]
    t_dv_lines = [
        f"-{p}\t{json.dumps(v)}" for p, v in sorted(t_dvs.items())
    ] + [
        # sidecar refs roll back by RE-REFERENCE — the immutable
        # sidecar files are shared between the target version and
        # the restore commit (protected from vacuum by either)
        f"%dv\t{r}\t{json.dumps(c, sort_keys=True)}"
        for r, c in sorted(t_dvrefs.items())
    ]
    while True:
        vs = versions(sink_dir)
        head = vs[-1] if vs else 0
        seq = head + 1
        is_ckpt = seq % CHECKPOINT_EVERY == 1
        cur, cur_schema, _cur_dvs, cur_checks, cur_partspec, cur_cm, _cur_refs = (
            _snapshot_at(sink_dir, head)
            if vs
            else ({}, None, {}, {}, None, {}, {})
        )
        eff_schema = t_schema if t_schema is not None else cur_schema
        eff_ps = t_partspec if t_partspec is not None else cur_partspec
        # colmap rolls back EXACTLY (unlike the schema, where keeping
        # the current wider schema is the backward-compatible choice):
        # a target without a mapping means physical names ARE the
        # logical names, and the explicit `{}` line resets any
        # current mapping (an absent delta line would mean no change)
        schema_lines = (
            [f"#schema\t{eff_schema}"] if eff_schema is not None else []
        ) + ([f"#partspec\t{eff_ps}"] if eff_ps is not None else []) + (
            [f"#colmap\t{json.dumps(t_cm, sort_keys=True)}"]
            if (t_cm or cur_cm)
            else []
        )
        check_lines = [
            f"#check\t{n}\t{e}" for n, e in sorted(cur_checks.items())
        ]
        if is_ckpt:
            lines = (
                ["#op\trestore"]
                + schema_lines
                + check_lines
                + t_tokens
                + t_dv_lines
            )
        else:
            dirs = sorted(
                {os.path.dirname(p) for p in list(cur) + list(target)}
            )
            lines = (
                ["#op\trestore"]
                + schema_lines
                + [f"~{d}" for d in dirs]
                + [f"+{t}" for t in t_tokens]
                + t_dv_lines
            )
        if _try_commit(sink_dir, seq, lines, is_ckpt):
            return seq


def history(sink_dir: str) -> list[dict]:
    """DESCRIBE HISTORY: one row per still-reconstructible version —
    version number, checkpoint flag, live file count, deletion-vector
    position count, metadata row count (None when any file predates
    footer counts), schema-declared flag, CHECK count, and (round 9)
    the commit's ``#op`` intent tag — Delta's DESCRIBE HISTORY
    ``operation`` column (None for pre-tag entries) — from
    manifest reads alone (each version is one checkpoint + ≤9 delta
    entries of bytes; zero data files opened at any table size).
    The audit surface of the table format: what changed, when, and
    what each version would read as."""
    out: list[dict] = []
    for v in versions(sink_dir):
        listing, schema, dvs, checks, partspec, _cm, _refs = _snapshot_at(
            sink_dir, v
        )
        agg = metadata_agg(sink_dir, version=v)
        out.append(
            {
                "version": v,
                "op": commit_op(sink_dir, v),
                "is_checkpoint": v % CHECKPOINT_EVERY == 1,
                "n_files": len(listing),
                "n_dv_positions": sum(dv_counts_at(sink_dir, v).values()),
                "n_rows": agg["count"],
                "has_schema": schema is not None,
                "n_checks": len(checks),
                "partspec": partspec,
            }
        )
    return out


class CheckViolation(Exception):
    """A batch (or, for :func:`add_check`, the existing table)
    violates a CHECK constraint — the commit was refused and
    NOTHING became visible (staged files stay manifest-invisible
    until vacuum reclaims them)."""

    def __init__(self, name: str, expr: str, violations: int):
        super().__init__(
            f"check constraint {name!r} ({expr}) violated by "
            f"{violations} row(s)"
        )
        self.name = name
        self.expr = expr
        self.violations = violations


def add_check(spark: SparkSession, sink_dir: str, name: str, expr: str) -> None:
    """Record a CHECK constraint in the manifest (round 6 — Delta's
    ``ALTER TABLE ADD CONSTRAINT``): one ``#check\\t<name>\\t<expr>``
    metadata line, carried through checkpoints like the schema line
    and enforced by :func:`commit_append_checked` on every later
    batch. Like Delta, the EXISTING data must already satisfy the
    constraint — one validating scan here, else CheckViolation and
    no commit. SQL CHECK semantics: NULL evaluations pass; only
    rows where the expression is literally false violate."""
    cur = read_committed(spark, sink_dir)
    if cur is not None:
        from pyspark.sql import functions as F

        bad = cur.where(~F.expr(expr)).count()
        if bad:
            raise CheckViolation(name, expr, bad)
    _commit(sink_dir, [], replace=False, add_check=(name, expr), op="meta")


def commit_append_checked(
    spark: SparkSession, sink_dir: str, new_files: list[str]
) -> None:
    """:func:`commit_append` gated on the snapshot's CHECK
    constraints: the staged batch is validated (one scan of the NEW
    files only — O(batch), never O(table)) and a violating batch
    raises CheckViolation without publishing anything — readers
    never observe a row that failed a check, which is the write-side
    quality gate a 100 TB ingest needs (a bad batch caught at commit
    time costs one batch scan; caught downstream it costs a
    table-wide audit + DV erasure)."""
    checks = checks_at(sink_dir)
    if checks and new_files:
        from pyspark.sql import functions as F

        reader = spark.read.option("basePath", sink_dir)
        schema = schema_at(sink_dir)
        if schema is not None:
            reader = reader.schema(schema)
        df = _apply_colmap(
            reader.parquet(*[os.path.join(sink_dir, f) for f in new_files]),
            colmap_at(sink_dir),
        )
        for name, expr in sorted(checks.items()):
            bad = df.where(~F.expr(expr)).count()
            if bad:
                raise CheckViolation(name, expr, bad)
    commit_append(sink_dir, new_files)


def commit_replace(
    sink_dir: str, new_files: list[str], op: str = "replace"
) -> None:
    """Publish a new snapshot with DYNAMIC-PARTITION-OVERWRITE
    semantics: every partition directory that ``new_files`` touches
    is replaced wholesale (its previously committed files drop out
    of the listing), untouched partitions carry over. One atomic
    log-entry create — so a rollup rewrite spanning several day
    partitions becomes ONE transaction, which Spark's native
    partitionOverwriteMode=dynamic (file deletes during job commit)
    cannot give. Superseded files stay on disk for in-flight readers
    until :func:`vacuum`."""
    _commit(sink_dir, list(new_files), replace=True, op=op)


def commit_replace_table(
    sink_dir: str, new_files: list[str], op: str = "replace"
) -> None:
    """FULL-SNAPSHOT replace — Delta OPTIMIZE's table-wide rewrite or
    a layout change (ZORDER re-clustering, re-bucketing) as ONE
    atomic commit: every file the current head lists drops out,
    whatever partition directory it lives in, and ``new_files``
    become the table. Same ``~dir`` drop grammar as
    :func:`commit_replace`, so replay, checkpoints, time travel,
    vacuum, and the change feed need no new cases; superseded files
    stay on disk for in-flight readers until :func:`vacuum`. The
    drop set is O(#directories) manifest lines — metadata-sized at
    any table size."""
    _commit(sink_dir, list(new_files), replace=True, replace_all=True, op=op)


def commit_replace_dirs(
    sink_dir: str, new_files: list[str], drop_dirs: list[str],
    op: str = "optimize",
) -> None:
    """Replace with an EXPLICIT drop set — the incremental-OPTIMIZE
    commit (Delta's OPTIMIZE only rewrites not-yet-optimized files):
    the rewritten input directories in ``drop_dirs`` retire even
    though the optimized output lands in a different dir family,
    previously-optimized files carry over untouched (their layout
    work is never redone), and the whole swap is ONE atomic
    log-entry create. Dirs touched by ``new_files`` drop as in
    :func:`commit_replace`."""
    _commit(sink_dir, list(new_files), replace=True, drop_dirs=list(drop_dirs), op=op)


def commit_replace_if(
    sink_dir: str, new_files: list[str], expected_version: int,
    op: str = "replace",
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
        sink_dir,
        list(new_files),
        replace=True,
        expected_version=expected_version,
        op=op,
    )


def vacuum(
    sink_dir: str,
    retain_seconds: float = 0.0,
    protect_log_versions: bool = False,
) -> list[str]:
    """Delete unreferenced data files — crash orphans and files
    superseded by replace commits. Returns the removed relative
    paths.

    ``retain_seconds`` is the Delta-style RETENTION WINDOW (round-6,
    advisor medium): a file is deleted only when its mtime is older
    than the window, so a file a CONCURRENT writer has staged via
    :func:`stage_append` but not yet committed is never reclaimed
    from under its commit (the stage-to-commit latency is bounded by
    the window; Delta defaults to 7 days for the same reason).
    Leftover ``.tmp-`` entries of in-flight commits get the same age
    gate, and :func:`_try_commit` additionally survives losing its
    temp file mid-publish. The 0.0 default keeps the quiesced-sink
    behavior (reclaim everything immediately) — correct ONLY when no
    writer is in flight, which is how the test suites and the
    single-writer streaming sinks call it.

    ``protect_log_versions=True`` additionally keeps every file any
    still-reconstructible log version references (union of the
    retained manifest entries — O(log) bytes), so TIME TRAVEL keeps
    working across the whole retained history; pair with
    :func:`prune_log` to shrink that set. False (default) protects
    only the CURRENT snapshot — past versions become unreadable, the
    documented trade-off of immediate reclamation."""
    protected = set(committed_files(sink_dir))
    # files staged on a live WAP branch (round 6) are not orphans —
    # they are awaiting audit/publish and may outlive any retention
    # window; Iceberg likewise protects branch-referenced files.
    # wap_abandon removes the records, at which point the files
    # become ordinary vacuum fodder.
    wapd = _wap_dir(sink_dir)
    if os.path.isdir(wapd):
        for fname in os.listdir(wapd):
            if fname.endswith(".txt"):
                with contextlib.suppress(FileNotFoundError):
                    with open(os.path.join(wapd, fname), encoding="utf-8") as f:
                        protected.update(
                            line.strip() for line in f if line.strip()
                        )
    # DV and BLOOM sidecars referenced by the CURRENT snapshot are
    # always protected; with protect_log_versions, every ref any
    # retained manifest entry mentions is (time travel + restore
    # both re-reference immutable sidecars rather than copying them)
    def _bloom_refs(stats: str | None) -> set[str]:
        if not stats:
            return set()
        try:
            parsed = json.loads(stats)
        except ValueError:
            return set()
        b = parsed.get("b") if isinstance(parsed, dict) else None
        if not isinstance(b, dict):
            return set()
        return {
            spec["r"]
            for spec in b.values()
            if isinstance(spec, dict) and isinstance(spec.get("r"), str)
        }

    vs = versions(sink_dir)
    protected_refs: set[str] = set()
    if vs:
        head_snap = _snapshot_at(sink_dir, vs[-1])
        protected_refs.update(head_snap[6])
        for stats in head_snap[0].values():
            protected_refs.update(_bloom_refs(stats))
    if protect_log_versions:
        log = _scan_log(sink_dir)
        for fname in log.values():
            for line in _read_entry(sink_dir, fname):
                if line.startswith("%dv\t"):
                    protected_refs.add(line.split("\t", 2)[1])
                    continue
                if line.startswith(("~", "#", "%")):
                    continue
                if line.startswith("-"):
                    continue
                token = line[1:] if line.startswith("+") else line
                path, stats = _split_stats(token)
                protected.add(path)
                protected_refs.update(_bloom_refs(stats))
    cutoff = time.time() - retain_seconds
    removed: list[str] = []
    for root, dirs, files in os.walk(sink_dir):
        # never descend into the txn/staging machinery
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, sink_dir)
            if rel in protected:
                continue
            with contextlib.suppress(FileNotFoundError):
                if os.path.getmtime(full) > cutoff:
                    continue
                os.remove(full)
                removed.append(rel)
    # leftover commit temp files from crashed writers — same age gate
    txn = _txn_dir(sink_dir)
    if os.path.isdir(txn):
        for fname in os.listdir(txn):
            if fname.startswith(".tmp-"):
                full = os.path.join(txn, fname)
                with contextlib.suppress(FileNotFoundError):
                    if os.path.getmtime(full) <= cutoff:
                        os.remove(full)
    # orphaned DV/bloom sidecars — staged by a crashed/raced writer
    # whose commit never published, or stranded by prune_log retiring
    # every version that referenced them. Same age gate as data files
    # (a concurrent writer's sidecar between stage and commit is
    # never reclaimed within the retention window).
    import shutil

    for kind in ("dv", "bloom"):
        root = os.path.join(txn, kind)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            ref = f"{kind}/{name}"
            full = os.path.join(root, name)
            if ref in protected_refs:
                continue
            with contextlib.suppress(FileNotFoundError):
                if os.path.getmtime(full) <= cutoff:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(os.path.join("_txn", ref))
    return sorted(removed)


def prune_log(sink_dir: str, keep_versions: int = CHECKPOINT_EVERY) -> list[int]:
    """Retire manifest entries no longer needed to reconstruct the
    most recent ``keep_versions`` snapshots (round-6 — the log-side
    half of the retention policy; Delta's metadata retention). Keeps
    the newest checkpoint at-or-below the horizon plus everything
    after it; versions OLDER than that checkpoint lose their entries
    and :func:`read_version` then refuses them with
    FileNotFoundError — a clean "beyond retention" failure, never a
    wrong snapshot. Entries between that checkpoint and the horizon
    survive as a conservative bonus. Returns the pruned versions.

    Run :func:`vacuum(..., protect_log_versions=True)` AFTER pruning
    to reclaim the data files only pre-horizon versions referenced —
    prune-then-vacuum is the safe order (vacuum protects exactly
    what the remaining log can still reach).

    TAGGED versions (round 6 — :func:`tag`) are protected like the
    retention window: the kept range extends back to the oldest
    checkpoint any tag needs, so a named snapshot stays
    time-travelable no matter how far the head moves (Iceberg's
    tag-retention rule). Conservative in between — entries between
    a tag's checkpoint and the horizon survive too — never a
    broken tag."""
    vs = versions(sink_dir)
    if not vs:
        return []
    horizon = max(vs[-1] - keep_versions + 1, vs[0])
    log = _scan_log(sink_dir)
    protected = [horizon] + [
        v for v in tags(sink_dir).values() if v in log
    ]
    bases = [
        max(
            (s for s, f in log.items() if s <= p and f.endswith(_CKPT_SUFFIX)),
            default=None,
        )
        for p in protected
    ]
    if any(b is None for b in bases):
        return []
    base = min(bases)
    pruned: list[int] = []
    for seq, fname in log.items():
        if seq < base:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(_txn_dir(sink_dir), fname))
            pruned.append(seq)
    return sorted(pruned)


def _located_positions(df, sink_dir: str, condition=None, extra: tuple = ()):
    """Project a committed read down to ``(path, pos[, *extra])`` of
    the rows matching ``condition`` — sink-RELATIVE paths via the
    parquet reader's hidden ``_metadata`` columns, projected
    straight off the scan (metadata columns don't survive joins)."""
    from pyspark.sql import functions as F

    base = os.path.abspath(sink_dir)
    out = df.where(condition) if condition is not None else df
    return out.select(
        F.expr(
            f"substring(regexp_replace(_metadata.file_path,"
            f" '^file:/*', '/'), {len(base) + 2})"
        ).alias("path"),
        F.col("_metadata.row_index").cast("long").alias("pos"),
        *[F.col(c) for c in extra],
    )


def _stage_dv(
    spark: SparkSession, sink_dir: str, positions
) -> tuple[str, dict[str, int]] | None:
    """Write a deletion-vector SIDECAR from a ``(path, pos)``
    DataFrame — parquet under ``_txn/dv/<uuid>``, written by the
    EXECUTORS (the positions of a 10⁹-row delete never pass through
    the driver). Returns ``(ref, {path: count})`` for
    ``_commit(dv_ref=...)`` — the counts map (O(#files)) is the only
    driver-side state, read back from the sidecar itself so it can
    never disagree with the published positions. None when the
    locate matched nothing (the empty sidecar dir is removed)."""
    import shutil

    from pyspark.sql import functions as F

    ref = f"dv/{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(_txn_dir(sink_dir), ref)
    positions.write.mode("overwrite").parquet(out_dir)
    counts = {
        r["path"]: int(r["n"])
        for r in spark.read.parquet(out_dir)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        shutil.rmtree(out_dir, ignore_errors=True)
        return None
    return ref, counts


def delete_where(
    spark: SparkSession,
    sink_dir: str,
    condition,
    max_attempts: int = 5,
    stats_out: dict | None = None,
) -> int:
    """DELETE FROM sink WHERE condition — as one deletion-vector
    commit (no data file touched). Matching rows are located with
    the parquet reader's ``_metadata`` columns and written straight
    from the EXECUTORS into a parquet sidecar (round 7 —
    :func:`_stage_dv`; the manifest carries the ref + O(#files)
    counts, never the positions, and driver memory is O(#files) at
    any deleted-row count — the roaring-bitmap-sidecar seam the
    round-6 design documented, now real). Published via a
    CONDITIONAL commit against the snapshot version the positions
    were computed from (optimistic concurrency — Delta's DELETE
    conflict detection): row positions stay valid across concurrent
    APPENDS but not across a concurrent REPLACE/compaction of the
    same files, so on losing the race the whole locate-and-commit
    cycle recomputes from the new head rather than publishing stale
    positions (the loser's sidecar stays unreferenced — vacuum
    fodder, like any crash orphan). Returns the number of rows
    deleted. Already-deleted rows never rematch (the read applies
    current DVs), so repeating a delete is a no-op.

    ``stats_out`` (round 7, optional) records concurrency evidence:
    ``{"attempts": locate-and-commit cycles run, "refused":
    conditional commits lost to a concurrent writer}``."""
    for attempt in range(1, max_attempts + 1):
        if stats_out is not None:
            stats_out["attempts"] = attempt
            stats_out.setdefault("refused", 0)
        vs = versions(sink_dir)
        head = vs[-1] if vs else 0
        df = read_committed(spark, sink_dir)
        if df is None:
            return 0
        staged = _stage_dv(
            spark, sink_dir, _located_positions(df, sink_dir, condition)
        )
        if staged is None:
            return 0
        if _commit(
            sink_dir,
            [],
            replace=False,
            dv_ref=staged,
            expected_version=head,
            op="delete",
        ):
            return sum(staged[1].values())
        if stats_out is not None:
            stats_out["refused"] += 1
    raise RuntimeError(
        f"delete_where lost the commit race {max_attempts} times on {sink_dir}"
    )


def merge_upsert_dv(
    spark: SparkSession,
    sink_dir: str,
    updates: DataFrame,
    key: str,
    partition_by: tuple[str, ...],
    max_attempts: int = 5,
    stats_out: dict | None = None,
) -> tuple[int, int]:
    """MERGE (upsert) as ONE atomic commit — Delta's DV-backed MERGE:
    rows of the current snapshot whose ``key`` appears in
    ``updates`` are deleted via deletion vectors, and ALL update
    rows (matched rewrites + brand-new keys) are appended, in a
    single log entry — so a reader sees either the whole merge or
    none of it, and no existing data file is rewritten (the q179
    CDC-apply rewrites whole partitions; this is the row-level,
    metadata-only variant a 100 TB upsert needs). Optimistic
    concurrency like :func:`delete_where`: positions are computed
    against a pinned snapshot and the commit is conditional on that
    version; a lost race recomputes. Returns (matched, inserted).
    The staged files of a lost attempt stay manifest-invisible
    until vacuum."""
    from pyspark.sql import functions as F

    for attempt in range(1, max_attempts + 1):
        if stats_out is not None:
            stats_out["attempts"] = attempt
            stats_out.setdefault("refused", 0)
        vs = versions(sink_dir)
        head = vs[-1] if vs else 0
        current = read_committed(spark, sink_dir)
        dv_ref: tuple[str, dict[str, int]] | None = None
        matched = 0
        if current is not None:
            # project the hidden _metadata columns straight off the
            # scan BEFORE joining — metadata columns propagate
            # through projections but are unresolvable after a join
            keyed = _located_positions(current, sink_dir, extra=(key,))
            hits = keyed.join(
                F.broadcast(updates.select(key).distinct()), key
            ).select("path", "pos")
            # matched positions go straight from the executors into
            # a parquet sidecar (round 7) — driver holds only the
            # O(#files) counts map
            dv_ref = _stage_dv(spark, sink_dir, hits)
            if dv_ref is not None:
                matched = sum(dv_ref[1].values())
        # the locate-join above runs on LOGICAL names (read_committed
        # applies the column mapping), but parquet files must carry
        # the table's frozen PHYSICAL names — translate before
        # staging (advisor round-6 medium: writing logical names
        # would schema-mix old and new files and null-fill one side)
        staged = stage_append(to_physical(updates, sink_dir), sink_dir, partition_by)
        if _commit(
            sink_dir,
            staged,
            replace=False,
            dv_ref=dv_ref,
            expected_version=head,
            op="merge",
        ):
            return matched, updates.count() - matched
        if stats_out is not None:
            stats_out["refused"] += 1
    raise RuntimeError(
        f"merge_upsert_dv lost the commit race {max_attempts} times on {sink_dir}"
    )


# ---------------------------------------------------------------
# Change data feed (round 6)


def _files_df(
    spark: SparkSession,
    sink_dir: str,
    files: list[str],
    schema: str | None,
):
    """Read specific committed files keyed by (normalized path, row
    position) — the building block of the change feed."""
    from pyspark.sql import functions as F

    reader = spark.read.option("basePath", sink_dir)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*[os.path.join(sink_dir, f) for f in files])
    return df.withColumn(
        "__p", F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/")
    ).withColumn("__i", F.col("_metadata.row_index"))


def _pos_join_df(keyed, pos_df, how: str):
    """Semi/anti join a keyed file read against a deleted-position
    DataFrame from :func:`_dv_pos_df` (absolute ``__dv_path`` +
    ``__dv_pos``). ``pos_df=None`` means no positions: an anti join
    passes everything through, a semi join yields nothing. No
    broadcast hint — inline position sets are small, sidecar-backed
    ones may not be; AQE still broadcasts the small case."""
    if pos_df is None:
        return keyed if how == "left_anti" else keyed.limit(0)
    return keyed.join(
        pos_df,
        (keyed["__p"] == pos_df["__dv_path"])
        & (keyed["__i"] == pos_df["__dv_pos"]),
        how,
    )


def read_changes(
    spark: SparkSession,
    sink_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame | None:
    """CHANGE DATA FEED: the row-level changes between two snapshot
    versions, derived from the MANIFEST DIFF of each intervening
    commit — Delta's ``readChangeFeed`` semantics without rewriting
    a byte at write time. Emits the data columns (under
    ``to_version``'s read schema, older files null-filled) plus
    ``_change_type`` ('insert' | 'delete') and ``_commit_version``.
    Per version v the diff against v-1 decomposes into:

    - files added        → their rows (minus any DV positions placed
                           on them in the same commit) are inserts;
    - files retired      → their still-live rows (minus the DV
                           positions already dead at v-1) are deletes;
    - DV positions added on surviving files → deletes;
    - DV positions removed on surviving files (a RESTORE undoing a
      delete) → inserts.

    An update (MERGE) therefore appears as delete+insert of the same
    key — exactly Delta CDF's representation for DV-backed merges.
    Cost is O(changed files + DV positions) per version — the
    listing diff is manifest bytes, and only changed files are ever
    opened — which is what makes a downstream incremental consumer
    (see operators using this for materialized-view maintenance)
    O(delta) instead of O(table) at 100 TB. Returns None when the
    range contains no versions. A ``from_version`` of 0 means "from
    the beginning" (every v1 row is an insert).

    Retention interaction: ``from_version`` (and the versions whose
    files must be read) must be within the :func:`prune_log` /
    vacuum horizons — outside them this raises FileNotFoundError,
    the same clean refusal as time travel. An INTERMEDIATE version
    pruned from the log does not raise: its net changes fold into
    the next surviving version's diff (nothing is ever lost — the
    diff is taken against the last SEEN snapshot — but per-version
    attribution coarsens to the surviving version), matching the
    consumer contract that replaying the feed reproduces the head
    snapshot exactly."""
    from functools import reduce

    from pyspark.sql import functions as F

    vs = versions(sink_dir)
    if to_version is None:
        to_version = vs[-1] if vs else 0
    if to_version <= from_version:
        return None
    target_schema = schema_at(sink_dir, to_version)

    if from_version == 0:
        prev_listing: dict[str, str | None] = {}
        prev_dvs: dict[str, list[int]] = {}
        prev_refs: dict[str, dict[str, int]] = {}
    else:
        prev_snap = _snapshot_at(sink_dir, from_version)
        prev_listing, prev_dvs, prev_refs = (
            prev_snap[0],
            prev_snap[2],
            prev_snap[6],
        )

    pieces = []
    for v in range(from_version + 1, to_version + 1):
        if v not in _scan_log(sink_dir):
            continue
        snap = _snapshot_at(sink_dir, v)
        cur_listing, cur_dvs, cur_refs = snap[0], snap[2], snap[6]
        added = [p for p in cur_listing if p not in prev_listing]
        removed = [p for p in prev_listing if p not in cur_listing]
        # DV diff at the SIDECAR-REF level (round 7): a ref is
        # immutable, so refs present in both snapshots contribute no
        # row-level change; added refs are new deletes, removed refs
        # (a RESTORE) are un-deletes. A restore chain that re-deletes
        # the same position under a fresh ref can emit a cancelling
        # delete+insert pair within one version — net-preserving for
        # any replaying consumer (the replay test pins this).
        added_refs = {r: c for r, c in cur_refs.items() if r not in prev_refs}
        removed_refs = {
            r: c for r, c in prev_refs.items() if r not in cur_refs
        }
        if added:
            ins = _files_df(spark, sink_dir, added, target_schema)
            pos = _dv_pos_df(
                spark,
                sink_dir,
                {p: cur_dvs.get(p, []) for p in added},
                cur_refs,
                restrict=set(added),
            )
            pieces.append((v, "insert", _pos_join_df(ins, pos, "left_anti")))
        if removed:
            dels = _files_df(spark, sink_dir, removed, target_schema)
            pos = _dv_pos_df(
                spark,
                sink_dir,
                {p: prev_dvs.get(p, []) for p in removed},
                prev_refs,
                restrict=set(removed),
            )
            pieces.append((v, "delete", _pos_join_df(dels, pos, "left_anti")))
        surviving = {p for p in cur_listing if p in prev_listing}
        new_dead = {
            p: srt
            for p in surviving
            if (srt := sorted(set(cur_dvs.get(p, [])) - set(prev_dvs.get(p, []))))
        }
        dead_paths = sorted(
            set(new_dead)
            | {p for c in added_refs.values() for p in c if p in surviving}
        )
        if dead_paths:
            d = _files_df(spark, sink_dir, dead_paths, target_schema)
            pos = _dv_pos_df(
                spark, sink_dir, new_dead, added_refs, restrict=set(dead_paths)
            )
            pieces.append((v, "delete", _pos_join_df(d, pos, "left_semi")))
        undead = {
            p: srt
            for p in surviving
            if (srt := sorted(set(prev_dvs.get(p, [])) - set(cur_dvs.get(p, []))))
        }
        undead_paths = sorted(
            set(undead)
            | {p for c in removed_refs.values() for p in c if p in surviving}
        )
        if undead_paths:
            u = _files_df(spark, sink_dir, undead_paths, target_schema)
            pos = _dv_pos_df(
                spark, sink_dir, undead, removed_refs, restrict=set(undead_paths)
            )
            pieces.append((v, "insert", _pos_join_df(u, pos, "left_semi")))
        prev_listing, prev_dvs, prev_refs = cur_listing, cur_dvs, cur_refs

    if not pieces:
        return None
    data_cols = [
        c for c in pieces[0][2].columns if c not in ("__p", "__i", "__dp", "__di")
    ]
    # the feed emits LOGICAL column names under to_version's mapping,
    # mirroring read_version — a renamed table's incremental consumer
    # must see the same names its snapshot reads do (advisor round-6)
    cm = colmap_at(sink_dir, to_version)
    labeled = [
        df.select(
            *[F.col(c).alias(cm.get(c, c)) for c in data_cols],
            F.lit(kind).alias("_change_type"),
            F.lit(v).cast("bigint").alias("_commit_version"),
        )
        for v, kind, df in pieces
    ]
    return reduce(DataFrame.unionByName, labeled)


def read_changes_with_images(
    spark: SparkSession,
    sink_dir: str,
    from_version: int,
    to_version: int | None,
    key: str,
) -> DataFrame | None:
    """Delta CDF's FOUR change types, INTENT-EXACT (round 9): each
    commit's ``#op`` tag (:func:`commit_op` — Delta's per-commit
    ``operation`` field analog) drives the classification the way
    Delta's readChangeFeed does:

    - ``op == 'optimize'`` → the version emits NOTHING (Delta's
      behavior for OPTIMIZE/compaction commits — their row-level
      deletes were already emitted by the DV commits they
      materialize);
    - ``op == 'merge'`` → every key with both a delete and an
      insert in the version is an UPDATE: delete rows relabeled
      ``update_preimage``, inserts ``update_postimage`` — INCLUDING
      a row the merge rewrote to its existing values, which emits
      Delta's identical pre/post pair (a DV merge writes only
      matched + inserted rows, never copies, so every same-key pair
      is genuine); one-sided keys keep plain types;
    - untagged versions (pre-round-9 logs) and other ops fall back
      to the content heuristic, now ROW-PAIRED (round-9 advisor):
      within ``(version, key)``, identical delete/insert row
      contents cancel ONE-FOR-ONE (multiset difference) — so a
      commit that re-lays some copies of a key unchanged while
      updating one copy suppresses exactly the unchanged pairs and
      labels only the residue, where the old whole-multiset compare
      relabeled every copy; a both-sided residue becomes an update
      pair, a one-sided residue keeps its plain type.

    Shuffle shape: one combine-safe aggregation to
    ``(version, key, row-content)`` — per-group fan-in is the
    commit's per-row write amplification — then per-key totals over
    that already-collapsed frame (group sizes = distinct contents
    per key per commit, bounded by the commit's write amplification;
    never a window over raw rows or a content hash alone). O(delta),
    never O(table), no hot key a merge didn't already have."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ch = read_changes(spark, sink_dir, from_version, to_version)
    if ch is None:
        return None
    vs = versions(sink_dir)
    hi = to_version if to_version is not None else (vs[-1] if vs else 0)
    log = _scan_log(sink_dir)
    ops = {
        v: commit_op(sink_dir, v)
        for v in range(from_version + 1, hi + 1)
        if v in log
    }
    optimize_vs = [v for v, o in ops.items() if o == "optimize"]
    merge_vs = [v for v, o in ops.items() if o == "merge"]
    if optimize_vs:
        ch = ch.where(~F.col("_commit_version").isin(optimize_vs))

    out_cols = ch.columns
    data_cols = [c for c in out_cols if not c.startswith("_")]
    content_h = F.md5(
        F.to_json(F.struct(*[F.col(c) for c in data_cols])).cast("binary")
    )
    is_ins = F.col("_change_type") == "insert"
    counts = (
        ch.withColumn("_content_h", content_h)
        .groupBy("_commit_version", key, "_content_h")
        .agg(
            F.sum(F.when(is_ins, 1).otherwise(0)).alias("_n_ins"),
            F.sum(F.when(is_ins, 0).otherwise(1)).alias("_n_del"),
            # same hash == same content, so any exemplar restores
            # the row (the md5-collision tolerance the round-8
            # multiset compare already accepted)
            F.first(F.struct(*data_cols)).alias("_row"),
        )
    )
    is_merge = F.col("_commit_version").isin(merge_vs) if merge_vs else F.lit(False)
    paired = F.when(is_merge, F.lit(0)).otherwise(
        F.least("_n_ins", "_n_del")
    )
    counts = counts.withColumn("_rem_ins", F.col("_n_ins") - paired).withColumn(
        "_rem_del", F.col("_n_del") - paired
    )
    w = Window.partitionBy("_commit_version", key)
    counts = counts.withColumn("_k_ins", F.sum("_rem_ins").over(w)).withColumn(
        "_k_del", F.sum("_rem_del").over(w)
    )
    upd = (F.col("_k_ins") > 0) & (F.col("_k_del") > 0)

    # ONE pass for both sides (round 10): the old
    # union(_emit(del), _emit(ins)) form planned the entire feed
    # twice — Spark does not ReuseExchange across the two branches
    # because each filters `counts` differently BELOW the union, so
    # every commit's changed files were scanned, hashed, aggregated
    # and windowed twice (measured: 14 parquet scans / 18 exchanges
    # at sf0.01; halved by this rewrite). Instead, each collapsed
    # (version, key, content) group emits one side-tag array sized
    # by its residual counts and a single explode fans out both
    # change types; empty arrays (fully-paired groups) drop out of
    # the plain explode exactly as the old rem > 0 filters did.
    empty = F.array().cast("array<string>")
    side_tags = F.concat(
        F.when(
            F.col("_rem_del") > 0,
            F.transform(
                F.sequence(F.lit(1), F.col("_rem_del")), lambda i: F.lit("d")
            ),
        ).otherwise(empty),
        F.when(
            F.col("_rem_ins") > 0,
            F.transform(
                F.sequence(F.lit(1), F.col("_rem_ins")), lambda i: F.lit("i")
            ),
        ).otherwise(empty),
    )
    return (
        counts.withColumn("_side", F.explode(side_tags))
        .select(
            F.col("_row.*"),
            F.when(
                F.col("_side") == "d",
                F.when(upd, "update_preimage").otherwise("delete"),
            )
            .otherwise(F.when(upd, "update_postimage").otherwise("insert"))
            .alias("_change_type"),
            "_commit_version",
        )
        .select(*out_cols)
    )


# ---------------------------------------------------------------
# Write-audit-publish (round 6)
#
# Iceberg's WAP pattern: an ingest job stages its output on a
# BRANCH, an audit job validates the branch (quality checks, row
# counts, reconciliation) while production readers still see the
# untouched main table, and only then is the branch PUBLISHED —
# one atomic commit making every audited batch visible at once.
# On this log a branch is a set of staged-file records under
# ``_txn/wap/`` (exclusive-create entries, so concurrent stagers
# on the same branch serialize like commits); the data files are
# the ordinary manifest-invisible staged files, so an abandoned
# branch is reclaimed by vacuum like any crash orphan. Publish
# funnels through the snapshot's CHECK constraints (one scan of
# the BRANCH files only — O(branch), not O(table)) and refuses
# atomically: a failed audit leaves main byte-identical.

_WAP_DIR = "wap"


def _wap_dir(sink_dir: str) -> str:
    return os.path.join(_txn_dir(sink_dir), _WAP_DIR)


def wap_stage(sink_dir: str, branch: str, new_files: list[str]) -> int:
    """Record a staged batch on ``branch`` — the files stay
    manifest-invisible to main readers. Returns the branch entry
    sequence. Exclusive-create per (branch, seq): two stagers race,
    the loser retries the next sequence — no record lost."""
    d = _wap_dir(sink_dir)
    os.makedirs(d, exist_ok=True)
    seq = 1
    while True:
        path = os.path.join(d, f"{branch}-{seq:04d}.txt")
        try:
            with open(path, "x", encoding="utf-8") as f:
                f.write("\n".join(new_files) + ("\n" if new_files else ""))
                f.flush()
                os.fsync(f.fileno())
            return seq
        except FileExistsError:
            seq += 1


def wap_files(sink_dir: str, branch: str) -> list[str]:
    """Every file staged on ``branch``, in stage order."""
    d = _wap_dir(sink_dir)
    if not os.path.isdir(d):
        return []
    out: list[str] = []
    for fname in sorted(os.listdir(d)):
        if fname.startswith(f"{branch}-") and fname.endswith(".txt"):
            with open(os.path.join(d, fname), encoding="utf-8") as f:
                out.extend(line.strip() for line in f if line.strip())
    return out


def wap_read(
    spark: SparkSession, sink_dir: str, branch: str
) -> DataFrame | None:
    """The AUDIT view: main's committed snapshot plus the branch's
    staged batches — what the table WOULD look like after publish.
    Production readers (read_committed) never see any of it."""
    staged = wap_files(sink_dir, branch)
    main = read_committed(spark, sink_dir)
    if not staged:
        return main
    reader = spark.read.option("basePath", sink_dir)
    schema = schema_at(sink_dir)
    if schema is not None:
        reader = reader.schema(schema)
    branch_df = _apply_colmap(
        reader.parquet(*[os.path.join(sink_dir, f) for f in staged]),
        colmap_at(sink_dir),
    )
    if main is None:
        return branch_df
    return main.unionByName(branch_df, allowMissingColumns=True)


def wap_publish(spark: SparkSession, sink_dir: str, branch: str) -> int:
    """Fast-forward main to include every batch staged on
    ``branch`` as ONE atomic commit, gated on the snapshot's CHECK
    constraints (scanning only the branch files — O(branch)). On
    CheckViolation NOTHING publishes and the branch stays staged
    (fix or abandon). Returns the new head version; the branch
    records are retired on success."""
    staged = wap_files(sink_dir, branch)
    commit_append_checked(spark, sink_dir, staged)
    wap_abandon(sink_dir, branch)  # retire records; files are now committed
    return versions(sink_dir)[-1]


def wap_abandon(sink_dir: str, branch: str) -> int:
    """Drop every branch record — the staged data files become
    ordinary manifest-invisible orphans, reclaimed by
    :func:`vacuum`. Returns the number of records removed."""
    d = _wap_dir(sink_dir)
    if not os.path.isdir(d):
        return 0
    n = 0
    for fname in os.listdir(d):
        if fname.startswith(f"{branch}-") and fname.endswith(".txt"):
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(d, fname))
                n += 1
    return n


# ---------------------------------------------------------------
# Snapshot tags (round 6)
#
# Iceberg's tags: durable NAMES for versions ("baseline",
# "v2024-audit") that survive log retention — a tagged snapshot
# stays reconstructible after prune_log retires the untagged
# history around it. A tag is one tiny file under ``_txn/tags/``
# (atomic replace, so re-tagging is last-write-wins like Iceberg's
# replace-tag); prune_log keeps every manifest entry from the
# OLDEST checkpoint any protected version (retention window or
# tag) needs — conservative in between, never a broken tag; and
# vacuum(protect_log_versions=True) already protects every file a
# surviving log version references, tags included.


def _tags_dir(sink_dir: str) -> str:
    return os.path.join(_txn_dir(sink_dir), "tags")


def tag(sink_dir: str, name: str, version: int | None = None) -> int:
    """Name a snapshot. Defaults to the current head. Re-tagging an
    existing name moves it (atomic replace). Returns the tagged
    version."""
    vs = versions(sink_dir)
    if not vs:
        raise FileNotFoundError(f"no commits to tag in {sink_dir}")
    v = vs[-1] if version is None else version
    if v not in _scan_log(sink_dir):
        raise FileNotFoundError(f"cannot tag missing version {v}")
    d = _tags_dir(sink_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"{v}\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, f"{name}.txt"))
    return v


def tags(sink_dir: str) -> dict[str, int]:
    """{tag name -> version}."""
    d = _tags_dir(sink_dir)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for fname in os.listdir(d):
        if fname.endswith(".txt") and not fname.startswith("."):
            with contextlib.suppress(OSError, ValueError):
                with open(os.path.join(d, fname), encoding="utf-8") as f:
                    out[fname[:-4]] = int(f.read().strip())
    return out


def read_tag(spark: SparkSession, sink_dir: str, name: str) -> DataFrame:
    """Time travel by tag name."""
    t = tags(sink_dir)
    if name not in t:
        raise FileNotFoundError(f"no tag {name!r} in {sink_dir}")
    return read_version(spark, sink_dir, t[name])


# ---------------------------------------------------------------
# Metadata-only partition counts (round 6)


def metadata_count_by_dir(
    sink_dir: str, version: int | None = None
) -> dict[str, int] | None:
    """COUNT(*) GROUP BY partition directory from the manifest
    alone — the partition-level extension of :func:`metadata_agg`:
    per-file footer row counts summed per directory, minus each
    file's deletion-vector length (exact under DVs — positions are
    per-file). Returns None when any file lacks a footer count
    (pre-round-6 stats lines). Zero data files opened at any table
    size — the manifest answers the partition histogram a 100 TB
    table's planner (and its operator dashboards) ask constantly."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    v = vs[-1] if version is None else version
    entries = _entries_at(sink_dir, v)
    deleted = dv_counts_at(sink_dir, v)
    out: dict[str, int] = {}
    for path, stats in entries.items():
        n, _cols = _parse_stats(stats)
        if n is None:
            return None
        d = os.path.dirname(path)
        out[d] = out.get(d, 0) + n - deleted.get(path, 0)
    return out


# ---------------------------------------------------------------
# Column mapping / RENAME COLUMN (round 6)


def _apply_colmap(df, colmap: dict[str, str]):
    """Rename physical columns to their logical names (no-op for
    tables that never renamed; unknown physical names tolerated)."""
    if df is None or not colmap:
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).alias(colmap.get(c, c)) for c in df.columns]
    )


def colmap_at(sink_dir: str, version: int | None = None) -> dict[str, str]:
    """The snapshot's column mapping: {physical name -> logical
    name} (empty when no rename ever happened)."""
    vs = versions(sink_dir)
    if not vs:
        return {}
    return _snapshot_at(sink_dir, vs[-1] if version is None else version)[5]


def to_physical(df, sink_dir: str):
    """Rename a logically-named DataFrame back to the sink's
    PHYSICAL column names before staging — the writer-side half of
    column mapping (Delta writers do the same translation via field
    IDs). Callers that never renamed pass through untouched."""
    cm = colmap_at(sink_dir)
    if not cm:
        return df
    from pyspark.sql import functions as F

    inv = {v: k for k, v in cm.items()}
    return df.select(*[F.col(c).alias(inv.get(c, c)) for c in df.columns])


def rename_column(sink_dir: str, old: str, new: str) -> None:
    """RENAME COLUMN as ONE metadata commit — Delta's column-mapping
    analog: physical names in data files are FROZEN at creation;
    a rename changes only the logical surface via a ``#colmap``
    manifest line (checkpoint-carried, restore-rolled-back). Every
    read path (committed, time travel, WAP audit view, CHECK
    validation) applies the snapshot's mapping, so old files are
    never rewritten and per-version names survive time travel.
    Writers keep producing PHYSICAL names — stage logically-named
    frames through :func:`to_physical` first (the same
    translation Delta writers do via field IDs)."""
    cur = colmap_at(sink_dir)
    # find the physical column whose CURRENT logical name is `old`
    logical = {p: cur.get(p, p) for p in _physical_columns(sink_dir)}
    phys = [p for p, l in logical.items() if l == old]
    if not phys:
        raise KeyError(f"no column with logical name {old!r}")
    updated = {**cur, phys[0]: new}
    _commit(sink_dir, [], replace=False, colmap=updated, op="meta")


def _split_ddl_top(schema: str) -> list[str]:
    """Split a schema DDL string on TOP-LEVEL commas only, tracking
    ``<>``/``()`` nesting depth — ``DECIMAL(12,2)``, ``STRUCT<...>``
    and ``MAP<...>`` fields stay whole (advisor round-6: a bare
    ``.split(",")`` yields pseudo-columns like ``2)`` and inner
    struct field names, which a rename could wrongly resolve to)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _physical_columns(sink_dir: str) -> list[str]:
    """Physical column names of the current snapshot: from the
    declared read schema when present, else from any committed
    file's footer stats keys plus partition dirs (best effort —
    enough to resolve a rename target)."""
    schema = schema_at(sink_dir)
    if schema is not None:
        return [f.split()[0].strip("`") for f in _split_ddl_top(schema)]
    cols: set[str] = set()
    for path, stats in _entries_at(sink_dir, versions(sink_dir)[-1]).items():
        _n, bounds = _parse_stats(stats)
        cols.update(bounds)
        d = os.path.dirname(path)
        if "=" in d:
            cols.add(d.split("=", 1)[0])
    return sorted(cols)
