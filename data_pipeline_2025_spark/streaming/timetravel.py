"""Snapshot time travel over the manifest commit log (txn.py) — the
``versionAsOf`` / DESCRIBE HISTORY capability of a real table format
reproduced on the repo's own transaction layer, and proven as a
checked query.

Reference analog: the Postgres silver store's state is only ever its
latest transaction (rabbitmq-to-postgres/app.py:158-176 commits and
moves on); a lakehouse sink keeps every manifest version, so any
past snapshot is still a readable table. Scale shape: a manifest is
a file LISTING (bytes per file, not per row); reading version v is
a plain parquet scan over v's files — time travel costs nothing at
read time, which is exactly why table formats implement it this
way."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, money_out
from ..registry import register
from ..session import session_scratch_dir
from . import txn

_TT_SPLIT = "2024-01-16 00:00:00"

_ORACLE_Q162 = f"""
WITH half AS (
    SELECT * FROM events WHERE ts < TIMESTAMP '{_TT_SPLIT}'
),
v1 AS (
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_value_d
    FROM half
),
v2 AS (
    SELECT CAST(2 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_value_d
    FROM events
)
SELECT version, n_rows, n_days, total_value_d,
       CAST(n_rows - COALESCE(lag(n_rows) OVER (ORDER BY version), 0)
            AS BIGINT) AS added_rows
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
ORDER BY version
"""


@register(
    "q162_snapshot_time_travel",
    oracle=_ORACLE_Q162,
    doc="versionAsOf time travel on the manifest commit log: two "
    "manifest-committed batches build a day-partitioned sink, then "
    "EVERY retained snapshot version is read back as a table and "
    "summarized (rows, days, exact value total, rows added vs the "
    "previous version) — the committed manifests ARE the table "
    "history, checked against batch SQL.",
    tags=("streaming", "txn", "timetravel"),
)
def q162_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session-scoped scratch sink: built once per (session, sf_dir),
    # reused by later invocations, removed at interpreter exit — a
    # fresh mkdtemp per call leaked a full copy of events each run.
    tag = "tt_q162_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    sink, fresh = session_scratch_dir(spark, tag)
    if not fresh and len(txn.versions(sink)) != 2:
        # a crashed earlier build left partial history — start over
        shutil.rmtree(sink, ignore_errors=True)
        os.makedirs(sink, exist_ok=True)
        fresh = True
    if fresh:
        ev = Catalog(spark, sf_dir).events.select(
            "event_id", "ts", "value", F.to_date("ts").alias("day")
        )
        split = F.lit(_TT_SPLIT).cast("timestamp")
        for batch in (
            ev.where(F.col("ts") < split),
            ev.where(F.col("ts") >= split),
        ):
            txn.commit_append(sink, txn.stage_append(batch, sink, ("day",)))
    per_version = [
        txn.read_version(spark, sink, v)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("day").alias("n_days"),
            money_out(F.sum(dec("value"))).alias("total_value_d"),
        )
        .select(F.lit(v).cast("bigint").alias("version"), "*")
        for v in txn.versions(sink)
    ]
    hist = per_version[0]
    for df in per_version[1:]:
        hist = hist.unionByName(df)
    from pyspark.sql import Window

    w = Window.orderBy("version")
    return hist.select(
        "version",
        "n_rows",
        "n_days",
        "total_value_d",
        (
            F.col("n_rows") - F.coalesce(F.lag("n_rows").over(w), F.lit(0))
        ).alias("added_rows"),
    ).orderBy("version")


# --------- q177: snapshot CHANGELOG (CDC) between log versions
#
# The table-format capability that pairs with q162's versionAsOf:
# "what changed between version A and version B" — Delta's CDF /
# table_changes, Iceberg's changelog scan. Three commits build the
# history: two day-partitioned appends (the q162 split) and then a
# commit_replace CORRECTION of one day partition (2024-01-10 keeps
# only its even event_ids — a late-arriving fix rewriting a bad
# day, the rollup-refresh shape cagg.py ships). The diff of two
# snapshots is two anti-joins on the row key: rows only in B
# (added) and rows only in A (removed). Append commits show pure
# adds; the replace commit shows pure removes — both transitions
# are emitted and the oracle states the same set algebra over the
# base table. Scale shape: snapshots are parquet scans of the
# manifest file lists; each anti-join shuffles on the unique
# event_id (uniform, no skew), counts partial-aggregate map-side.
_CDC_FIX_DAY = "2024-01-10"


def _build_cdc_sink(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped 3-commit sink: append / append / replace-fix.
    Rebuilt only if a crashed earlier build left partial history."""
    tag = "cdc_q177_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    sink, fresh = session_scratch_dir(spark, tag)
    if not fresh and len(txn.versions(sink)) != 3:
        shutil.rmtree(sink, ignore_errors=True)
        os.makedirs(sink, exist_ok=True)
        fresh = True
    if fresh:
        ev = Catalog(spark, sf_dir).events.select(
            "event_id", "ts", "value", F.to_date("ts").alias("day")
        )
        split = F.lit(_TT_SPLIT).cast("timestamp")
        txn.commit_append(
            sink, txn.stage_append(ev.where(F.col("ts") < split), sink, ("day",))
        )
        txn.commit_append(
            sink, txn.stage_append(ev.where(F.col("ts") >= split), sink, ("day",))
        )
        fix = ev.where(
            (F.col("day") == F.lit(_CDC_FIX_DAY).cast("date"))
            & (F.col("event_id") % 2 == 0)
        )
        txn.commit_replace(sink, txn.stage_append(fix, sink, ("day",)))
    return sink


_ORACLE_Q177 = f"""
WITH v1 AS (SELECT event_id FROM events WHERE ts < TIMESTAMP '{_TT_SPLIT}'),
     v2 AS (SELECT event_id FROM events),
     v3 AS (SELECT event_id FROM events
            WHERE CAST(ts AS DATE) <> DATE '{_CDC_FIX_DAY}'
               OR event_id % 2 = 0)
SELECT * FROM (
SELECT CAST(1 AS BIGINT) AS from_version, CAST(2 AS BIGINT) AS to_version,
       (SELECT COUNT(*) FROM v1) AS rows_from,
       (SELECT COUNT(*) FROM v2) AS rows_to,
       (SELECT COUNT(*) FROM v2 ANTI JOIN v1 USING (event_id)) AS added_rows,
       (SELECT COUNT(*) FROM v1 ANTI JOIN v2 USING (event_id)) AS removed_rows
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT),
       (SELECT COUNT(*) FROM v2),
       (SELECT COUNT(*) FROM v3),
       (SELECT COUNT(*) FROM v3 ANTI JOIN v2 USING (event_id)),
       (SELECT COUNT(*) FROM v2 ANTI JOIN v3 USING (event_id))
) ORDER BY from_version
"""


@register(
    "q177_snapshot_changelog",
    oracle=_ORACLE_Q177,
    doc="CDC between manifest-log snapshots (Delta CDF analog): a "
    "3-commit history (append, append, replace-correction of one "
    "day partition) is diffed version-to-version with key "
    "anti-joins — appends show pure adds, the replace shows pure "
    "removes; both transitions checked against set algebra on the "
    "base table.",
    tags=("streaming", "txn", "timetravel", "cdc"),
)
def q177_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    sink = _build_cdc_sink(spark, sf_dir)
    vs = {v: txn.read_version(spark, sink, v).select("event_id") for v in (1, 2, 3)}
    out = None
    for a, b in ((1, 2), (2, 3)):
        va, vb = vs[a], vs[b]
        row = (
            va.agg(F.count(F.lit(1)).alias("rows_from"))
            .crossJoin(
                F.broadcast(vb.agg(F.count(F.lit(1)).alias("rows_to")))
            )
            .crossJoin(
                F.broadcast(
                    vb.join(va, "event_id", "left_anti").agg(
                        F.count(F.lit(1)).alias("added_rows")
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    va.join(vb, "event_id", "left_anti").agg(
                        F.count(F.lit(1)).alias("removed_rows")
                    )
                )
            )
            .select(
                F.lit(a).cast("bigint").alias("from_version"),
                F.lit(b).cast("bigint").alias("to_version"),
                F.col("rows_from").cast("bigint").alias("rows_from"),
                F.col("rows_to").cast("bigint").alias("rows_to"),
                F.col("added_rows").cast("bigint").alias("added_rows"),
                F.col("removed_rows").cast("bigint").alias("removed_rows"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("from_version")


# --------- q188: OPTIMIZE compaction audit (round 5)
#
# The third table-format lifecycle capability next to q162
# (versionAsOf) and q177 (CDC): small-file COMPACTION as a
# transaction (maintenance.txn_compact — Delta OPTIMIZE). Two
# parity-split append commits give every day partition two files;
# one txn_compact publishes the single-file rewrite of every
# partition as ONE replace commit. The audit reads the
# post-compaction snapshot back and emits, per day, the row count
# and exact value total (the content-preservation contract — the
# cross-engine hash against plain batch SQL over events IS the
# proof that compaction changed layout, not data), the per-partition
# committed file count (1 by construction: coalesce toward the
# 128 MB target), the manifest version count (2 appends + 1
# compaction), and a time-travel flag comparing the pre-compaction
# snapshot's row count to the live one. Scale shape: compaction cost
# is one parquet scan + write of the touched partitions; the audit
# is one groupBy over the compacted snapshot plus an O(days)
# manifest listing joined broadcast.
_ORACLE_Q188 = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total_value_d,
       CAST(1 AS BIGINT) AS files_after,
       CAST(3 AS BIGINT) AS snapshot_versions,
       CAST(1 AS BIGINT) AS time_travel_intact
FROM events
GROUP BY 1
ORDER BY 1
"""


@register(
    "q188_compaction_audit",
    oracle=_ORACLE_Q188,
    doc="Transactional small-file compaction (Delta OPTIMIZE analog) "
    "proven as a checked query: two parity-split appends, one "
    "txn_compact replace commit, then per-day rows + exact value "
    "totals from the compacted snapshot hash-checked against batch "
    "SQL (content preserved), per-partition committed file counts "
    "(compacted to 1), manifest version count, and a pre/post "
    "time-travel row-count flag.",
    tags=("streaming", "txn", "maintenance"),
)
def q188_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..maintenance import txn_compact

    tag = "opt_q188_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    sink, fresh = session_scratch_dir(spark, tag)
    if not fresh and len(txn.versions(sink)) != 3:
        shutil.rmtree(sink, ignore_errors=True)
        os.makedirs(sink, exist_ok=True)
        fresh = True
    if fresh:
        ev = Catalog(spark, sf_dir).events.select(
            "event_id", "ts", "value", F.to_date("ts").alias("day")
        )
        for parity in (1, 0):
            txn.commit_append(
                sink,
                txn.stage_append(
                    ev.where(F.col("event_id") % 2 == parity), sink, ("day",)
                ),
            )
        txn_compact(spark, sink, min_files=2)
    pre_rows = txn.read_version(spark, sink, 2).count()
    snapshot = txn.read_committed(spark, sink)
    post_rows = snapshot.count()
    tt_ok = 1 if pre_rows == post_rows else 0
    n_versions = len(txn.versions(sink))
    per_dir: dict[str, int] = {}
    for f in txn.committed_files(sink):
        d = os.path.dirname(f)
        per_dir[d] = per_dir.get(d, 0) + 1
    audit = spark.createDataFrame(
        [(d.split("=", 1)[1], c) for d, c in sorted(per_dir.items())],
        "day string, files_after long",
    )
    return (
        snapshot.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_out(F.sum(dec("value"))).alias("total_value_d"),
        )
        .join(F.broadcast(audit), "day")
        .withColumn("snapshot_versions", F.lit(n_versions).cast("bigint"))
        .withColumn("time_travel_intact", F.lit(tt_ok).cast("bigint"))
        .orderBy("day")
    )
