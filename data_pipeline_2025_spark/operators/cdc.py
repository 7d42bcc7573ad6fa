"""CDC apply — MERGE INTO semantics as a checked batch operator.

q177 (streaming/timetravel.py) extracts a changelog between table
snapshots; this module is the complement: APPLYING a changelog of
upserts/deletes/inserts to a base snapshot, i.e. the row-level
semantics of `MERGE INTO base USING changelog ON key WHEN MATCHED
AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
THEN INSERT`. The reference applies changes row-at-a-time through
Postgres upserts (rabbitmq-to-postgres/app.py:158-176 INSERT ..
ON CONFLICT); a lakehouse engine applies a whole CDC batch in one
set-oriented pass.

Scale shape: a CDC batch is small relative to the base table, so the
update/delete log is BROADCAST and the base streams through one
map-side left join — zero shuffle of the 100 TB side; inserts are a
unionByName append. (When the changelog is itself huge — a backfill —
the same plan holds with the broadcast dropped: one shuffle on the
unique primary key, no skew.) Delete precedence over update for a
key carrying both ops is made explicit and oracle-checked.

The changelog here is DERIVED deterministically from the base table
(delete every 97th key, bump every key ending in 3, insert a shifted
copy of keys ending in 07) so DuckDB can state the identical merge in
pure set algebra — the full merged table is row-level hash-compared,
not just summarized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, money_out
from ..registry import register

_DELETE_MOD = 97  # key % 97 == 0        -> WHEN MATCHED DELETE
_UPDATE_MOD = 10  # key % 10 == 3        -> WHEN MATCHED UPDATE (+1.00)
_INSERT_MOD = 100  # key % 100 == 7      -> WHEN NOT MATCHED INSERT
_INSERT_SHIFT = 10_000_000_000  # new surrogate keys, disjoint from base

_ORACLE_Q179 = f"""
WITH chg AS (
    SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % {_DELETE_MOD} = 0 THEN 'D' ELSE 'U' END AS op,
           CAST(o_totalprice AS DECIMAL(12,2)) + 1.00 AS new_total
    FROM orders
    WHERE o_orderkey % {_DELETE_MOD} = 0 OR o_orderkey % {_UPDATE_MOD} = 3
),
ins AS (
    SELECT o_orderkey + {_INSERT_SHIFT} AS k,
           CAST(o_totalprice AS DECIMAL(12,2)) AS total
    FROM orders WHERE o_orderkey % {_INSERT_MOD} = 7
),
merged AS (
    SELECT o.o_orderkey AS k,
           CASE WHEN c.op = 'U' THEN 'update' ELSE 'keep' END AS action,
           CASE WHEN c.op = 'U' THEN c.new_total
                ELSE CAST(o.o_totalprice AS DECIMAL(12,2)) END AS total
    FROM orders o LEFT JOIN chg c ON c.k = o.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    UNION ALL
    SELECT k, 'insert' AS action, total FROM ins
)
SELECT k AS o_orderkey, action,
       CAST(ROUND(total, 2) AS DOUBLE) AS total_d
FROM merged
ORDER BY o_orderkey
"""


@register(
    "q179_merge_upsert",
    oracle=_ORACLE_Q179,
    doc="MERGE INTO semantics (CDC apply): a derived changelog of "
    "deletes / updates / inserts is applied to the orders snapshot "
    "in one set-oriented pass — broadcast update/delete log, "
    "map-side left join over the base (no shuffle of the big side), "
    "unionByName inserts; delete precedence explicit. The FULL "
    "merged table is row-level hash-checked against the oracle's "
    "set algebra.",
    tags=("cdc", "merge", "join", "scale"),
)
def q179_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", dec("o_totalprice").alias("total")
    )
    k = F.col("o_orderkey")
    chg = (
        base.where((k % _DELETE_MOD == 0) | (k % _UPDATE_MOD == 3))
        .select(
            k.alias("k"),
            F.when(k % _DELETE_MOD == 0, "D").otherwise("U").alias("op"),
            (F.col("total") + F.lit("1.00").cast("decimal(3,2)")).alias("new_total"),
        )
    )
    ins = base.where(k % _INSERT_MOD == 7).select(
        (k + _INSERT_SHIFT).alias("o_orderkey"),
        F.lit("insert").alias("action"),
        F.col("total"),
    )
    survivors = (
        base.join(F.broadcast(chg), k == F.col("k"), "left")
        # delete precedence: a key matching both mods carries op='D'
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("op") == "U", "update").otherwise("keep").alias("action"),
            F.when(F.col("op") == "U", F.col("new_total"))
            .otherwise(F.col("total"))
            .alias("total"),
        )
    )
    return (
        survivors.unionByName(ins)
        .select("o_orderkey", "action", money_out(F.col("total")).alias("total_d"))
        .orderBy("o_orderkey")
    )
