"""Physical-layout operators — multi-dimensional clustering for
data skipping (Delta OPTIMIZE ZORDER / Iceberg sort-order analog).

At 100 TB the scan cost of a selective query is decided by how many
files min/max pruning can SKIP, and a single-column sort only helps
predicates on that column. Z-ordering interleaves the bits of
several key columns so that any file (= contiguous run of the sort
order) covers a bounded RANGE IN EVERY DIMENSION — min/max pruning
then works for predicates on any of them. q163 makes that claim
measurable and engine-exact: same rows, three layouts, the per-file
min/max spans that pruning would use, summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import register

Z_BITS = 16
Z_FILES = 32
_Z_EPOCH = "2024-01-01"


def _interleave_sql(u: str, d: str) -> str:
    """Bit-interleave expression (Morton/Z code) valid in BOTH Spark
    SQL and DuckDB: u's bit i lands at position 2i, d's at 2i+1."""
    terms = [
        f"((({u} >> {i}) & 1) << {2 * i}) + ((({d} >> {i}) & 1) << {2 * i + 1})"
        for i in range(Z_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


_ORACLE_Q163 = f"""
WITH base AS (
    SELECT event_id,
           user_id & 65535 AS u,
           date_diff('day', DATE '{_Z_EPOCH}', CAST(ts AS DATE)) AS d
    FROM events
),
keyed AS (
    SELECT *, {_interleave_sql('u', 'd')} AS z FROM base
),
layouts AS (
    SELECT 'day_sorted' AS layout, u, d,
           ntile({Z_FILES}) OVER (ORDER BY d, event_id) AS f
    FROM keyed
    UNION ALL
    SELECT 'user_sorted' AS layout, u, d,
           ntile({Z_FILES}) OVER (ORDER BY u, event_id) AS f
    FROM keyed
    UNION ALL
    SELECT 'zorder' AS layout, u, d,
           ntile({Z_FILES}) OVER (ORDER BY z, event_id) AS f
    FROM keyed
),
per_file AS (
    SELECT layout, f,
           MAX(u) - MIN(u) AS uspan,
           MAX(d) - MIN(d) AS dspan
    FROM layouts GROUP BY layout, f
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(uspan) AS BIGINT) AS sum_user_span,
       CAST(SUM(dspan) AS BIGINT) AS sum_day_span
FROM per_file
GROUP BY layout
ORDER BY layout
"""


@register(
    "q163_zorder_locality",
    oracle=_ORACLE_Q163,
    doc="Z-order (Morton) clustering audit: the same rows bucketed "
    "into 32 'files' under three sort orders — day-sorted, "
    "user-sorted, z-ordered (16-bit interleave of user and "
    "epoch-day) — with each file's min/max span per dimension "
    "summed, exactly the statistics min/max file skipping prunes "
    "on. Single-column sorts degenerate on the other dimension; "
    "z-order bounds both — the OPTIMIZE ZORDER decision made "
    "measurable in exact integers.",
    tags=("layout", "zorder", "skipping"),
)
def q163_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ntile file-assignment below is the AUDIT harness, not the
    # write path: a global-order window funnels rows through one
    # task, acceptable for a diagnostic, never for the layout write
    # itself — production z-writes are repartitionByRange(z) + local
    # sortWithinPartitions, which is all-parallel and produces the
    # same per-file span statistics this query measures.
    cat = Catalog(spark, sf_dir)
    base = cat.events.select(
        "event_id",
        F.expr("user_id & 65535").alias("u"),
        F.datediff(F.to_date("ts"), F.lit(_Z_EPOCH).cast("date")).alias("d"),
    )
    keyed = base.withColumn("z", F.expr(_interleave_sql("u", "d")))
    layouts = None
    for name, order in (
        ("day_sorted", ["d", "event_id"]),
        ("user_sorted", ["u", "event_id"]),
        ("zorder", ["z", "event_id"]),
    ):
        w = Window.orderBy(*order)
        part = keyed.select(
            F.lit(name).alias("layout"),
            "u",
            "d",
            F.ntile(Z_FILES).over(w).alias("f"),
        )
        layouts = part if layouts is None else layouts.unionByName(part)
    per_file = layouts.groupBy("layout", "f").agg(
        (F.max("u") - F.min("u")).alias("uspan"),
        (F.max("d") - F.min("d")).alias("dspan"),
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("uspan").alias("sum_user_span"),
            F.sum("dspan").alias("sum_day_span"),
        )
        .orderBy("layout")
    )
