"""Pricing-summary aggregations — the flagship query.

Re-expresses the reference's aggregation surface (SURVEY.md §2.4
A1-A3: grouped sums, conditional counts, averages with rounding —
salim/app/server/routes/utils.py:40-50) over the driver's lineitem
table as a TPC-H-Q1-shaped pricing summary: one shuffle-light
groupBy over a scan with pushed-down date filter; partial
aggregation (map-side combine) happens automatically, so at 100 TB
this is a single pass over the fact table + a 6-row shuffle.

All money math follows functions/money.py: exact decimals inside,
double only at the end, so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, dec_lit, money_out, to_double
from ..registry import register

CUTOFF = "1998-09-02 00:00:00"

_ORACLE_Q01 = f"""
WITH li AS (
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(l_quantity AS DECIMAL(12,2))      AS qty,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        CAST(l_discount AS DECIMAL(6,4))       AS disc,
        CAST(l_tax AS DECIMAL(6,4))            AS tax
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
)
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(qty) AS DOUBLE)                                          AS sum_qty,
    CAST(SUM(price) AS DOUBLE)                                        AS sum_base_price,
    CAST(ROUND(SUM(price * (CAST('1.0000' AS DECIMAL(6,4)) - disc)), 2) AS DOUBLE) AS sum_disc_price,
    CAST(ROUND(SUM(price * (CAST('1.0000' AS DECIMAL(6,4)) - disc)
                         * (CAST('1.0000' AS DECIMAL(6,4)) + tax)), 2) AS DOUBLE)  AS sum_charge,
    CAST(SUM(qty) AS DOUBLE) / COUNT(*)                               AS avg_qty,
    CAST(SUM(price) AS DOUBLE) / COUNT(*)                             AS avg_price,
    CAST(SUM(disc) AS DOUBLE) / COUNT(*)                              AS avg_disc,
    COUNT(*)                                                          AS count_order
FROM li
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q52_sql_api_pricing",
    oracle=_ORACLE_Q01,
    doc="The SAME ANSI SQL text as q01's oracle executed via "
    "spark.sql() over registered views — SQL-surface parity: one "
    "query string, two engines, identical bytes out.",
    tags=("sql", "agg"),
)
def q52_sql_api_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_ORACLE_Q01)


@register(
    "q01_pricing_summary",
    oracle=_ORACLE_Q01,
    doc="Flagship grouped pricing summary (SURVEY §2.4 A1-A3; TPC-H Q1 shape).",
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    one = dec_lit("1.0000")
    qty = dec("l_quantity")
    price = dec("l_extendedprice")
    disc = dec("l_discount", 6, 4)
    tax = dec("l_tax", 6, 4)
    cnt = F.count(F.lit(1))
    return (
        cat.lineitem.where(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            to_double(F.sum(qty)).alias("sum_qty"),
            to_double(F.sum(price)).alias("sum_base_price"),
            money_out(F.sum(price * (one - disc))).alias("sum_disc_price"),
            money_out(F.sum(price * (one - disc) * (one + tax))).alias("sum_charge"),
            (to_double(F.sum(qty)) / cnt).alias("avg_qty"),
            (to_double(F.sum(price)) / cnt).alias("avg_price"),
            (to_double(F.sum(disc)) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
