"""Scalar-function surface — the reference's expression vocabulary
(SURVEY.md §2.8 F1-F11): string ops, regex extraction/cleanup, md5,
formatting, null-guarded casts, price parsing. All JVM-side builtins
(no Python UDFs) so the whole projection stays inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.money import dec, to_double
from ..registry import register

_ORACLE_Q25 = """
SELECT p_partkey,
       concat_ws('|', p_name, p_brand)                    AS label,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
       md5(p_name)                                        AS name_hash,
       upper(p_type)                                      AS type_u,
       CAST(length(p_name) AS INTEGER)                    AS name_len,
       split_part(p_name, ' ', 1)                         AS first_word,
       CAST(CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 100, 0) AS BIGINT) AS BIGINT) AS price_cents,
       CAST(regexp_replace(CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR),
                           '[^0-9.]', '', 'g') AS DOUBLE) AS parsed_price,
       CASE WHEN p_size > 0 THEN CAST(p_size AS VARCHAR) || ' unit' ELSE NULL END AS size_info
FROM part
WHERE p_partkey < 100
ORDER BY p_partkey
"""


@register(
    "q25_scalar_showcase",
    oracle=_ORACLE_Q25,
    doc="F1-F11 scalar vocabulary: concat_ws, regexp_extract/replace "
    "price parse, md5, case/format, null-guarded size_info "
    "(mcp.py:273's f-string).",
    tags=("scalar",),
)
def q25_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    price2 = dec("p_retailprice")
    return (
        cat.part.where(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.concat_ws("|", "p_name", "p_brand").alias("label"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("bigint").alias(
                "brand_num"
            ),
            F.md5("p_name").alias("name_hash"),
            F.upper("p_type").alias("type_u"),
            F.length("p_name").alias("name_len"),
            F.substring_index("p_name", " ", 1).alias("first_word"),
            F.round(price2 * 100, 0).cast("bigint").alias("price_cents"),
            F.regexp_replace(price2.cast("string"), "[^0-9.]", "")
            .cast("double")
            .alias("parsed_price"),
            F.when(
                F.col("p_size") > 0,
                F.concat(F.col("p_size").cast("string"), F.lit(" unit")),
            ).alias("size_info"),
        )
        .orderBy("p_partkey")
    )


_ORACLE_Q26 = """
SELECT c_mktsegment,
       COUNT(*) AS customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_balance_d,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_accounts,
       md5(c_mktsegment) AS segment_hash
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "q26_segment_balances",
    oracle=_ORACLE_Q26,
    doc="Null-guarded coercion + conditional counts + md5 over a "
    "dimension (F7/F9 + A2).",
    tags=("scalar", "agg"),
)
def q26_segment_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bal = dec("c_acctbal")
    return (
        cat.customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            to_double(F.round(F.sum(bal), 2)).alias("total_balance_d"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias(
                "negative_accounts"
            ),
        )
        .withColumn("segment_hash", F.md5("c_mktsegment"))
        .select(
            "c_mktsegment",
            "customers",
            "total_balance_d",
            "negative_accounts",
            "segment_hash",
        )
        .orderBy("c_mktsegment")
    )
