"""Gold-layer sinks: partitioned parquet writes — the engine's
answer to the reference's Postgres serving tables (SURVEY.md §1.1:
"persisted as Parquet/Delta tables").

Physical layout IS the index here (SURVEY §4: Spark has no btree/GIN
— partition pruning + row-group stats replace them): gold tables
partition by the columns the serving queries filter on
(supermarket_id / category / date), so a store-scoped or
category-scoped query reads only its directories. The pruning is
asserted in tests/test_gold.py via the plan's PartitionFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_gold(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_gold(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
