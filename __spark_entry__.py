"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of data_pipeline_2025_spark.registry — operators
register themselves with both a Spark plan and (where SQL can
express the semantics) a DuckDB oracle string. See SURVEY.md §2 for
the inventory each query maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_2025_spark import registry  # noqa: E402

FLAGSHIP = "q01_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = registry.get(FLAGSHIP)
    return spec.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in registry.load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry.load_all().items()
        if spec.oracle is not None
    }
