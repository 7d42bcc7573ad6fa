"""Bronze ingest: price files → one enveloped row per item.

Replaces the reference's S3-poll → per-item RabbitMQ fan-out
(SURVEY.md §2.1 S6/S7, §3.2): the file source (batch here; its
streaming twin in streaming/ingest.py) detects new files, `explode`
fans out items, and the envelope carries provenance
{source_file, ingested_at, chain_id, store_id} exactly like
s3-to-rabbitmq/app.py:88-94.

Quirks preserved:
- a file whose Items.Item is a single dict (not a list) parses via
  the fallback schema and is coerced to a 1-element array
  (app.py:81-82);
- unparseable files keep their raw payload with NULL items (the
  bronze layer never drops data — PERMISSIVE semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PRICE_FILE_SCHEMA, PRICE_FILE_SINGLE_SCHEMA


def read_price_files(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file read → parsed Root with Items.Item normalized to an
    array. One row per FILE (explode happens in explode_items)."""
    raw = (
        spark.read.option("wholetext", "true")
        .text(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("raw_payload"),
        )
    )
    return normalize_price_payload(raw)


def normalize_price_payload(raw: DataFrame) -> DataFrame:
    """Parse raw_payload twice (list-shaped and single-item-shaped
    Items.Item) and coalesce — the Spark expression of the
    reference's isinstance-list coercion."""
    as_list = F.from_json("raw_payload", PRICE_FILE_SCHEMA)
    as_single = F.from_json("raw_payload", PRICE_FILE_SINGLE_SCHEMA)
    items = F.coalesce(
        F.col("parsed_list.Root.Items.Item"),
        F.when(
            F.col("parsed_single.Root.Items.Item").isNotNull(),
            F.array(F.col("parsed_single.Root.Items.Item")),
        ),
    )
    return (
        raw.withColumn("parsed_list", as_list)
        .withColumn("parsed_single", as_single)
        .select(
            "source_file",
            "raw_payload",
            F.coalesce(
                F.col("parsed_list.Root.ChainId"),
                F.col("parsed_single.Root.ChainId"),
            ).alias("chain_id"),
            F.coalesce(
                F.col("parsed_list.Root.StoreId"),
                F.col("parsed_single.Root.StoreId"),
            ).alias("store_id"),
            items.alias("items"),
        )
    )


def explode_items(files: DataFrame, ingested_at=None) -> DataFrame:
    """Per-item fan-out with envelope (S7/T2). ``ingested_at`` is an
    optional fixed timestamp literal for deterministic tests;
    production uses processing time."""
    ts = F.lit(ingested_at).cast("timestamp") if ingested_at else F.current_timestamp()
    return files.where(F.col("items").isNotNull()).select(
        "source_file",
        ts.alias("ingested_at"),
        "chain_id",
        "store_id",
        F.explode("items").alias("item"),
    )
