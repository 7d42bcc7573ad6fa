"""Streaming ingest: the reference's three containers (S3 poller →
RabbitMQ → Postgres consumer, SURVEY.md §3.2) collapsed into ONE
checkpointed Structured Streaming job:

    file source (exactly-once file tracking replaces the in-memory
    processed_files set, T1)
      → per-item explode + envelope (T2)
      → silver casts (S9)
      → foreachBatch idempotent append (checkpoint + content-key
        anti-join = effectively-once, replacing ack/requeue +
        UNIQUE-constraint, T3/T6)

Sink is parquet here (this container has no Delta); with Delta the
foreachBatch body becomes a single MERGE. The replay test in
tests/test_ingest.py proves duplicate file delivery does not
duplicate rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.bronze import explode_items, normalize_price_payload
from ..sources.silver import dedupe_price_items, normalize_items

DEDUP_KEY = ["chain_id", "store_id", "item_code", "price_update_date", "raw_hash"]


def start_price_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the end-to-end ingest stream (AvailableNow so tests and
    backfills drain the source then stop; swap the trigger for
    processingTime='30 seconds' to mirror the reference's poll
    cadence, T4)."""
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .schema("value STRING")
        .load(source_dir)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("raw_payload"),
        )
    )
    silver = normalize_items(explode_items(normalize_price_payload(raw)))

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = dedupe_price_items(batch)
        spark_ = batch.sparkSession
        if os.path.exists(sink_dir):
            existing = spark_.read.parquet(sink_dir).select(*DEDUP_KEY)
            # eqNullSafe: a NULL key column (e.g. malformed
            # PriceUpdateDate) must still match its replayed twin, or
            # every replay re-appends those rows.
            cond = None
            for k in DEDUP_KEY:
                c = batch[k].eqNullSafe(existing[k])
                cond = c if cond is None else cond & c
            batch = batch.join(existing, cond, "left_anti")
        batch.write.mode("append").parquet(sink_dir)

    return (
        silver.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
