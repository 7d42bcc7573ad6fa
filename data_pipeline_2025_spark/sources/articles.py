"""Crawler-article ingest (FIXTURES.md §6; the reference's warm-up
crawler output — assignments/warm-up/README.md:14-22 field spec,
golden record in examples/class-assignments/).

The interesting part is the messy human-format timestamps
('Published July 23, 2025', 'Updated 10:24 PM EDT, Jul 23 2025'):
normalized with a try_to_timestamp cascade after regexp cleanup —
all JVM-side, NULL on defeat (never a crash, F5/F9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

ARTICLES_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("published_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("content", StringType()),
        StructField("description", StringType()),
        StructField("video_urls", ArrayType(StringType())),
        StructField("image", StringType()),
    ]
)


def parse_human_date(col: Column) -> Column:
    """'Published July 23, 2025' / 'Updated Jul 23, 2025' /
    '2025-07-23' → timestamp, else NULL."""
    cleaned = F.trim(
        F.regexp_replace(col, r"(?i)^(published|updated)\s+", "")
    )
    # strip a time-and-zone suffix like '10:24 PM EDT, ' prefix form
    cleaned = F.trim(F.regexp_replace(cleaned, r"(?i)^\d{1,2}:\d{2}\s*[AP]M\s+\w+,\s*", ""))
    return F.coalesce(
        F.try_to_timestamp(cleaned, F.lit("MMMM d, yyyy")),
        F.try_to_timestamp(cleaned, F.lit("MMM d, yyyy")),
        F.try_to_timestamp(cleaned, F.lit("MMM d yyyy")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(cleaned),
    )


def read_articles(spark: SparkSession, path: str) -> DataFrame:
    """JSON articles → normalized frame: parsed timestamps, author
    'ByNBC…' prefix stripped, media URL count."""
    raw = spark.read.schema(ARTICLES_SCHEMA).json(path)
    return raw.select(
        "title",
        F.regexp_replace(F.col("author"), r"(?i)^by\s*", "").alias("author"),
        parse_human_date(F.col("published_at")).alias("published_ts"),
        parse_human_date(F.col("updated_at")).alias("updated_ts"),
        "content",
        F.coalesce(F.size("video_urls"), F.lit(0)).alias("video_count"),
        F.length(F.coalesce(F.col("content"), F.lit(""))).alias("content_chars"),
    )
