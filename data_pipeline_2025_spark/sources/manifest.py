"""File-manifest source — the engine-side half of the reference's
crawler (SURVEY.md §2.1 S1/S2: driver-side page scraping produces a
list of files to fetch; the ENGINE's job starts at "here is a pile
of files"). Spark's `binaryFile` source turns any landed directory
into a manifest DataFrame (path, modificationTime, length, content)
— which is also the real ingest path for multimodal payloads
(operators/multimodal.py consumes exactly this shape at production
time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_manifest(
    spark: SparkSession, path: str, glob: str | None = None, with_content: bool = False
) -> DataFrame:
    """Manifest of landed files. ``with_content=False`` drops the
    payload column so the scan reads only metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    cols = [
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("modificationTime").alias("modified_at"),
        F.col("length").alias("bytes"),
        F.regexp_extract("path", r"\.([a-z0-9]+)$", 1).alias("extension"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)


def new_files(manifest: DataFrame, processed: DataFrame) -> DataFrame:
    """The reference's processed-files set diff (S6,
    s3-to-rabbitmq/app.py:48-63) as a left-anti join — batch flavor;
    the streaming flavor is the checkpointed file source."""
    return manifest.join(processed.select("path"), "path", "left_anti")
