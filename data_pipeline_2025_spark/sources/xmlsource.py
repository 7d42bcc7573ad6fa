"""StoresFull XML ingest — the reference's recursive XML→dict
converter (SURVEY.md §2.1 S4, utils/__init__.py:45-93) re-expressed
with Spark's native XML data source.

The reference's converter maps attributes to '@key' and text to
'#text'; the StoresFull documents carry no attributes, so the
mapping reduces to element nesting — we keep the option spellings
anyway for parity. Explicit schema (schemas.STORES_XML_SCHEMA)
guarantees a single <SubChain>/<Store> still lands as a 1-element
array (the XML flavor of the single-item coercion,
s3-to-rabbitmq/app.py:81-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import STORES_XML_SCHEMA


def read_stores_xml(spark: SparkSession, path: str) -> DataFrame:
    """One row per StoresFull document (rowTag=Root)."""
    return (
        spark.read.format("xml")
        .option("rowTag", "Root")
        .option("attributePrefix", "@")
        .option("valueTag", "#text")
        .schema(STORES_XML_SCHEMA)
        .load(path)
    )


def flatten_stores(doc: DataFrame) -> DataFrame:
    """Explode the 4-level nesting into one row per store — the
    shape the example pipeline lands in its `stores` table
    (rabbitmq-to-postgres/app.py:58-70)."""
    sub = doc.select(
        F.col("ChainID").alias("chain_id"),
        F.col("ChainName").alias("chain_name"),
        F.col("LastUpdateDate").alias("last_update_date"),
        F.explode("SubChains.SubChain").alias("sc"),
    )
    st = sub.select(
        "chain_id",
        "chain_name",
        "last_update_date",
        F.col("sc.SubChainID").alias("sub_chain_id"),
        F.col("sc.SubChainName").alias("sub_chain_name"),
        F.explode("sc.Stores.Store").alias("st"),
    )
    return st.select(
        "chain_id",
        "chain_name",
        "last_update_date",
        "sub_chain_id",
        "sub_chain_name",
        F.col("st.StoreID").alias("store_id"),
        F.col("st.BikoretNo").alias("bikoret_no"),
        F.col("st.StoreType").cast("int").alias("store_type"),
        F.col("st.StoreName").alias("store_name"),
        F.col("st.Address").alias("address"),
        # empty elements (<City></City>) arrive as NULL or '' depending
        # on the parser; normalize '' → NULL like the silver coercion.
        F.nullif(F.col("st.City"), F.lit("")).alias("city"),
        F.nullif(F.col("st.ZIPCode"), F.lit("")).alias("zip_code"),
    )
