"""Normative schemas for the supermarket data model and ingest
envelope (SURVEY.md §1.3, FIXTURES.md §1-§5).

Bronze keeps everything as strings (the reference's queue messages
are stringly-typed JSON — s3-to-rabbitmq/app.py:73-84); silver casts
(rabbitmq-to-postgres/app.py:210-227). Decimal columns stay Decimal
(not double) per FIXTURES.md so hashes can match an oracle.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SUPERMARKETS_SCHEMA = StructType(
    [
        StructField("supermarket_id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("branch_name", StringType()),
        StructField("city", StringType()),
        StructField("address", StringType()),
        StructField("website", StringType()),
        StructField("created_at", TimestampType(), False),
    ]
)

PRODUCTS_SCHEMA = StructType(
    [
        StructField("product_id", LongType(), False),
        StructField("supermarket_id", IntegerType(), False),
        StructField("barcode", StringType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("brand", StringType()),
        StructField("category", StringType()),
        StructField("size_value", DecimalType(12, 3)),
        StructField("size_unit", StringType()),
        StructField("price", DecimalType(12, 2), False),
        StructField("currency", StringType(), False),
        StructField("list_price", DecimalType(12, 2)),
        StructField("promo_price", DecimalType(12, 2)),
        StructField("promo_text", StringType()),
        StructField("loyalty_only", BooleanType(), False),
        StructField("in_stock", BooleanType()),
        StructField("collected_at", TimestampType(), False),
        StructField("source", StringType()),
        StructField("raw_hash", StringType()),
    ]
)

# Raw PriceFull item — field list per rabbitmq-to-postgres/
# app.py:210-227; everything arrives stringly typed.
RAW_ITEM_SCHEMA = StructType(
    [
        StructField("ItemCode", StringType()),
        StructField("ItemName", StringType()),
        StructField("ManufacturerName", StringType()),
        StructField("ItemPrice", StringType()),
        StructField("UnitOfMeasurePrice", StringType()),
        StructField("Quantity", StringType()),
        StructField("UnitQty", StringType()),
        StructField("UnitOfMeasure", StringType()),
        StructField("PriceUpdateDate", StringType()),
        StructField("ItemStatus", StringType()),
        StructField("AllowDiscount", StringType()),
        StructField("bIsWeighted", StringType()),
        StructField("ItemId", StringType()),
    ]
)


def _price_file_schema(items_as_array: bool) -> StructType:
    item_field = (
        ArrayType(RAW_ITEM_SCHEMA) if items_as_array else RAW_ITEM_SCHEMA
    )
    return StructType(
        [
            StructField(
                "Root",
                StructType(
                    [
                        StructField("ChainId", StringType()),
                        StructField("StoreId", StringType()),
                        StructField(
                            "Items",
                            StructType([StructField("Item", item_field)]),
                        ),
                    ]
                ),
            )
        ]
    )


# A PriceFull file whose Items.Item is a list — the normal case.
PRICE_FILE_SCHEMA = _price_file_schema(items_as_array=True)
# …and the single-item quirk: Item arrives as one dict, not a list
# (s3-to-rabbitmq/app.py:81-82 coerces; we parse both ways).
PRICE_FILE_SINGLE_SCHEMA = _price_file_schema(items_as_array=False)

# Message envelope (s3-to-rabbitmq/app.py:88-94) — the bronze row.
ENVELOPE_FIELDS = ("source_file", "ingested_at", "chain_id", "store_id")

# StoresFull XML (FIXTURES.md §4): 4-level nesting with repeated
# elements. Explicit schema so a single <SubChain>/<Store> still
# lands as a 1-element array (the XML flavor of the single-item
# quirk).
_STORE = StructType(
    [
        StructField("StoreID", StringType()),
        StructField("BikoretNo", StringType()),
        StructField("StoreType", StringType()),
        StructField("StoreName", StringType()),
        StructField("Address", StringType()),
        StructField("City", StringType()),
        StructField("ZIPCode", StringType()),
    ]
)

STORES_XML_SCHEMA = StructType(
    [
        StructField("ChainID", StringType()),
        StructField("ChainName", StringType()),
        StructField("LastUpdateDate", StringType()),
        StructField("LastUpdateTime", StringType()),
        StructField(
            "SubChains",
            StructType(
                [
                    StructField(
                        "SubChain",
                        ArrayType(
                            StructType(
                                [
                                    StructField("SubChainID", StringType()),
                                    StructField("SubChainName", StringType()),
                                    StructField(
                                        "Stores",
                                        StructType(
                                            [StructField("Store", ArrayType(_STORE))]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)
