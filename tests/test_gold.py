"""Gold-layer layout tests: partitioned writes + pruning proof.
The reference's only physical tuning is btree/GIN indexes
(tables.sql:44-48); our equivalent is directory partitioning +
row-group stats, and this test pins that a store-scoped read
actually prunes (PartitionFilters in the scan, one directory read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_2025_spark.catalog import Catalog
from data_pipeline_2025_spark.mapping import products
from data_pipeline_2025_spark.plans import plan_of
from data_pipeline_2025_spark.sources.gold import read_gold, write_gold


def test_partitioned_gold_prunes(spark, sf_smoke, tmp_path):
    gold = str(tmp_path / "gold_products")
    df = products(Catalog(spark, sf_smoke)).drop("_price_raw")
    write_gold(df, gold, partition_by=("supermarket_id",))

    back = read_gold(spark, gold)
    assert back.count() == df.count()

    scoped = back.where(F.col("supermarket_id") == 3)
    plan = plan_of(scoped)
    assert "PartitionFilters" in plan
    assert "supermarket_id" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly the partition's rows
    assert scoped.count() == df.where(F.col("supermarket_id") == 3).count()


def test_gold_roundtrip_preserves_decimals(spark, sf_smoke, tmp_path):
    gold = str(tmp_path / "gold_rt")
    df = products(Catalog(spark, sf_smoke)).drop("_price_raw")
    write_gold(df, gold)
    back = read_gold(spark, gold)
    assert dict(back.dtypes)["price"] == "decimal(12,2)"
    orig = sorted(str(r) for r in df.select("product_id", "price").collect())
    rt = sorted(str(r) for r in back.select("product_id", "price").collect())
    assert orig == rt
