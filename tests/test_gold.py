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


def test_trigram_index_incremental_update(spark, tmp_path):
    """Incremental index maintenance: new names append postings into
    ONLY their own tg1 partitions; already-indexed names are no-ops
    (manifest anti-join); search sees the new names immediately."""
    import os

    from data_pipeline_2025_spark.operators.search import (
        build_trigram_index_at,
        search_trigram_index,
        update_trigram_index,
    )

    path = str(tmp_path / "tg_index")
    base = spark.createDataFrame(
        [("widget bolt",), ("gadget nut",)], ["name"]
    )
    build_trigram_index_at(spark, base, path)

    # a tg1 partition no new name will touch ('w' from 'widget')
    w_dir = next(
        os.path.join(path, d) for d in os.listdir(path) if d == "tg1=w"
    )
    before = sorted(os.listdir(w_dir))

    # duplicate name → 0 new; fresh name → appended once
    assert update_trigram_index(spark, path, base.limit(1)) == 0
    fresh = spark.createDataFrame([("sprocket cam",), ("widget bolt",)], ["name"])
    assert update_trigram_index(spark, path, fresh) == 1

    # untouched 'w' partition files unchanged ('sprocket cam' has no
    # trigram starting with w)
    assert sorted(os.listdir(w_dir)) == before

    # no duplicate postings for the re-sent name
    idx = read_gold(spark, path)
    assert (
        idx.where(F.col("name") == "widget bolt").count()
        == idx.where(F.col("name") == "widget bolt").select("tg").distinct().count()
    )

    # the fresh name is immediately searchable (misspelled probe)
    hits = search_trigram_index(spark, path, "sproket cam").collect()
    assert [r["name"] for r in hits][:1] == ["sprocket cam"]

    # idempotent re-send after the append
    assert update_trigram_index(spark, path, fresh) == 0
