from __future__ import annotations

import gzip
import json


def test_file_manifest_and_diff(spark, tmp_path):
    from data_pipeline_2025_spark.sources.manifest import file_manifest, new_files

    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.json").write_text('{"x": 1}')
    (d / "b.xml").write_text("<Root/>")
    m = file_manifest(spark, str(d))
    rows = {r["file_name"]: r for r in m.collect()}
    assert set(rows) == {"a.json", "b.xml"}
    assert rows["a.json"]["extension"] == "json"
    assert rows["a.json"]["bytes"] == 8
    assert "content" not in m.columns  # metadata-only scan

    processed = m.where(m.file_name == "a.json")
    fresh = new_files(m, processed)
    assert [r["file_name"] for r in fresh.collect()] == ["b.xml"]

    with_payload = file_manifest(spark, str(d), glob="*.json", with_content=True)
    (row,) = with_payload.collect()
    assert bytes(row["content"]) == b'{"x": 1}'


def test_bronze_reads_gzip_transparently(spark, tmp_path):
    """S3: the reference gunzips by hand; Spark's text source
    decompresses .gz on read."""
    from data_pipeline_2025_spark.sources.bronze import (
        explode_items,
        read_price_files,
    )

    d = tmp_path / "gz"
    d.mkdir()
    payload = {
        "Root": {
            "ChainId": "7290700100008",
            "StoreId": "001",
            "Items": {"Item": [{"ItemCode": "9", "ItemPrice": "5.00"}]},
        }
    }
    with gzip.open(d / "f.json.gz", "wt", encoding="utf-8") as f:
        f.write(json.dumps(payload))
    bronze = explode_items(read_price_files(spark, str(d)), "2025-08-21 07:00:00")
    rows = bronze.collect()
    assert len(rows) == 1
    assert rows[0]["item"]["ItemCode"] == "9"
