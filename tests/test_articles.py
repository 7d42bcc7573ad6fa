from __future__ import annotations

import json


def test_article_ingest_messy_dates(spark, tmp_path):
    from data_pipeline_2025_spark.sources.articles import read_articles

    rows = [
        {
            "title": "A",
            "author": "ByNBC News Staff",
            "published_at": "Published July 23, 2025",
            "updated_at": "Updated 10:24 PM EDT, Jul 23 2025",
            "content": "hello world",
            "video_urls": ["https://v/1", "https://v/2"],
        },
        {
            "title": "B",
            "author": "Jane Doe",
            "published_at": "2025-07-24",
            "updated_at": "complete garbage",
            "content": None,
            "video_urls": None,
        },
    ]
    p = tmp_path / "articles.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    got = {r["title"]: r for r in read_articles(spark, str(p)).collect()}

    a = got["A"]
    assert a["author"] == "NBC News Staff"
    assert a["published_ts"].date().isoformat() == "2025-07-23"
    assert a["updated_ts"].date().isoformat() == "2025-07-23"
    assert a["video_count"] == 2
    assert a["content_chars"] == 11

    b = got["B"]
    assert b["published_ts"].date().isoformat() == "2025-07-24"
    assert b["updated_ts"] is None  # garbage → NULL, never a crash
    assert b["video_count"] == 0
    assert b["content_chars"] == 0
