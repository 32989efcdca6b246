"""Source/sink format layer: schema-pinned round-trips + quarantine."""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.corpus import generate_pages
from google_like_search_engine_spark.sources import read_table, write_table, PAGES_READ_SCHEMA


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    pages = generate_pages(spark, 60, partitions=2)
    df = pages.select("url", "text", "lang")  # csv/json can't carry binary
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt=fmt)
    schema = "url string, text string, lang string" if fmt in ("csv", "json") else None
    back = read_table(spark, path, fmt=fmt, schema=schema)
    if "_corrupt_record" in back.columns:
        # Spark disallows querying ONLY the corrupt column off a raw
        # csv/json scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first.
        back = back.cache()
        assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
        back = back.drop("_corrupt_record")
    a = {(r["url"], r["text"], r["lang"]) for r in df.collect()}
    b = {(r["url"], r["text"], r["lang"]) for r in back.collect()}
    assert a == b, fmt


def test_binary_roundtrip_parquet(spark, tmp_path):
    pages = generate_pages(spark, 20, partitions=1)
    path = str(tmp_path / "pages_pq")
    write_table(pages, path)
    back = read_table(spark, path, schema=PAGES_READ_SCHEMA)
    orig = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    got = {r["url"]: bytes(r["html"]) for r in back.collect()}
    assert got == orig


def test_json_quarantines_corrupt_rows(spark, tmp_path):
    path = tmp_path / "bad_json"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"url": "http://a", "text": "ok", "lang": "en"}\n'
        "this is not json at all\n"
        '{"url": "http://b", "text": "ok2", "lang": "en"}\n'
    )
    back = read_table(
        spark, str(path), fmt="json", schema="url string, text string, lang string"
    ).cache()
    good = back.where(F.col("_corrupt_record").isNull())
    bad = back.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path), fmt="csv")
