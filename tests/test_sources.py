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


class TestVersionedTable:
    """Snapshot-versioned parquet (the Iceberg-contract stand-in):
    atomic commits, time travel, snapshot isolation, MERGE INTO,
    DELETE, snapshot expiry."""

    def test_write_read_time_travel(self, spark, tmp_path):
        from google_like_search_engine_spark.sources.versioned import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "vt"))
        v0 = t.write_snapshot(
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        )
        v1 = t.write_snapshot(
            spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
        )
        assert (v0, v1) == (0, 1) and t.history() == [0, 1]
        assert {r["v"] for r in t.read().collect()} == {"a2", "c"}
        assert {r["v"] for r in t.read(version=0).collect()} == {"a", "b"}

    def test_snapshot_isolation_under_concurrent_commit(self, spark, tmp_path):
        from google_like_search_engine_spark.sources.versioned import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "vt2"))
        t.write_snapshot(spark.createDataFrame([(1, "old")], "id long, v string"))
        pinned = t.read()  # resolves snap=0 files NOW
        t.write_snapshot(spark.createDataFrame([(1, "new")], "id long, v string"))
        # the pre-commit reader still sees its snapshot, post-commit
        # readers see the new one
        assert [r["v"] for r in pinned.collect()] == ["old"]
        assert [r["v"] for r in t.read().collect()] == ["new"]

    def test_merge_into_replace_and_insert(self, spark, tmp_path):
        from google_like_search_engine_spark.sources.versioned import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "vt3"))
        t.write_snapshot(
            spark.createDataFrame(
                [(1, "keep"), (2, "stale")], "id long, v string"
            )
        )
        t.merge_into(
            spark.createDataFrame(
                [(2, "fresh"), (3, "added")], "id long, v string"
            ),
            key="id",
        )
        got = {r["id"]: r["v"] for r in t.read().collect()}
        assert got == {1: "keep", 2: "fresh", 3: "added"}
        # previous version still reconstructable (row versioning)
        old = {r["id"]: r["v"] for r in t.read(version=0).collect()}
        assert old == {1: "keep", 2: "stale"}

    def test_delete_where_and_expire(self, spark, tmp_path):
        import pytest as _pt
        from pyspark.sql import functions as F

        from google_like_search_engine_spark.sources.versioned import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "vt4"))
        t.write_snapshot(
            spark.createDataFrame([(i, f"r{i}") for i in range(6)],
                                  "id long, v string")
        )
        t.delete_where(F.col("id") % 2 == 0)
        assert {r["id"] for r in t.read().collect()} == {1, 3, 5}
        t.write_snapshot(spark.createDataFrame([(9, "z")], "id long, v string"))
        expired = t.expire_snapshots(keep_last=2)
        assert expired == [0] and t.history() == [1, 2]
        with _pt.raises(ValueError, match="expired or never committed"):
            t.read(version=0)
        # expired data dir really gone
        import os

        assert not os.path.exists(str(tmp_path / "vt4" / "snap=0"))
