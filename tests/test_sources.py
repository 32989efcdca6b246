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


class TestVersionedTableV3:
    """Round-5 extensions to the Iceberg-contract stand-in:
    manifest-entry file stats + pruned reads, hidden partitioning,
    optimistic concurrent-writer conflict detection."""

    def _vt(self, spark, tmp_path, name):
        from google_like_search_engine_spark.sources.versioned import (
            VersionedTable,
        )

        return VersionedTable(spark, str(tmp_path / name))

    def test_file_stats_pruning_selects_matching_files_only(
        self, spark, tmp_path
    ):
        t = self._vt(spark, tmp_path, "vt_stats")
        df = spark.createDataFrame(
            [(i, f"row{i}") for i in range(400)], "id long, v string"
        ).repartitionByRange(4, "id")
        t.write_snapshot(df, stats_cols=["id"])
        plan = t.plan_files([("id", "=", 7)])
        assert plan["total"] == 4 and len(plan["selected"]) == 1
        # range predicate prunes too
        plan2 = t.plan_files([("id", ">=", 350)])
        assert len(plan2["selected"]) == 1
        # pruned read is EXACT vs an unpruned filter
        got = sorted(
            r["id"] for r in t.read(where=[("id", ">=", 350)]).collect()
        )
        assert got == list(range(350, 400))
        assert [r["v"] for r in t.read(where=[("id", "=", 7)]).collect()] == [
            "row7"
        ]

    def test_pruned_read_empty_selection_is_empty(self, spark, tmp_path):
        t = self._vt(spark, tmp_path, "vt_empty")
        t.write_snapshot(
            spark.createDataFrame([(i,) for i in range(10)], "id long"),
            stats_cols=["id"],
        )
        plan = t.plan_files([("id", "=", 999)])
        assert plan["selected"] == []
        assert t.read(where=[("id", "=", 999)]).count() == 0

    def test_string_stats_and_no_stats_columns_never_prune_wrongly(
        self, spark, tmp_path
    ):
        t = self._vt(spark, tmp_path, "vt_str")
        df = spark.createDataFrame(
            [(i, chr(ord("a") + i // 25) * 3) for i in range(100)],
            "id long, tag string",
        ).repartitionByRange(4, "tag")
        t.write_snapshot(df, stats_cols=["tag"])
        assert len(t.plan_files([("tag", "=", "bbb")])["selected"]) <= 2
        # predicate on a column WITHOUT stats: all files kept, result exact
        plan = t.plan_files([("id", "=", 5)])
        assert len(plan["selected"]) == plan["total"]
        assert t.read(where=[("id", "=", 5)]).count() == 1

    def test_hidden_partitioning_mod(self, spark, tmp_path):
        from google_like_search_engine_spark.sources.versioned import PART_COL

        t = self._vt(spark, tmp_path, "vt_hidden")
        df = spark.createDataFrame(
            [(i, f"d{i}") for i in range(64)], "doc_id long, body string"
        )
        t.write_snapshot(df, partition_by=("mod", "doc_id", 4))
        # reader names the SOURCE column; the physical key prunes invisibly
        plan = t.plan_files([("doc_id", "=", 6)])
        assert plan["partition_pruned"]
        assert all(p.startswith(f"{PART_COL}=2/") for p in plan["selected"])
        out = t.read(where=[("doc_id", "=", 6)])
        assert PART_COL not in out.columns
        assert [r["body"] for r in out.collect()] == ["d6"]
        # plain read hides the partition column too, full row count intact
        full = t.read()
        assert PART_COL not in full.columns and full.count() == 64

    def test_hidden_partitioning_truncate_strings(self, spark, tmp_path):
        t = self._vt(spark, tmp_path, "vt_trunc")
        rows = [(f"site{i % 3}/page{i}", i) for i in range(30)]
        t.write_snapshot(
            spark.createDataFrame(rows, "url string, n long"),
            partition_by=("truncate", "url", 5),
        )
        plan = t.plan_files([("url", "=", "site1/page4")])
        assert plan["partition_pruned"] and len(plan["selected"]) < plan["total"]
        assert [
            r["n"]
            for r in t.read(where=[("url", "=", "site1/page4")]).collect()
        ] == [4]

    def test_compact_files_rewrites_small_files(self, spark, tmp_path):
        t = self._vt(spark, tmp_path, "vt_compact")
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(200)], "id long, v string"
        ).repartition(16)
        t.write_snapshot(df, stats_cols=["id"])
        assert t.plan_files([("id", ">=", 0)])["total"] == 16
        res = t.compact_files(target_file_rows=100)
        assert res["files_before"] == 16 and res["files_after"] == 2
        assert res["rows"] == 200 and res["snapshot"] == 1
        assert sorted(r["id"] for r in t.read().collect()) == list(range(200))
        # the small-file original is still time-travelable
        assert t.read(version=0).count() == 200
        # range layout -> disjoint per-file stats -> point lookup opens 1 file
        plan = t.plan_files([("id", "=", 7)])
        assert plan["total"] == 2 and len(plan["selected"]) == 1

    def test_merge_into_inherits_partition_spec_and_stats(
        self, spark, tmp_path
    ):
        t = self._vt(spark, tmp_path, "vt_inherit")
        t.write_snapshot(
            spark.createDataFrame(
                [(i, f"d{i}") for i in range(40)], "doc_id long, body string"
            ),
            partition_by=("mod", "doc_id", 4),
            stats_cols=["doc_id"],
        )
        t.merge_into(
            spark.createDataFrame(
                [(6, "NEW"), (99, "ins")], "doc_id long, body string"
            ),
            "doc_id",
        )
        # the merged snapshot kept the hidden-partition layout + stats
        plan = t.plan_files([("doc_id", "=", 6)])
        assert plan["partition_pruned"]
        assert len(plan["selected"]) < plan["total"]
        assert [
            r["body"] for r in t.read(where=[("doc_id", "=", 6)]).collect()
        ] == ["NEW"]
        assert t.read().count() == 41
        # compaction on a partitioned table keeps the spec working too
        t.compact_files(target_file_rows=1000)
        plan2 = t.plan_files([("doc_id", "=", 6)])
        assert plan2["partition_pruned"]
        # explicit None drops the inherited spec (back to unpartitioned)
        t.write_snapshot(t.read(), partition_by=None, stats_cols=None)
        m = t._read_manifest()
        assert m["meta"][str(m["current"])]["partition_spec"] is None

    def test_concurrent_commit_conflict_detected(self, spark, tmp_path):
        import pytest as _pt

        from google_like_search_engine_spark.sources.versioned import (
            CommitConflictError,
            VersionedTable,
        )

        t = self._vt(spark, tmp_path, "vt_conflict")
        t.write_snapshot(
            spark.createDataFrame([(1, "base")], "id long, v string")
        )
        # writer A captures its base, writer B commits in between
        base, _ = t._load()
        other = VersionedTable(spark, t.path)
        other.write_snapshot(
            spark.createDataFrame([(1, "winner")], "id long, v string")
        )
        with _pt.raises(CommitConflictError, match="re-read"):
            t.write_snapshot(
                spark.createDataFrame([(1, "loser")], "id long, v string"),
                expected_base=base,
            )
        # the winning writer's state survives untouched
        assert [r["v"] for r in t.read().collect()] == ["winner"]

    def test_merge_into_lost_update_is_refused(self, spark, tmp_path):
        import pytest as _pt

        from google_like_search_engine_spark.sources.versioned import (
            CommitConflictError,
            VersionedTable,
        )

        t = self._vt(spark, tmp_path, "vt_lostupd")
        t.write_snapshot(
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        )
        delta = spark.createDataFrame([(2, "b2")], "id long, v string")
        # interleave a competing commit inside merge_into's read->commit
        # window by racing the data write step
        orig = VersionedTable.write_snapshot

        def racing_write(self, df, **kw):
            if kw.get("expected_base") is not None and not getattr(
                self, "_raced", False
            ):
                self._raced = True
                VersionedTable(self.spark, self.path).write_snapshot(
                    self.spark.createDataFrame(
                        [(3, "concurrent")], "id long, v string"
                    )
                )
            return orig(self, df, **kw)

        VersionedTable.write_snapshot = racing_write
        try:
            with _pt.raises(CommitConflictError):
                t.merge_into(delta, key="id")
        finally:
            VersionedTable.write_snapshot = orig
        # the concurrent writer's snapshot is intact and current
        assert {r["v"] for r in t.read().collect()} == {"concurrent"}


def test_versioned_verify_clean_and_tampered(spark, tmp_path):
    """verify() passes a fresh snapshot (files, footer row counts and
    stats all agree with the manifest) and pinpoints tampering: a
    deleted data file and an orphan dropped beside it."""
    import os
    import shutil

    from google_like_search_engine_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"))
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    v = t.write_snapshot(df, stats_cols=["id"])
    report = t.verify()
    assert report["ok"] and report["version"] == v and report["n_files"] > 0

    snap = t.snapshot_dir(v)
    files = sorted(
        f for f in os.listdir(snap) if f.endswith(".parquet")
    )
    shutil.copy(os.path.join(snap, files[0]), os.path.join(snap, "orphan.parquet"))
    os.remove(os.path.join(snap, files[0]))
    report2 = t.verify()
    assert not report2["ok"]
    assert report2["checks"]["missing_files"] == 1
    assert report2["checks"]["orphan_files"] == 1


def test_versioned_diff_metadata_and_row_level(spark, tmp_path):
    """diff(): manifest-only volume delta with zero jobs, and keyed
    row-level added/removed/changed counts across a merge + delete."""
    from google_like_search_engine_spark.sources.versioned import (
        VersionedTable,
    )

    t = VersionedTable(spark, str(tmp_path / "vt"))
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    )
    v0 = t.write_snapshot(base, stats_cols=None)
    # merge: update ids 0-2, insert 10-11  -> snapshot 1
    delta = spark.createDataFrame(
        [(0, "new0"), (1, "new1"), (2, "new2"), (10, "v10"), (11, "v11")],
        "id long, val string",
    )
    t.merge_into(delta, key="id")
    # delete ids >= 8 and < 10  -> snapshot 2
    from pyspark.sql import functions as F

    t.delete_where((F.col("id") >= 8) & (F.col("id") < 10))
    v2 = t.current_version()

    meta_only = t.diff(v0, v2)
    assert meta_only["row_delta"] == 0  # +2 inserts, -2 deletes
    assert "keys_added" not in meta_only  # no jobs ran

    full = t.diff(v0, v2, key="id")
    assert full["keys_added"] == 2      # 10, 11
    assert full["keys_removed"] == 2    # 8, 9
    assert full["keys_changed"] == 3    # 0, 1, 2
    assert t.diff(v0, v0, key="id")["keys_changed"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.diff(99)
