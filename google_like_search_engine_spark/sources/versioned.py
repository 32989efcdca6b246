"""Snapshot-versioned parquet tables: the sandbox stand-in for Iceberg.

SURVEY §1.4 maps the reference's ``pt-`` tables to Iceberg (MERGE INTO
for the Indexer's read-modify-write appends, Indexer.java:132-147;
snapshots for row versioning, kvs/RowVersioning.java:4-12). This
environment ships no Iceberg jars, so this module provides the same
OPERATIONS — atomic commits, snapshot isolation for readers, time
travel, MERGE INTO by key, snapshot expiry — on plain parquet with a
JSON manifest, deliberately shaped like the table-format contract so a
real deployment swaps it for Iceberg by replacing this module only:

- every write lands in a fresh ``snap=N`` directory; the table state
  is a manifest (``_manifest.json``) naming the current snapshot, and
  the commit is the ATOMIC rename of a temp manifest over it (the same
  single-pointer-swap Iceberg does against its catalog);
- readers resolve the manifest once, then read only their snapshot's
  files — a concurrent commit never changes data under a running scan
  (snapshot isolation);
- ``merge_into`` is MERGE INTO t USING delta ON key WHEN MATCHED THEN
  REPLACE WHEN NOT MATCHED THEN INSERT, materialized as a new snapshot
  (copy-on-write, the Iceberg CoW strategy);
- ``expire_snapshots`` deletes all but the newest K snapshots' data.

All filesystem ops go through the Hadoop FS API, so any scheme the
cluster mounts (file://, hdfs://, s3a://) works.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _jpath(spark: SparkSession, p: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)


def _fs(spark: SparkSession, p: str):
    return _jpath(spark, p).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )


class VersionedTable:
    """A snapshot-versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- manifest -----------------------------------------------------------

    def _manifest_path(self) -> str:
        return f"{self.path}/_manifest.json"

    def _read_manifest(self) -> dict:
        fs = _fs(self.spark, self.path)
        mp = _jpath(self.spark, self._manifest_path())
        if not fs.exists(mp):
            return {"current": None, "snapshots": []}
        stream = fs.open(mp)
        try:
            data = bytes(stream.readAllBytes())  # Java 9+ InputStream API
        finally:
            stream.close()
        return json.loads(data.decode("utf-8"))

    def _commit(self, manifest: dict) -> None:
        """Atomic manifest swap: write to a temp name, rename over the
        live pointer (rename is atomic on HDFS/posix; on object stores
        the real table format's catalog swap plays this role)."""
        fs = _fs(self.spark, self.path)
        tmp = _jpath(self.spark, f"{self.path}/_manifest.json.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps(manifest, indent=1), "utf-8"))
        out.close()
        live = _jpath(self.spark, self._manifest_path())
        if fs.exists(live):
            fs.delete(live, False)
        if not fs.rename(tmp, live):
            raise IOError(f"manifest commit failed for {self.path}")

    # -- public API ---------------------------------------------------------

    def history(self) -> list:
        """Committed snapshot ids, oldest first."""
        return list(self._read_manifest()["snapshots"])

    def current_version(self) -> int | None:
        return self._read_manifest()["current"]

    def write_snapshot(self, df: DataFrame) -> int:
        """Full-table overwrite as a NEW snapshot; readers of older
        versions are untouched. Returns the new snapshot id."""
        m = self._read_manifest()
        snap = 0 if m["current"] is None else m["current"] + 1
        df.write.mode("overwrite").parquet(f"{self.path}/snap={snap}")
        m["current"] = snap
        m["snapshots"] = m["snapshots"] + [snap]
        self._commit(m)
        return snap

    def write_snapshot_with(self, writer) -> int:
        """Multi-relation snapshot: ``writer(snap_dir)`` persists
        arbitrary content (e.g. a whole index: postings + doc_stats +
        dictionary + pageranks) under the new snapshot directory; the
        manifest commit happens only after it returns, so a crash
        mid-write leaves the table pointing at the previous snapshot —
        one atomic commit for a multi-relation write."""
        m = self._read_manifest()
        snap = 0 if m["current"] is None else m["current"] + 1
        writer(f"{self.path}/snap={snap}")
        m["current"] = snap
        m["snapshots"] = m["snapshots"] + [snap]
        self._commit(m)
        return snap

    def snapshot_dir(self, version: int | None = None) -> str:
        """Path of a committed snapshot's directory (default current)."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v is None:
            raise ValueError(f"{self.path}: no committed snapshot")
        if v not in m["snapshots"]:
            raise ValueError(
                f"{self.path}: snapshot {v} not in history {m['snapshots']} "
                "(expired or never committed)"
            )
        return f"{self.path}/snap={v}"

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: current). Resolves the
        snapshot ONCE — a commit racing this reader can't change the
        files under its scan."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v is None:
            raise ValueError(f"{self.path}: no committed snapshot")
        if v not in m["snapshots"]:
            raise ValueError(
                f"{self.path}: snapshot {v} not in history {m['snapshots']} "
                "(expired or never committed)"
            )
        return self.spark.read.parquet(f"{self.path}/snap={v}")

    def merge_into(self, delta: DataFrame, key: str) -> int:
        """MERGE INTO this table USING delta ON ``key``: matched rows
        are REPLACED by the delta's, unmatched delta rows INSERT —
        copy-on-write into a new snapshot (the batch form of the
        reference Indexer's read-modify-write append). Returns the new
        snapshot id."""
        cur = self.read()
        keys = delta.select(key).distinct()
        merged = cur.join(keys, key, "left_anti").unionByName(
            delta.select(*cur.columns)
        )
        return self.write_snapshot(merged)

    def delete_where(self, condition) -> int:
        """Copy-on-write DELETE: rows matching ``condition`` (a Column)
        drop from a new snapshot."""
        cur = self.read()
        return self.write_snapshot(cur.where(~condition))

    def expire_snapshots(self, keep_last: int = 2) -> list:
        """Drop all but the newest ``keep_last`` snapshots (data dirs
        deleted, manifest rewritten). Returns the expired ids. Readers
        pinned to an expired version get a clear error on next read."""
        m = self._read_manifest()
        if len(m["snapshots"]) <= keep_last:
            return []
        expired = m["snapshots"][:-keep_last]
        m["snapshots"] = m["snapshots"][-keep_last:]
        self._commit(m)
        fs = _fs(self.spark, self.path)
        for v in expired:
            fs.delete(_jpath(self.spark, f"{self.path}/snap={v}"), True)
        return expired
