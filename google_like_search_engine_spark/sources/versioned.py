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
  is a manifest naming the current snapshot, written to a VERSIONED
  name (``_manifest-N.json``, Iceberg's own metadata layout: vN
  metadata files, newest wins) — readers resolve the highest N, so the
  commit point is the appearance of the new file and there is never a
  window with no live manifest (a delete-then-rename swap of a single
  name would have one);
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

    def _manifest_seq(self) -> tuple:
        """(highest manifest sequence number, its path) or (-1, None).

        Also recognizes the legacy single-name ``_manifest.json`` (from
        tables written before manifests were versioned) as sequence -1
        with a real path, so old tables stay readable.
        """
        fs = _fs(self.spark, self.path)
        root = _jpath(self.spark, self.path)
        best, best_path = -1, None
        if fs.exists(root):
            for st in fs.listStatus(root):
                name = st.getPath().getName()
                if name.startswith("_manifest-") and name.endswith(".json"):
                    try:
                        seq = int(name[len("_manifest-"):-len(".json")])
                    except ValueError:
                        continue
                    if seq > best:
                        best, best_path = seq, f"{self.path}/{name}"
        if best_path is None:
            legacy = _jpath(self.spark, f"{self.path}/_manifest.json")
            if fs.exists(legacy):
                return -1, f"{self.path}/_manifest.json"
        return best, best_path

    def _read_manifest(self) -> dict:
        _, mp = self._manifest_seq()
        if mp is None:
            return {"current": None, "snapshots": []}
        fs = _fs(self.spark, self.path)
        stream = fs.open(_jpath(self.spark, mp))
        try:
            data = bytes(stream.readAllBytes())  # Java 9+ InputStream API
        finally:
            stream.close()
        return json.loads(data.decode("utf-8"))

    def _commit(self, manifest: dict) -> None:
        """Crash-safe manifest commit: write ``_manifest-{seq+1}.json``
        (readers resolve the highest sequence, so the new state becomes
        visible exactly when the file appears — no window without a live
        manifest), then best-effort delete older manifests. A crash
        between the write and the cleanup leaves extra files that the
        newest-wins read resolves correctly."""
        fs = _fs(self.spark, self.path)
        seq, _ = self._manifest_seq()
        new_path = f"{self.path}/_manifest-{seq + 1}.json"
        tmp = _jpath(self.spark, new_path + ".tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps(manifest, indent=1), "utf-8"))
        out.close()
        # rename is atomic on HDFS/posix: never expose a half-written file
        if not fs.rename(tmp, _jpath(self.spark, new_path)):
            raise IOError(f"manifest commit failed for {self.path}")
        # cleanup keeps the newest TWO manifests: a reader that resolved
        # seq just before this commit can still open it (deleting it
        # immediately would reopen the no-manifest race the versioned
        # names exist to close). Writers are single-process by contract
        # — concurrent commits need a catalog/lock service, exactly as
        # real table formats require for their metadata pointer swap.
        for st in fs.listStatus(_jpath(self.spark, self.path)):
            name = st.getPath().getName()
            old = (name == "_manifest.json" and seq >= 0) or (
                name.startswith("_manifest-")
                and name.endswith(".json")
                and name not in (
                    f"_manifest-{seq}.json",
                    f"_manifest-{seq + 1}.json",
                )
            )
            if old:
                fs.delete(st.getPath(), False)

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
