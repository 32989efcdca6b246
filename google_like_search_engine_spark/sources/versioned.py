"""Snapshot-versioned parquet tables: the sandbox stand-in for Iceberg.

SURVEY §1.4 maps the reference's ``pt-`` tables to Iceberg (MERGE INTO
for the Indexer's read-modify-write appends, Indexer.java:132-147;
snapshots for row versioning, kvs/RowVersioning.java:4-12). This
environment ships no Iceberg jars, so this module provides the same
OPERATIONS — atomic commits, snapshot isolation for readers, time
travel, MERGE INTO by key, snapshot expiry, file-level min/max stats
pruning, hidden partitioning, optimistic concurrency — on plain
parquet with a JSON manifest, deliberately shaped like the
table-format contract so a real deployment swaps it for Iceberg by
replacing this module only:

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
- ``expire_snapshots`` deletes all but the newest K snapshots' data;
- the manifest records the snapshot's DATA FILES with per-file row
  counts and min/max column stats (Iceberg's manifest-entry stats,
  harvested from the parquet footers with zero Spark jobs), and
  ``read(where=...)`` plans the scan against those stats so a
  selective predicate touches only the files that can match —
  manifest-level file pruning, the thing that makes a 10^12-row table
  queryable without listing or opening 10^7 files;
- ``write_snapshot(partition_by=...)`` implements HIDDEN partitioning:
  the manifest records the transform (``("mod", col, n)`` /
  ``("truncate", col, w)`` — the deterministic sandbox analogs of
  Iceberg's bucket/truncate), the writer derives and writes the
  partition column, and ``read(where=[(col, "=", v)])`` re-derives the
  partition value from the PREDICATE so readers never name — or even
  see — the physical partition column;
- mutating operations carry an optimistic-concurrency base version:
  the commit re-checks that no other writer advanced the manifest
  since the operation read its base state and raises
  ``CommitConflictError`` for the caller to re-read and retry
  (Iceberg's optimistic retry loop). The final check-then-publish
  step itself is made atomic in production by the catalog's
  compare-and-swap of the metadata pointer — exactly the piece
  Iceberg also delegates to its catalog — so on a bare filesystem the
  check narrows, but cannot fully close, the race window.

All filesystem ops go through the Hadoop FS API, so any scheme the
cluster mounts (file://, hdfs://, s3a://) works; footer-stats harvest
uses pyarrow and engages only for local paths (non-local tables simply
carry no stats and skip pruning — correctness never depends on stats
because the predicate is always re-applied to the scanned rows).
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: name of the derived physical partition column (never user-visible)
PART_COL = "_part"

#: predicate operators understood by ``read(where=...)``
_OPS = ("=", "<", "<=", ">", ">=")

#: sentinel: "keep the current snapshot's partition spec / stats profile"
INHERIT = object()


class CommitConflictError(RuntimeError):
    """Another writer committed since this operation read its base
    snapshot — re-read the table and retry (optimistic concurrency)."""


def _jpath(spark: SparkSession, p: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)


def _fs(spark: SparkSession, p: str):
    return _jpath(spark, p).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )


def _json_safe(v):
    """Footer-stat value -> JSON-storable (int/float/str) or None."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)):
        return v
    return None  # timestamps/decimals: skip rather than mis-compare


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

    def _load(self) -> tuple:
        """(manifest sequence, manifest dict) — the base state every
        mutating operation captures for its optimistic-concurrency
        check."""
        seq, mp = self._manifest_seq()
        if mp is None:
            return seq, {"current": None, "snapshots": []}
        fs = _fs(self.spark, self.path)
        stream = fs.open(_jpath(self.spark, mp))
        try:
            data = bytes(stream.readAllBytes())  # Java 9+ InputStream API
        finally:
            stream.close()
        return seq, json.loads(data.decode("utf-8"))

    def _read_manifest(self) -> dict:
        return self._load()[1]

    def _commit(self, manifest: dict, base_seq: int | None = None) -> None:
        """Crash-safe manifest commit: write ``_manifest-{seq+1}.json``
        (readers resolve the highest sequence, so the new state becomes
        visible exactly when the file appears — no window without a live
        manifest), then best-effort delete older manifests. A crash
        between the write and the cleanup leaves extra files that the
        newest-wins read resolves correctly.

        ``base_seq`` is the manifest sequence the mutating operation
        started from; if another writer advanced it since, the commit
        refuses with :class:`CommitConflictError` instead of silently
        overwriting the other writer's rows (lost update)."""
        fs = _fs(self.spark, self.path)
        seq, _ = self._manifest_seq()
        if base_seq is not None and seq != base_seq:
            raise CommitConflictError(
                f"{self.path}: manifest advanced {base_seq} -> {seq} while "
                "this operation ran; re-read the table and retry"
            )
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

    # -- file metadata (manifest-entry stats) --------------------------------

    def _list_data_files(self, snap_dir: str) -> list:
        """Relative paths of the snapshot's parquet data files, via the
        Hadoop FS API (any scheme), recursive so hidden-partition
        subdirectories are included. Sorted for determinism."""
        fs = _fs(self.spark, snap_dir)
        it = fs.listFiles(_jpath(self.spark, snap_dir), True)
        base = _jpath(self.spark, snap_dir).toUri().getPath().rstrip("/")
        rels = []
        while it.hasNext():
            p = it.next().getPath()
            if not p.getName().endswith(".parquet"):
                continue
            full = p.toUri().getPath()
            rels.append(full[len(base) + 1:])
        return sorted(rels)

    def _harvest_stats(self, snap_dir: str, rel: str, cols: list) -> tuple:
        """(row_count, {col: [min, max]}) from the parquet footer —
        pyarrow, zero Spark jobs. Local filesystems only; elsewhere
        returns (None, {}) and the file simply never prunes."""
        fs = _fs(self.spark, snap_dir)
        if fs.getScheme() != "file":
            return None, {}
        import pyarrow.parquet as pq

        local = _jpath(self.spark, f"{snap_dir}/{rel}").toUri().getPath()
        md = pq.ParquetFile(local).metadata
        agg = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name not in cols:
                    continue
                s = c.statistics
                if s is None or not s.has_min_max:
                    agg[name] = None  # one statless group poisons the file
                    continue
                mn, mx = _json_safe(s.min), _json_safe(s.max)
                if mn is None or mx is None:
                    agg[name] = None
                    continue
                if name in agg:
                    if agg[name] is None:
                        continue
                    agg[name] = [min(agg[name][0], mn), max(agg[name][1], mx)]
                else:
                    agg[name] = [mn, mx]
        return md.num_rows, {k: v for k, v in agg.items() if v is not None}

    def _file_meta(self, snap_dir: str, stats_cols) -> list:
        files = []
        for rel in self._list_data_files(snap_dir):
            rows, stats = (None, {})
            if stats_cols:
                rows, stats = self._harvest_stats(
                    snap_dir, rel, list(stats_cols)
                )
            files.append({"path": rel, "rows": rows, "stats": stats})
        return files

    # -- hidden partitioning --------------------------------------------------

    @staticmethod
    def _part_expr(spec: dict):
        """The derived partition Column for a write."""
        t, src, arg = spec["transform"], spec["source"], spec["arg"]
        if t == "mod":
            return F.pmod(F.col(src).cast("long"), F.lit(int(arg)))
        if t == "truncate":
            return F.substring(F.col(src).cast("string"), 1, int(arg))
        raise ValueError(f"unknown partition transform {t!r}")

    @staticmethod
    def _part_value(spec: dict, v):
        """Driver-side transform of a PREDICATE literal to its partition
        value — this is what makes the partitioning hidden: the reader
        supplies the source-column value, never the partition key."""
        t, arg = spec["transform"], spec["arg"]
        if t == "mod":
            return int(v) % int(arg)  # pmod == python % for positive modulus
        if t == "truncate":
            return str(v)[: int(arg)]
        raise ValueError(f"unknown partition transform {t!r}")

    # -- public API ---------------------------------------------------------

    def history(self) -> list:
        """Committed snapshot ids, oldest first."""
        return list(self._read_manifest()["snapshots"])

    def current_version(self) -> int | None:
        return self._read_manifest()["current"]

    def write_snapshot(
        self,
        df: DataFrame,
        stats_cols=INHERIT,
        partition_by: tuple | None = INHERIT,
        expected_base: int | None = None,
    ) -> int:
        """Full-table overwrite as a NEW snapshot; readers of older
        versions are untouched. Returns the new snapshot id.

        ``stats_cols``: harvest per-file min/max footer stats for these
        columns into the manifest (enables ``read(where=...)`` file
        pruning — sort or range-partition the DataFrame by the column
        first so file ranges are tight and disjoint).

        ``partition_by``: ``(transform, source_col, arg)`` hidden
        partitioning — ``("mod", "doc_id", 16)`` or
        ``("truncate", "url", 8)``. The derived key is written as a
        physical partition column the reader never sees.

        ``expected_base``: manifest sequence this write logically
        depends on (captured by ``merge_into``/``delete_where`` before
        they read the current rows); a concurrent commit in between
        raises :class:`CommitConflictError` instead of losing it.

        Both ``stats_cols`` and ``partition_by`` default to INHERIT:
        like Iceberg, the partition spec and stats profile are table
        metadata that persist across snapshots, so merge_into /
        delete_where / compact_files keep the current layout without
        restating it. Pass ``None`` explicitly to drop either."""
        seq, m = self._load()
        if expected_base is not None and seq != expected_base:
            raise CommitConflictError(
                f"{self.path}: manifest advanced {expected_base} -> {seq}; "
                "re-read and retry"
            )
        base_seq = seq if expected_base is None else expected_base
        cur_meta = (
            m.get("meta", {}).get(str(m["current"])) or {}
            if m["current"] is not None
            else {}
        )
        if partition_by is INHERIT:
            s = cur_meta.get("partition_spec")
            partition_by = (s["transform"], s["source"], s["arg"]) if s else None
        if stats_cols is INHERIT:
            stats_cols = cur_meta.get("stats_cols")
        snap = 0 if m["current"] is None else m["current"] + 1
        snap_dir = f"{self.path}/snap={snap}"
        spec = None
        if partition_by is not None:
            t, src, arg = partition_by
            spec = {"transform": t, "source": src, "arg": arg}
            (
                df.withColumn(PART_COL, self._part_expr(spec))
                .write.mode("overwrite")
                .partitionBy(PART_COL)
                .parquet(snap_dir)
            )
        else:
            df.write.mode("overwrite").parquet(snap_dir)
        try:
            m.setdefault("meta", {})[str(snap)] = {
                "partition_spec": spec,
                "stats_cols": list(stats_cols) if stats_cols else None,
                "files": self._file_meta(snap_dir, stats_cols),
            }
            m["current"] = snap
            m["snapshots"] = m["snapshots"] + [snap]
            self._commit(m, base_seq=base_seq)
        except CommitConflictError:
            # clean our uncommitted data dir so it can't collide with the
            # winning writer's NEXT snapshot id — but only if the winner's
            # committed manifest doesn't reference this very id (both
            # writers derive snap from the same base, so the winner may
            # own snap_dir now)
            _, m2 = self._load()
            if snap not in m2["snapshots"]:
                _fs(self.spark, snap_dir).delete(
                    _jpath(self.spark, snap_dir), True
                )
            raise
        return snap

    def write_snapshot_with(self, writer) -> int:
        """Multi-relation snapshot: ``writer(snap_dir)`` persists
        arbitrary content (e.g. a whole index: postings + doc_stats +
        dictionary + pageranks) under the new snapshot directory; the
        manifest commit happens only after it returns, so a crash
        mid-write leaves the table pointing at the previous snapshot —
        one atomic commit for a multi-relation write."""
        seq, m = self._load()
        snap = 0 if m["current"] is None else m["current"] + 1
        writer(f"{self.path}/snap={snap}")
        m["current"] = snap
        m["snapshots"] = m["snapshots"] + [snap]
        self._commit(m, base_seq=seq)
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

    # -- scan planning --------------------------------------------------------

    @staticmethod
    def _range_may_match(mn, mx, op: str, v) -> bool:
        """Could a value in [mn, mx] satisfy ``col <op> v``?"""
        if op == "=":
            return mn <= v <= mx
        if op == "<":
            return mn < v
        if op == "<=":
            return mn <= v
        if op == ">":
            return mx > v
        if op == ">=":
            return mx >= v
        raise ValueError(f"unknown predicate op {op!r} (one of {_OPS})")

    def plan_files(self, where, version: int | None = None) -> dict:
        """Plan a pruned scan WITHOUT running it: which of the
        snapshot's data files can contain rows matching every
        ``(col, op, value)`` predicate, per the manifest's partition
        spec and per-file min/max stats. Returns ``{"selected": [...],
        "total": n, "partition_pruned": bool}`` — the observability
        hook the tests and ``index_stats`` use."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v is None or v not in m["snapshots"]:
            raise ValueError(f"{self.path}: snapshot {v} not committed")
        meta = m.get("meta", {}).get(str(v))
        if meta is None:
            return {"selected": None, "total": None, "partition_pruned": False}
        spec = meta.get("partition_spec")
        part_pruned = False
        part_prefix = None
        if spec is not None:
            for col, op, val in where:
                if col == spec["source"] and op == "=":
                    part_prefix = f"{PART_COL}={self._part_value(spec, val)}/"
                    part_pruned = True
                    break
        selected = []
        for f in meta["files"]:
            if part_prefix is not None and not f["path"].startswith(part_prefix):
                continue
            keep = True
            for col, op, val in where:
                rng = (f.get("stats") or {}).get(col)
                if rng is None:
                    continue  # no stats for this column: cannot prune
                if not self._range_may_match(rng[0], rng[1], op, val):
                    keep = False
                    break
            if keep:
                selected.append(f["path"])
        return {
            "selected": selected,
            "total": len(meta["files"]),
            "partition_pruned": part_pruned,
        }

    def read(self, version: int | None = None, where=None) -> DataFrame:
        """The table at ``version`` (default: current). Resolves the
        snapshot ONCE — a commit racing this reader can't change the
        files under its scan.

        ``where``: optional list of ``(col, op, value)`` predicates
        (ops: = < <= > >=). The scan is planned against the manifest's
        hidden-partition spec and per-file min/max stats so only files
        that can match are opened; the predicate is then RE-APPLIED to
        the scanned rows, so the result is exact whether or not stats
        exist. The hidden partition column never appears in the
        output."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v is None:
            raise ValueError(f"{self.path}: no committed snapshot")
        if v not in m["snapshots"]:
            raise ValueError(
                f"{self.path}: snapshot {v} not in history {m['snapshots']} "
                "(expired or never committed)"
            )
        snap_dir = f"{self.path}/snap={v}"
        meta = m.get("meta", {}).get(str(v)) or {}
        spec = meta.get("partition_spec")

        df = None
        if where:
            plan = self.plan_files(where, version=v)
            sel, total = plan["selected"], plan["total"]
            if sel is not None and total and len(sel) < total:
                if not sel:
                    df = self.spark.read.parquet(snap_dir).limit(0)
                else:
                    # basePath keeps the _part directory column resolvable
                    df = self.spark.read.option("basePath", snap_dir).parquet(
                        *[f"{snap_dir}/{p}" for p in sel]
                    )
        if df is None:
            df = self.spark.read.parquet(snap_dir)
        if spec is not None and PART_COL in df.columns:
            df = df.drop(PART_COL)
        if where:
            conds = []
            for col, op, val in where:
                c = F.col(col)
                conds.append(
                    {"=": c == val, "<": c < val, "<=": c <= val,
                     ">": c > val, ">=": c >= val}[op]
                )
            df = df.where(reduce(lambda a, b: a & b, conds))
        return df

    def merge_into(self, delta: DataFrame, key: str) -> int:
        """MERGE INTO this table USING delta ON ``key``: matched rows
        are REPLACED by the delta's, unmatched delta rows INSERT —
        copy-on-write into a new snapshot (the batch form of the
        reference Indexer's read-modify-write append). Returns the new
        snapshot id. Raises :class:`CommitConflictError` if another
        writer commits between this operation's read of the current
        rows and its commit (the merge would silently drop that
        writer's changes — the classic lost update)."""
        base, _ = self._load()
        cur = self.read()
        keys = delta.select(key).distinct()
        merged = cur.join(keys, key, "left_anti").unionByName(
            delta.select(*cur.columns)
        )
        return self.write_snapshot(merged, expected_base=base)

    def delete_where(self, condition) -> int:
        """Copy-on-write DELETE: rows matching ``condition`` (a Column)
        drop from a new snapshot. Conflict-checked like merge_into."""
        base, _ = self._load()
        cur = self.read()
        return self.write_snapshot(cur.where(~condition), expected_base=base)

    def compact_files(self, target_file_rows: int = 1_000_000) -> dict:
        """Iceberg ``rewrite_data_files`` analog: rewrite the CURRENT
        snapshot's data into right-sized files as a NEW snapshot with
        identical rows. Streaming/incremental writers leave many small
        files (each availableNow drain, each merge_into); at scale the
        per-file open cost and statless tiny row groups dominate scan
        time, so periodic compaction is what keeps a 10^12-doc table
        scannable. Readers pinned to older snapshots are untouched;
        ``expire_snapshots`` later reclaims the small-file originals.

        Layout: file count = ceil(rows / target_file_rows). With a
        stats profile the data is range-repartitioned on the first
        stats column, so compacted files carry tight DISJOINT min/max
        ranges — compaction improves ``read(where=)`` pruning instead
        of destroying it. With a hidden-partition spec rows are
        clustered by the derived key so each partition value lands in
        few files. Commit is conflict-checked: losing a race to a
        concurrent writer raises CommitConflictError (the rewrite
        would resurrect rows the winner deleted).

        Returns ``{"snapshot", "files_before", "files_after", "rows"}``.
        """
        seq, m = self._load()
        if m["current"] is None:
            raise ValueError(f"{self.path}: nothing to compact")
        meta = m.get("meta", {}).get(str(m["current"])) or {}
        files = meta.get("files") or []
        spec = meta.get("partition_spec")
        stats_cols = meta.get("stats_cols")
        rows = (
            sum(f["rows"] for f in files)
            if files and all(f.get("rows") is not None for f in files)
            else None
        )
        df = self.read()
        if rows is None:
            rows = df.count()
        n = max(1, -(-rows // target_file_rows))
        if stats_cols:
            df = df.repartitionByRange(n, F.col(stats_cols[0]))
        elif spec is not None:
            df = df.repartition(n, self._part_expr(spec))
        else:
            df = df.repartition(n)
        snap = self.write_snapshot(df, expected_base=seq)
        after = self._read_manifest()["meta"][str(snap)]["files"]
        return {
            "snapshot": snap,
            "files_before": len(files),
            "files_after": len(after),
            "rows": rows,
        }

    def verify(self, version: int | None = None) -> dict:
        """Integrity check (fsck) for a snapshot: every manifest-listed
        data file exists; re-harvested parquet footers agree with the
        recorded row counts and min/max stats (the numbers pruning
        decisions trust); no orphan parquet files sit in the snapshot
        dir outside the manifest. Footer reads are pyarrow metadata
        only — zero Spark jobs, like the harvest itself.

        Returns {"ok": bool, "checks": {...violation counts...}}.
        """
        m = self._read_manifest()
        v = m["current"] if version is None else version
        snap_dir = self.snapshot_dir(v)
        meta = m.get("meta", {}).get(str(v)) or {}
        listed = meta.get("files") or []
        stats_cols = meta.get("stats_cols") or []
        fs = _fs(self.spark, snap_dir)
        checks = {
            "missing_files": 0,
            "bad_row_counts": 0,
            "bad_stats": 0,
            "orphan_files": 0,
        }
        for f in listed:
            p = _jpath(self.spark, f"{snap_dir}/{f['path']}")
            if not fs.exists(p):
                checks["missing_files"] += 1
                continue
            if f.get("rows") is None and not stats_cols:
                continue  # statless profile: nothing recorded to compare
            rows, stats = self._harvest_stats(
                snap_dir, f["path"], list(stats_cols)
            )
            if rows is None:
                continue  # non-local FS: footers unreadable here
            if f.get("rows") is not None and rows != f["rows"]:
                checks["bad_row_counts"] += 1
            if stats != (f.get("stats") or {}):
                checks["bad_stats"] += 1
        on_disk = set(self._list_data_files(snap_dir))
        checks["orphan_files"] = len(on_disk - {f["path"] for f in listed})
        return {
            "ok": all(c == 0 for c in checks.values()),
            "version": v,
            "n_files": len(listed),
            "checks": checks,
        }

    def diff(self, v_from: int, v_to: int | None = None,
             key: str | None = None) -> dict:
        """Snapshot diff (Iceberg's snapshot-summary / changelog-read
        analog). Metadata level is ZERO Spark jobs: per-side file and
        row counts straight from the manifests (each snapshot owns its
        data dir, so file identity doesn't carry across versions — the
        meaningful metadata delta is volume, not file names). With
        ``key``, adds row-level counts (Spark jobs): keys added,
        removed, and changed (same key, any column different, compared
        via a row hash) between the two versions."""
        m = self._read_manifest()
        if v_to is None:
            v_to = m["current"]
        for v in (v_from, v_to):
            if v not in m["snapshots"]:
                raise ValueError(f"{self.path}: no snapshot {v}")

        def side(v):
            files = (m.get("meta", {}).get(str(v)) or {}).get("files") or []
            return {
                "files": len(files),
                "rows": sum(f.get("rows") or 0 for f in files),
            }

        out = {"from": v_from, "to": v_to,
               "from_meta": side(v_from), "to_meta": side(v_to)}
        out["row_delta"] = out["to_meta"]["rows"] - out["from_meta"]["rows"]
        if key:
            a, b = self.read(version=v_from), self.read(version=v_to)

            def hashed(df):
                cols = sorted(df.columns)
                return df.select(
                    F.col(key).alias("_k"),
                    F.md5(F.to_json(F.struct(*cols))).alias("_h"),
                )

            ha, hb = hashed(a), hashed(b)
            out["keys_added"] = hb.join(ha, "_k", "left_anti").count()
            out["keys_removed"] = ha.join(hb, "_k", "left_anti").count()
            out["keys_changed"] = (
                ha.alias("x")
                .join(hb.alias("y"), "_k")
                .where(F.col("x._h") != F.col("y._h"))
                .count()
            )
        return out

    def expire_snapshots(self, keep_last: int = 2) -> list:
        """Drop all but the newest ``keep_last`` snapshots (data dirs
        deleted, manifest rewritten). Returns the expired ids. Readers
        pinned to an expired version get a clear error on next read."""
        seq, m = self._load()
        if len(m["snapshots"]) <= keep_last:
            return []
        expired = m["snapshots"][:-keep_last]
        m["snapshots"] = m["snapshots"][-keep_last:]
        for v in expired:
            m.get("meta", {}).pop(str(v), None)
        self._commit(m, base_seq=seq)
        fs = _fs(self.spark, self.path)
        for v in expired:
            fs.delete(_jpath(self.spark, f"{self.path}/snap={v}"), True)
        return expired
