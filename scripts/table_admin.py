#!/usr/bin/env python
"""spark-submit entry point: operate a VersionedTable (the Iceberg
stand-in) — inspect history, compact small files, expire old
snapshots, dry-run a pruned scan plan.

  python scripts/table_admin.py history  --table /path/to/table
  python scripts/table_admin.py compact  --table T [--target-rows N]
  python scripts/table_admin.py expire   --table T [--keep-last K]
  python scripts/table_admin.py plan     --table T --where col=5 [--where col2>=10]
  python scripts/table_admin.py verify   --table T   (fsck; exit 1 on violations)

The maintenance loop a streaming/incremental writer needs: drains and
merges leave many small files; `compact` rewrites the current snapshot
into right-sized files (a new snapshot — readers never block), then
`expire` reclaims the originals. `plan` shows which data files a
predicate would open (manifest stats + hidden-partition pruning)
without running a Spark job.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PRED = re.compile(r"^(\w+)\s*(>=|<=|=|<|>)\s*(.+)$")


def _parse_where(raw: list) -> list:
    out = []
    for w in raw or []:
        m = _PRED.match(w)
        if not m:
            raise SystemExit(f"bad --where {w!r} (use col=5, col>=10, ...)")
        col, op, val = m.groups()
        try:
            val = int(val)
        except ValueError:
            try:
                val = float(val)
            except ValueError:
                pass  # string predicate
        out.append((col, op, val))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["history", "compact", "expire", "plan",
                                    "verify", "diff"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--target-rows", type=int, default=1_000_000)
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--where", action="append", default=[])
    ap.add_argument("--from", dest="v_from", type=int,
                    help="diff: older snapshot id")
    ap.add_argument("--to", dest="v_to", type=int, default=None,
                    help="diff: newer snapshot id (default current)")
    ap.add_argument("--key", default=None,
                    help="diff: key column for row-level added/removed/"
                         "changed counts (metadata-only without it)")
    args = ap.parse_args()

    from google_like_search_engine_spark.session import get_spark
    from google_like_search_engine_spark.sources.versioned import VersionedTable

    spark = get_spark("table_admin")
    t = VersionedTable(spark, args.table)

    if args.cmd == "history":
        m = t._read_manifest()
        out = {"current": m["current"], "snapshots": m["snapshots"]}
        out["files_per_snapshot"] = {
            v: len((m.get("meta", {}).get(str(v)) or {}).get("files") or [])
            for v in m["snapshots"]
        }
        print(json.dumps(out))
    elif args.cmd == "compact":
        print(json.dumps(t.compact_files(target_file_rows=args.target_rows)))
    elif args.cmd == "expire":
        print(json.dumps({"expired": t.expire_snapshots(args.keep_last)}))
    elif args.cmd == "plan":
        plan = t.plan_files(_parse_where(args.where))
        print(json.dumps(plan))
    elif args.cmd == "diff":
        if args.v_from is None:
            ap.error("diff needs --from")
        print(json.dumps(t.diff(args.v_from, args.v_to, key=args.key)))
    elif args.cmd == "verify":
        report = t.verify()
        print(json.dumps(report))
        if not report["ok"]:
            spark.stop()
            sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
