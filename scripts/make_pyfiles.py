#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

  python scripts/make_pyfiles.py [out.zip]      (default: engine.zip)

Then launch any scripts/ entry on a cluster:

  spark-submit --py-files engine.zip scripts/build_index.py \\
      --pages <warc-or-parquet> --out <index> [--format warc] [--blocked]

The archive is deterministic (sorted entries, zeroed timestamps) so
repeated builds ship byte-identical artifacts.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "google_like_search_engine_spark"


def build(out_path: str) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entries = []
    for root, _dirs, files in os.walk(os.path.join(repo, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                entries.append((os.path.relpath(p, repo), p))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, p in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(p, "rb") as f:
                z.writestr(info, f.read())
    return len(entries)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    n = build(out)
    print(f"wrote {out} ({n} modules)")
