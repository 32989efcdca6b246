#!/usr/bin/env python
"""spark-submit entry point: merge blocked index shards (segment merge).

  python scripts/merge_shards.py --shards /idx/s0,/idx/s1 --out /idx/merged

Decode -> renumber -> re-encode, no re-tokenize; later shards take
precedence per url (so base,delta order applies updates). The output
is a normal blocked index servable by every query path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", required=True,
                    help="comma-separated blocked index dirs, oldest first")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    paths = [p for p in args.shards.split(",") if p]
    if len(paths) < 2:
        ap.error("--shards needs at least two paths")

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.session import get_spark

    spark = get_spark("merge_shards")
    t0 = time.perf_counter()
    SearchEngine(spark).merge_blocked_shards(paths, args.out)
    eng = SearchEngine(spark)
    stats = eng.index_stats(args.out)
    print(f"merged {len(paths)} shards -> {args.out} "
          f"in {time.perf_counter() - t0:.1f}s")
    print({k: stats[k] for k in ("total_documents", "terms", "blocks")
           if k in stats})
    spark.stop()


if __name__ == "__main__":
    main()
