#!/usr/bin/env python
"""spark-submit entry point: query a built index.

  python scripts/query_index.py --index /path/to/index \
      --query "apples figs" [--scorer tfidf|bm25|bm25-blocked] [-k 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--scorer", default="tfidf",
                    choices=["tfidf", "bm25", "bm25-pruned", "bm25-blocked"])
    ap.add_argument("-k", type=int, default=10)
    args = ap.parse_args()

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.session import get_spark

    spark = get_spark("query_index")
    eng = SearchEngine(spark)
    if args.scorer != "bm25-blocked":
        # the blocked scorer reads only the self-contained blocked
        # layout; loading the flat postings for it would add ~30 s of
        # needless cold I/O
        eng.load(args.index)
    t0 = time.perf_counter()
    if args.scorer == "tfidf":
        res = eng.search(args.query, k=args.k)
    elif args.scorer == "bm25":
        res = eng.search_bm25(args.query, k=args.k)
    elif args.scorer == "bm25-pruned":
        res = eng.search_bm25(args.query, k=args.k, pruned=True)
    else:
        res = eng.search_bm25_blocked(
            os.path.join(args.index, "blocked"), args.query, k=args.k
        )
    rows = res.collect()
    dt = (time.perf_counter() - t0) * 1000
    for r in rows:
        print(f"{r['score']:.6f}  {r['url']}")
    print(f"[{len(rows)} results in {dt:.0f} ms]")
    spark.stop()


if __name__ == "__main__":
    main()
