#!/usr/bin/env python
"""spark-submit entry point: continuous WARC ingestion into the index.

Watches a landing directory for new ``*.warc[.gz]`` archives and folds
them into an incremental posting store exactly once per file (file
source + checkpoint log — kill and re-run to resume):

  spark-submit --py-files engine.zip scripts/ingest_warc_stream.py \\
      --landing /data/warc-landing --index /data/index \\
      --checkpoint /data/index/_checkpoint [--dictionary words.txt] \\
      [--once] [--interval 30]

``--once`` drains everything currently in the landing dir and exits
(availableNow trigger); without it the query runs until killed,
picking up archives as crawlers deposit them. Query-side, compact the
store with ``streaming.index_stream.compact_index`` (collapses
re-crawl appends to the newest capture per (term, doc)).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landing", required=True, help="WARC landing directory")
    ap.add_argument("--index", required=True, help="incremental postings dir")
    ap.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ap.add_argument("--dictionary", help="valid-words file (one per line)")
    ap.add_argument("--once", action="store_true", help="drain and exit")
    ap.add_argument(
        "--interval", type=float, default=30.0,
        help="micro-batch trigger interval, seconds (ignored with --once)",
    )
    args = ap.parse_args()

    from google_like_search_engine_spark.session import get_spark
    from google_like_search_engine_spark.sources.warc import stream_warc
    from google_like_search_engine_spark.streaming.index_stream import (
        incremental_index,
    )

    if args.dictionary:
        with open(args.dictionary) as f:
            dictionary = frozenset(w.strip() for w in f if w.strip())
    else:
        from google_like_search_engine_spark.corpus import fixture_dictionary

        dictionary = fixture_dictionary()

    spark = get_spark("ingest_warc_stream")
    pages = stream_warc(spark, args.landing, dictionary)
    q = incremental_index(
        pages,
        args.index,
        args.checkpoint,
        processing_interval=None if args.once else args.interval,
    )
    q.awaitTermination()
    print("stream terminated")


if __name__ == "__main__":
    main()
