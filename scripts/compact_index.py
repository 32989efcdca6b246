#!/usr/bin/env python
"""spark-submit entry point: compact an incremental posting store.

The streaming ingest path (scripts/ingest_warc_stream.py,
streaming.index_stream.incremental_index) appends per-micro-batch
postings; re-crawled docs therefore accumulate one posting set per
capture. Compaction keeps the newest per (term, doc_id) and writes a
clean store:

  spark-submit --py-files engine.zip scripts/compact_index.py \\
      --in /data/index --out /data/index_compacted [--buckets 32]

The output is bucketed by term hash (same pmod(xxhash64) scheme as the
blocked layout) so downstream per-term reads prune partitions.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True,
                    help="incremental postings dir (append store)")
    ap.add_argument("--out", required=True, help="compacted output dir")
    ap.add_argument("--buckets", type=int, default=32,
                    help="term-hash partition count for the output")
    ap.add_argument("--promote", metavar="DIR",
                    help="ALSO promote the compacted store to a full "
                         "blocked serving index at DIR "
                         "(engine.promote_stream_index)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from google_like_search_engine_spark.session import get_spark
    from google_like_search_engine_spark.streaming.index_stream import (
        compact_index,
    )

    spark = get_spark("compact_index")
    t0 = time.perf_counter()
    compacted = compact_index(spark, args.in_dir).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(args.buckets)).cast("int")
    )
    compacted.write.mode("overwrite").partitionBy("bucket").parquet(args.out)
    if args.promote:
        from google_like_search_engine_spark.engine import SearchEngine

        SearchEngine(spark).promote_stream_index(args.in_dir, args.promote)
        print(f"promoted -> blocked serving index at {args.promote}")
    out = spark.read.parquet(args.out)
    n_post = out.count()
    n_docs = out.select("doc_id").distinct().count()
    dt = time.perf_counter() - t0
    print(f"compacted {n_post} postings / {n_docs} docs in {dt:.1f}s -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
