#!/usr/bin/env python
"""spark-submit entry point: the full LLM training-data pipeline in one
command — curate, split, pack.

  1. curate   the four gates (quality rules, language agreement,
              MinHash-dedup survivorship, bigram-LM perplexity) —
              catalog_text.curate_corpus, the oracle-gated composite
  2. split    reproducible hash-bucket train/val/test assignment
              (analytics.curation.split_assign; optionally thin a head
              language with --lang-rate) — a pure function of doc_id,
              so re-runs and backfills agree row-by-row
  3. pack     concat-and-chunk sequence packing per split
              (analytics.curation.pack_chunks): every document gets its
              global token offset and training-chunk id for a fixed
              --budget, computed with the two-phase prefix sum (no
              single-reducer window)

Outputs under --out:
  audit/                per-document gate columns + keep
  train/ val/ test/     surviving documents with (split, n_tokens,
                        start_offset, chunk_id, n_chunks) columns
  summary.json          docs/tokens/chunks per split

Usage (cluster):
  spark-submit --py-files engine.zip scripts/prepare_training_data.py \
      --docs s3://bucket/corpus_dir --out s3://bucket/prepared

Usage (local):
  python scripts/prepare_training_data.py --docs /root/testdata/sf0.001 \
      --out /tmp/prepared --budget 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="dir holding documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=256,
                    help="tokens per packed training chunk")
    ap.add_argument("--ppl-max", type=float, default=None,
                    help="override the perplexity gate cutoff")
    ap.add_argument("--lang-rate", default="",
                    help="per-language keep rates per mille, e.g. "
                    "'en=500,fr=800' (unlisted languages keep 1000)")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from google_like_search_engine_spark import catalog_text as t
    from google_like_search_engine_spark.analytics.curation import (
        pack_chunks,
        split_assign,
        stratified_keep,
    )
    from google_like_search_engine_spark.catalog import load
    from google_like_search_engine_spark.session import get_spark

    if args.ppl_max is not None:
        t.CURATE_PPL_MAX = args.ppl_max

    spark = get_spark("prepare_training_data", cores=args.cores)
    t0 = time.time()

    # 1. curate: the oracle-gated 4-gate composite, audit persisted
    audit = t.curate_corpus(spark, args.docs)
    audit.write.mode("overwrite").parquet(f"{args.out}/audit")
    audit = spark.read.parquet(f"{args.out}/audit")

    docs = load(spark, args.docs, "documents")
    kept = docs.join(audit.where("keep").select("doc_id"), "doc_id", "left_semi")

    # 2. split (+ optional stratified thinning of head languages)
    kept = split_assign(kept, "doc_id")
    if args.lang_rate:
        rates = {
            kv.split("=")[0]: int(kv.split("=")[1])
            for kv in args.lang_rate.split(",")
            if kv
        }
        kept = stratified_keep(kept, "doc_id", "lang", rates, 1000)
        kept = kept.where("keep").drop("keep")
    kept = kept.persist()
    kept.count()

    # 3. pack each split independently (chunk ids are per-split) and
    # write the final training tables
    summary = {}
    for split in ("train", "val", "test"):
        part = kept.where(F.col("split") == split)
        placed = pack_chunks(part, "doc_id", "text", budget=args.budget)
        out_df = part.join(placed, "doc_id")
        out_df.write.mode("overwrite").parquet(f"{args.out}/{split}")
        agg = out_df.agg(
            F.count(F.lit(1)).alias("docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
        ).collect()[0]
        n_chunks = int(-(-int(agg["tokens"]) // args.budget)) if agg["tokens"] else 0
        summary[split] = {
            "docs": int(agg["docs"]),
            "tokens": int(agg["tokens"]),
            "chunks": n_chunks,
        }
    kept.unpersist()

    summary["budget"] = args.budget
    summary["wall_sec"] = round(time.time() - t0, 1)
    # Hadoop FS stream so the summary lands next to the parquet on any
    # scheme (local, HDFS, object store), not just file:// — the
    # docstring's s3:// usage would otherwise crash at the last step
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{args.out}/summary.json")
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    out.write(bytearray(json.dumps(summary, indent=1), "utf-8"))
    out.close()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
