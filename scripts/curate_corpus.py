#!/usr/bin/env python
"""spark-submit entry point: run the full curation pipeline and write
the kept corpus plus a per-document audit relation.

The four training-data gates in one job (catalog_text.curate_corpus):

  1. quality rules      Gopher-style token/word-length/stopword/TTR
  2. language agreement declared lang vs detected-English heuristic
  3. dedup survivorship MinHash+LSH pairs -> connected components ->
                        one canonical survivor per cluster
  4. perplexity         add-one bigram LM trained on the corpus; drop
                        docs above --ppl-max

Outputs under --out:
  audit/      (doc_id, ok_quality, ok_lang, ok_dedup, ok_ppl, keep)
  kept/       the surviving documents, original schema

Usage (cluster):
  spark-submit --py-files engine.zip scripts/curate_corpus.py \
      --docs s3://bucket/corpus_dir --out s3://bucket/curated

--docs is a directory holding documents.parquet (the engine's corpus
layout). Usage (local): python scripts/curate_corpus.py --docs ... --out ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="dir holding documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ppl-max", type=float, default=None,
                    help="override the perplexity ceiling")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from google_like_search_engine_spark import catalog_text as t
    from google_like_search_engine_spark.catalog import load
    from google_like_search_engine_spark.session import get_spark

    if args.ppl_max is not None:
        t.CURATE_PPL_MAX = args.ppl_max

    spark = get_spark("curate_corpus", cores=args.cores)
    t0 = time.time()
    audit = t.curate_corpus(spark, args.docs)
    audit.write.mode("overwrite").parquet(f"{args.out}/audit")
    audit = spark.read.parquet(f"{args.out}/audit")

    docs = load(spark, args.docs, "documents")
    kept = docs.join(
        audit.where("keep").select("doc_id"), "doc_id", "left_semi"
    )
    kept.write.mode("overwrite").parquet(f"{args.out}/kept")

    from pyspark.sql import functions as F

    gate_cols = ["ok_quality", "ok_lang", "ok_dedup", "ok_ppl", "keep"]
    row = audit.agg(
        F.count(F.lit(1)).alias("n_in"),
        *[F.sum(F.col(g).cast("int")).alias(g) for g in gate_cols],
    ).collect()[0]
    print(
        f"curated {row['n_in']} -> {row['keep']} docs in "
        f"{time.time() - t0:.1f}s; "
        + ", ".join(f"{g}={row[g]}" for g in gate_cols[:-1])
    )
    spark.stop()


if __name__ == "__main__":
    main()
