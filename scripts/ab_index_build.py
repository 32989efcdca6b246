#!/usr/bin/env python
"""Controlled A/B for the index_build throughput watch item (round-3
verdict: driver bench fell 1720 -> 1134 docs/s between r2 and r3, the
same rounds the tokenize pass gained the denormalized per-doc ``dl``
that made BM25 scoring join-free).

Three variants of the bench _build pipeline run INTERLEAVED (A, B2,
B1, repeated), best-of-N each, in ONE Spark session, so host-epoch
drift hits all variants equally:

  A  = current pipeline (dl computed in the Arrow tokenize pass AND
       carried through the (term, block) shuffle into dls block arrays)
  B2 = dl computed in tokenize but DROPPED before blocking (isolates
       the shuffle+encode cost of the extra column from the Arrow cost)
  B1 = round-2 tokenize: no dl anywhere (the old pipeline)

A CPU-health probe (fixed busyloop) runs first: per the bench
methodology, absolute numbers from a degraded host epoch are recorded
but flagged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from google_like_search_engine_spark.compression import (
    assign_doc_indexes,
    block_postings,
)
from google_like_search_engine_spark.indexer import (
    POSTINGS_SCHEMA,
    _TAG_RE,
    build_postings,
)
from google_like_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def build_postings_r2(docs):
    """The round-2 tokenize pass: identical to indexer.build_postings
    minus the dl computation and column (kept here, not in the library,
    purely as the A/B baseline)."""
    from typing import Iterator

    import pandas as pd

    from google_like_search_engine_spark.kernels.textclean import index_tokenize

    schema_r2 = POSTINGS_SCHEMA.replace(", dl int", "")

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_term, out_doc, out_url, out_tf, out_pos, out_l2 = [], [], [], [], [], []
            for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"]):
                if text is None:
                    continue
                page = _TAG_RE.sub(" ", text)
                positions, l2 = index_tokenize(page)
                for term, plist in positions.items():
                    out_term.append(term)
                    out_doc.append(doc_id)
                    out_url.append(url)
                    out_tf.append(len(plist))
                    out_pos.append(plist)
                    out_l2.append(l2)
            yield pd.DataFrame(
                {
                    "term": out_term,
                    "doc_id": out_doc,
                    "url": out_url,
                    "tf": out_tf,
                    "positions": pd.Series(out_pos, dtype="object"),
                    "l2_norm": out_l2,
                }
            )

    return docs.mapInPandas(tokenize, schema=schema_r2)


def cpu_probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def main():
    spark = get_spark("ab_index_build", cores=CPUS, shuffle_partitions=CPUS)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("doc_id").cast("string").alias("url"),
            "text",
        )
    )
    n_docs = docs.count()

    def run(flat_fn, drop_dl: bool) -> float:
        # times the full bench _build window (tokenize + numbering +
        # block exchange + varint encode + parquet write)
        t0 = time.perf_counter()
        d = docs.repartition(CPUS * 2)
        flat = flat_fn(d)
        if drop_dl and "dl" in flat.columns:
            flat = flat.drop("dl")
        idx = assign_doc_indexes(d)
        block_postings(flat.join(F.broadcast(idx), "doc_id")).write.mode(
            "overwrite"
        ).parquet("/tmp/ab_blocks")
        return time.perf_counter() - t0

    variants = {
        "A_dl_through_blocks": lambda: run(build_postings, drop_dl=False),
        "B2_dl_tokenized_not_blocked": lambda: run(build_postings, drop_dl=True),
        "B1_r2_no_dl": lambda: run(build_postings_r2, drop_dl=False),
    }
    probe0 = cpu_probe()
    # one untimed warmup (python worker spin-up, page cache)
    variants["A_dl_through_blocks"]()
    times: dict = {k: [] for k in variants}
    for _ in range(ROUNDS):
        for k, fn in variants.items():
            times[k].append(fn())
    probe1 = cpu_probe()

    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
        "cpu_probe_sec": [round(probe0, 2), round(probe1, 2)],
        "rounds": {k: [round(v, 3) for v in vs] for k, vs in times.items()},
        "best_sec": {k: round(min(vs), 3) for k, vs in times.items()},
        "best_docs_per_sec": {
            k: round(n_docs / min(vs), 1) for k, vs in times.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
