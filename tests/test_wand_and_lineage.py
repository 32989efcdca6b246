"""MaxScore exactness (vs naive BM25) + checkpoint/lineage resume tests."""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.indexer import build_postings
from google_like_search_engine_spark.plans.lineage import (
    checkpointed_index_build,
    load_built_postings,
    read_lineage,
)
from google_like_search_engine_spark.ranker import score_bm25
from google_like_search_engine_spark.wand import maxscore_topk

VOCAB = ["spark", "index", "query", "merge", "shuffle", "join", "table",
         "scan", "row", "page", "rank", "term", "block", "batch", "stream"]


def _random_docs(spark, n=120, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        words = [VOCAB[min(int(len(VOCAB) ** rng.random()) - 1, len(VOCAB) - 1)]
                 for _ in range(rng.randint(5, 60))]
        rows.append((f"d{i}", f"http://x.com/{i}.html", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id string, url string, text string")


@pytest.mark.parametrize("query,k", [
    ("spark shuffle", 5),
    ("spark", 10),
    ("index merge join", 7),
    ("stream block batch rank", 3),
    ("missingword", 5),
    ("spark missingword", 5),
])
def test_maxscore_equals_naive_bm25(spark, query, k):
    docs = _random_docs(spark)
    postings = build_postings(docs).cache()
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    ).cache()
    n = docs.count()
    naive = score_bm25(spark, query, postings, doc_stats, n).limit(k).collect()
    fast = maxscore_topk(spark, query, postings, doc_stats, n, k=k).collect()
    assert [r["url"] for r in fast] == [r["url"] for r in naive], query
    for a, b in zip(fast, naive):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)
    postings.unpersist()
    doc_stats.unpersist()


def test_checkpointed_build_and_resume(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = _random_docs(spark, n=60, seed=5)
    lineage = checkpointed_index_build(docs, out, n_buckets=4)
    assert len(lineage) == 4
    assert all(r["status"] == "done" for r in lineage.values())

    # full postings equal the direct build
    from google_like_search_engine_spark.indexer import build_posting_lists

    direct = {
        r["term"]: [e["doc_id"] for e in r["postings"]]
        for r in build_posting_lists(build_postings(docs)).collect()
    }
    loaded = {
        r["term"]: [e["doc_id"] for e in r["postings"]]
        for r in load_built_postings(spark, out).collect()
    }
    assert loaded == direct

    # resume skips everything (lineage timestamps unchanged)
    before = {b: r["ts"] for b, r in lineage.items()}
    lineage2 = checkpointed_index_build(docs, out, n_buckets=4)
    assert {b: r["ts"] for b, r in lineage2.items()} == before

    # invalidate one bucket -> only that bucket rebuilds
    victim = sorted(lineage)[0]
    path = os.path.join(out, "_lineage", f"bucket-{victim}.json")
    rec = json.load(open(path))
    rec["fp_sum"] = rec["fp_sum"] + 1
    json.dump(rec, open(path, "w"))
    lineage3 = checkpointed_index_build(docs, out, n_buckets=4)
    assert lineage3[victim]["ts"] != before[victim]
    for b in lineage3:
        if b != victim:
            assert lineage3[b]["ts"] == before[b]
