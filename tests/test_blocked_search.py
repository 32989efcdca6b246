"""Blocked-index MaxScore == flat naive BM25 (exactness through the
compressed path: encode -> block-skip -> decode -> score)."""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.compression import (
    assign_doc_indexes,
    block_postings,
)
from google_like_search_engine_spark.indexer import build_postings
from google_like_search_engine_spark.ranker import score_bm25
from google_like_search_engine_spark.wand import blocked_maxscore_topk

from tests.test_wand_and_lineage import _random_docs


@pytest.mark.parametrize("query,k", [
    ("spark shuffle", 5),
    ("spark", 10),
    ("index merge join table", 7),
    ("missingword", 5),
])
def test_blocked_maxscore_equals_naive(spark, query, k):
    docs = _random_docs(spark, n=150, seed=23)
    postings = build_postings(docs).persist()
    idx = assign_doc_indexes(docs).persist()
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=32).persist()

    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    doc_stats_idx = doc_stats.join(idx, "doc_id").select(
        "doc_index", "url", "n_term_entries"
    ).persist()
    n = docs.count()

    naive = score_bm25(spark, query, postings, doc_stats, n).limit(k).collect()
    fast = blocked_maxscore_topk(
        spark, query, blocks, doc_stats_idx, n, k=k
    ).collect()
    assert [r["url"] for r in fast] == [r["url"] for r in naive], query
    for a, b in zip(fast, naive):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)
    for df in (postings, idx, blocks, doc_stats_idx):
        df.unpersist()


def test_blocked_phrase_topk_counts(spark):
    """Positional phrase counts off the varint positions store equal a
    direct adjacency computation on the flat postings."""
    from google_like_search_engine_spark.wand import blocked_phrase_topk

    docs = spark.createDataFrame(
        [
            ("d0", "u0", "table scan table scan table"),
            ("d1", "u1", "scan table scan"),
            ("d2", "u2", "table table scan"),
            ("d3", "u3", "nothing relevant here"),
            ("d4", "u4", "table scan"),
        ],
        "doc_id string, url string, text string",
    )
    postings = build_postings(docs)
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=4).persist()
    dsi = (
        postings.groupBy("doc_id", "url")
        .agg(F.sum("tf").alias("n_term_entries"))
        .join(idx, "doc_id")
        .select("doc_index", "url", "n_term_entries")
    )
    got = {
        r["url"]: r["n_occurrences"]
        for r in blocked_phrase_topk(spark, "table scan", blocks, dsi, k=10).collect()
    }
    # adjacency over the raw token stream (same 1-based positions)
    assert got == {"u0": 2, "u1": 1, "u2": 1, "u4": 1}
    # repeated-word phrase: "table table" only in u2
    got2 = {
        r["url"]: r["n_occurrences"]
        for r in blocked_phrase_topk(spark, "table table", blocks, dsi, k=10).collect()
    }
    assert got2 == {"u2": 1}
    blocks.unpersist()
