"""HW9 golden fixtures ported verbatim (reference test/HW9Test.java).

These pin the hash, stemmer, tokenizer, index shape, and PageRank math
at once — the reference's own correctness bar.
"""

import math

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.indexer import (
    build_index,
    build_posting_lists,
    build_postings,
)
from google_like_search_engine_spark.kernels import kvs_hash
from google_like_search_engine_spark.pagerank import (
    extract_edges,
    pagerank,
    vertices_from_pages,
)
from google_like_search_engine_spark.ranker import expand_query, score_bm25, score_tfidf

# --- HW9Test.java:169-173 indexer fixture -------------------------------
INDEXER_DOCS = {
    "http://foo.com/page1.html": "apples bananas coconuts",
    "http://foo.com/page2.html": "dates elderberries figs",
    "http://foo.com/page3.html": "guavas hazelnuts",
}
# HW9Test.java:186-194 + stem expansion (comparator stems each word and
# accepts raw or stemmed postings; HW9Test.java:95-130)
INDEXER_EXPECTED = {
    "apples": "http://foo.com/page1.html",
    "bananas": "http://foo.com/page1.html",
    "coconuts": "http://foo.com/page1.html",
    "dates": "http://foo.com/page2.html",
    "elderberries": "http://foo.com/page2.html",
    "figs": "http://foo.com/page2.html",
    "guavas": "http://foo.com/page3.html",
    "hazelnuts": "http://foo.com/page3.html",
    # stems that differ from the raw token are indexed at the same
    # positions (Indexer.java:76-79)
    "appl": "http://foo.com/page1.html",
    "banana": "http://foo.com/page1.html",
    "coconut": "http://foo.com/page1.html",
    "date": "http://foo.com/page2.html",
    "elderberri": "http://foo.com/page2.html",
    "fig": "http://foo.com/page2.html",
    "guava": "http://foo.com/page3.html",
    "hazelnut": "http://foo.com/page3.html",
}

# --- HW9Test.java:213-241 pagerank fixture -------------------------------
PAGERANK_PAGES = {
    "http://foo.com:80/page1.html":
        'This links to <a href="http://foo.com:80/page2.html">page 2</a>',
    "http://foo.com:80/page2.html":
        'A link to <a href="http://foo.com:80/page1.html">page 1</a> and '
        '<a href="http://foo.com:80/page3.html">page 3</a>',
    "http://foo.com:80/page3.html":
        'Linking back to <a href="http://foo.com:80/page1.html">page 1</a>',
}
PAGERANK_EXPECTED = {
    "http://foo.com:80/page1.html": 1.191681575822917,
    "http://foo.com:80/page2.html": 1.1637322274926893,
    "http://foo.com:80/page3.html": 0.644586196684393,
}


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(kvs_hash(u), u, t) for u, t in docs.items()],
        "doc_id string, url string, text string",
    )


def _pages_df(spark, docs):
    return spark.createDataFrame(
        [(u, t) for u, t in docs.items()], "url string, text string"
    )


def test_indexer_golden(spark):
    postings = build_postings(_docs_df(spark, INDEXER_DOCS))
    rows = postings.collect()
    got = {}
    for r in rows:
        got.setdefault(r["term"], set()).add(r["url"])
    for term, url in INDEXER_EXPECTED.items():
        assert got.get(term) == {url}, term
    # no extra terms
    assert set(got) == set(INDEXER_EXPECTED)
    # positions are 1-based; apples=1, bananas=2, coconuts=3
    by_term = {r["term"]: r for r in rows if r["url"].endswith("page1.html")}
    assert list(by_term["apples"]["positions"]) == [1]
    assert list(by_term["bananas"]["positions"]) == [2]
    assert list(by_term["coconuts"]["positions"]) == [3]
    # l2 norm over combined raw+stem map: 6 entries of tf 1 -> sqrt(6)
    assert by_term["apples"]["l2_norm"] == pytest.approx(math.sqrt(6))
    assert by_term["apples"]["doc_id"] == kvs_hash("http://foo.com/page1.html")


def test_posting_lists_sorted_and_salted_equivalent(spark):
    postings = build_postings(_docs_df(spark, INDEXER_DOCS))
    plain = {r["term"]: r for r in build_posting_lists(postings).collect()}
    salted = {r["term"]: r for r in build_posting_lists(postings, salt_buckets=4).collect()}
    assert set(plain) == set(salted)
    for term in plain:
        p, s = plain[term], salted[term]
        assert p["df"] == s["df"]
        assert [e["doc_id"] for e in p["postings"]] == [e["doc_id"] for e in s["postings"]]
        assert [e["doc_id"] for e in p["postings"]] == sorted(
            e["doc_id"] for e in p["postings"]
        )


def test_pagerank_golden(spark):
    pages = _pages_df(spark, PAGERANK_PAGES)
    ranks = pagerank(
        vertices_from_pages(pages), extract_edges(pages), threshold=0.001
    )
    got = {r["doc_id"]: r["rank"] for r in ranks.collect()}
    assert len(got) == 3
    for url, expected in PAGERANK_EXPECTED.items():
        assert got[kvs_hash(url)] == pytest.approx(expected, abs=0.001), url


def test_extract_edges_golden(spark):
    edges = extract_edges(_pages_df(spark, PAGERANK_PAGES)).collect()
    got = {(e["src"], e["dst"]) for e in edges}
    h = kvs_hash
    assert got == {
        (h("http://foo.com:80/page1.html"), h("http://foo.com:80/page2.html")),
        (h("http://foo.com:80/page2.html"), h("http://foo.com:80/page1.html")),
        (h("http://foo.com:80/page2.html"), h("http://foo.com:80/page3.html")),
        (h("http://foo.com:80/page3.html"), h("http://foo.com:80/page1.html")),
    }


# --- Ranker vs a pure-Python oracle implementing Ranker.java:64-159 -----

def _oracle_rank(query, docs, pageranks, total_docs):
    """Pure-Python reference scorer (Ranker.java semantics)."""
    # build the index the reference way
    from google_like_search_engine_spark.kernels.textclean import index_tokenize

    index = {}  # term -> list of (url, tf_norm)
    for url, text in docs.items():
        positions, l2 = index_tokenize(text)
        for term, plist in positions.items():
            index.setdefault(term, []).append((url, len(plist) / l2))
    scores = {}
    for word in expand_query(query):
        postings = index.get(word.lower(), [])
        distinct = list(dict.fromkeys(postings))
        if not distinct:
            continue
        idf = math.log(total_docs / len(distinct))
        for url, tf_norm in distinct:
            scores[url] = scores.get(url, 0.0) + tf_norm * idf
    out = []
    for url, tfidf in scores.items():
        pr = pageranks.get(kvs_hash(url), 0.15)
        out.append((url, tfidf * pr))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


RANKER_DOCS = {
    "http://foo.com/page1.html": "apples bananas coconuts apples",
    "http://foo.com/page2.html": "dates elderberries figs apples",
    "http://foo.com/page3.html": "guavas hazelnuts",
    "http://foo.com/page4.html": "apples apples apples bananas",
}
RANKER_PRS = {kvs_hash("http://foo.com/page1.html"): 1.5,
              kvs_hash("http://foo.com/page4.html"): 0.3}

QUERIES = [
    "apples",
    "apple",            # stem appl matches the stem-indexed form
    "apples figs",
    "apples apples",    # duplicate term must not double-count
    "Apples",           # mixed case: lookup lowercases
    "unknownterm",
    "the and is",       # stopword-ish terms (still indexed here)
    "",
]


@pytest.mark.parametrize("query", QUERIES)
def test_ranker_matches_oracle(spark, query):
    docs_df = _docs_df(spark, RANKER_DOCS)
    postings = build_postings(docs_df)
    prs = spark.createDataFrame(
        [(k, v) for k, v in RANKER_PRS.items()], "doc_id string, rank double"
    )
    got = [
        (r["url"], r["score"])
        for r in score_tfidf(spark, query, postings, prs, len(RANKER_DOCS)).collect()
    ]
    expected = _oracle_rank(query, RANKER_DOCS, RANKER_PRS, len(RANKER_DOCS))
    assert [u for u, _ in got] == [u for u, _ in expected], query
    for (gu, gs), (eu, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-12), (query, gu)


def test_bm25_sane(spark):
    docs_df = _docs_df(spark, RANKER_DOCS)
    postings = build_postings(docs_df)
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    res = score_bm25(spark, "apples bananas", postings, doc_stats, len(RANKER_DOCS)).collect()
    assert res, "bm25 returned no rows"
    # page4 has most apples+bananas mass
    assert res[0]["url"] == "http://foo.com/page4.html"
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_build_index_doc_stats(spark):
    pages = spark.createDataFrame(
        [(u, t, None, "en") for u, t in INDEXER_DOCS.items()],
        "url string, text string, html binary, lang string",
    )
    postings, doc_stats = build_index(pages)
    stats = {r["url"]: r for r in doc_stats.collect()}
    # page1: 3 raw + 3 stems, tf 1 each -> 6 entries
    assert stats["http://foo.com/page1.html"]["n_term_entries"] == 6
    assert stats["http://foo.com/page3.html"]["n_distinct_terms"] == 4
