"""End-to-end SearchEngine facade: build -> save -> load -> query."""

import pytest

from google_like_search_engine_spark.corpus import generate_pages
from google_like_search_engine_spark.engine import SearchEngine


def test_engine_end_to_end(spark, tmp_path):
    pages = generate_pages(spark, 150, partitions=4).where("lang = 'en'")
    eng = SearchEngine(spark).build(pages, pagerank_threshold=0.01)

    res = eng.search("search engine index", k=10).collect()
    assert res
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    assert all(r["pagerank"] != 0 for r in res)

    bm = eng.search_bm25("search engine", k=5).collect()
    bm_pruned = eng.search_bm25("search engine", k=5, pruned=True).collect()
    assert [r["url"] for r in bm] == [r["url"] for r in bm_pruned]
    for a, b in zip(bm, bm_pruned):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)

    # save / load round-trip preserves results
    path = str(tmp_path / "engine_idx")
    eng.save(path)
    eng2 = SearchEngine(spark).load(path)
    res2 = eng2.search("search engine index", k=10).collect()
    assert [(r["url"], r["score"]) for r in res2] == [
        (r["url"], r["score"]) for r in res
    ]
    eng.unpersist()
    eng2.unpersist()


def test_engine_served_bm25_identical(spark):
    pages = generate_pages(spark, 100, partitions=4).where("lang = 'en'")
    eng = SearchEngine(spark).build(pages, run_pagerank=False)
    assert eng.enable_serving()
    for q in ["search engine", "apples", "index merge rank", "nosuchterm"]:
        naive = eng.search_bm25(q, k=8).collect()
        served = eng.search_bm25_served(q, k=8).collect()
        assert [r["url"] for r in served] == [r["url"] for r in naive], q
        for a, b in zip(served, naive):
            assert a["score"] == pytest.approx(b["score"], rel=1e-9)
    eng.unpersist()


def test_engine_blocked_index_path(spark, tmp_path):
    pages = generate_pages(spark, 120, partitions=4).where("lang = 'en'")
    eng = SearchEngine(spark).build(pages, run_pagerank=False)
    naive = eng.search_bm25("search engine index", k=8).collect()

    path = str(tmp_path / "blocked_idx")
    eng.save_blocked(path)
    blocked = eng.search_bm25_blocked(path, "search engine index", k=8).collect()
    assert [r["url"] for r in blocked] == [r["url"] for r in naive]
    for a, b in zip(blocked, naive):
        import pytest as _pt

        assert a["score"] == _pt.approx(b["score"], rel=1e-9)

    # the scan is partition-pruned: the physical plan carries a
    # term_bucket partition filter
    df = eng.search_bm25_blocked(path, "search", k=3)
    assert df.collect() is not None
    eng.unpersist()
