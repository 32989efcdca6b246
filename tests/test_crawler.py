"""Frontier-BFS crawl job: convergence + checkpoint/resume semantics
(the reference's Crawler.java frontier loop with pt-url persistence)."""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.corpus import generate_pages, url_for
from google_like_search_engine_spark.crawler import _last_complete_round, crawl
from google_like_search_engine_spark.kernels.urls import extract_links

N_PAGES = 150


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N_PAGES).persist()


@pytest.fixture(scope="module")
def expected_bfs(pages):
    """Driver-side BFS over the same kernels = ground truth reachable set."""
    rows = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    seed = url_for(0)
    depth = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for u in frontier:
            text = rows.get(u)
            if text is None:
                continue
            for link in extract_links(text, u):
                if link not in depth:
                    depth[link] = depth[u] + 1
                    nxt.append(link)
        frontier = nxt
    return depth


def test_crawl_converges_to_reachable_set(spark, pages, expected_bfs, tmp_path):
    visited = crawl(spark, pages, [url_for(0)], str(tmp_path / "state"))
    got = {r["url"]: (r["depth"], r["status"]) for r in visited.collect()}
    assert set(got) == set(expected_bfs)
    for u, d in expected_bfs.items():
        assert got[u][0] == d, u
    assert all(s == "ok" for _, s in got.values())  # all targets exist


def test_crawl_resume_after_kill(spark, pages, expected_bfs, tmp_path):
    state = str(tmp_path / "state2")
    partial = crawl(spark, pages, [url_for(0)], state, max_rounds=2)
    assert partial.count() < len(expected_bfs)  # genuinely interrupted
    assert _last_complete_round(spark, state) == 1

    resumed = crawl(spark, pages, [url_for(0)], state)
    got = {r["url"]: r["depth"] for r in resumed.collect()}
    assert got == expected_bfs

    # converged: re-invoking is a no-op (no new rounds are written)
    last = _last_complete_round(spark, state)
    again = crawl(spark, pages, [url_for(0)], state)
    assert _last_complete_round(spark, state) == last
    assert again.count() == len(expected_bfs)


def test_crawl_per_host_cap_still_converges(spark, pages, expected_bfs, tmp_path):
    visited = crawl(
        spark, pages, [url_for(0)], str(tmp_path / "state3"),
        max_rounds=500, max_per_host=3,
    )
    # politeness defers fetches (depths may grow) but never loses urls
    assert {r["url"] for r in visited.collect()} == set(expected_bfs)
