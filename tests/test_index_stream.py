"""Incremental streaming index build: two waves of pages == batch build."""

from pyspark.sql import functions as F

from google_like_search_engine_spark.corpus import generate_pages
from google_like_search_engine_spark.indexer import build_postings, docs_from_pages
from google_like_search_engine_spark.streaming.index_stream import (
    compact_index,
    incremental_index,
    stream_pages,
)


def test_incremental_index_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "index_out")
    ckpt = str(tmp_path / "ckpt")

    all_pages = generate_pages(spark, 80, partitions=2).cache()
    wave1 = all_pages.where(F.col("warc_ts") < "2024-01-01 00:00:40")
    wave2 = all_pages.where(F.col("warc_ts") >= "2024-01-01 00:00:40")

    # wave 1 lands, stream drains it
    wave1.write.mode("append").parquet(pages_dir)
    q = incremental_index(stream_pages(spark, pages_dir), out_dir, ckpt)
    q.awaitTermination()

    mid = compact_index(spark, out_dir)
    n_mid = mid.count()
    assert n_mid > 0

    # wave 2 lands, a NEW availableNow drain picks up only the new files
    wave2.write.mode("append").parquet(pages_dir)
    q2 = incremental_index(stream_pages(spark, pages_dir), out_dir, ckpt)
    q2.awaitTermination()

    final = compact_index(spark, out_dir)
    batch = build_postings(docs_from_pages(all_pages))
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in final.collect()
    }
    expected = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in batch.collect()
    }
    assert got == expected
    assert len(got) > n_mid
    all_pages.unpersist()


def test_recrawl_appends_then_compaction_collapses(spark, tmp_path):
    """Re-crawled docs ACCUMULATE in the appended store (the reference's
    read-modify-write append, Indexer.java:132-147); compaction keeps
    the newest per (term, doc_id) — the driver-gate streaming_compaction
    entry relies on exactly this."""
    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "index_out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 30, partitions=2).cache()
    # batch 0: all pages; batch 1: the SAME pages re-crawled unchanged
    pages.write.mode("append").parquet(pages_dir)
    incremental_index(stream_pages(spark, pages_dir), out_dir, ckpt).awaitTermination()
    pages.write.mode("append").parquet(pages_dir)
    incremental_index(stream_pages(spark, pages_dir), out_dir, ckpt).awaitTermination()

    raw = spark.read.parquet(out_dir)
    assert {r["_batch_id"] for r in raw.select("_batch_id").distinct().collect()} == {0, 1}
    n_raw = raw.count()
    compacted = compact_index(spark, out_dir)
    n_comp = compacted.count()
    assert n_raw == 2 * n_comp  # every posting duplicated pre-compaction
    batch = build_postings(docs_from_pages(pages))
    assert n_comp == batch.count()
    pages.unpersist()


def test_promote_stream_index_serves_like_batch_build(spark, tmp_path):
    """Streaming -> serving hand-off: drain a corpus through the
    incremental store, promote it to a blocked index, and get the
    SAME BM25 and phrase answers as a batch-built blocked index over
    the same pages; a re-crawl drain before promotion updates docs
    (newest batch wins)."""
    from google_like_search_engine_spark.engine import SearchEngine

    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 60, partitions=2).cache()
    pages.write.mode("append").parquet(pages_dir)
    incremental_index(
        stream_pages(spark, pages_dir), out_dir, ckpt
    ).awaitTermination()
    # re-crawl the same pages: appends duplicate batches, promotion
    # must collapse to one version per doc
    pages.write.mode("append").parquet(pages_dir)
    incremental_index(
        stream_pages(spark, pages_dir), out_dir, ckpt
    ).awaitTermination()

    eng = SearchEngine(spark)
    promoted_p = str(tmp_path / "promoted")
    eng.promote_stream_index(out_dir, promoted_p)

    batch_p = str(tmp_path / "batch")
    SearchEngine(spark).build(pages, run_pagerank=False).save_blocked(batch_p)

    q = "apple fig grape"
    want = [(r["url"], round(r["score"], 6)) for r in
            eng.search_bm25_blocked(batch_p, q, k=8).collect()]
    got = [(r["url"], round(r["score"], 6)) for r in
           eng.search_bm25_blocked(promoted_p, q, k=8).collect()]
    assert got == want and want

    # positions survive: phrase answers match too
    terms = pages.limit(1).collect()[0]["text"].split()[:2]
    ph = " ".join(terms)
    want_ph = sorted((r["url"], r["n_occurrences"]) for r in
                     eng.search_phrase_blocked(batch_p, ph, k=100).collect())
    got_ph = sorted((r["url"], r["n_occurrences"]) for r in
                    eng.search_phrase_blocked(promoted_p, ph, k=100).collect())
    assert got_ph == want_ph
    pages.unpersist()
