"""The curate -> split -> pack training-data pipeline composition
(scripts/prepare_training_data.py runs exactly these steps; the CLI
itself is smoke-tested manually like the other spark-submit entries).
"""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark import catalog_text as t
from google_like_search_engine_spark.analytics.curation import (
    pack_chunks,
    split_assign,
)
from google_like_search_engine_spark.catalog import load

BUDGET = 128


@pytest.fixture(scope="module")
def prepared(spark, sf_dir):
    audit = t.curate_corpus(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    kept = docs.join(
        audit.where("keep").select("doc_id"), "doc_id", "left_semi"
    )
    kept = split_assign(kept, "doc_id").persist()
    kept.count()
    yield kept
    kept.unpersist()


def test_splits_partition_the_kept_corpus(prepared):
    counts = {
        r["split"]: r["n"]
        for r in prepared.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == prepared.count()
    assert counts.get("train", 0) > counts.get("val", 0)
    # hash-bucket assignment is a pure function of doc_id: re-running
    # produces the identical assignment
    again = split_assign(prepared.drop("split"), "doc_id")
    diff = (
        prepared.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
    )
    assert diff == 0


def test_packing_offsets_are_contiguous_per_split(prepared):
    for split in ("train", "val", "test"):
        part = prepared.where(F.col("split") == split)
        placed = pack_chunks(part, "doc_id", "text", budget=BUDGET).collect()
        placed.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in placed:
            assert r["start_offset"] == expect, (split, r["doc_id"])
            assert r["chunk_id"] == r["start_offset"] // BUDGET
            last = r["start_offset"] + r["n_tokens"] - 1
            assert r["n_chunks"] == last // BUDGET - r["chunk_id"] + 1
            expect += r["n_tokens"]


def test_packing_respects_budget_chunk_count(prepared):
    part = prepared.where(F.col("split") == "train")
    placed = pack_chunks(part, "doc_id", "text", budget=BUDGET)
    total = placed.agg(F.sum("n_tokens")).collect()[0][0] or 0
    max_chunk = placed.agg(
        F.max(F.col("chunk_id") + F.col("n_chunks") - 1)
    ).collect()[0][0]
    if total:
        assert max_chunk == (total - 1) // BUDGET
