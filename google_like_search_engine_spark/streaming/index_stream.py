"""Incremental index build over a stream of pages.

The reference's index is rebuilt by re-running the Indexer job with
read-modify-write appends into pt-index (Indexer.java:132-147). The
streaming-native equivalent: new page files land in a directory,
Structured Streaming picks them up, and ``foreachBatch`` appends their
postings to the index store. Checkpointing makes the build resumable
(exactly-once per input file via the file-source + checkpoint log) —
the streaming twin of plans/lineage.checkpointed_index_build.

Append semantics match the reference: postings for re-crawled docs
accumulate (the df > N idf anomaly documented in SURVEY.md section 2.2
note 6); compaction dedupes by (term, doc_id) keeping the newest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..indexer import build_postings
from ..sources.formats import PAGES_READ_SCHEMA


def stream_pages(spark: SparkSession, path: str, schema=None) -> DataFrame:
    return spark.readStream.schema(schema or PAGES_READ_SCHEMA).parquet(path)


def incremental_index(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    postings_fn=None,
    processing_interval: float | None = None,
):
    """Start the incremental build; returns the StreamingQuery.

    Each micro-batch runs the same partition-local posting construction
    as the batch indexer and appends to ``out_dir`` (parquet; an
    Iceberg table on a real cluster makes each batch an atomic commit).

    ``postings_fn``: batch DataFrame -> postings relation carrying at
    least (term, doc_id); defaults to the reference indexer kernels
    over a pages batch. The driver-gate entry passes the plain
    space-tokenized form so the streamed+compacted index is
    SQL-oracle-checkable.

    ``processing_interval``: None (default) drains what exists and
    stops (availableNow); a number keeps the query live, folding in
    newly landed files every that-many seconds.
    """
    from ..indexer import docs_from_pages

    if postings_fn is None:
        def postings_fn(batch_df: DataFrame) -> DataFrame:
            return build_postings(docs_from_pages(batch_df))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            postings_fn(batch_df)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = pages_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{processing_interval} seconds")
    return writer.start()


def compact_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest posting per (term, doc_id) — collapses re-crawl appends."""
    raw = spark.read.parquet(out_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("term", "doc_id").orderBy(F.desc("_batch_id"))
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )
