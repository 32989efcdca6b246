"""Structured Streaming operator tests (file source, availableNow drain)."""

import datetime as dt
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.streaming import events as se


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = []
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    eid = 0
    for user in (1, 2):
        # session A: 3 events 5 min apart; gap 45 min; session B: 2 events
        for m in (0, 5, 10):
            rows.append((eid, base + dt.timedelta(minutes=m), user, "click", 1.0, "{}"))
            eid += 1
        for m in (55, 60):
            rows.append((eid, base + dt.timedelta(minutes=m), user, "view", 2.0, "{}"))
            eid += 1
    df = spark.createDataFrame(rows, se.EVENTS_SCHEMA)
    path = str(tmp_path / "events_in")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    name = "win_" + uuid.uuid4().hex[:8]
    stream = se.stream_events(spark, events_dir)
    # complete mode: append would only emit watermark-finalized windows,
    # and the 1h of test data never pushes the watermark past any window.
    out = se.run_to_memory(
        se.windowed_counts(stream, window="30 minutes", watermark="10 minutes"),
        name, spark, output_mode="complete",
    )
    got = {
        (r["window_start"].minute, r["event_type"]): r["n"] for r in out.collect()
    }
    # minutes 0,5,10 -> window :00; 55 -> window :30(+25); 60 -> window :00+1h
    assert got[(0, "click")] == 6           # 2 users x 3 clicks
    assert got[(30, "view")] == 2           # minute 55, both users
    assert got[(0, "view")] == 2            # minute 60 lands in the 1:00 window

    # batch equivalence on the same input
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bat = {(r["w"]["start"].minute, r["event_type"]): r["n"] for r in batch.collect()}
    assert got == bat


def test_stateful_sessionize(spark, events_dir):
    name = "sess_" + uuid.uuid4().hex[:8]
    stream = se.stream_events(spark, events_dir)
    # use_timeout=False: availableNow drains data and stops; a
    # processing-time timeout would hold the query open for the gap.
    out = se.run_to_memory(se.sessionize(stream, use_timeout=False), name, spark)
    rows = out.collect()
    # the 45-min gap closes one session per user within the batch;
    # the second session stays in state (would emit on timeout).
    assert len(rows) == 2
    for r in rows:
        assert r["n_events"] == 3 and r["sum_value"] == pytest.approx(3.0)
        assert (r["session_end"] - r["session_start"]).total_seconds() == 600


def test_stream_dedup_drops_reappearing_content(spark, tmp_path):
    """Watermarked streaming dedup: byte-identical texts arriving in a
    later batch are dropped; distinct texts pass. availableNow drains
    give deterministic batch boundaries."""
    import shutil

    from pyspark.sql import functions as F

    from google_like_search_engine_spark.streaming.events import stream_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, ts timestamp, text string"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)

    import datetime

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    write_batch([(1, t0, "alpha beta"), (2, t0, "gamma delta"),
                 (3, t0, "alpha beta")])  # in-batch dup

    def drain():
        src = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            stream_dedup(src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = spark.read.parquet(out_dir)
    texts1 = [r["text"] for r in got1.collect()]
    assert sorted(texts1) == ["alpha beta", "gamma delta"]

    # batch 2: a cross-batch duplicate plus a genuinely new doc
    write_batch([(4, t0 + datetime.timedelta(minutes=5), "alpha beta"),
                 (5, t0 + datetime.timedelta(minutes=6), "epsilon zeta")])
    drain()
    texts2 = sorted(r["text"] for r in spark.read.parquet(out_dir).collect())
    assert texts2 == ["alpha beta", "epsilon zeta", "gamma delta"]
