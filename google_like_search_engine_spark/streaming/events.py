"""Structured Streaming operators over the events stream.

The reference has no streaming engine (its crawler loop is batch
iteration — SURVEY.md section 2.1 note), so this module is pure
additive Spark surface: the same event analytics the batch catalog
exposes (hourly windows, sessionization) in incremental form with
watermarked late-data handling.

- ``stream_events``: file-source reader (schema-pinned, no inference).
- ``windowed_counts``: tumbling-window counts/sums with a watermark;
  append mode emits only finalized windows.
- ``sessionize``: custom stateful operator via applyInPandasWithState —
  per-user session accumulation with a 30-min inactivity gap and
  timeout-based session closure (the engine's "custom stateful
  streaming operator" slot).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


GAP_SECONDS = 1800


def _session_fn(key, pdfs, state: GroupState):
    """Stateful per-user sessionizer: emits a session row whenever a
    30-minute inactivity gap closes one (or the state times out)."""
    gap_s = GAP_SECONDS
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [
                (
                    user_id,
                    _dt.datetime.utcfromtimestamp(start),
                    _dt.datetime.utcfromtimestamp(last),
                    n,
                    total,
                )
            ],
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )
        return

    rows = []
    events = []
    for pdf in pdfs:
        for ts, value in zip(pdf["ts"], pdf["value"]):
            events.append((ts.timestamp(), float(value)))
    events.sort()
    if state.exists:
        start, last, n, total = state.get
    else:
        start = last = None
        n, total = 0, 0.0
    for ts, value in events:
        if last is not None and ts - last > gap_s:
            rows.append(
                (
                    user_id,
                    _dt.datetime.utcfromtimestamp(start),
                    _dt.datetime.utcfromtimestamp(last),
                    n,
                    total,
                )
            )
            start, n, total = ts, 0, 0.0
        if start is None:
            start = ts
        last = ts
        n += 1
        total += value
    state.update((int(start), int(last), int(n), float(total)))
    try:
        state.setTimeoutDuration(gap_s * 1000)
    except Exception:
        pass  # NoTimeout mode: trailing session stays in state until more data
    if rows:
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )


def sessionize(
    events: DataFrame, watermark: str = "2 hours", use_timeout: bool = True
) -> DataFrame:
    """Custom stateful streaming sessionization (applyInPandasWithState).

    ``use_timeout=True`` (continuous operation): trailing sessions flush
    via processing-time timeout after the inactivity gap. For bounded
    drains (trigger=availableNow, as in tests) pass ``use_timeout=False``
    — a processing-time timeout would keep the query alive for the full
    wall-clock gap; without it, trailing sessions simply remain in state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, spark: SparkSession,
                  output_mode: str = "append"):
    """Drain a stream with availableNow into an in-memory table (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_dedup(
    docs: DataFrame,
    key_cols: list | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key
    within the watermark horizon, via ``dropDuplicatesWithinWatermark``
    — the operator whose state Spark actually evicts once the watermark
    passes a key's event time. (Plain ``dropDuplicates`` only bounds
    state when the event-time column is PART of the dedup key; with a
    content-hash key the watermark is inert and state grows with every
    distinct document ever seen — correct output, unbounded memory at
    ingest scale.) ``key_cols`` defaults to a content hash of the
    ``text`` column — the streaming twin of
    analytics/dedup.exact_duplicates: a re-crawled byte-identical page
    within the horizon never re-enters the downstream index build."""
    keyed = docs
    if key_cols is None:
        keyed = docs.withColumn(
            "content_hash", F.md5(F.encode(F.col("text"), "utf-8"))
        )
        key_cols = ["content_hash"]
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
