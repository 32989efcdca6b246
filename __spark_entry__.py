"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in google_like_search_engine_spark/ (registry.py
maps names to Spark callables + oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from google_like_search_engine_spark.registry import (  # noqa: E402
    NO_ORACLE_QUERIES,
    QUERIES,
    QUERY_ORDER,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 search over the
    documents table (index build + scoring in one lazy plan)."""
    from google_like_search_engine_spark.catalog_text import bm25_search

    return bm25_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 —
    exactly 50, ordered so the headline + rows-only entries sit well
    inside the driver's 50-row gate."""
    return {
        name: (QUERIES[name][0] if name in QUERIES else NO_ORACLE_QUERIES[name])
        for name in QUERY_ORDER
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-checkable query."""
    return {name: QUERIES[name][1] for name in QUERY_ORDER if name in QUERIES}
