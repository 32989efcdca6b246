"""DataFrame equivalents of the reference dataflow operator inventory.

The reference's "Flame" API (SURVEY.md section 2.1; /root/reference
src/cis5550/flame/FlameRDD.java, FlamePairRDD.java) is an eager,
fully-materialized RDD-of-strings model where every operator is a
distributed scan + per-row lambda + shuffle-by-write. On Spark each of
these is a *lazy* DataFrame transformation that Catalyst fuses and
optimizes — the point of the rebuild is that none of these need custom
execution machinery.

Conventions: an "RDD" is a single-column DataFrame ``value: string``;
a "PairRDD" is ``k: string, v: string`` (the reference's key->values
row encoding is exactly a hash exchange, deferred here to the next wide
operator). Custom lambdas run as Arrow-batched pandas transforms via
``map_partitions``, never per-row Python UDFs.

Reference file:line citations are given per function for parity checks.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def parallelize(spark: SparkSession, items: list) -> DataFrame:
    """FlameContext.parallelize (FlameContextImpl.java:42-49)."""
    return spark.createDataFrame([(s,) for s in items], "value string")


def from_table(df: DataFrame, expr) -> DataFrame:
    """FlameContext.fromTable (FlameContextImpl.java:135-140): projection
    with null-drop. ``expr`` is a Column; null results drop the row."""
    return df.select(expr.alias("value")).where(F.col("value").isNotNull())


def flat_map(df: DataFrame, array_expr) -> DataFrame:
    """FlameRDD.flatMap (flame/Worker.java:36-75): per-element expansion.
    ``array_expr`` is a Column producing array<string>; explode drops
    null/empty arrays like the reference drops empty iterables."""
    return df.select(F.explode(array_expr).alias("value"))


def map_to_pair(df: DataFrame, k_expr, v_expr) -> DataFrame:
    """FlameRDD.mapToPair (flame/Worker.java:191-230). The reference
    eagerly routes by key; Spark defers the exchange to the next wide op."""
    return df.select(k_expr.alias("k"), v_expr.alias("v"))


def flat_map_to_pair(df: DataFrame, pairs_array_expr) -> DataFrame:
    """FlameRDD.flatMapToPair / FlamePairRDD.flatMapToPair
    (flame/Worker.java:77-133, 439-505): per-row expansion into (k, v)
    pairs. ``pairs_array_expr`` is a Column producing
    array<struct<k string, v string>> — explode-over-structs, the
    pattern the indexer/wordcount pipelines inline
    (catalog_text.py wordcount, indexer.build_postings).

    NOTE the reference's PairRDD variant silently DROPS pairs whose key
    contains a space (Worker.java row-key encoding); that bug is
    intentionally NOT reproduced — SURVEY section 2.1 adjudicates it as
    an encoding artifact, not semantics."""
    e = F.explode(pairs_array_expr).alias("p")
    return df.select(e).select(F.col("p.k").alias("k"), F.col("p.v").alias("v"))


def distinct(df: DataFrame) -> DataFrame:
    """FlameRDD.distinct (flame/Worker.java:507-537): value-as-row-key
    dedupe == hash-shuffle distinct."""
    return df.distinct()


def fold(df: DataFrame, agg_expr) -> DataFrame:
    """FlameRDD.fold (flame/Worker.java:595-633): worker partials +
    coordinator final == Spark partial/final aggregation. Both reference
    uses are commutative (sum, max)."""
    return df.agg(agg_expr)


def fold_by_key(pair_df: DataFrame, agg_expr) -> DataFrame:
    """FlamePairRDD.foldByKey (flame/Worker.java:232-266). The
    reference's sequential per-key fold contract is only ever used with
    commutative folds (sum, set-union), so groupBy aggregation is exact."""
    return pair_df.groupBy("k").agg(agg_expr)


def intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """FlameRDD.intersection (flame/Worker.java:268-320): output deduped."""
    return a.intersect(b)


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """FlameRDD.sample (flame/Worker.java:322-361). The reference uses
    Math.random(); we add a seed for determinism (allowed — the
    reference test only checks the count within ±10%)."""
    return df.sample(fraction=fraction, seed=seed)


def group_by(df: DataFrame, key_expr) -> DataFrame:
    """FlameRDD.groupBy (flame/Worker.java:363-437): (k, comma-joined
    values). Values sorted for determinism (reference column order is
    random; its test compares as sets)."""
    return (
        df.groupBy(key_expr.alias("k"))
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("value"))).alias("v"))
    )


def join_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """FlamePairRDD.join (flame/Worker.java:539-593): inner equi-join,
    result value ``vA + "," + vB`` with per-key cross product."""
    bb = b.withColumnRenamed("v", "_vb")
    return a.join(bb, "k", "inner").select(
        "k", F.concat_ws(",", F.col("v"), F.col("_vb")).alias("v")
    )


def cogroup(a: DataFrame, b: DataFrame) -> DataFrame:
    """FlamePairRDD.cogroup (flame/Worker.java:710-807): full-outer
    (k, "[v1,..],[w1,..]") including one-sided keys. Lists sorted for
    determinism; the reference checker is order-insensitive."""
    ga = a.groupBy("k").agg(F.array_sort(F.collect_list("v")).alias("_va"))
    gb = b.groupBy("k").agg(F.array_sort(F.collect_list("v")).alias("_vb"))
    return ga.join(gb, "k", "full_outer").select(
        "k",
        F.concat(
            F.lit("["),
            F.concat_ws(",", F.coalesce(F.col("_va"), F.array())),
            F.lit("],["),
            F.concat_ws(",", F.coalesce(F.col("_vb"), F.array())),
            F.lit("]"),
        ).alias("v"),
    )


def map_partitions(
    df: DataFrame, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]], schema: str
) -> DataFrame:
    """FlameRDD.mapPartitions (flame/Worker.java:669-708) — the
    vectorized-UDF workhorse: one Arrow stream per partition instead of
    the reference's materialize-whole-partition-into-a-list."""
    return df.mapInPandas(fn, schema=schema)
