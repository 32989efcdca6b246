"""Dataset curation for training pipelines: reproducible hash-bucket
train/val/test splits and stratified (per-stratum rate) downsampling.

Content-hash bucketing instead of random(): the assignment is a pure
function of the row key, so re-runs, backfills and incremental ingests
agree on every row's split/sample decision without any coordination or
persisted state — the property a 100 TB corpus actually needs (a
seeded random() changes with partitioning and row order). The whole
expression (md5 -> 60-bit hex prefix -> conv -> pmod) is JVM built-ins
inside whole-stage codegen; no Python in the path. Distinct salts keep
the split and sample decisions independent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(col: Column, n_buckets: int = 1000, salt: str = "") -> Column:
    """Deterministic bucket 0..n_buckets-1 from a key column: the
    first 60 bits (15 hex chars — fits a signed long) of md5(key||salt)
    mod n_buckets. The same expression is replayable in any engine
    with md5 + hex parsing, which is what makes it oracle-checkable."""
    key = F.concat(col.cast("string"), F.lit(salt))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def split_assign(
    df: DataFrame,
    key_col: str,
    train: int = 800,
    val: int = 100,
    n_buckets: int = 1000,
    out: str = "split",
) -> Column | DataFrame:
    """Adds ``out`` in {'train','val','test'} with train/val/
    (rest) proportions of ``train``/``val`` per ``n_buckets``."""
    b = hash_bucket(F.col(key_col), n_buckets, salt=":split")
    return df.withColumn(
        out,
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test"),
    )


def stratified_keep(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict,
    default_rate: int,
    n_buckets: int = 1000,
    out: str = "keep",
) -> DataFrame:
    """Adds boolean ``out``: keep the row iff its sample bucket falls
    under its stratum's rate (per ``n_buckets``) — deterministic
    stratified downsampling (e.g. thin the head language to rebalance
    a corpus) that never needs a shuffle or a count first."""
    b = hash_bucket(F.col(key_col), n_buckets, salt=":sample")
    rate = reduce(
        lambda acc, kv: F.when(F.col(strata_col) == kv[0], F.lit(kv[1])).otherwise(acc),
        sorted(rates.items()),
        F.lit(default_rate),
    )
    return df.withColumn(out, b < rate)
