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

def pack_chunks(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Concat-and-chunk sequence packing: the position every document's
    tokens land at when the corpus is concatenated in ``key_col`` order
    and cut into fixed ``budget``-token training chunks — the packing
    step an LLM pretraining pipeline runs so no chunk is padded.

    Returns (key, n_tokens, start_offset, chunk_id, n_chunks): the
    document's global token offset, the chunk its first token falls in
    (start_offset div budget) and how many chunks it spans. Pure
    integers, deterministic in key order.

    The global exclusive prefix sum is the same two-phase shape as
    compression.assign_doc_indexes (a bare ordered window would funnel
    the whole corpus through one reducer): range-partition + sort by
    key, pin that partitioning, one cheap per-partition token-sum job,
    broadcast the cumulative bases, then an Arrow pass adds base +
    partition-local running sum. Per-executor state is O(1); the only
    driver data is one row per partition.
    """
    from typing import Iterator

    import pandas as pd

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
    ids = (
        df.select(F.col(key_col).alias("k"), n.cast("long").alias("n_tokens"))
        .repartitionByRange(nparts, "k")
        .sortWithinPartitions("k")
        .persist()  # pins the range partitioning across the two passes
    )
    key_type = ids.schema["k"].dataType.simpleString()
    sums = (
        ids.select(F.spark_partition_id().alias("pid"), "n_tokens")
        .groupBy("pid")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    bases = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["pid"]):
        bases[row["pid"]] = acc
        acc += row["s"]
    bbase = spark.sparkContext.broadcast(bases)

    def offsets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        run = bbase.value.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            ntok = pdf["n_tokens"].to_numpy()
            start = ntok.cumsum() - ntok + run
            run += int(ntok.sum())
            yield pd.DataFrame(
                {"k": pdf["k"], "n_tokens": ntok, "start_offset": start}
            )

    placed = ids.mapInPandas(
        offsets, schema=f"k {key_type}, n_tokens long, start_offset long"
    ).localCheckpoint(eager=True)
    ids.unpersist()
    first_chunk = F.expr(f"start_offset DIV {budget}")
    last_chunk = F.expr(f"(start_offset + n_tokens - 1) DIV {budget}")
    return placed.select(
        F.col("k").alias(key_col),
        "n_tokens",
        "start_offset",
        first_chunk.alias("chunk_id"),
        F.when(F.col("n_tokens") == 0, F.lit(1).cast("long"))
        .otherwise(last_chunk - first_chunk + 1)
        .alias("n_chunks"),
    )


def bigram_lm_nll(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model score: train an add-one
    (Laplace) bigram LM on the corpus itself and score every document
    by its negative log likelihood and perplexity — the CCNet-style
    perplexity filter web-corpus pipelines run to drop incoherent or
    boilerplate text (a doc whose bigrams are rare under the corpus LM
    scores high-perplexity).

    Returns (key, n_bigrams, nll, ppl) for every doc with >= 2 tokens:
    nll = sum over bigram occurrences of round(-ln(p), 4) with
    p = (c(w1,w2)+1)/(c(w1,.)+V), rounded to 4 (each term is a 1e-4
    multiple so the sum is grid-exact and engine-order-independent);
    ppl = round(exp(nll/n_bigrams), 2).

    Scale: everything is JVM built-ins (split/slice/arrays_zip/explode,
    two hash aggregations, two shuffle joins on the bigram keys); the
    context-count and vocab relations are vocabulary-sized so Catalyst
    broadcasts them under AQE. The bigram relation is derived twice
    (counts + scoring) straight off the columnar scan rather than
    cached — re-scanning parquet beats caching row-format at this
    width. No Python in the path.
    """
    a = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    toks = df.select(F.col(key_col).alias("k"), a.alias("a"))
    # vocabulary size as a broadcast 1-row relation (the SQL twin's
    # CROSS JOIN v) — the whole expression stays lazy; composing the
    # relation never runs a corpus scan
    vocab = (
        toks.select(F.explode("a").alias("w"))
        .agg(F.countDistinct("w").alias("__v"))
    )
    n = F.size("a")
    big = (
        toks.where(n >= 2)
        .select(
            "k",
            F.explode(
                F.arrays_zip(
                    F.slice("a", 1, n - 1).alias("w1"),
                    F.slice("a", 2, n - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("k", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n_ctx"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(cc, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "k",
            F.round(
                -F.log((F.col("c") + 1.0) / (F.col("n_ctx") + F.col("__v"))), 4
            ).alias("nll_r"),
        )
    )
    return scored.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("nll_r"), 4).alias("nll"),
        F.round(F.exp(F.sum("nll_r") / F.count(F.lit(1))), 2).alias("ppl"),
    ).withColumnRenamed("k", key_col)
