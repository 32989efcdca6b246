"""Corpus generator invariants + physical-plan quality checks."""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark import catalog as c
from google_like_search_engine_spark import catalog_text as t
from google_like_search_engine_spark.corpus import (
    fixture_dictionary,
    generate_pages,
    make_page,
)
from google_like_search_engine_spark.kernels.textclean import clean_html


def test_corpus_deterministic_and_invariant(spark):
    pages = generate_pages(spark, 200, partitions=4).collect()
    assert len(pages) == 200
    by_url = {r["url"]: r for r in pages}
    assert len(by_url) == 200

    dictionary = fixture_dictionary()
    n_en = 0
    for r in pages:
        # per-row invariant: stored text == cleaning chain over html
        text, links = clean_html(
            bytes(r["html"]).decode("utf-8"), dictionary, base_url=r["url"]
        )
        assert text == r["text"], r["url"]
        if r["lang"] == "en":
            n_en += 1
            assert r["text"] is not None
        else:
            assert r["text"] is None
    assert 180 <= n_en < 200  # ~95% en

    # distributed generation == local generation (partition independence)
    vocab_row = make_page(7, 200, *_vocab_dict(), seed=42)
    assert by_url[vocab_row[0]]["text"] == vocab_row[3]


def _vocab_dict():
    from google_like_search_engine_spark.corpus import (
        fixture_dictionary,
        fixture_vocabulary,
    )

    return fixture_vocabulary(), fixture_dictionary()


def test_corpus_has_links_and_sinks(spark):
    pages = generate_pages(spark, 100, partitions=2)
    en = pages.where(F.col("lang") == "en")
    with_links = en.where(F.col("text").contains("<a href=")).count()
    total = en.count()
    assert 0 < with_links < total  # sinks exist, links exist


# --- physical plan quality -------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = c.flame_filter(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan, plan


def test_column_pruning(spark, sf_dir):
    df = c.flame_filter(spark, sf_dir)
    plan = _plan(df)
    # scan must read only the 3 referenced columns, not the whole table
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderpriority:string>" in plan or (
        "o_orderdate" not in plan.split("ReadSchema")[1].split("\n")[0]
    ), plan


def test_broadcast_join_for_small_dims(spark, sf_dir):
    plan = _plan(c.tpch_q5(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_tfidf_terms_broadcast(spark, sf_dir):
    plan = _plan(t.tfidf_search(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_wholestage_codegen_in_aggregation(spark, sf_dir):
    df = c.tpch_q1(spark, sf_dir)
    df.collect()  # AQE: codegen spans appear only in the final plan
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string;
    # both the partial and final aggregates must be inside codegen.
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan, plan
    assert "partial_sum" in plan, plan  # map-side combine present


def test_salted_join_equals_plain_join_and_spreads_hot_key(spark):
    """A 95%-hot-key fact salted-joined to its dimension returns
    exactly the plain join's rows, and the hot key's rows really do
    spread across all salt sub-keys (the whole point: no single
    shuffle task owns the hot key)."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.operators.skew import (
        _SALT,
        salted_join,
    )

    n = 2000
    fact = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    dim = fact.select("k").distinct().withColumn("attr", F.length("k"))

    got = sorted(
        (r["k"], r["v"], r["attr"])
        for r in salted_join(fact, dim, "k", n_salts=8).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["attr"]) for r in fact.join(dim, "k").collect()
    )
    assert got == want and len(got) == n

    # the spread itself: the hot key occupies every salt, and no salt
    # holds more than ~2x its fair share of the hot rows
    spread = (
        fact.where(F.col("k") == "hot")
        .withColumn(
            _SALT,
            F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int"),
        )
        .groupBy(_SALT)
        .count()
        .collect()
    )
    hot_n = n - n // 20
    assert len(spread) == 8
    assert max(r["count"] for r in spread) < 2 * hot_n / 8


def test_salted_join_rejects_right_preserving_types(spark):
    """Right/full joins over the replicated right side would emit
    unmatched right rows once per salt — refused loudly."""
    import pytest as _pt

    from google_like_search_engine_spark.operators.skew import salted_join

    df = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with _pt.raises(ValueError):
            salted_join(df, df, "k", how=how)


def test_salted_join_refuses_salt_column_collision(spark):
    import pytest as _pt

    from google_like_search_engine_spark.operators.skew import salted_join

    df = spark.range(3).withColumnRenamed("id", "k")
    bad = df.withColumn("__salt", df["k"])
    with _pt.raises(ValueError):
        salted_join(bad, df, "k")
    with _pt.raises(ValueError):
        salted_join(df, bad, "k")
