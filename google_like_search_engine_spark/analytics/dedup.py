"""Deduplication operators over a (id, text) DataFrame.

Library forms of the dedup suite (catalog_text.py holds the
oracle-checked SQL-parallel variants). All hashing is deterministic
(md5 / xxhash64-free of JVM seeds), so results are reproducible across
cluster sizes and retries — a requirement for resumable 100 TB builds.

Scale design:
- exact dedup: one hash-groupBy, AQE-skew-safe.
- MinHash+LSH: signatures via one Arrow-batched pandas UDF pass
  (partition-local), then a band-key exchange; candidate verification
  joins only within buckets, never all-pairs.
- SimHash: 64-bit signature per doc in the same UDF pass; near-dup
  candidates via 4x16-bit band buckets (Hamming distance <= 3 guarantee
  by pigeonhole over 4 bands), verified by exact Hamming popcount.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def exact_duplicates(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, canonical)."""
    return (
        df.groupBy(F.md5(F.encode(text_col, "utf-8")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("canonical"))
        .where(F.col("n_dups") > 1)
    )


def _md5_64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _shingles(text: str, k: int) -> set:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signatures(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    with_shingle_hashes: bool = False,
) -> DataFrame:
    """(id, sig array<long>[, shset array<long>]) — one partition-local
    Arrow pass. ``with_shingle_hashes`` additionally emits the doc's
    distinct 63-bit shingle hashes, a compact set representation the
    verify step intersects JVM-side instead of re-shipping full texts
    (shset is ~8 bytes/token vs the text's full bytes twice)."""

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out, shsets = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingles(text or "", shingle_k)
                if not sh:
                    sig = [0] * num_hashes
                else:
                    sig = [
                        min(_md5_64(f"{seed}:{s}") for s in sh) & 0x7FFFFFFFFFFFFFFF
                        for seed in range(num_hashes)
                    ]
                ids.append(i)
                out.append(sig)
                if with_shingle_hashes:
                    shsets.append(
                        sorted(_md5_64(s) & 0x7FFFFFFFFFFFFFFF for s in sh)
                    )
            data = {"id": ids, "sig": out}
            if with_shingle_hashes:
                data["shset"] = shsets
            yield pd.DataFrame(data)

    schema = "id long, sig array<long>"
    if with_shingle_hashes:
        schema += ", shset array<long>"
    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        sigs, schema=schema
    )


def minhash_lsh_pairs(
    signatures: DataFrame, bands: int = 4, max_bucket_size: int = 1000
) -> DataFrame:
    """Candidate near-dup pairs from banded signatures: (id_a, id_b).

    ``max_bucket_size`` bounds the within-bucket self-join: a band
    bucket of c docs emits c^2/2 pairs, and near-identical clusters
    (exactly what dedup targets) put all members in one bucket — at
    100 TB a single hot bucket would be quadratic. Oversized buckets
    are skipped here (their members still pair via their other,
    better-distributed bands); at cluster scale route them to an
    explicit cluster-collapse pass (they ARE a duplicate cluster)."""
    n = bands
    rows_per = F.size("sig") / n

    def _bkey(b):
        return F.md5(
            F.concat_ws(
                ",",
                F.slice(
                    F.col("sig"),
                    (rows_per * b + 1).cast("int"),
                    rows_per.cast("int"),
                ).cast("array<string>"),
            ).cast("binary")
        )

    band_structs = F.array(
        *[F.struct(F.lit(b).alias("band"), _bkey(b).alias("bkey")) for b in range(n)]
    )
    all_bands = signatures.select("id", F.explode(band_structs).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    bucket_ok = (
        all_bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(F.col("bucket_n") <= max_bucket_size)
        .select("band", "bkey")
    )
    all_bands = all_bands.join(bucket_ok, ["band", "bkey"], "left_semi")
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs verified by exact shingle Jaccard:
    (id_a, id_b, jaccard). LSH prunes the pair space; verification
    intersects the docs' 63-bit shingle-hash sets (computed once in the
    signature pass) JVM-side — candidates never re-ship full texts, and
    set Jaccard over hashes equals set Jaccard over shingles (md5-64
    collisions aside)."""
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k, with_shingle_hashes=True
    ).persist()
    cands = minhash_lsh_pairs(sigs.select("id", "sig"), bands, max_bucket_size)
    sets = sigs.select("id", "shset")
    pa = cands.join(sets.withColumnsRenamed({"id": "id_a", "shset": "set_a"}), "id_a")
    both = pa.join(sets.withColumnsRenamed({"id": "id_b", "shset": "set_b"}), "id_b")
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    out = both.select(
        "id_a",
        "id_b",
        F.when(union == 0, F.lit(1.0)).otherwise(inter / union).alias("jaccard"),
    ).where(F.col("jaccard") >= jaccard_threshold)
    # pairs are small: pin them executor-side so the persisted signature
    # relation can be released here instead of leaking across calls
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def simhash_signatures(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: (id, simhash long). Weighted by tf."""

    def sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                acc = [0] * 64
                toks = [t for t in (text or "").split(" ") if t]
                tf: dict = {}
                for tkn in toks:
                    tf[tkn] = tf.get(tkn, 0) + 1
                for tkn, w in tf.items():
                    h = _md5_64(tkn)
                    for bit in range(64):
                        acc[bit] += w if (h >> bit) & 1 else -w
                sig = 0
                for bit in range(64):
                    if acc[bit] > 0:
                        sig |= 1 << bit
                ids.append(i)
                out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame({"id": ids, "simhash": out})

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        sim, schema="id long, simhash long"
    )


def simhash_near_pairs(
    signatures: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Bucket by disjoint bands of the 64-bit signature (pigeonhole: a
    pair within Hamming distance d agrees exactly on >= 1 of B bands
    whenever d < B), join within buckets, verify with popcount — never
    all-pairs. Full recall therefore requires B >= max_hamming + 1;
    by default we pick the smallest power-of-two band count that
    divides 64 and satisfies that bound. Narrow bands (high B) collide
    heavily at scale — prefer max_hamming <= 3 (4x16-bit bands) for
    100 TB corpora and treat larger radii as a recall/SLA trade-off."""
    if n_bands is None:
        n_bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b >= max_hamming + 1)
    if 64 % n_bands != 0:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"{n_bands} bands only guarantee recall for Hamming <= {n_bands - 1}; "
            f"requested max_hamming={max_hamming}"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    # signatures come from an Arrow pass — persist so the band derivation
    # and both self-join sides don't re-run it; bands via one explode,
    # not an n_bands-branch union (each branch re-evaluates its input)
    signatures = signatures.persist()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", width * b)
                .bitwiseAND(F.lit(mask))
                .alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    bands = signatures.select(
        "id", "simhash", F.explode(band_structs).alias("bb")
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a, b_ = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = cands.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
    # pin the (small) verified pairs, release the persisted signatures
    out = out.localCheckpoint(eager=True)
    signatures.unpersist()
    return out


def embedding_near_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.4,
    band_bits: int = 8,
    bucket_cap: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-quantized band
    buckets generate candidates, exact cosine verifies — never
    all-pairs.

    Each band is ``band_bits`` consecutive dimensions quantized to
    their sign bits; two vectors whose angle is small agree on sign
    bands with high probability (the deterministic, SQL-mirrorable
    cousin of random-hyperplane LSH — no seeded projections, so the
    DuckDB oracle reproduces candidates exactly). Pairs sharing ANY
    band key join within that bucket only; buckets larger than
    ``bucket_cap`` are skipped before the self-join (a degenerate
    corpus of near-identical vectors would otherwise go quadratic —
    same cap discipline as the MinHash path). Survivors verify with
    the exact JVM-side cosine (zip_with + aggregate, no Python) and
    only pairs with cos >= ``threshold`` return:
    (id_a, id_b, cos_sim) with cos_sim rounded to 4.
    """
    n_bands = dim // band_bits

    def bkey(b):
        acc = F.lit(0)
        for j in range(band_bits):
            acc = acc + F.when(
                F.element_at(F.col(vec_col), b * band_bits + j + 1).cast("double")
                > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
        return acc

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), bkey(b).alias("bkey"))
            for b in range(n_bands)
        ]
    )
    # the banded relation feeds the bucket-cap aggregation AND both
    # self-join sides: persist it so the embedding scan + band math run
    # once, then materialize the (small) candidate pair list executor-
    # side and release the cache (the signature-relation discipline the
    # MinHash path uses)
    keyed = (
        emb.select(F.col(id_col).alias("id"), F.explode(band_structs).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
        .persist()
    )
    bucket_ok = (
        keyed.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= bucket_cap)
        .select("band", "bkey")
    )
    capped = keyed.join(bucket_ok, ["band", "bkey"], "left_semi")
    a, b = capped.alias("a"), capped.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed.unpersist()
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def nrm(col):
        return F.sqrt(
            F.aggregate(
                F.col(col),
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        )

    cos = dot / (nrm("va") * nrm("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_sim"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(id, component_id) for every id appearing in ``pairs``, where
    component_id is the SMALLEST id reachable through the pair graph —
    the canonical representative of the duplicate cluster.

    Min-label propagation: every node starts labeled with itself; each
    round a node adopts the minimum of its own label and its
    neighbors'. A round is one join + one min-aggregation (two
    shuffles over the edge relation); the loop converges in at most
    graph-diameter rounds. Near-dup graphs are near-cliques after
    verification (every member pairs with most others), so the
    diameter — and the round count — is small (2-3) regardless of
    corpus size; the 100 TB cost is O(diameter) scans of the edge
    list, all shuffle-partitioned on id. Labels are localCheckpointed
    per round so the plan never accumulates lineage (the same
    iterative-loop discipline as pagerank.py). For adversarial
    long-chain graphs the large-star/small-star alternation (Kiveris
    et al., "Connected Components in MapReduce") converges in
    O(log^2 n) rounds; dedup graphs never need it, so the simpler
    exact-min propagation is used here and ``max_iters`` guards the
    pathological case with a hard error rather than a silent partial
    labeling.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component_id").alias("neigh_min"))
        )
        upd = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                "component_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce("neigh_min", "component_id"),
                ).alias("new_label"),
            )
            .persist()
        )
        n_changed = upd.where(F.col("new_label") < F.col("component_id")).count()
        labels = upd.select(
            "id", F.col("new_label").alias("component_id")
        ).localCheckpoint(eager=True)
        upd.unpersist()
        if n_changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds the bound; raise max_iters or use "
        "star-contraction for adversarial chain graphs)"
    )


def dedup_keep_list(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """The cluster-resolution step every pairwise dedup needs before it
    can actually DROP documents: near-dup pairs say "these two match",
    but a training-data pipeline must pick one survivor per transitive
    cluster (a~b, b~c => keep one of {a,b,c}, not two). Returns one row
    per id in ``ids``: (id, component_id, keep) — keep is true exactly
    for the minimum id of each connected component, and for every
    singleton that appears in no pair (the canonical-member-wins rule,
    deterministic across runs and cluster sizes). Completes the
    reference's content-seen dedup (Crawler.java:497-510) into a
    corpus-wide operator."""
    comp = connected_components(pairs, a_col, b_col, max_iters)
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component_id", "id").alias("component_id"),
        )
        .withColumn("keep", F.col("id") == F.col("component_id"))
    )


def substring_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
) -> DataFrame:
    """Exact-substring deduplication spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    operator): find every ``width``-token run that occurs more than
    once in the corpus (across documents or repeated within one), and
    merge the hits into maximal per-document removal intervals.
    Returns (id, span_start, span_end, n_grams) with 1-based inclusive
    token positions (positions count non-empty tokens) — the spans a
    curation pipeline cuts out of the training text.

    Plan shape: one pass builds the positional shingle relation
    JVM-side (transform over an index sequence + posexplode — no
    self-joins, no Python); duplicated shingles are a self-semi-join
    on the shingle key (hash-partitioned, bounded per-key fan-out);
    interval merging is the gaps-and-islands pattern with two
    per-document windows (running max end -> island flag -> island
    id), all integer arithmetic so any engine agrees bit-for-bit.
    At 100 TB the shingle relation is the big intermediate; hashing
    the shingle text to a 64-bit key (xxhash64) before the join is
    the production variant — kept as readable text here so the oracle
    can replay it verbatim.
    """
    from pyspark.sql import Window

    a = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    grams = F.when(
        F.size(a) >= width,
        F.transform(
            F.sequence(F.lit(0), F.size(a) - width),
            lambda i: F.concat_ws(" ", F.slice(a, i + 1, width)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = docs.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos0", "h")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "h")
    dup = sh.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") > 1)
    hits = sh.join(dup.select("h"), "h", "left_semi").select(
        "id", "pos", (F.col("pos") + width - 1).alias("e")
    )
    order = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "id",
        "pos",
        "e",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    island = F.sum("new_island").over(
        order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.select("id", "pos", "e", island.alias("island"))
        .groupBy("id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("id").alias(id_col), "span_start", "span_end", "n_grams"
        )
    )
