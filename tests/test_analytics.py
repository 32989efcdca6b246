"""Tests for the training-data pipeline operators (dedup, simsearch,
text analysis, multimodal plumbing)."""

import math

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.analytics import dedup, multimodal, simsearch, text


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base.replace("today", "tomorrow")),     # near dup of 0
        (3, "completely different text about spark shuffles and joins here now"),
        (4, "another unrelated document describing inverted index construction steps"),
        (5, base.replace("quick", "slow").replace("today", "yesterday")),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_duplicates(corpus):
    groups = dedup.exact_duplicates(corpus).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["canonical"] == 0


def test_minhash_dedup_finds_near_dups(corpus):
    pairs = dedup.minhash_dedup(corpus, jaccard_threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got            # identical -> jaccard 1.0
    assert (0, 2) in got or (1, 2) in got  # one-word change
    for r in pairs:
        if (r["id_a"], r["id_b"]) == (0, 1):
            assert r["jaccard"] == pytest.approx(1.0)
    # unrelated docs never pair
    assert not any(3 in p or 4 in p for p in got)


def test_simhash_near_pairs(corpus):
    sigs = dedup.simhash_signatures(corpus)
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 1)) == 0     # identical text -> identical simhash
    assert not any(
        (3 in p or 4 in p) and h <= 3 for p, h in got.items()
    )


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = simsearch.cosine_topk(emb, [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 4]
    assert got[0]["cos_sim"] == pytest.approx(1.0)
    assert got[2]["cos_sim"] == pytest.approx(math.cos(math.pi / 4), abs=1e-6)


def test_lsh_topk_matches_bruteforce_top1(spark):
    import random

    rng = random.Random(3)
    dim = 16
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[17][1]  # query = an existing vector -> its bucket matches
    planes = simsearch.hyperplanes(dim, bits=12, seed=9)
    keyed = emb.transform(lambda d: simsearch.add_lsh_key(d, planes)).cache()
    exact = simsearch.cosine_topk(emb, q, k=1).collect()[0]
    approx = simsearch.lsh_topk(keyed, q, planes, k=1, probe_bits=6).collect()[0]
    assert approx["vec_id"] == exact["vec_id"] == 17
    keyed.unpersist()


def test_ivf_topk_self_retrieval(spark):
    import random

    rng = random.Random(5)
    dim = 8
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(150)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = simsearch.train_centroids(emb, n_centroids=8, sample_fraction=0.5, seed=1)
    assert cents
    keyed = simsearch.add_ivf_key(emb, cents).cache()
    q = rows[42][1]
    got = simsearch.ivf_topk(keyed, q, cents, k=1, nprobe=2).collect()
    assert got and got[0]["vec_id"] == 42
    keyed.unpersist()


def test_ivf_topk_ranked_deterministic(spark):
    import random

    rng = random.Random(11)
    dim = 8
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[float(x) for x in rows[i][1]] for i in range(4)]
    keyed = simsearch.add_ivf_key(emb, cents, round_to=6).cache()
    q = rows[42][1]
    got = simsearch.ivf_topk_ranked(keyed, q, cents, k=5, nprobe=2).collect()
    assert [r["rnk"] for r in got] == [1, 2, 3, 4, 5]
    assert got[0]["vec_id"] == 42 and got[0]["cos_sim"] == 1.0
    # scores are rounded and non-increasing; cells restricted to probes
    probes = set(simsearch.probe_cells(q, cents, 2, round_to=6))
    assert all(r["cell"] in probes for r in got)
    sims = [r["cos_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
    keyed.unpersist()


def test_dataset_split_is_partitioning_invariant(spark):
    """The whole point of hash-bucket splits: the assignment is a pure
    function of the key, so repartitioned/reordered inputs (a backfill,
    an incremental ingest) agree row-by-row — a seeded random() would
    not."""
    from google_like_search_engine_spark.analytics.curation import (
        split_assign,
        stratified_keep,
    )

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, lang string")
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, lang string").repartition(7)

    def run(df):
        df = split_assign(df, "doc_id")
        df = stratified_keep(df, "doc_id", "lang", {"en": 300}, 1000)
        return {r["doc_id"]: (r["split"], r["keep"]) for r in df.collect()}

    ra, rb = run(a), run(b)
    assert ra == rb
    splits = [v[0] for v in ra.values()]
    assert {"train", "val", "test"} == set(splits)
    # en thinned hard, others untouched
    en_keep = [v[1] for k, v in ra.items() if k % 3 == 0]
    de_keep = [v[1] for k, v in ra.items() if k % 3 == 1]
    assert all(de_keep) and 0 < sum(en_keep) < len(en_keep)


def test_bfs_depths_hand_graph(spark):
    """Shortest-hop semantics on a graph with a shortcut, a cycle and
    an unreachable island; the loop exits early once the frontier
    drains (depth cap far above the diameter)."""
    from google_like_search_engine_spark.pagerank import bfs_depths

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (3, 0), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {r["doc_id"]: r["depth"] for r in bfs_depths(seeds, edges, 50).collect()}
    # 0->3 shortcut beats the 0->1->2->3 path; 7/8 unreachable
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_lang_scores(spark):
    rows = [
        (0, "the cat and the dog are running and jumping the fence"),
        (1, "der hund und die katze laufen schnell durch einen garten"),
        (2, "les enfants des villes ont une grande question est posée"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["pred_lang"] for r in text.lang_scores(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the quick fox!! runs... fast"), (1, "aaa")],
        "id long, text string",
    )
    got = {r["id"]: r for r in text.quality_features(df).collect()}
    assert got[0]["n_tokens"] == 5
    assert got[0]["punct_ratio"] > got[1]["punct_ratio"]
    assert got[1]["n_tokens"] == 1


def test_bpe_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world123 foo-bar")], "id long, text string"
    )
    r = text.bpe_token_counts(df).collect()[0]
    assert r["ws_tokens"] == 3
    # hello | world | 123 | foo | - | bar
    assert r["bpe_tokens"] == 6


def test_rolling_fingerprints_detect_shared_prefix(spark):
    base = "x" * 10 + "the common shared long substring that is well over the window size" + "y" * 10
    df = spark.createDataFrame(
        [(0, base), (1, "zzz " + base[4:]), (2, "totally different content here entirely")],
        "id long, text string",
    )
    got = {r["id"]: set(r["fingerprint"]) for r in text.rolling_fingerprints(df).collect()}
    assert got[0] & got[1]          # overlapping windows share hashes
    assert not (got[0] & got[2])


def test_multimodal_image_plumbing(spark):
    assets = multimodal.synth_assets(spark, n=30)
    feats = multimodal.image_features(assets, fake=True).collect()
    assert len(feats) == 10
    for r in feats:
        assert r["channels"] == 3 and len(r["features"]) == 8
    # deterministic: same payload -> same features
    again = multimodal.image_features(multimodal.synth_assets(spark, n=30), fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_multimodal_strict_mode_raises(spark):
    assets = multimodal.synth_assets(spark, n=3)
    with pytest.raises(Exception) as exc:
        multimodal.image_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "image decode" in str(exc.value)


def test_multimodal_frame_sampling(spark):
    assets = multimodal.synth_assets(spark, n=30)
    frames = multimodal.sample_frames(assets, every_n=5, fake=True).collect()
    assert frames
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    for idxs in by_asset.values():
        assert idxs == sorted(idxs)
        assert all(i % 5 == 0 for i in idxs)


def test_minhash_lsh_bucket_cap(spark):
    """Oversized band buckets are skipped: a cluster of identical docs
    lands in one bucket per band; capping below the cluster size must
    drop the quadratic within-bucket join entirely."""
    docs = spark.createDataFrame(
        [(i, "same exact text repeated for everyone here") for i in range(12)],
        "id long, text string",
    )
    sigs = dedup.minhash_signatures(docs)
    capped = dedup.minhash_lsh_pairs(sigs, max_bucket_size=5).collect()
    assert capped == []
    uncapped = dedup.minhash_lsh_pairs(sigs, max_bucket_size=1000).collect()
    assert len(uncapped) == 12 * 11 // 2


def test_minhash_dedup_signature_verify(spark):
    """Verification runs on shingle-hash sets (no full-text reship) and
    still yields exact Jaccard: near-dups pass, disjoint docs don't."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                      # identical -> jaccard 1.0
            (2, base + " with a small suffix change"),
            (3, "completely different content about spark shuffles and joins"),
        ],
        "id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_dedup(docs, jaccard_threshold=0.3).collect()
    }
    assert got[(0, 1)] == 1.0
    assert 0.3 <= got[(0, 2)] < 1.0 and 0.3 <= got[(1, 2)] < 1.0
    assert not any(3 in k for k in got)


def test_ngram_jaccard_hot_shingle_cap(spark, tmp_path):
    """A boilerplate shingle shared by every doc must not explode the
    pair join: above SHINGLE_DF_CAP it is excluded, leaving only pairs
    that share rare shingles."""
    from google_like_search_engine_spark import catalog_text as t

    n = t.SHINGLE_DF_CAP + 50
    boiler = "all rights reserved worldwide"  # 4 tokens -> 2 shared shingles
    rows = [(i, f"{boiler} unique{i} tail{i} words{i} here{i}") for i in range(n)]
    rows.append((n, rows[0][1]))  # one true near-dup pair via rare shingles
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = t.ngram_jaccard(spark, str(tmp_path)).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert got == {(0, n)}  # boilerplate-only pairs all pruned


def test_bpe_train_merges_hand_computed(spark):
    """Classic Sennrich fixture: merge order is fully determined by the
    pair counts + lexicographic tie-break (hand-verified)."""
    from google_like_search_engine_spark.analytics.text import bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    merges = bpe_train(df, num_merges=6)
    assert merges == [
        ("e", "s"),        # 9 (newest+widest)
        ("es", "t"),       # 9
        ("est", "</w>"),   # 9
        ("l", "o"),        # 7 (ties (o,w) at 7; lexicographic min)
        ("lo", "w"),       # 7
        ("e", "w"),        # 6 (ties (n,e) and (w,est</w>); min)
    ]


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from google_like_search_engine_spark.analytics.text import (
        bpe_encode,
        bpe_train,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    train = spark.createDataFrame([(0, text)], "id long, text string")
    merges = bpe_train(train, num_merges=6)
    docs = spark.createDataFrame(
        [(0, "lowest low"), (1, "newest")], "id long, text string"
    )
    got = {r["id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_encode(docs, merges).collect()}
    # "lowest": es -> est -> est</w> -> lo -> low  => [low, est</w>]
    # "low":    lo -> low (no (low,</w>) merge trained) => [low, </w>]
    assert got[0] == (["low", "est</w>", "low", "</w>"], 4)
    # "newest": ew merged but (n,ew) never trained
    assert got[1] == (["n", "ew", "est</w>"], 3)


def test_bpe_full_training_reconstructs_words(spark):
    """With enough merges every training word collapses to one token."""
    from google_like_search_engine_spark.analytics.text import (
        END_OF_WORD,
        bpe_encode,
        bpe_train,
    )

    text = " ".join(["alpha"] * 4 + ["beta"] * 3 + ["gamma"] * 2)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    merges = bpe_train(df, num_merges=100)
    got = bpe_encode(df, merges).collect()[0]
    assert set(got["tokens"]) == {
        "alpha" + END_OF_WORD, "beta" + END_OF_WORD, "gamma" + END_OF_WORD
    }
    assert got["n_tokens"] == 9


def test_bmp_decode_roundtrip_real_mode(spark):
    """encode_bmp -> decode_bmp roundtrips pixels exactly (incl. row
    padding and bottom-up order), and image_features runs STRICT mode
    over genuine BMP payloads."""
    from google_like_search_engine_spark.analytics.multimodal import (
        decode_bmp,
        encode_bmp,
        image_features,
        synth_media_assets,
    )

    pix = lambda x, y: ((x * 40) % 256, (y * 90) % 256, (x + y) % 256)  # noqa: E731
    payload = encode_bmp(5, 3, pix)  # width 5 -> 15-byte rows, pad to 16
    w, h, c, got = decode_bmp(payload)
    assert (w, h, c) == (5, 3, 3)
    assert got == [pix(x, y) for y in range(3) for x in range(5)]

    feats = image_features(synth_media_assets(spark, n=20), fake=False).collect()
    assert len(feats) == 10  # even ids are images
    for r in feats:
        assert r["channels"] == 3 and len(r["features"]) == 8
        assert all(0.0 <= f <= 255.0 for f in r["features"])
    # deterministic across invocations
    again = image_features(synth_media_assets(spark, n=20), fake=False).collect()
    assert [list(r["features"]) for r in again] == [list(r["features"]) for r in feats]


def test_ppm_decode():
    from google_like_search_engine_spark.analytics.multimodal import decode_ppm

    body = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    payload = b"P6\n# comment\n2 2\n255\n" + body
    w, h, c, pix = decode_ppm(payload)
    assert (w, h, c) == (2, 2, 3)
    assert pix == [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]


def test_wav_decode_real_mode(spark):
    from google_like_search_engine_spark.analytics.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
        synth_media_assets,
    )

    samples = [0, 1000, -1000, 32767, -32768, 0]
    sr, n, feats = decode_wav(encode_wav(8000, samples))
    assert (sr, n) == (8000, 6)
    assert feats[1] == 32767 / 32768.0 and feats[2] == -1.0
    rows = audio_features(synth_media_assets(spark, n=20), fake=False).collect()
    assert len(rows) == 10 and all(r["sample_rate"] == 8000 for r in rows)


def test_lossy_formats_still_raise_strict(spark):
    """Formats without a pure-Python codec (e.g. WebP) keep the honest
    strict NotImplementedError; PNG and baseline JPEG are now really
    decoded, and a PROGRESSIVE JPEG raises rather than mis-decoding."""
    from google_like_search_engine_spark.analytics import multimodal

    assets = spark.createDataFrame(
        [(0, "image", b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"x" * 64,
          {"width": "4"})],
        multimodal.ASSETS_SCHEMA,
    )
    import pytest as _pt

    with _pt.raises(Exception, match="NotImplementedError|image library"):
        multimodal.image_features(assets, fake=False).collect()

    # arithmetic-coded JPEG (SOF9): honest NotImplementedError
    # (progressive SOF2 decodes for real since round 5)
    arith = spark.createDataFrame(
        [(0, "image",
          b"\xff\xd8\xff\xc9" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0]),
          {"width": "8"})],
        multimodal.ASSETS_SCHEMA,
    )
    with _pt.raises(Exception, match="NotImplementedError|non-baseline"):
        multimodal.image_features(arith, fake=False).collect()


def test_png_encode_decode_roundtrip():
    from google_like_search_engine_spark.analytics.multimodal import (
        decode_png,
        encode_png,
    )

    pix = lambda x, y: ((x * 31) % 256, (y * 77) % 256, (x * y) % 256)  # noqa: E731
    w, h, c, got = decode_png(encode_png(7, 5, pix))
    assert (w, h, c) == (7, 5, 3)
    assert got == [pix(x, y) for y in range(5) for x in range(7)]
    # deterministic bytes
    assert encode_png(7, 5, pix) == encode_png(7, 5, pix)


def _png_from_filtered(w, h, color, scanlines):
    """Assemble a PNG from pre-filtered scanlines (filter byte + data)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_unfilter_correctly():
    """Rows filtered with Sub/Up/Average/Paeth (the encoder never emits
    them) must reconstruct the exact pixels."""
    from google_like_search_engine_spark.analytics.multimodal import (
        _paeth,
        decode_png,
    )

    w, h, nch = 4, 5, 3
    want = [
        [((x * 23 + y * 71 + c * 13) % 256) for x in range(w) for c in range(nch)]
        for y in range(h)
    ]

    def filt(ftype, row, prev):
        out = bytearray([ftype])
        for i, v in enumerate(row):
            left = row[i - nch] if i >= nch else 0
            up = prev[i]
            ul = prev[i - nch] if i >= nch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: _paeth(left, up, ul)}[ftype]
            out.append((v - pred) & 0xFF)
        return bytes(out)

    prev = [0] * (w * nch)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        lines.append(filt(ftype, want[y], prev))
        prev = want[y]

    dw, dh, dc, pix = decode_png(_png_from_filtered(w, h, 2, lines))
    assert (dw, dh, dc) == (w, h, nch)
    flat = [v for px in pix for v in px]
    assert flat == [v for row in want for v in row]


def test_png_gray_and_rgba():
    from google_like_search_engine_spark.analytics.multimodal import decode_png

    # 2x2 grayscale, filter 0 rows
    g = _png_from_filtered(2, 2, 0, [bytes([0, 10, 20]), bytes([0, 30, 40])])
    w, h, c, pix = decode_png(g)
    assert (w, h, c) == (2, 2, 1)
    assert pix == [(10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)]
    # 1x2 RGBA: alpha dropped
    r = _png_from_filtered(
        1, 2, 6, [bytes([0, 1, 2, 3, 255]), bytes([0, 4, 5, 6, 0])]
    )
    w, h, c, pix = decode_png(r)
    assert (w, h, c) == (1, 2, 4)
    assert pix == [(1, 2, 3), (4, 5, 6)]


def _png_chunk(ctype, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_png_unsupported_shapes_raise():
    import struct

    import pytest as _pt

    from google_like_search_engine_spark.analytics.multimodal import decode_png

    def png_with_ihdr(depth, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        return b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")

    # 16-bit, palette, Adam7 AND sub-byte greyscale are SUPPORTED now;
    # the honest raises that remain are illegal depth/color combos, bad
    # color types, and palette images missing their PLTE
    with _pt.raises(NotImplementedError):
        decode_png(png_with_ihdr(4, 2, 0))  # 4-bit RGB (illegal)
    with _pt.raises(NotImplementedError):
        decode_png(png_with_ihdr(4, 4, 0))  # 4-bit grey+alpha (illegal)
    with _pt.raises(NotImplementedError):
        decode_png(png_with_ihdr(8, 5, 0))  # bogus color type
    with _pt.raises(ValueError):
        decode_png(png_with_ihdr(8, 3, 0))  # palette without PLTE
    with _pt.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # no IHDR


def test_png_palette_and_16bit_and_greyalpha():
    """Hand-built palette (8-bit and 4-bit), 16-bit RGB, and
    grey+alpha PNGs decode to the expected pixels."""
    import struct
    import zlib

    from google_like_search_engine_spark.analytics.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    def build(w, h, depth, color, raw, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _png_chunk(b"PLTE", b"".join(bytes(c) for c in plte))
        return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    # 8-bit palette, 3x2: indexes per row with filter 0
    raw8 = bytes([0, 0, 1, 2]) + bytes([0, 3, 3, 0])
    w, h, c, pix = decode_png(build(3, 2, 8, 3, raw8, pal))
    assert (w, h, c) == (3, 2, 3)
    assert pix == [pal[0], pal[1], pal[2], pal[3], pal[3], pal[0]]

    # 4-bit palette, 3x1: indexes 1,2,0 packed MSB-first -> 0x12, 0x00
    raw4 = bytes([0, 0x12, 0x00])
    _w, _h, _c, pix4 = decode_png(build(3, 1, 4, 3, raw4, pal))
    assert pix4 == [pal[1], pal[2], pal[0]]

    # 16-bit RGB 2x1: high bytes (10,20,30) and (40,50,60)
    raw16 = bytes([0, 10, 99, 20, 99, 30, 99, 40, 99, 50, 99, 60, 99])
    _w, _h, c16, pix16 = decode_png(build(2, 1, 16, 2, raw16))
    assert pix16 == [(10, 20, 30), (40, 50, 60)] and c16 == 3

    # grey+alpha 8-bit 2x1: (g=7,a=255),(g=200,a=0) -> alpha dropped
    rawga = bytes([0, 7, 255, 200, 0])
    _w, _h, _c, pixga = decode_png(build(2, 1, 8, 4, rawga))
    assert pixga == [(7, 7, 7), (200, 200, 200)]


def test_png_adam7_interlaced_roundtrip():
    """An Adam7-interlaced PNG built pass-by-pass decodes to the same
    pixels as its non-interlaced twin."""
    import struct
    import zlib

    from google_like_search_engine_spark.analytics.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    w, h = 9, 6

    def pix(x, y):
        return ((x * 29 + 3) % 256, (y * 47 + 5) % 256, (x * y) % 256)

    # reference: plain encode -> decode
    _w, _h, _c, want = decode_png(encode_png(w, h, pix))

    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for py in range(ph):
            raw.append(0)  # filter: None
            y = y0 + py * dy
            for px_i in range(pw):
                r, g, b = pix(x0 + px_i * dx, y)
                raw += bytes((r, g, b))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    payload = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    _w2, _h2, _c2, got = decode_png(payload)
    assert got == want


def test_png_strict_mode_through_spark(spark):
    """image_features strict mode over genuine PNG payloads."""
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        encode_png,
        image_features,
    )

    rows = [
        (
            i,
            "image",
            encode_png(6 + i, 4, lambda x, y, i=i: ((x * i) % 256, y, (x + y) % 256)),
            {"width": str(6 + i)},
        )
        for i in range(4)
    ]
    got = image_features(spark.createDataFrame(rows, ASSETS_SCHEMA), fake=False)
    out = {r["asset_id"]: r for r in got.collect()}
    assert len(out) == 4
    for i in range(4):
        assert out[i]["width"] == 6 + i and out[i]["height"] == 4
        assert len(out[i]["features"]) == 8


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(w, h, seed):
    from google_like_search_engine_spark.analytics.multimodal import (
        decode_png,
        encode_png,
    )

    def pix(x, y):
        v = (x * 2654435761 + y * 40503 + seed) & 0xFFFFFFFF
        return (v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF)

    dw, dh, dc, got = decode_png(encode_png(w, h, pix))
    assert (dw, dh, dc) == (w, h, 3)
    assert got == [pix(x, y) for y in range(h) for x in range(w)]


def test_jpeg_roundtrip_444_near_lossless():
    """Baseline JPEG encode -> decode at quant=1 (4:4:4): every pixel
    within the DCT float-rounding error of the original."""
    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    def pix(x, y):
        return ((x * 37 + 11) % 256, (y * 53 + 7) % 256, (x * y + 3) % 256)

    for w, h in [(8, 8), (16, 16), (17, 13)]:  # incl. non-multiple-of-8
        payload = encode_jpeg(w, h, pix, quant=1)
        dw, dh, dc, got = decode_jpeg(payload)
        assert (dw, dh, dc) == (w, h, 3)
        err = max(
            abs(a - b)
            for y in range(h)
            for x in range(w)
            for a, b in zip(got[y * w + x], pix(x, y))
        )
        assert err <= 3, (w, h, err)
    # deterministic bytes
    assert encode_jpeg(16, 16, pix) == encode_jpeg(16, 16, pix)


def test_jpeg_420_subsampling_decodes():
    """4:2:0 chroma subsampling: the decoder's multi-block MCU +
    upsampling path reconstructs chroma-smooth images near-exactly."""
    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    def smooth(x, y):
        return (min(255, 50 + x * 3), min(255, 40 + y * 3), 100)

    payload = encode_jpeg(24, 18, smooth, quant=1, subsample=True)
    w, h, c, got = decode_jpeg(payload)
    assert (w, h, c) == (24, 18, 3)
    err = max(
        abs(a - b)
        for y in range(h)
        for x in range(w)
        for a, b in zip(got[y * w + x], smooth(x, y))
    )
    assert err <= 4, err


def test_jpeg_strict_image_features(spark):
    """image_features strict mode over genuine JPEG payloads — and the
    synth asset table now rotates BMP/PNG/JPEG over the same pixel
    grids, with JPEG features within the lossy tolerance of the
    lossless ones."""
    from google_like_search_engine_spark.analytics.jpeg import encode_jpeg
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        encode_bmp,
        image_features,
        synth_media_assets,
    )

    def pix(x, y):
        return ((x * 9) % 256, (y * 7) % 256, (x + y) % 256)

    assets = spark.createDataFrame(
        [
            (0, "image", encode_jpeg(12, 10, pix, quant=1), {}),
            (1, "image", encode_bmp(12, 10, pix), {}),
        ],
        ASSETS_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in image_features(assets, fake=False).collect()}
    assert rows[0]["width"] == 12 and rows[0]["height"] == 10
    for fj, fb in zip(rows[0]["features"], rows[1]["features"]):
        assert abs(fj - fb) <= 0.05, (fj, fb)

    feats = image_features(synth_media_assets(spark, n=24), fake=False).collect()
    assert len(feats) == 12 and all(len(r["features"]) == 8 for r in feats)


def test_embedding_near_pairs_finds_and_caps(spark):
    """Sign-band candidates find a planted near-dup pair (exact cosine
    verified), and the bucket cap drops a degenerate all-identical
    cluster before the self-join."""
    from google_like_search_engine_spark.analytics.dedup import (
        embedding_near_pairs,
    )

    base = [1.0 if i % 3 == 0 else -0.5 for i in range(16)]
    near = list(base)
    near[0] += 0.05  # tiny perturbation: same sign pattern, cos ~ 1
    far = [(-1.0) ** i * (i + 1) / 16.0 for i in range(16)]
    rows = [(0, base), (1, near), (2, far)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_pairs(emb, dim=16, threshold=0.9).collect()
    }
    assert set(got) == {(0, 1)} and got[(0, 1)] > 0.99

    # degenerate cluster: 12 identical vectors -> bucket_cap=10 skips
    # every bucket they share, so no quadratic pair blowup
    clones = [(i, base) for i in range(12)]
    emb2 = spark.createDataFrame(clones, "vec_id long, embedding array<float>")
    capped = embedding_near_pairs(
        emb2, dim=16, threshold=0.9, bucket_cap=10
    ).collect()
    assert capped == []


def test_wav_spectral_features():
    """Spectral centroid/rolloff: a pure tone's centroid and rolloff
    both sit at the tone frequency (FFT bin resolution)."""
    import math

    from google_like_search_engine_spark.analytics.multimodal import (
        decode_wav,
        encode_wav,
    )

    sr, f0, n = 8000, 1000, 4000
    samples = [int(20000 * math.sin(2 * math.pi * f0 * k / sr)) for k in range(n)]
    _sr, _n, feats = decode_wav(encode_wav(sr, samples))
    centroid, rolloff = feats[6], feats[7]
    assert abs(centroid - f0) < 25, centroid  # spectral leakage tolerance
    assert abs(rolloff - f0) < 25, rolloff


def test_jpeg_property_roundtrip():
    """Property: any small RGB image round-trips through the baseline
    codec at quant=1 within the worst-case DCT+color rounding error
    (4:4:4; adversarial noise can align the 64 per-coefficient +-0.5
    quantization errors, so the bound is 6, not the typical 2-3), and
    with constant chroma also through 4:2:0 (subsampling loses nothing
    when chroma is flat). Derandomized for a deterministic suite."""
    from hypothesis import given, settings, strategies as st

    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(
        w=st.integers(1, 18),
        h=st.integers(1, 14),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, seed):
        import random

        rng = random.Random(seed)
        grid = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
                 for _ in range(w)] for _ in range(h)]
        W, H, C, pix = decode_jpeg(
            encode_jpeg(w, h, lambda x, y: grid[y][x], quant=1)
        )
        assert (W, H) == (w, h)
        err = max(
            abs(a - b)
            for y in range(h)
            for x in range(w)
            for a, b in zip(pix[y * w + x], grid[y][x])
        )
        assert err <= 6, (w, h, seed, err)

        grey = [[(v := rng.randrange(256), v, v) for _ in range(w)]
                for _ in range(h)]
        _w, _h, _c, pix2 = decode_jpeg(
            encode_jpeg(w, h, lambda x, y: grey[y][x], quant=1, subsample=True)
        )
        err2 = max(
            abs(a - b)
            for y in range(h)
            for x in range(w)
            for a, b in zip(pix2[y * w + x], grey[y][x])
        )
        assert err2 <= 6, (w, h, seed, err2)

    prop()


def test_mjpeg_avi_video_sampling(spark):
    """REAL video decode: an MJPEG AVI round-trips through the RIFF
    parser, sampled frames are genuine JPEG bytes, and they compose
    straight into image_features (the sample->featurize pipeline)."""
    from google_like_search_engine_spark.analytics.jpeg import decode_jpeg
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        image_features,
        sample_frames,
    )

    w, h, n_frames = 16, 12, 9
    fns = [
        (lambda x, y, f=f: ((x * 10 + f * 20) % 256, (y * 7) % 256, f * 25 % 256))
        for f in range(n_frames)
    ]
    avi = encode_avi_mjpeg(w, h, fns, fps=5)
    frames = decode_avi_mjpeg(avi)
    assert len(frames) == n_frames
    dw, dh, _c, pix = decode_jpeg(frames[3])
    assert (dw, dh) == (w, h)
    # frame 3's red channel at (0,0) is 60 +- codec error
    assert abs(pix[0][0] - 60) <= 6

    assets = spark.createDataFrame(
        [(7, "video", avi, {"fps": "5"})], ASSETS_SCHEMA
    )
    sampled = sample_frames(assets, every_n=3, fake=False).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 3, 6]
    # sampled frames ARE images: feed them to the image featurizer
    frame_assets = spark.createDataFrame(
        [(r["frame_idx"], "image", bytes(r["frame"]), {}) for r in sampled],
        ASSETS_SCHEMA,
    )
    feats = image_features(frame_assets, fake=False).collect()
    assert len(feats) == 3
    assert all(r["width"] == w and r["height"] == h for r in feats)

    # non-AVI container still raises honestly in strict mode
    import pytest as _pt

    bad = spark.createDataFrame(
        [(0, "video", b"\x00\x00\x00\x20ftypmp42" + b"x" * 64, {})], ASSETS_SCHEMA
    )
    with _pt.raises(Exception, match="NotImplementedError|media library"):
        sample_frames(bad, fake=False).collect()


def test_gif_roundtrip_and_features(spark):
    """GIF LZW round-trip is EXACT (palette-indexed, lossless), the
    interlaced layout decodes, and GIF payloads flow through
    image_features strict mode like every other real format."""
    from google_like_search_engine_spark.analytics.gif import (
        decode_gif,
        encode_gif,
    )
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        image_features,
    )

    def pix(x, y):
        return ((x * 40) % 200, (y * 30) % 120, ((x + y) * 10) % 80)

    for w, h in [(11, 7), (16, 16), (1, 1), (300, 2)]:
        payload = encode_gif(w, h, pix)
        dw, dh, dc, got = decode_gif(payload)
        assert (dw, dh, dc) == (w, h, 3)
        assert got == [pix(x, y) for y in range(h) for x in range(w)], (w, h)

    # hand-built interlaced image: rewrite the descriptor's interlace
    # bit and re-order rows the way an interlaced encoder would
    w, h = 4, 8
    flat = encode_gif(w, h, pix)
    rows = [[pix(x, y) for x in range(w)] for y in range(h)]
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, h, step)]
    inter = encode_gif(w, h, lambda x, y: rows[order[y]][x])
    # flip the interlace flag in the image descriptor packed byte
    idx = inter.index(b"\x2c")
    inter = inter[: idx + 9] + bytes([inter[idx + 9] | 0x40]) + inter[idx + 10 :]
    dw, dh, _c, got = decode_gif(inter)
    assert got == [c for r in rows for c in r]

    assets = spark.createDataFrame(
        [(0, "image", encode_gif(12, 9, pix), {})], ASSETS_SCHEMA
    )
    feats = image_features(assets, fake=False).collect()
    assert len(feats) == 1 and feats[0]["width"] == 12 and feats[0]["height"] == 9

    # >256 distinct colors is an encoder error, not silent quantization
    import pytest as _pt

    with _pt.raises(ValueError, match="256"):
        encode_gif(64, 64, lambda x, y: (x * 4, y * 4, (x ^ y) & 0xFF))


def test_partial_dup_pairs_finds_edited_copy(spark):
    """A doc with a one-word edit still shares most winnowing
    fingerprints with its source; an unrelated doc shares none."""
    from google_like_search_engine_spark.analytics.text import (
        partial_dup_pairs,
    )

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(40))
    edited = base.replace("beta20", "EDITED")
    other = " ".join(f"zeta{i} eta{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in partial_dup_pairs(docs, min_shared=2).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 2


def test_animated_gif_frames_and_sampling(spark):
    """Animated GIF: disposal-composited frames decode correctly
    (disposal 1 leaves prior content; a transparent index skips
    drawing), and sample_frames emits PNG-encoded composites that feed
    image_features."""
    from google_like_search_engine_spark.analytics.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        decode_png,
        image_features,
        sample_frames,
    )

    w, h = 6, 4
    fns = [
        (lambda x, y, f=f: ((f * 50) % 200, (x * 30) % 150, (y * 20) % 100))
        for f in range(5)
    ]
    payload = encode_gif_animated(w, h, fns, disposal=1)
    dw, dh, frames = decode_gif_frames(payload)
    assert (dw, dh) == (w, h) and len(frames) == 5
    for f, pix in enumerate(frames):  # full-frame draws: exact match
        assert pix == [fns[f](x, y) for y in range(h) for x in range(w)], f

    assets = spark.createDataFrame(
        [(3, "video", payload, {})], ASSETS_SCHEMA
    )
    sampled = sample_frames(assets, every_n=2, fake=False).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 2, 4]
    # sampled frames are lossless PNGs of the composited frames
    pw, ph, _c, got = decode_png(bytes(sampled[1]["frame"]))
    assert (pw, ph) == (w, h)
    assert got == frames[2]
    frame_assets = spark.createDataFrame(
        [(r["frame_idx"], "image", bytes(r["frame"]), {}) for r in sampled],
        ASSETS_SCHEMA,
    )
    feats = image_features(frame_assets, fake=False).collect()
    assert len(feats) == 3 and all(r["width"] == w for r in feats)


def test_connected_components_min_label(spark):
    """Chain (1-2-3), pair (10,40 via 40>10 reversed input), isolated
    edge loops, and convergence: every node gets the minimum id of its
    component, in <= diameter rounds."""
    from google_like_search_engine_spark.analytics.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (40, 10), (7, 8), (8, 9), (9, 11), (11, 7)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 40: 10, 7: 7, 8: 7, 9: 7, 11: 7}


def test_connected_components_raises_past_max_iters(spark):
    from google_like_search_engine_spark.analytics.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=3)


def test_dedup_keep_list_keeps_one_per_cluster(spark):
    """keep is true exactly for each component's min id and for
    singletons absent from the pair graph."""
    from google_like_search_engine_spark.analytics.dedup import (
        dedup_keep_list,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    pairs = spark.createDataFrame(
        [(2, 5), (5, 6), (3, 7)], "id_a long, id_b long"
    )
    rows = {r["id"]: r for r in dedup_keep_list(ids, pairs).collect()}
    assert len(rows) == 7
    assert [rows[i]["component_id"] for i in range(1, 8)] == [1, 2, 3, 4, 2, 2, 3]
    assert [rows[i]["keep"] for i in range(1, 8)] == [
        True, True, True, True, False, False, False,
    ]


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive and baseline encode the SAME quantized coefficients
    (only the entropy-coding order differs), so the decodes must agree
    pixel-for-pixel — the strongest possible cross-check of the
    spectral-selection + successive-approximation scan machinery."""
    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    def pix(x, y):
        return ((x * 13 + y * 7) % 256, (x * x + 3 * y) % 256, (255 - x * y) % 256)

    for (w, h), sub in [((16, 16), False), ((23, 11), False),
                        ((24, 18), True), ((21, 13), True), ((8, 8), False)]:
        base = decode_jpeg(encode_jpeg(w, h, pix, quant=2, subsample=sub))
        prog_payload = encode_jpeg_progressive(w, h, pix, quant=2, subsample=sub)
        assert b"\xff\xc2" in prog_payload and b"\xff\xc0" not in prog_payload[:2]
        prog = decode_jpeg(prog_payload)
        assert prog == base, (w, h, sub)


def test_jpeg_progressive_property():
    """Random images: progressive decode == baseline decode, exactly."""
    import random

    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = random.Random(20260817)
    for trial in range(4):
        w = rng.randrange(8, 40)
        h = rng.randrange(8, 40)
        grid = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        fn = lambda x, y: grid[y][x]
        sub = trial % 2 == 1
        base = decode_jpeg(encode_jpeg(w, h, fn, quant=3, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, fn, quant=3, subsample=sub)
        )
        assert prog == base, (trial, w, h, sub)


def test_jpeg_progressive_refinement_zrl_paths():
    """Adversarial low-amplitude high-frequency patterns: coefficients
    of magnitude 1 are invisible in the first scans (>>1 == 0) and only
    appear in the refinement scan after long zero-history runs — the
    ZRL-inside-refinement and correction-bit paths. Decode must still
    equal baseline exactly."""
    from google_like_search_engine_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    def make(mode, d):
        def f(x, y):
            if mode == "checker":
                v = 128 + ((x + y) % 2) * d
            elif mode == "impulse":
                v = 128 + (d * 8 if (x % 8 == 7 and y % 8 == 7) else 0)
            else:
                v = 128 + ((x + y) % 2) * d + (6 if x % 8 == 0 and y % 8 == 0 else 0)
            v = max(0, min(255, v))
            return (v, v, v)

        return f

    for d in (1, 2, 3, 5):
        for mode in ("checker", "impulse", "mix"):
            f = make(mode, d)
            base = decode_jpeg(encode_jpeg(24, 16, f, quant=1))
            prog = decode_jpeg(encode_jpeg_progressive(24, 16, f, quant=1))
            assert prog == base, (mode, d)


def test_dedup_corpus_pipeline(spark, tmp_path):
    """End-to-end corpus dedup (scripts/dedup_corpus.py): exact dups,
    near dups, and an overlapping exact+near cluster resolve to ONE
    canonical survivor via the shared connected-components pass."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "dedup_corpus_script",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "dedup_corpus.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = "the quick brown fox jumps over the lazy dog near the river today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                   # exact dup of 1
            (3, base.replace("today", "tomorrow")),      # near dup of 1
            (4, "completely different text about spark shuffles and joins"),
            (5, base),                                   # exact dup of 1 (chain)
        ],
        "doc_id long, text string",
    )
    kept, keep_list = mod.dedup_corpus(spark, docs, jaccard=0.4)
    rows = {r["id"]: r for r in keep_list.collect()}
    assert [rows[i]["component_id"] for i in (1, 2, 3, 4, 5)] == [1, 1, 1, 4, 1]
    assert rows[1]["reason"] == "canonical" and rows[4]["reason"] == "canonical"
    assert rows[2]["reason"] == "exact_dup" and rows[5]["reason"] == "exact_dup"
    assert rows[3]["reason"] == "near_dup"
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]


def test_bmp_rle8_roundtrip_and_escapes():
    """BI_RLE8 BMP: palette-exact pixels round-trip losslessly through
    encoded runs, absolute literal blocks (word-padded), EOL and EOB
    escapes; delta-skipped pixels render palette[0]."""
    import struct

    from google_like_search_engine_spark.analytics.multimodal import (
        decode_bmp,
        encode_bmp_rle8,
    )

    pix = lambda x, y: (((x * 2) % 6) * 51, ((y * 3) % 6) * 51, ((x + y) % 6) * 51)  # noqa: E731
    for w, h in [(7, 5), (16, 9), (1, 1), (13, 2)]:
        W, H, C, got = decode_bmp(encode_bmp_rle8(w, h, pix))
        assert (W, H, C) == (w, h, 3)
        assert got == [pix(x, y) for y in range(h) for x in range(w)]

    # hand-built stream exercising the delta escape: run of 2 index-1
    # pixels, delta +2/+1, run of 1 index-2, EOB; untouched -> palette[0]
    palette = [(10, 20, 30), (200, 0, 0), (0, 200, 0)] + [(0, 0, 0)] * 253
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    data = bytes([2, 1, 0, 2, 2, 1, 1, 2, 0, 1])
    off = 14 + 40 + len(pal)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, 6, 3, 1, 8, 1, len(data),
                      0, 0, 256, 0)
        + pal + data
    )
    w, h, c, got = decode_bmp(payload)
    assert (w, h) == (6, 3)
    grid = [got[r * 6:(r + 1) * 6] for r in range(3)]
    # bottom-up: stream row 0 = image row 2
    assert grid[2][0] == grid[2][1] == (200, 0, 0)
    assert grid[1][4] == (0, 200, 0)          # after delta dx=2 dy=1
    assert grid[2][2] == grid[0][0] == (10, 20, 30)  # untouched


def test_best_snippet_window_tiebreak_and_edges(spark):
    """Earliest-window-on-ties, window truncation at doc end, and
    no-hit docs dropped."""
    from google_like_search_engine_spark.analytics.text import (
        best_snippet_window,
    )

    docs = spark.createDataFrame(
        [
            (1, "x spark y z z z z z z z z z spark shuffle"),  # best at tail
            (2, "spark a b c d e f g h i j k spark"),  # tie: earliest wins
            (3, "nothing relevant here at all"),
            (4, "short spark"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in
            best_snippet_window(docs, ["spark", "shuffle"], width=5).collect()}
    assert 3 not in rows
    assert rows[1]["n_hits"] == 2
    assert rows[1]["snippet"].split() == ["z", "spark", "shuffle"][:3] or \
        "spark shuffle" in rows[1]["snippet"]
    assert rows[2]["n_hits"] == 1
    assert rows[2]["snippet"].startswith("spark a")  # earliest of the tie
    assert rows[4]["snippet"] == "short spark"  # window truncates at end


def test_connected_components_random_vs_union_find(spark):
    """Random pair graphs: the distributed min-label propagation must
    match a driver-side union-find exactly."""
    import random

    from google_like_search_engine_spark.analytics.dedup import (
        connected_components,
    )

    rng = random.Random(20260817)
    for trial in range(3):
        n = 60
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randrange(10, 70))
            }
        )
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {
            i: find(i) for i in range(n) if any(i in p for p in pairs)
        }
        got = {
            r["id"]: r["component_id"]
            for r in connected_components(
                spark.createDataFrame(pairs, "id_a long, id_b long")
            ).collect()
        }
        assert got == want, trial


def test_resize_images_bilinear(spark):
    """Resize: identity at same size, exact 2x downscale averaging on
    a block pattern, and PNG output that re-enters the decode pipeline."""
    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        bilinear_resize,
        decode_png,
        encode_bmp,
        image_features,
        resize_images,
    )

    # identity: same-size resize returns the same pixels
    pix = [(x * 10 % 256, y * 20 % 256, (x + y) % 256)
           for y in range(6) for x in range(8)]
    assert bilinear_resize(8, 6, pix, 8, 6) == pix

    # 2x downscale of a 2x2-block image averages each block exactly
    big = [(0, 0, 0)] * 16
    for y in range(4):
        for x in range(4):
            big[y * 4 + x] = (200, 100, 0) if (x // 2 + y // 2) % 2 == 0 else (0, 100, 200)
    small = bilinear_resize(4, 4, big, 2, 2)
    assert small[0] == (200, 100, 0) and small[1] == (0, 100, 200)

    def src(x, y):
        return ((x * 37) % 256, (y * 53) % 256, (x * y) % 256)

    assets = spark.createDataFrame(
        [(0, "image", encode_bmp(16, 12, src), {})], ASSETS_SCHEMA
    )
    out = resize_images(assets, 8, 6).collect()
    assert len(out) == 1 and out[0]["width"] == 8 and out[0]["height"] == 6
    w, h, c, got = decode_png(bytes(out[0]["payload"]))
    assert (w, h, c) == (8, 6, 3)
    # resized payloads feed straight back into image_features
    back = spark.createDataFrame(
        [(0, "image", bytes(out[0]["payload"]), {})], ASSETS_SCHEMA
    )
    feats = image_features(back, fake=False).collect()
    assert feats[0]["width"] == 8 and len(feats[0]["features"]) == 8


def test_bmp_rle8_truncated_payload_raises_cleanly():
    """Truncated RLE8 streams (delta/absolute escapes cut short) raise
    the decoders' ValueError contract, not IndexError."""
    import struct

    from google_like_search_engine_spark.analytics.multimodal import (
        decode_bmp,
    )

    pal = b"".join(bytes([0, 0, 0, 0]) for _ in range(256))
    off = 14 + 40 + len(pal)

    def bmp(data):
        return (
            b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(data),
                          0, 0, 256, 0)
            + pal + data
        )

    with pytest.raises(ValueError, match="delta"):
        decode_bmp(bmp(bytes([0, 2])))  # delta escape, no dx/dy
    with pytest.raises(ValueError, match="absolute"):
        decode_bmp(bmp(bytes([0, 4, 1])))  # absolute run of 4, 1 byte

def test_bigram_lm_nll_hand_computed(spark):
    """Add-one bigram LM on a 3-doc corpus, checked against pencil-and-
    paper: V=4 (a,b,c,x); c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts
    c(a,.)=3, c(b,.)=2. The single-token doc has no bigrams and is
    excluded."""
    import math

    from google_like_search_engine_spark.analytics.curation import bigram_lm_nll

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in bigram_lm_nll(docs).collect()}
    ab = round(-math.log(4 / 7), 4)       # (3+1)/(3+4)
    ba = round(-math.log(2 / 6), 4)       # (1+1)/(2+4)
    bc = round(-math.log(2 / 6), 4)
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 3
    assert got[1]["nll"] == round(ab + ba + ab, 4)
    assert got[1]["ppl"] == round(math.exp((ab + ba + ab) / 3), 2)
    assert got[2]["n_bigrams"] == 2
    assert got[2]["nll"] == round(ab + bc, 4)
    assert got[2]["ppl"] == round(math.exp((ab + bc) / 2), 2)


def test_spell_suggest_ranking(spark, tmp_path):
    """Top-k ranking is (distance, df desc, term): 'cut' (dist 1, df 3)
    beats 'cot' (dist 1, df 2) beats 'bat' (dist 1, df 1); 'cart'
    (dist 2) can't displace any dist-1 term; far terms never appear."""
    from google_like_search_engine_spark.catalog_text import spell_suggest

    rows = [
        (1, "cut cot bat cart zebra"),
        (2, "cut cot"),
        (3, "cut"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = [
        (r["suggestion"], r["dist"], r["df"], r["rank"])
        for r in spell_suggest(spark, str(tmp_path), queries=("cat",))
        .orderBy("rank")
        .collect()
    ]
    assert got == [("cut", 1, 3, 1), ("cot", 1, 2, 2), ("bat", 1, 1, 3)]


def test_png_subbyte_greyscale():
    """1-bit and 4-bit greyscale PNGs decode with samples scaled to
    8-bit (0/255 for 1-bit; v*255//15 for 4-bit), MSB-first packing."""
    import struct
    import zlib

    from google_like_search_engine_spark.analytics.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    def build(w, h, depth, raw):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        return (
            _PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 1-bit, 10x1: pattern 1100110011 -> bytes 0b11001100, 0b11......
    raw1 = bytes([0, 0b11001100, 0b11000000])
    w, h, c, pix = decode_png(build(10, 1, 1, raw1))
    assert (w, h, c) == (10, 1, 1)
    want = [255, 255, 0, 0, 255, 255, 0, 0, 255, 255]
    assert [p[0] for p in pix] == want
    assert all(p == (p[0], p[0], p[0]) for p in pix)

    # 4-bit, 3x2: samples (1, 8, 15) and (0, 5, 10), MSB-first nibbles
    raw4 = bytes([0, 0x18, 0xF0]) + bytes([0, 0x05, 0xA0])
    w, h, c, pix = decode_png(build(3, 2, 4, raw4))
    assert (w, h, c) == (3, 2, 1)
    assert [p[0] for p in pix] == [v * 255 // 15 for v in (1, 8, 15, 0, 5, 10)]


def test_curate_corpus_gate_attribution(spark, tmp_path):
    """Each curation gate drops the doc built to fail exactly it:
    doc 10 is a near-dup of doc 0 (dedup gate), doc 11 declares 'de'
    but reads as English (lang gate), doc 12 is two tokens (quality
    length gate). Survivors keep=True only when every gate passes."""
    from google_like_search_engine_spark.catalog_text import curate_corpus

    base = (
        "the batch window spark order data column agg join hash table "
        "scan slow fast value part key row the big small merge filter "
        "sort group query stream line vector customer dup the a "
    ) * 3
    rows = [(i, base + f"doc{i} marker{i} extra{i} tail{i}", "en") for i in range(10)]
    rows.append((10, base + "doc0 marker0 extra0 tail0", "en"))  # ~= doc 0
    rows.append((11, base + "doc11 marker11 extra11 tail11", "de"))
    rows.append((12, "two tokens", "en"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r["doc_id"]: r.asDict() for r in curate_corpus(spark, str(tmp_path)).collect()}
    assert len(got) == 13
    assert not got[11]["ok_lang"] and got[10]["ok_lang"]
    assert not got[12]["ok_quality"]
    # 0 and 10 are near-dups: the min-id canonical (0) survives, 10 drops
    assert got[0]["ok_dedup"] and not got[10]["ok_dedup"]
    for i, r in got.items():
        assert r["keep"] == (
            r["ok_quality"] and r["ok_lang"] and r["ok_dedup"] and r["ok_ppl"]
        )


def _mp4_box(btype, body):
    import struct as _s

    return _s.pack(">I", 8 + len(body)) + btype + body


def test_mp4_and_mp3_container_metadata():
    import struct as _s

    from google_like_search_engine_spark.analytics.multimodal import (
        mp3_metadata,
        mp4_metadata,
    )

    # mvhd v0: version/flags + creation + modification + timescale=1000
    # + duration=2500 (2.5 s) + the rate/volume/matrix tail (zeros)
    mvhd = _mp4_box(
        b"mvhd", bytes(4) + bytes(8) + _s.pack(">II", 1000, 2500) + bytes(80)
    )
    hdlr_v = _mp4_box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    hdlr_s = _mp4_box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    trak_v = _mp4_box(b"trak", _mp4_box(b"mdia", hdlr_v))
    trak_s = _mp4_box(b"trak", _mp4_box(b"mdia", hdlr_s))
    moov = _mp4_box(b"moov", mvhd + trak_v + trak_s)
    ftyp = _mp4_box(b"ftyp", b"isom" + bytes(8))
    got = mp4_metadata(ftyp + moov)
    assert got["brand"] == "isom"
    assert got["duration_s"] == 2.5
    assert got["tracks"] == ["vide", "soun"]

    # MPEG1 Layer III 128 kbps 44100 Hz: header FF FB 90 00,
    # frame length 144*128000/44100 = 417 bytes
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)
    id3 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 10]) + bytes(10)
    got = mp3_metadata(id3 + frame * 5)
    assert got["n_frames"] == 5
    assert got["bitrate"] == 128000 and got["sample_rate"] == 44100
    assert got["mpeg_version"] == 1
    assert got["duration_s"] == round(5 * 1152 / 44100, 3)


def test_media_metadata_operator_sniffs_by_magic(spark):
    """MP4 and MP3 payloads surface container metadata; garbage rows
    drop out; sniffing is by magic bytes, not the kind column."""
    import json as _json
    import struct as _s

    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        media_metadata,
    )

    mvhd = _mp4_box(
        b"mvhd", bytes(4) + bytes(8) + _s.pack(">II", 600, 1200) + bytes(80)
    )
    mp4 = _mp4_box(b"ftyp", b"mp42" + bytes(8)) + _mp4_box(b"moov", mvhd)
    mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)
    rows = [
        (0, "video", mp4, {}),
        (1, "audio", mp3 * 3, {}),
        (2, "video", b"garbage-not-a-container", {}),
    ]
    df = spark.createDataFrame(rows, ASSETS_SCHEMA)
    got = {r["asset_id"]: r.asDict() for r in media_metadata(df).collect()}
    assert set(got) == {0, 1}
    assert got[0]["format"] == "mp4" and got[0]["duration_s"] == 2.0
    assert got[1]["format"] == "mp3"
    assert _json.loads(got[1]["detail"])["sample_rate"] == 44100


def test_media_metadata_drops_truncated_containers(spark):
    """Sniffed-by-magic garbage must drop the row, never the task: a
    'ftyp'-bearing payload whose mvhd is truncated raises struct.error
    inside the parser and the operator skips it."""
    import struct as _s

    from google_like_search_engine_spark.analytics.multimodal import (
        ASSETS_SCHEMA,
        media_metadata,
    )

    # two boxes that pass the size checks but truncate mvhd's fields
    bad = (
        _s.pack(">I", 16) + b"ftyp" + bytes(8)
        + _s.pack(">I", 16) + b"mvhd" + bytes(8)
    )
    bare_sync = bytes([0xFF, 0xE1])  # MP3 syncword, nothing behind it
    rows = [(0, "video", bad, {}), (1, "audio", bare_sync, {})]
    df = spark.createDataFrame(rows, ASSETS_SCHEMA)
    assert media_metadata(df).count() == 0


def test_pack_chunks_hand_computed(spark):
    """Concat-and-chunk packing over a hand corpus at budget=4:
    offsets are the exclusive prefix sum in doc_id order and span
    counts honor budget boundaries (incl. a doc that exactly fills a
    chunk and a doc spanning three)."""
    from google_like_search_engine_spark.analytics.curation import pack_chunks

    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 toks, start 0, chunk 0, 1 span
            (2, "d"),              # 1 tok,  start 3, chunk 0, 1 span
            (3, "e f g h"),        # 4 toks, start 4, chunk 1, 1 span (exact fill)
            (4, "i j  k l m n o p q"),  # 9 toks (double space), start 8, chunks 2-4
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in pack_chunks(docs, budget=4).collect()
    }
    assert got[1] == {"doc_id": 1, "n_tokens": 3, "start_offset": 0,
                      "chunk_id": 0, "n_chunks": 1}
    assert got[2] == {"doc_id": 2, "n_tokens": 1, "start_offset": 3,
                      "chunk_id": 0, "n_chunks": 1}
    assert got[3] == {"doc_id": 3, "n_tokens": 4, "start_offset": 4,
                      "chunk_id": 1, "n_chunks": 1}
    assert got[4] == {"doc_id": 4, "n_tokens": 9, "start_offset": 8,
                      "chunk_id": 2, "n_chunks": 3}


def test_epoch_shuffle_is_permutation_and_differs(spark, sf_dir):
    """Each epoch's positions are a 1..N permutation, epochs order the
    corpus differently, and re-running yields the identical order."""
    from google_like_search_engine_spark.catalog_text import epoch_shuffle

    rows = epoch_shuffle(spark, sf_dir).collect()
    by_ep = {}
    for r in rows:
        by_ep.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    assert set(by_ep) == {0, 1}
    n = len(by_ep[0])
    for ep in (0, 1):
        assert sorted(by_ep[ep].values()) == list(range(1, n + 1))
    assert by_ep[0] != by_ep[1]  # different epoch, different order
    again = {
        (r["epoch"], r["doc_id"]): r["pos"]
        for r in epoch_shuffle(spark, sf_dir).collect()
    }
    assert all(again[(ep, d)] == p for ep, m in by_ep.items() for d, p in m.items())


def test_hits_fixed_iters_hand_computed(spark):
    """One exact HITS iteration on a 3-node chain 0->1->2 plus 0->2:
    auth1 = in-hub sums (0:0, 1:1, 2:2), hub1 = out-auth1 sums
    (0: 1+2=3, 1: 2, 2: 0); second iteration from those by hand."""
    from google_like_search_engine_spark.pagerank import hits_fixed_iters

    ids = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    one = {
        r["id"]: (r["auth"], r["hub"])
        for r in hits_fixed_iters(ids, edges, iters=1).collect()
    }
    assert one == {0: (0, 3), 1: (1, 2), 2: (2, 0)}
    # iter 2: auth = in-hub1 (0:0, 1:3, 2:3+2=5); hub = out-auth2
    # (0: 3+5=8, 1: 5, 2: 0)
    two = {
        r["id"]: (r["auth"], r["hub"])
        for r in hits_fixed_iters(ids, edges, iters=2).collect()
    }
    assert two == {0: (0, 8), 1: (3, 5), 2: (5, 0)}


def test_triangle_counts_hand_computed(spark):
    """K4 minus one edge has exactly 2 triangles; the two vertices on
    the missing edge sit in 1 each, the shared edge's endpoints in 2."""
    from google_like_search_engine_spark.pagerank import triangle_counts

    ids = spark.createDataFrame([(i,) for i in range(5)], "id long")
    # edges of K4 on {0,1,2,3} minus (2,3), plus isolated vertex 4;
    # directions/duplicates must not matter
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (3, 1), (2, 2)],
        "src long, dst long",
    )
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(ids, edges).collect()}
    assert got == {0: 2, 1: 2, 2: 1, 3: 1, 4: 0}


def test_substring_dup_spans_hand_computed(spark):
    """Width-3 fixture: 'a b c d' repeats across docs 1/2 -> two
    3-gram hits at pos 1,2 in each, merged to one span [1,4]; doc 3
    repeats 'x y z' WITHIN itself (pos 1 and 4, adjacent spans [1,3]
    and [4,6] merge to [1,6]); doc 4 shares nothing -> no row."""
    from google_like_search_engine_spark.analytics.dedup import (
        substring_dup_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d p q r"),
            (2, "z z a b c d"),
            (3, "x y z x y z"),
            (4, "unique tokens only here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_grams"]
        for r in substring_dup_spans(docs, width=3).collect()
    }
    assert got == {(1, 1, 4): 2, (2, 3, 6): 2, (3, 1, 6): 2}
