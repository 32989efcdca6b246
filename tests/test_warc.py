"""WARC source/sink + HTML-to-text extraction operator.

Covers: record-level parse/serialize round trip, gzip multi-member
streams (Common Crawl layout), resync over garbage, the Spark
write->read round trip, and the north-star per-row invariant — the
extracted ``text`` is byte-identical per url to the corpus fixture's
independently generated text column, so an index built from WARC input
equals the index built from the parquet pages table.
"""

import datetime as dt
import gzip
import os

import pytest

from google_like_search_engine_spark.corpus import (
    fixture_dictionary,
    generate_pages,
)
from google_like_search_engine_spark.extract import (
    extract_pages,
    extracted_or_stored_text,
)
from google_like_search_engine_spark.indexer import build_postings, docs_from_pages
from google_like_search_engine_spark.sources.warc import (
    parse_warc,
    read_warc,
    record_bytes,
    warc_to_pages,
    write_warc,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 5, tzinfo=dt.timezone.utc)


def test_record_roundtrip():
    body = b"<html><body>hello warc</body></html>"
    raw = record_bytes("https://a.example.com/x", TS, body, content_type="text/html")
    recs = list(parse_warc(raw))
    assert len(recs) == 1
    r = recs[0]
    assert r["url"] == "https://a.example.com/x"
    assert r["warc_ts"] == TS
    assert r["html"] == body
    assert r["http_status"] == 200
    assert r["content_type"] == "text/html"


def test_record_bytes_deterministic():
    a = record_bytes("https://a/x", TS, b"b")
    assert a == record_bytes("https://a/x", TS, b"b")
    assert a != record_bytes("https://a/y", TS, b"b")


def test_parse_skips_non_response_and_resyncs():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nblah\r\n\r\n"
    )
    good = record_bytes("https://a/1", TS, b"one")
    stream = info + b"\x00garbage\x00" + good + b"trailing junk"
    recs = list(parse_warc(stream))
    assert [r["url"] for r in recs] == ["https://a/1"]


def test_parse_multi_member_gzip():
    r1 = gzip.compress(record_bytes("https://a/1", TS, b"one"), mtime=0)
    r2 = gzip.compress(record_bytes("https://a/2", TS, b"two"), mtime=0)
    data = gzip.decompress(r1 + r2)  # multi-member decompress
    recs = list(parse_warc(data))
    assert [r["html"] for r in recs] == [b"one", b"two"]


def test_resource_record_body_passthrough():
    raw = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://a/r\r\n"
        b"WARC-Date: 2024-03-01T12:00:05Z\r\n"
        b"Content-Length: 3\r\n\r\nxyz\r\n\r\n"
    )
    (r,) = parse_warc(raw)
    assert r["html"] == b"xyz" and r["http_status"] is None


@pytest.fixture(scope="module")
def warc_corpus(spark, tmp_path_factory):
    """120 fixture pages written out as gzipped WARC archives."""
    out = str(tmp_path_factory.mktemp("warc") / "corpus")
    pages = generate_pages(spark, 120, partitions=4).persist()
    n = write_warc(pages, out, compress=True)
    assert n == 120
    return pages, out


def test_spark_roundtrip_bytes(spark, warc_corpus):
    pages, out = warc_corpus
    back = read_warc(spark, out)
    orig = {r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()}
    got = {
        r["url"]: bytes(r["html"])
        for r in back.select("url", "html").collect()
    }
    assert got == orig
    st = back.select("http_status").distinct().collect()
    assert [r[0] for r in st] == [200]


def test_warc_extraction_byte_identical_to_fixture_text(spark, warc_corpus):
    pages, out = warc_corpus
    extracted = warc_to_pages(spark, out, fixture_dictionary())
    joined = (
        pages.selectExpr("url", "text as want_text", "lang as want_lang")
        .join(extracted.selectExpr("url", "text", "lang"), "url", "inner")
        .collect()
    )
    assert len(joined) == 120
    for row in joined:
        assert row["text"] == row["want_text"], row["url"]
        assert row["lang"] == row["want_lang"], row["url"]


def test_index_from_warc_equals_index_from_parquet(spark, warc_corpus):
    pages, out = warc_corpus
    via_warc = build_postings(
        docs_from_pages(warc_to_pages(spark, out, fixture_dictionary()))
    )
    via_pages = build_postings(docs_from_pages(pages))
    a = {(r["term"], r["doc_id"], r["tf"]) for r in
         via_warc.select("term", "doc_id", "tf").collect()}
    b = {(r["term"], r["doc_id"], r["tf"]) for r in
         via_pages.select("term", "doc_id", "tf").collect()}
    assert a == b and len(a) > 0


def test_extracted_or_stored_text_passthrough(spark):
    pages = generate_pages(spark, 5)
    assert extracted_or_stored_text(pages) is pages
    raw = pages.drop("text")
    with pytest.raises(ValueError):
        extracted_or_stored_text(raw)
    out = extracted_or_stored_text(raw, fixture_dictionary())
    assert "text" in out.columns


def test_extract_handles_null_and_bad_bytes(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "url": ["https://x/1", "https://x/2"],
            "warc_ts": [TS, TS],
            "html": [None, b"\xff\xfe<html lang=\"en\"><body>apples</body></html>"],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = extract_pages(df, fixture_dictionary()).collect()
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://x/1"]["text"] in (None, "")
    assert "apples" in (by_url["https://x/2"]["text"] or "")


def test_latest_capture_newest_wins(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "url": ["u1", "u1", "u2", "u1"],
            "warc_ts": [
                dt.datetime(2024, 1, 1),
                dt.datetime(2024, 1, 3),
                dt.datetime(2024, 1, 2),
                dt.datetime(2024, 1, 2),
            ],
            "html": [b"old", b"newest", b"only", b"mid"],
        }
    )
    from google_like_search_engine_spark.extract import latest_capture

    out = {
        r["url"]: bytes(r["html"])
        for r in latest_capture(spark.createDataFrame(rows)).collect()
    }
    assert out == {"u1": b"newest", "u2": b"only"}


def test_latest_capture_tie_deterministic(spark):
    import pandas as pd

    ts = dt.datetime(2024, 1, 1)
    rows = pd.DataFrame(
        {"url": ["u", "u"], "warc_ts": [ts, ts], "html": [b"aaa", b"bbb"]}
    )
    from google_like_search_engine_spark.extract import latest_capture

    picked = {
        bytes(latest_capture(spark.createDataFrame(rows.sample(frac=1.0, random_state=s)))
              .collect()[0]["html"])
        for s in range(3)
    }
    assert len(picked) == 1  # same winner regardless of input order


def test_stream_warc_incremental_index(spark, tmp_path):
    """Continuous crawl ingestion: WARC files land -> streaming extract
    -> incremental index; after two drains the compacted index equals
    the one-shot batch build over the union of all captures."""
    from google_like_search_engine_spark.sources.warc import stream_warc
    from google_like_search_engine_spark.streaming.index_stream import (
        compact_index,
        incremental_index,
    )

    warc_dir = str(tmp_path / "landing")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    words = fixture_dictionary()

    all_pages = generate_pages(spark, 80, partitions=2).persist()
    # deterministic split by the page number baked into the url (limit()
    # would pick different rows on recompute)
    page_no = "cast(regexp_extract(url, 'page(\\\\d+)\\\\.html', 1) as int)"
    first = all_pages.where(f"{page_no} < 50")
    write_warc(first, warc_dir, compress=True)

    def drain():
        stream = stream_warc(spark, warc_dir, words)
        q = incremental_index(stream, idx_dir, ckpt)
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(idx_dir).select("doc_id").distinct().count()
    assert 0 < n1 <= 50

    # second batch of archives lands (staged under a different name so
    # the file source sees them as new; batch-1 files are not re-read
    # thanks to the checkpoint log)
    import glob
    import shutil

    staging = str(tmp_path / "staging")
    write_warc(all_pages.where(f"{page_no} >= 50"), staging, compress=True)
    for i, f in enumerate(sorted(glob.glob(staging + "/*.warc.gz"))):
        shutil.move(f, os.path.join(warc_dir, f"late-{i:05d}.warc.gz"))

    drain()
    compacted = compact_index(spark, idx_dir)

    batch = build_postings(docs_from_pages(all_pages))
    a = {(r["term"], r["doc_id"], r["tf"]) for r in
         compacted.select("term", "doc_id", "tf").collect()}
    b = {(r["term"], r["doc_id"], r["tf"]) for r in
         batch.select("term", "doc_id", "tf").collect()}
    assert a == b and len(a) > 0
    all_pages.unpersist()


# ---- property tests (hypothesis) ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_url_st = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           exclude_characters="\r\n"),
    min_size=1, max_size=80,
).map(lambda s: "https://h.example.com/" + s)


@settings(max_examples=60, deadline=None)
@given(
    url=_url_st,
    body=st.binary(max_size=2048),
    seconds=st.integers(0, 2_000_000_000),
)
def test_record_roundtrip_property(url, body, seconds):
    ts = dt.datetime.fromtimestamp(seconds, tz=dt.timezone.utc)
    recs = list(parse_warc(record_bytes(url, ts, body)))
    assert len(recs) == 1
    assert recs[0]["url"] == url
    assert recs[0]["html"] == body
    assert recs[0]["warc_ts"] == ts


@settings(max_examples=25, deadline=None)
@given(
    bodies=st.lists(st.binary(max_size=512), min_size=1, max_size=8),
    junk=st.binary(max_size=64),
)
def test_concatenated_records_with_junk_property(bodies, junk):
    """A stream of records with arbitrary junk between them parses
    every record (resync on the WARC/ magic) as long as the junk
    doesn't itself contain the magic."""
    import gzip as _gz

    if b"WARC/" in junk:
        junk = junk.replace(b"WARC/", b"XXXX/")
    stream = junk.join(
        record_bytes(f"https://a/{i}", TS, b) for i, b in enumerate(bodies)
    )
    recs = list(parse_warc(stream))
    assert [r["html"] for r in recs] == bodies
    # and the gzip multi-member form decodes identically
    gz = b"".join(
        _gz.compress(record_bytes(f"https://a/{i}", TS, b), mtime=0)
        for i, b in enumerate(bodies)
    )
    recs2 = list(parse_warc(_gz.decompress(gz)))
    assert [r["html"] for r in recs2] == bodies


def test_warc_media_assets_end_to_end(spark, tmp_path):
    """A WARC holding HTML pages AND media bodies: warc_media_assets
    sniffs the media records by magic (ignoring the Content-Type
    header, which is deliberately wrong for one record) and the assets
    flow through the real decoders."""
    import datetime

    from google_like_search_engine_spark.analytics.gif import encode_gif
    from google_like_search_engine_spark.analytics.jpeg import encode_jpeg
    from google_like_search_engine_spark.analytics.multimodal import (
        audio_features,
        encode_avi_mjpeg,
        encode_bmp,
        encode_wav,
        image_features,
        sample_frames,
    )
    from google_like_search_engine_spark.sources.warc import (
        warc_media_assets,
        write_warc,
    )

    pix = lambda x, y: ((x * 30) % 250, (y * 40) % 200, (x + y) % 100)  # noqa: E731
    ts = datetime.datetime(2026, 2, 1, tzinfo=datetime.timezone.utc)
    rows = [
        ("http://m.example/page.html", ts, b"<html><body>hi there</body></html>"),
        ("http://m.example/a.bmp", ts, encode_bmp(9, 6, pix)),
        ("http://m.example/b.jpg", ts, encode_jpeg(8, 8, pix, quant=1)),
        # wrong content type on purpose: sniffing must still say image
        ("http://m.example/c.gif", ts, encode_gif(7, 5, pix)),
        ("http://m.example/t.wav", ts, encode_wav(8000, [0, 900, -900] * 50)),
        ("http://m.example/v.avi", ts,
         encode_avi_mjpeg(8, 8, [pix, pix, pix, pix], fps=2)),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    out = str(tmp_path / "warc_media")
    write_warc(pages, out)

    assets = warc_media_assets(spark, out)
    kinds = {r["kind"] for r in assets.collect()}
    assert kinds == {"image", "audio", "video"}
    assert assets.count() == 5  # the html page is not an asset

    imgs = image_features(assets, fake=False).collect()
    assert sorted((r["width"], r["height"]) for r in imgs) == [
        (7, 5), (8, 8), (9, 6)
    ]
    aud = audio_features(assets, fake=False).collect()
    assert len(aud) == 1 and aud[0]["sample_rate"] == 8000
    frames = sample_frames(assets, every_n=2, fake=False).collect()
    assert [r["frame_idx"] for r in frames] == [0, 2]


def test_warc_media_assets_sniffs_mp4_and_mp3(spark, tmp_path):
    """ISO-BMFF and MPEG-audio payloads land in the asset table (video/
    audio) and media_metadata parses their containers end-to-end from
    the archive."""
    import datetime
    import struct

    from google_like_search_engine_spark.analytics.multimodal import (
        media_metadata,
    )
    from google_like_search_engine_spark.sources.warc import (
        warc_media_assets,
        write_warc,
    )

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(
        b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 100, 450) + bytes(80)
    )
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + box(b"moov", mvhd)
    mp3 = (bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)) * 2
    ts = datetime.datetime(2026, 2, 1, tzinfo=datetime.timezone.utc)
    rows = [
        ("http://m.example/clip.mp4", ts, mp4),
        ("http://m.example/song.mp3", ts, mp3),
        ("http://m.example/page.html", ts, b"<html>not media</html>"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    out = str(tmp_path / "warc_av")
    write_warc(pages, out)

    assets = warc_media_assets(spark, out)
    got = {r["meta"]["url"]: r["kind"] for r in assets.collect()}
    assert got == {
        "http://m.example/clip.mp4": "video",
        "http://m.example/song.mp3": "audio",
    }
    meta = {r["format"]: r for r in media_metadata(assets).collect()}
    assert meta["mp4"]["duration_s"] == 4.5
    assert meta["mp3"]["duration_s"] == round(2 * 1152 / 44100, 3)
