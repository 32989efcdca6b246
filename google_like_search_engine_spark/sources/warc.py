"""WARC source/sink: Common-Crawl-style web archive files.

The north-star corpus is "Common-Crawl-style web pages"; Common Crawl's
native interchange format is WARC/1.0 (ISO 28500): a concatenation of
records, each a header block (``WARC/1.0`` + ``Name: value`` lines +
blank line) followed by ``Content-Length`` bytes of payload. For
``WARC-Type: response`` records the payload is a full HTTP response
(status line + headers + body); the body is the page HTML. Common
Crawl ``.warc.gz`` files are *per-record gzip members* concatenated —
``gzip.decompress`` handles multi-member streams natively.

Reader design (100 TB scale):
- ``spark.read.format("binaryFile")`` gives one task per archive file
  (a Common Crawl crawl is ~64k files of ~1 GB — natural parallelism
  with no splitting logic; binaryFile caps at 2 GB/file, which CC
  respects). Parsing runs in ``mapInPandas`` so record assembly is
  Arrow-batched out; the parse itself is sequential per file, exactly
  as the format requires.
- No shuffle: scan -> parse -> downstream extraction is one narrow
  pipeline; pair with ``extract.extract_pages`` for the text column.
- Malformed records are skipped by re-synchronizing on the next
  ``WARC/`` magic, never failing the task; chunked transfer encoding
  is not decoded (Common Crawl stores bodies unchunked).

Writer: deterministic bytes (record ids derived from url+timestamp,
gzip mtime pinned to 0) so fixture WARCs are reproducible; one file
per input partition, written executor-side.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import os
import uuid
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession

WARC_RECORDS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, "
    "http_status int, content_type string, warc_file string"
)

_CRLF = b"\r\n"


# ---------------------------------------------------------------- parse


def _parse_headers(raw: bytes) -> dict:
    headers = {}
    for line in raw.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", errors="replace"
            )
    return headers


def _parse_warc_date(s: str):
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield response/resource records from one (decompressed) WARC
    stream: {url, warc_ts, html, http_status, content_type}."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5  # re-sync on next magic
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get("warc-type", "")
        if rec_type not in ("response", "resource"):
            continue
        url = headers.get("warc-target-uri")
        ts = _parse_warc_date(headers.get("warc-date", ""))
        status, ctype, body = None, None, block
        if block.startswith(b"HTTP/"):
            split = block.find(_CRLF + _CRLF)
            if split >= 0:
                http_hdr = _parse_headers(block[:split])
                body = block[split + 4 :]
                status_line = block.split(_CRLF, 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                ctype = http_hdr.get("content-type")
        yield {
            "url": url,
            "warc_ts": ts,
            "html": body,
            "http_status": status,
            "content_type": ctype,
        }


def _maybe_decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":  # multi-member safe
        return gzip.decompress(data)
    return data


# ---------------------------------------------------------------- write


def _record_id(url: str, ts: _dt.datetime) -> str:
    digest = hashlib.md5(f"{url}\x00{ts.isoformat() if ts else ''}".encode()).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=digest)}>"


def record_bytes(
    url: str,
    ts: _dt.datetime,
    html: bytes,
    http_status: int = 200,
    content_type: str = "text/html; charset=UTF-8",
) -> bytes:
    """One deterministic WARC/1.0 response record."""
    http = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("latin-1") + html
    when = ts or _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    if when.tzinfo is None:  # Arrow hands back session-UTC naive stamps
        when = when.replace(tzinfo=_dt.timezone.utc)
    when = when.astimezone(_dt.timezone.utc)
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {when.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"WARC-Record-ID: {_record_id(url, when)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("latin-1")
    return hdr + http + _CRLF + _CRLF


def write_warc(pages: DataFrame, out_dir: str, compress: bool = True) -> int:
    """Write (url, warc_ts, html) rows as WARC files, one per partition
    (``part-<pid>.warc[.gz]``), executor-side. gzip is one member per
    record with mtime=0 — Common Crawl's layout, byte-deterministic.
    Returns total records written. Local/NFS paths; an object-store
    deployment would swap the ``open`` for a Hadoop FS stream."""
    ext = ".warc.gz" if compress else ".warc"

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        os.makedirs(out_dir, exist_ok=True)
        count = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    if hasattr(ts, "to_pydatetime"):
                        ts = ts.to_pydatetime()
                    rec = record_bytes(url, ts, bytes(html or b""))
                    f.write(gzip.compress(rec, mtime=0) if compress else rec)
                    count += 1
        yield pd.DataFrame({"path": [path], "records": [count]})

    parts = (
        pages.select("url", "warc_ts", "html")
        .mapInPandas(dump, schema="path string, records long")
        .collect()
    )
    return sum(r["records"] for r in parts)


# ----------------------------------------------------------------- read


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) -> one row per response/resource record.

    ``path`` is a file/dir/glob as accepted by binaryFile. Plan: whole-
    file scan (one task per archive) -> Arrow-batched parse. Column
    ``warc_file`` carries provenance for per-partition lineage."""

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_parse_file_batches, schema=WARC_RECORDS_SCHEMA)


def _parse_file_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(path, content) Arrow batches -> WARC_RECORDS_SCHEMA batches."""
    for pdf in batches:
        rows = []
        for fpath, content in zip(pdf["path"], pdf["content"]):
            for rec in parse_warc(_maybe_decompress(bytes(content))):
                rec["warc_file"] = fpath
                rows.append(rec)
        yield pd.DataFrame(
            rows,
            columns=[
                "url",
                "warc_ts",
                "html",
                "http_status",
                "content_type",
                "warc_file",
            ],
        ).astype({"http_status": "Int32"})


_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc(spark: SparkSession, path: str, dictionary=None) -> DataFrame:
    """Streaming twin of ``read_warc``: new ``*.warc[.gz]`` files
    landing under ``path`` become record micro-batches (file source
    checkpoint log = exactly-once per archive). With ``dictionary``,
    extraction runs in-stream and the result is a streaming pages
    table ready for ``streaming.index_stream.incremental_index`` —
    continuous crawl ingestion end to end. All stages are stateless
    (parse + extract are narrow mapInPandas), so no watermark is
    needed."""

    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    recs = raw.mapInPandas(_parse_file_batches, schema=WARC_RECORDS_SCHEMA)
    if dictionary is None:
        return recs
    from ..extract import extract_pages

    ok = recs.where((recs.http_status.isNull()) | (recs.http_status == 200))
    return extract_pages(ok, dictionary)


def warc_to_pages(spark: SparkSession, path: str, dictionary) -> DataFrame:
    """WARC archives -> the canonical pages table
    (url, warc_ts, html, text, lang): read_warc + the reference
    extraction chain, 200-responses only."""
    from ..extract import extract_pages

    recs = read_warc(spark, path)
    ok = recs.where(
        (recs.http_status.isNull()) | (recs.http_status == 200)
    )
    return extract_pages(ok, dictionary)


def warc_media_assets(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives -> the multimodal asset table (analytics/
    multimodal.ASSETS_SCHEMA): response records whose BODY is a
    decodable media payload become (asset_id, kind, payload, meta)
    rows, ready for image_features / audio_features / sample_frames.

    The kind is sniffed from payload magic bytes JVM-side (substring
    comparisons on the binary column — no Python worker, and no trust
    in the Content-Type header, which real crawls get wrong
    constantly); asset_id is the xxhash64 of the url. Records that are
    neither media nor needed here (HTML et al.) are filtered out —
    ``warc_to_pages`` handles those."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path).where(
        (F.col("http_status").isNull()) | (F.col("http_status") == 200)
    )
    b = F.col("html")
    riff = F.substring(b, 1, 4) == F.lit(b"RIFF")
    is_image = (
        (F.substring(b, 1, 2) == F.lit(b"BM"))
        | (F.substring(b, 1, 2) == F.lit(b"P6"))
        | (F.substring(b, 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n"))
        | (F.substring(b, 1, 2) == F.lit(b"\xff\xd8"))
        | (F.substring(b, 1, 4) == F.lit(b"GIF8"))
    )
    from ..analytics.multimodal import isobmff_magic, mpeg_audio_magic

    # MPEG audio / ISO-BMFF: container metadata parses (media_metadata);
    # frame decode honestly raises. One shared sniff definition.
    is_audio = (riff & (F.substring(b, 9, 4) == F.lit(b"WAVE"))) | (
        mpeg_audio_magic(b)
    )
    is_video = (riff & (F.substring(b, 9, 4) == F.lit(b"AVI "))) | (
        isobmff_magic(b)
    )
    kind = (
        F.when(is_image, F.lit("image"))
        .when(is_audio, F.lit("audio"))
        .when(is_video, F.lit("video"))
    )
    return (
        recs.withColumn("kind", kind)
        .where(F.col("kind").isNotNull())
        .select(
            F.xxhash64("url").alias("asset_id"),
            "kind",
            b.alias("payload"),
            F.create_map(
                F.lit("url"), F.col("url"),
                F.lit("content_type"), F.coalesce("content_type", F.lit("")),
            ).alias("meta"),
        )
    )


__all__ = [
    "parse_warc",
    "record_bytes",
    "write_warc",
    "read_warc",
    "warc_to_pages",
    "warc_media_assets",
    "WARC_RECORDS_SCHEMA",
]
