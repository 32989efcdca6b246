"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested. Decoding is REAL for the formats a
pure-Python parser can handle without media libraries:
- images: BMP (BI_RGB 24/32-bit), PPM (P6, maxval 255), PNG
  (grey/grey+alpha/RGB/RGBA at 8/16-bit, palette at 1/2/4/8-bit,
  non-interlaced AND Adam7-interlaced, all five filters — stdlib zlib
  does the inflate), baseline AND progressive DCT JPEG (full Huffman +
  IDCT + chroma upsampling pipeline, spectral-selection/successive-
  approximation scans, analytics/jpeg.py; arithmetic-coded streams
  raise), and GIF 87a/89a (LZW + interlace + global/local
  palettes, first frame, analytics/gif.py),
- audio: PCM WAV (stdlib ``wave``), with real spectral features
  (numpy rfft centroid/rolloff),
- video: MJPEG-in-AVI (RIFF chunk walk -> per-frame JPEG bytes ->
  the same baseline JPEG decoder; sampled frames compose straight
  into ``image_features``).
Entropy-coded audio and inter-frame video (MP3/MP4/H.264) still raise
NotImplementedError in strict mode — those need codec libraries this
environment doesn't ship — or produce a deterministic payload-derived
fake in fake mode (used to exercise the 1->N frame-sampling shape and
batch plumbing). Their CONTAINER metadata is parsed for real, though:
``mp4_metadata`` (ISO-BMFF box walk: brand, movie duration, track
handler types) and ``mp3_metadata`` (ID3v2 skip + frame-header walk:
bitrate, sample rate, frame count, duration), surfaced as the
Arrow-batched ``media_metadata`` operator.

Asset table schema:
  asset_id: long, kind: string (image|audio|video), payload: binary,
  meta: map<string,string>   (e.g. width/height/sample_rate as strings)
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSETS_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, channels int, features array<float>"
)
AUDIO_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, n_samples long, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame binary"


def _fake_floats(payload: bytes, n: int) -> list:
    """Deterministic pseudo-features from payload bytes (md5 stream)."""
    out = []
    counter = 0
    while len(out) < n:
        d = hashlib.md5(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in d)
        counter += 1
    return [float(x) for x in out[:n]]


def _pixel_features(w: int, h: int, channels: int, pix: list) -> list:
    """8 deterministic summary floats from decoded RGB pixels: per-band
    mean + max (normalized) plus aspect + fill ratio — the slot a real
    embedding model occupies."""
    n = max(len(pix), 1)
    means = [0.0, 0.0, 0.0]
    maxs = [0, 0, 0]
    for px in pix:
        for c in range(3):
            means[c] += px[c]
            if px[c] > maxs[c]:
                maxs[c] = px[c]
    out = [m / (255.0 * n) for m in means] + [m / 255.0 for m in maxs]
    out.append(w / (h or 1))
    out.append(n / float(w * h or 1))
    return [float(x) for x in out]


def decode_bmp(payload: bytes):
    """Pure-Python BMP decoder: BITMAPFILEHEADER + BITMAPINFOHEADER,
    uncompressed (BI_RGB) 24/32-bit, bottom-up or top-down rows, 4-byte
    row padding. -> (width, height, channels, pixels row-major [(r,g,b)])."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression == 1 and bpp == 8:  # BI_RLE8 (palette-indexed)
        return _decode_bmp_rle8(payload, pixel_off, hdr_size, w, h)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only BI_RGB 24/32-bit and BI_RLE8 BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    nbytes = bpp // 8
    stride = ((w * nbytes + 3) // 4) * 4
    rows = []
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pixel_off + src_row * stride
        rows.append(
            [
                (
                    payload[base + x * nbytes + 2],  # stored BGR(A)
                    payload[base + x * nbytes + 1],
                    payload[base + x * nbytes],
                )
                for x in range(w)
            ]
        )
    return w, h, 3, [px for r in rows for px in r]


def _decode_bmp_rle8(payload: bytes, pixel_off: int, hdr_size: int,
                     w: int, h: int):
    """BI_RLE8 decode: 8-bit palette indexes run-length coded as
    (count, index) pairs with escape codes 0,0=end-of-line 0,1=end of
    bitmap 0,2=delta(dx,dy) 0,n>=3=absolute run (word-aligned). RLE
    bitmaps are always bottom-up. Untouched pixels are palette[0], as
    Windows renders them."""
    if h < 0:
        raise ValueError("RLE BMP cannot be top-down")
    ncolors = struct.unpack_from("<I", payload, 46)[0] or 256
    pal_off = 14 + hdr_size
    palette = [
        (payload[pal_off + 4 * i + 2], payload[pal_off + 4 * i + 1],
         payload[pal_off + 4 * i])
        for i in range(ncolors)
    ]
    idx = [[0] * w for _ in range(h)]  # bottom-up row-major
    x = y = 0
    pos = pixel_off
    while pos + 1 < len(payload):
        cnt, val = payload[pos], payload[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            for _ in range(cnt):
                if x < w and y < h:
                    idx[y][x] = val
                x += 1
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > len(payload):
                raise ValueError("truncated RLE8 BMP (delta escape)")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
        else:  # absolute mode: val literal indexes, padded to a word
            if pos + val > len(payload):
                raise ValueError("truncated RLE8 BMP (absolute run)")
            for i in range(val):
                if x < w and y < h:
                    idx[y][x] = payload[pos + i]
                x += 1
            pos += val + (val & 1)
    pixels = []
    for row in range(h - 1, -1, -1):  # bottom-up storage -> top-down out
        pixels.extend(palette[i] for i in idx[row])
    return w, h, 3, pixels


def encode_bmp_rle8(width: int, height: int, pixel_fn, palette=None):
    """BI_RLE8 writer for fixtures: quantizes pixel_fn through a
    256-color palette (default: 6x6x6 color cube + greys) and emits
    encoded runs + absolute blocks + EOL/EOB escapes."""
    if palette is None:
        palette = [
            (r * 51, g * 51, b * 51)
            for r in range(6) for g in range(6) for b in range(6)
        ] + [(v * 16 + 8,) * 3 for v in range(16)] + [(0, 0, 0)] * 24
    lookup = {}

    def nearest(px):
        if px not in lookup:
            lookup[px] = min(
                range(len(palette)),
                key=lambda i: sum((a - b) ** 2 for a, b in zip(palette[i], px)),
            )
        return lookup[px]

    data = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        xs = [nearest(pixel_fn(x, row)) for x in range(width)]
        x = 0
        while x < width:
            run = 1
            while x + run < width and xs[x + run] == xs[x] and run < 255:
                run += 1
            if run >= 2:
                data += bytes([run, xs[x]])
                x += run
            else:
                # absolute block of literals until the next run of >= 3
                lit_end = x + 1
                while lit_end < width and (lit_end - x) < 255:
                    nxt = 1
                    while (lit_end + nxt < width
                           and xs[lit_end + nxt] == xs[lit_end] and nxt < 3):
                        nxt += 1
                    if nxt >= 3:
                        break
                    lit_end += 1
                n = lit_end - x
                if n >= 3:
                    data += bytes([0, n]) + bytes(xs[x:lit_end])
                    if n & 1:
                        data += b"\x00"
                else:
                    for i in range(n):
                        data += bytes([1, xs[x + i]])
                x = lit_end
        data += b"\x00\x00"  # EOL
    data += b"\x00\x01"  # EOB

    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette[:256])
    pixel_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", pixel_off + len(data), 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1, len(data), 2835, 2835,
        256, 0,
    )
    return bytes(hdr + info + pal + data)


def decode_ppm(payload: bytes):
    """Pure-Python PPM (P6, maxval 255) decoder -> (w, h, 3, pixels)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> with comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    pix = [
        (payload[pos + i * 3], payload[pos + i * 3 + 1], payload[pos + i * 3 + 2])
        for i in range(w * h)
    ]
    return w, h, 3, pix


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, off: int, w: int, h: int, bpp: int, stride: int):
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at ``off``
    (filter-type byte per line; ``bpp`` = bytes per pixel for the
    left-neighbor offset, min 1 for sub-byte depths). Returns
    (list-of-line-bytearrays, new offset)."""
    prev = bytearray(stride)
    lines = []
    for _row in range(h):
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up_left = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        lines.append(line)
        prev = line
    return lines, off


def _png_line_pixels(line, w: int, nch: int, depth: int, palette):
    """One unfiltered scanline -> list of (r, g, b)."""
    if palette is not None:  # color type 3: palette indexes, any depth
        out = []
        if depth == 8:
            for x in range(w):
                out.append(palette[line[x] % len(palette)])
        else:  # 1/2/4-bit packed indexes, MSB first
            per_byte = 8 // depth
            mask = (1 << depth) - 1
            for x in range(w):
                byte = line[x // per_byte]
                shift = 8 - depth * (x % per_byte + 1)
                out.append(palette[((byte >> shift) & mask) % len(palette)])
        return out
    if nch == 1 and depth < 8:  # sub-byte greyscale: scale to 8-bit
        per_byte = 8 // depth
        mask = (1 << depth) - 1
        out = []
        for x in range(w):
            byte = line[x // per_byte]
            shift = 8 - depth * (x % per_byte + 1)
            g = ((byte >> shift) & mask) * 255 // mask
            out.append((g, g, g))
        return out
    step = nch * (2 if depth == 16 else 1)
    take = 2 if depth == 16 else 1  # 16-bit: high byte (standard 8-bit view)
    out = []
    for x in range(w):
        b0 = x * step
        if nch in (1, 2):  # grey / grey+alpha
            g = line[b0]
            out.append((g, g, g))
        else:  # RGB / RGBA (alpha dropped)
            out.append((line[b0], line[b0 + take], line[b0 + 2 * take]))
    return out


def decode_png(payload: bytes):
    """Pure-Python PNG decoder (stdlib zlib): grey at 1/2/4/8/16 bit
    (sub-byte samples scaled to 8-bit), grey+alpha / RGB / RGBA at 8 or
    16 bit (16-bit reads the high byte — the standard 8-bit view),
    palette (color type 3) at 1/2/4/8 bit, both
    non-interlaced and Adam7-interlaced layouts, all five scanline
    filters. -> (width, height, channels, pixels [(r,g,b)])."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = [tuple(data[3 * i : 3 * i + 3]) for i in range(len(data) // 3)]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if color not in (0, 2, 3, 4, 6) or interlace not in (0, 1):
        raise NotImplementedError(f"PNG color={color} interlace={interlace}")
    palette = None
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if depth not in (1, 2, 4, 8):
            raise NotImplementedError(f"palette PNG depth={depth}")
        palette = plte
        nch = 1
        bits_pp = depth
    elif color == 0:  # greyscale: every legal depth incl. sub-byte
        if depth not in (1, 2, 4, 8, 16):
            raise NotImplementedError(f"PNG depth={depth} for color={color}")
        nch = 1
        bits_pp = depth
    else:
        if depth not in (8, 16):
            raise NotImplementedError(f"PNG depth={depth} for color={color}")
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        bits_pp = nch * depth
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, bits_pp // 8)

    def stride_of(width_px):
        return (width_px * bits_pp + 7) // 8

    pix = [(0, 0, 0)] * (w * h)
    if interlace == 0:
        lines, _ = _png_unfilter(raw, 0, w, h, bpp, stride_of(w))
        for y, line in enumerate(lines):
            row = _png_line_pixels(line, w, nch, depth, palette)
            pix[y * w : (y + 1) * w] = row
    else:  # Adam7: each pass is an independently-filtered sub-image
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            lines, off = _png_unfilter(raw, off, pw, ph, bpp, stride_of(pw))
            for py, line in enumerate(lines):
                row = _png_line_pixels(line, pw, nch, depth, palette)
                y = y0 + py * dy
                for px_i, rgb in enumerate(row):
                    pix[y * w + x0 + px_i * dx] = rgb
    return w, h, nch if palette is None else 3, pix


def encode_png(width: int, height: int, pixel_fn) -> bytes:
    """Minimal deterministic 8-bit RGB PNG writer (filter 0 rows, one
    zlib stream); ``pixel_fn(x, y) -> (r, g, b)``. Synthesizes REAL
    compressed image payloads for tests without any image library."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    scan = bytearray()
    for y in range(height):
        scan.append(0)  # filter: None
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            scan += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), 9))
        + chunk(b"IEND", b"")
    )


def decode_image_pixels(payload: bytes, meta: dict, fake: bool):
    """Decode one image payload to (w, h, channels, pixels row-major
    [(r,g,b)]). REAL path for BMP (incl. RLE8) / PPM / PNG /
    baseline+progressive JPEG / GIF; other formats raise in strict mode
    (no codec libs in this environment) or produce a deterministic
    payload-hash-derived fake in fake mode."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(payload)
    if not fake:
        raise NotImplementedError(
            "decode for this format requires an image library not present "
            "in this environment; supply BMP/PPM/PNG/baseline-JPEG "
            "payloads, run with fake=True, or plug in a real decoder"
        )
    # clamp meta-declared dimensions: fake pixels materialize w*h
    # tuples, and untrusted metadata must not size executor memory
    w = min(max(int(meta.get("width", 16)), 1), 1024)
    h = min(max(int(meta.get("height", 16)), 1), 1024)
    d = hashlib.md5(payload).digest()
    pix = [
        (d[(3 * i) % 16], d[(3 * i + 1) % 16], d[(3 * i + 2) % 16])
        for i in range(w * h)
    ]
    return w, h, 3, pix


def decode_image_batch(payload: bytes, meta: dict, fake: bool):
    """Decode one image payload to (w, h, channels, features[8])."""
    if fake and payload[:2] not in (b"BM", b"P6") and payload[:8] != _PNG_SIG \
            and payload[:2] != b"\xff\xd8" and payload[:4] != b"GIF8":
        # fake-mode feature path keeps its historical md5-float shape
        w = int(meta.get("width", 16))
        h = int(meta.get("height", 16))
        return w, h, 3, _fake_floats(payload, 8)
    return _with_features(decode_image_pixels(payload, meta, fake))


def bilinear_resize(w: int, h: int, pixels: list, out_w: int, out_h: int):
    """Pure-Python bilinear resample of row-major (r,g,b) pixels."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    out = []
    for oy in range(out_h):
        sy = (oy + 0.5) * h / out_h - 0.5
        y0 = max(0, min(h - 1, int(math.floor(sy))))
        y1 = min(h - 1, y0 + 1)
        fy = min(1.0, max(0.0, sy - y0))
        for ox in range(out_w):
            sx = (ox + 0.5) * w / out_w - 0.5
            x0 = max(0, min(w - 1, int(math.floor(sx))))
            x1 = min(w - 1, x0 + 1)
            fx = min(1.0, max(0.0, sx - x0))
            p00 = pixels[y0 * w + x0]
            p01 = pixels[y0 * w + x1]
            p10 = pixels[y1 * w + x0]
            p11 = pixels[y1 * w + x1]
            out.append(tuple(
                int(round(
                    p00[ch] * (1 - fx) * (1 - fy)
                    + p01[ch] * fx * (1 - fy)
                    + p10[ch] * (1 - fx) * fy
                    + p11[ch] * fx * fy
                ))
                for ch in range(3)
            ))
    return out


RESIZED_SCHEMA = (
    "asset_id long, width int, height int, payload binary"
)


def resize_images(
    assets: DataFrame, out_w: int, out_h: int, fake: bool = False
) -> DataFrame:
    """Thumbnail/normalization pass over the image assets: decode ->
    bilinear resample to (out_w, out_h) -> re-encode as lossless PNG —
    (asset_id, width, height, payload). The standard pre-training
    image-normalization step, Arrow-batched like image_features; the
    output is itself a valid asset table payload (PNG), so resize
    composes with every downstream decode/feature op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, _c, pix = decode_image_pixels(
                    bytes(payload), dict(meta or {}), fake
                )
                small = bilinear_resize(w, h, pix, out_w, out_h)
                png = encode_png(out_w, out_h, lambda x, y: small[y * out_w + x])
                rows.append((aid, out_w, out_h, png))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "payload"]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def _with_features(decoded):
    w, h, c, pix = decoded
    return w, h, c, _pixel_features(w, h, c, pix)


def image_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """images -> (asset_id, width, height, channels, features).

    Arrow-batched; at scale run over a table partitioned by a
    size-balanced bucket of asset_id so batches have bounded byte size
    (media payloads dominate memory, not row counts)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                w, h, c, feats = decode_image_batch(bytes(payload), dict(meta or {}), fake)
                rows.append((aid, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "channels", "features"]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def audio_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """audio -> (asset_id, sample_rate, n_samples, features). STUB decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                payload = bytes(payload)
                if payload[:4] == b"RIFF":  # REAL path: PCM WAV via stdlib
                    sr, n, feats = decode_wav(payload)
                    rows.append((aid, sr, n, feats))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "compressed audio decode requires an audio library "
                        "not present; supply PCM WAV payloads, run with "
                        "fake=True, or plug in a real decoder"
                    )
                sr = int(meta.get("sample_rate", 16000))
                rows.append((aid, sr, len(payload) // 2, _fake_floats(payload, 8)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "sample_rate", "n_samples", "features"]
            )

    return (
        assets.where(F.col("kind") == "audio")
        .select("asset_id", "payload", "meta")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def decode_avi_mjpeg(payload: bytes) -> list:
    """Pure-Python MJPEG-in-AVI reader: walk the RIFF chunk tree and
    return the list of per-frame JPEG byte strings ('00dc'/'00db'
    chunks inside the 'movi' list). Frames decode with the baseline
    JPEG codec (analytics/jpeg.py) — real video decode, no media lib."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    frames: list = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list type fourcc
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)  # chunks pad to even

    walk(12, len(payload))
    return frames


def encode_avi_mjpeg(width: int, height: int, frame_fns: list, fps: int = 10) -> bytes:
    """Minimal deterministic MJPEG AVI writer: ``frame_fns`` is a list
    of ``pixel_fn(x, y) -> (r,g,b)`` per frame, each encoded with the
    baseline JPEG encoder. Synthesizes REAL compressed video payloads
    for tests without any media library."""
    from .jpeg import encode_jpeg

    jpegs = [encode_jpeg(width, height, fn, quant=1) for fn in frame_fns]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(jpegs)
    maxbuf = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<IIIIIIIIII16x",
        1_000_000 // max(fps, 1), maxbuf * fps, 0, 0x10, n, 0, 1, maxbuf,
        width, height,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi8x",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, maxbuf, 0, 0,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def sample_frames(assets: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """video -> one row per sampled frame (asset_id, frame_idx, frame).

    REAL paths: MJPEG-in-AVI (RIFF parse above; each emitted frame is
    that frame's JPEG bytes) and animated GIF (disposal-composited
    frames re-encoded as lossless PNG bytes) — either way sampled
    frames feed straight into ``image_features``, the
    sample->featurize composition a video training pipeline runs.
    Other containers raise in strict mode; fake mode keeps the
    fixed-256-byte pseudo-frames that exercise the 1->N explode
    shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    frames = decode_avi_mjpeg(payload)
                    for idx in range(0, len(frames), every_n):
                        rows.append((aid, idx, frames[idx]))
                    continue
                if payload[:4] == b"GIF8":
                    from .gif import decode_gif_frames

                    w, h, gframes = decode_gif_frames(payload)
                    for idx in range(0, len(gframes), every_n):
                        pix = gframes[idx]
                        rows.append((
                            aid, idx,
                            encode_png(w, h, lambda x, y: pix[y * w + x]),
                        ))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode for this container requires a media "
                        "library not present; supply MJPEG-AVI payloads, run "
                        "with fake=True, or plug in a real decoder"
                    )
                n_frames = max(len(payload) // 256, 1)
                for idx in range(0, n_frames, every_n):
                    rows.append((aid, idx, payload[idx * 256 : (idx + 1) * 256]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def decode_wav(payload: bytes):
    """PCM WAV via stdlib ``wave`` -> (sample_rate, n_samples,
    features[8]: mean/max/min of normalized 16-bit samples + duration +
    channel count + zero-crossing rate + spectral centroid + spectral
    rolloff(85%), both in Hz via numpy rfft — the real DSP summary a
    training pipeline keys quality filters on)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width != 2:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    samples = struct.unpack("<" + "h" * (len(raw) // 2), raw)
    m = max(len(samples), 1)
    mean = sum(samples) / m / 32768.0
    mx = max(samples, default=0) / 32768.0
    mn = min(samples, default=0) / 32768.0
    zc = sum(
        1 for i in range(1, len(samples)) if (samples[i - 1] < 0) != (samples[i] < 0)
    ) / m
    centroid = rolloff = 0.0
    if len(samples) >= 2:
        mag = np.abs(np.fft.rfft(np.asarray(samples, dtype=np.float64)))
        freqs = np.fft.rfftfreq(len(samples), d=1.0 / (sr or 1))
        total = float(mag.sum())
        if total > 0.0:
            centroid = float((freqs * mag).sum() / total)
            cum = np.cumsum(mag)
            rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    feats = [mean, mx, mn, n / float(sr or 1), float(ch), zc, centroid, rolloff]
    return sr, n, [float(x) for x in feats]


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (bottom-up, 4-byte row padding);
    ``pixel_fn(x, y) -> (r, g, b)``. Used to synthesize REAL image
    payloads for tests/fixtures without any image library."""
    stride = ((width * 3 + 3) // 4) * 4
    pixel_data = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            r, g, b = pixel_fn(x, row)
            pixel_data += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        pixel_data += b"\x00" * (stride - width * 3)
    size = 54 + len(pixel_data)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return bytes(hdr + info + pixel_data)


def encode_wav(sample_rate: int, samples: list) -> bytes:
    """Minimal 16-bit mono PCM WAV writer (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(struct.pack("<" + "h" * len(samples), *samples))
    return buf.getvalue()


def synth_media_assets(spark, n: int = 30) -> DataFrame:
    """Deterministic REAL-format asset table: BMP images (gradient
    patterns varying per asset) and PCM WAV audio (pure tones via a
    cubic-approx sine — integer arithmetic, fully deterministic)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
            # rotate container formats over the SAME pixel grid: BMP and
            # PNG are lossless (identical features), JPEG is the real
            # baseline codec at quant=1 (near-lossless: features agree
            # to within the DCT rounding error) and slot 2 is the
            # PROGRESSIVE (SOF2) writer — same coefficients, different
            # scan order — GIF gets a palette-limited variant of the
            # grid (<=256 colors is a format constraint) — all five
            # decode paths are exercised by the same asset table
            if i % 8 == 4:
                from .jpeg import encode_jpeg

                encoder = lambda w_, h_, fn: encode_jpeg(w_, h_, fn, quant=1)  # noqa: E731
            elif i % 8 == 2:
                from .jpeg import encode_jpeg_progressive

                encoder = lambda w_, h_, fn: encode_jpeg_progressive(  # noqa: E731
                    w_, h_, fn, quant=1
                )
            elif i % 8 == 6:
                from .gif import encode_gif

                encoder = encode_gif
            else:
                encoder = encode_bmp if i % 8 == 0 else encode_png
            quant = 32 if i % 8 == 6 else 1  # GIF: coarse palette
            payload = encoder(
                w, h,
                lambda x, y, i=i, q=quant: (
                    (x * 37 + i * 11) % 256 // q * q,
                    (y * 53 + i * 7) % 256 // q * q,
                    (x * y + i) % 256 // q * q,
                ),
            )
            rows.append(
                (i, "image", payload, {"width": str(w), "height": str(h)})
            )
        else:
            sr = 8000
            n_samp = 400 + (i % 4) * 100
            samples = [
                ((k * (i + 3) * 257) % 20001) - 10000 for k in range(n_samp)
            ]
            rows.append(
                (i, "audio", encode_wav(sr, samples), {"sample_rate": str(sr)})
            )
    return spark.createDataFrame(rows, ASSETS_SCHEMA)


def synth_assets(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(512, 4096)))
        meta = (
            {"width": str(8 * (1 + i % 4)), "height": str(8 * (1 + i % 3))}
            if kind == "image"
            else {"sample_rate": "16000"}
            if kind == "audio"
            else {"fps": "30"}
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, ASSETS_SCHEMA)


# -- A/V container metadata (no frame decode) -----------------------------

# Container sniffing lives HERE, once, in both forms (Python for the
# Arrow batch, Column expressions for JVM-side scans) — the WARC bridge
# and the media CLI import these so the three call sites can't drift.

def sniff_isobmff(data: bytes) -> bool:
    """ISO-BMFF (MP4/MOV): 'ftyp' box type at offset 4."""
    return len(data) > 8 and data[4:8] == b"ftyp"


def sniff_mpeg_audio(data: bytes) -> bool:
    """MPEG audio: ID3v2 tag or a bare frame syncword (0xFF 0xEx)."""
    return data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    )


def isobmff_magic(col) -> "F.Column":
    """Column twin of sniff_isobmff."""
    return F.substring(col, 5, 4) == F.lit(b"ftyp")


def mpeg_audio_magic(col) -> "F.Column":
    """Column twin of sniff_mpeg_audio (binary columns compare
    lexicographically UNSIGNED, so >= 0xE0 on the second byte works)."""
    return (F.substring(col, 1, 3) == F.lit(b"ID3")) | (
        (F.substring(col, 1, 1) == F.lit(b"\xff"))
        & (F.substring(col, 2, 1) >= F.lit(b"\xe0"))
    )


def mp4_metadata(payload: bytes) -> dict:
    """ISO-BMFF (MP4/MOV) box walk: brand, movie duration and track
    handler types from ftyp/mvhd/hdlr — the metadata a corpus profile
    needs, without touching the (H.264 etc.) sample data whose decode
    honestly raises elsewhere. Handles 64-bit largesize and
    size=0-to-EOF boxes."""
    out = {"format": "mp4", "brand": None, "duration_s": None, "tracks": []}

    def walk(pos: int, end: int, depth: int = 0) -> None:
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", payload, pos)
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize follows the type
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                body = pos + 16
            elif size == 0:  # to end of enclosing scope
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError("truncated MP4 box")
            if btype == b"ftyp":
                out["brand"] = payload[body : body + 4].decode("latin-1")
            elif btype == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, body + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", payload, body + 4 + 8)
                if ts:
                    out["duration_s"] = round(dur / ts, 3)
            elif btype == b"hdlr":
                out["tracks"].append(
                    payload[body + 8 : body + 12].decode("latin-1")
                )
            elif btype in (b"moov", b"trak", b"mdia") and depth < 8:
                walk(body, pos + size, depth + 1)
            pos += size

    walk(0, len(payload))
    if out["brand"] is None and not out["tracks"]:
        raise ValueError("no MP4 structure found")
    return out


_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def mp3_metadata(payload: bytes) -> dict:
    """MPEG audio (Layer III) stream metadata: skip an ID3v2 tag,
    parse frame headers (version/bitrate/samplerate), count frames and
    sum their durations. Header-walk only — the entropy-coded audio
    itself still raises in the decode path."""
    pos = 0
    if payload[:3] == b"ID3":  # syncsafe 28-bit size after 6-byte header
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    frames, duration = 0, 0.0
    first = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
            pos += 1
            continue
        ver = (payload[pos + 1] >> 3) & 0x3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (payload[pos + 1] >> 1) & 0x3  # 1 = Layer III
        br_i = (payload[pos + 2] >> 4) & 0xF
        sr_i = (payload[pos + 2] >> 2) & 0x3
        pad = (payload[pos + 2] >> 1) & 0x1
        if ver == 1 or layer != 1 or br_i in (0, 15) or sr_i == 3:
            pos += 1
            continue
        bitrate = (
            _MP3_BITRATES_V1L3 if ver == 3 else _MP3_BITRATES_V2L3
        )[br_i] * 1000
        sr = _MP3_RATES[ver][sr_i]
        spf = 1152 if ver == 3 else 576
        flen = spf // 8 * bitrate // sr + pad
        if flen <= 4:
            pos += 1
            continue
        if first is None:
            first = {"bitrate": bitrate, "sample_rate": sr,
                     "mpeg_version": {3: 1, 2: 2, 0: 25}[ver]}
        frames += 1
        duration += spf / sr
        pos += flen
    if first is None:
        raise ValueError("no MPEG audio frames found")
    return {"format": "mp3", "n_frames": frames,
            "duration_s": round(duration, 3), **first}


def media_metadata(assets: DataFrame) -> DataFrame:
    """(asset_id, payload) -> container metadata for MP4/MP3 payloads,
    sniffed by magic bytes (never by declared type). Arrow-batched like
    the other media ops; one row per parseable asset, with the fields
    JSON-encoded so the schema stays stable across formats."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        for pdf in batches:
            ids, fmts, durs, metas = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    if sniff_isobmff(data):
                        m = mp4_metadata(data)
                    elif sniff_mpeg_audio(data):
                        m = mp3_metadata(data)
                    else:
                        continue
                # sniffed-by-magic garbage must drop the row, never the
                # task: truncated boxes raise struct.error/IndexError
                # from fixed-offset reads, not just ValueError
                except (ValueError, struct.error, IndexError):
                    continue
                ids.append(aid)
                fmts.append(m.pop("format"))
                durs.append(m.pop("duration_s"))
                metas.append(_json.dumps(m, sort_keys=True))
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="int64"),
                 "format": pd.Series(fmts, dtype="object"),
                 "duration_s": pd.Series(durs, dtype="float64"),
                 "detail": pd.Series(metas, dtype="object")}
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, format string, duration_s double, detail string"
    )
