"""Pure-Python GIF decoder (87a/89a) + minimal writer for fixtures.

The remaining common crawler image format after BMP/PPM/PNG/JPEG:
palette-indexed LZW. The decoder handles global/local color tables,
variable-width LZW with dictionary reset, the 4-pass interlace layout,
and returns the FIRST frame (animation frames beyond the first are a
sampling concern, not a decode concern — sample_frames handles video).
The writer emits the classic "uncompressed GIF" form — literal codes
with frequent clear codes so the code width never grows — which is a
fully valid LZW stream any decoder accepts, built here so tests can
synthesize real GIF payloads without an image library.
"""

from __future__ import annotations

import struct


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> list:
    """GIF LZW: variable-width codes LSB-first, clear/end codes,
    dictionary grows to 4096 then freezes until a clear."""
    clear = 1 << mcs
    end = clear + 1

    def reset():
        return {i: (i,) for i in range(clear)}, mcs + 1, None

    table, width, prev = reset()
    next_code = end + 1
    out: list = []
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width, prev = reset()
            next_code = end + 1
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def _iter_gif_frames(payload: bytes):
    """Yield (width, height, composited pixel list) per frame, applying
    GIF89a graphic-control disposal semantics between frames (0/1 leave,
    2 restore the frame rect to background, 3 restore the pre-frame
    canvas) and honoring the transparent index while drawing."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg % len(gct)] if gct else (0, 0, 0)
    canvas = [bg_rgb] * (w * h)
    disposal, transparent = 0, None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gce_packed = payload[pos + 1]
                disposal = (gce_packed >> 2) & 0x07
                transparent = (
                    payload[pos + 4] if gce_packed & 0x01 else None
                )
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        interlaced = bool(ipacked & 0x40)
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idxs = _lzw_decode(mcs, bytes(data), iw * ih)
        if len(idxs) < iw * ih:
            idxs = idxs + [0] * (iw * ih - len(idxs))
        if interlaced:
            rows = [None] * ih
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, ih, step):
                    rows[y] = idxs[src * iw : (src + 1) * iw]
                    src += 1
            idxs = [i for r in rows for i in r]
        before = list(canvas) if disposal == 3 else None
        for y in range(ih):
            for x in range(iw):
                idx = idxs[y * iw + x]
                if transparent is not None and idx == transparent:
                    continue
                gx, gy = left + x, top + y
                if gx < w and gy < h:
                    canvas[gy * w + gx] = ct[idx % len(ct)]
        yield w, h, list(canvas)
        if disposal == 2:  # restore frame rect to background
            for y in range(ih):
                for x in range(iw):
                    gx, gy = left + x, top + y
                    if gx < w and gy < h:
                        canvas[gy * w + gx] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal, transparent = 0, None


def decode_gif(payload: bytes):
    """-> (width, height, 3, pixels row-major [(r,g,b)]) of the FIRST
    composited frame. Raises ValueError on malformed data."""
    for w, h, pix in _iter_gif_frames(payload):
        return w, h, 3, pix
    raise ValueError("GIF without an image block")


def decode_gif_frames(payload: bytes):
    """-> (width, height, [frame pixel lists]) — every composited frame
    of an animated GIF (disposal methods applied between frames)."""
    frames = []
    w = h = 0
    for w, h, pix in _iter_gif_frames(payload):
        frames.append(pix)
    if not frames:
        raise ValueError("GIF without an image block")
    return w, h, frames


def _lzw_literal_stream(indexes: list, mcs: int) -> bytes:
    """Index list -> LZW byte stream of literal codes with clear codes
    emitted before the width would grow (the uncompressed-GIF trick)."""
    clear = 1 << mcs
    end = clear + 1
    width_bits = mcs + 1
    out_codes = [clear]
    budget = (1 << width_bits) - end - 2
    since_clear = 0
    for idx in indexes:
        if since_clear >= budget:
            out_codes.append(clear)
            since_clear = 0
        out_codes.append(idx)
        since_clear += 1
    out_codes.append(end)
    acc = nbits = 0
    stream = bytearray()
    for code in out_codes:
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def _sub_blocks(stream: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def _build_gif(width: int, height: int, frame_pixel_lists: list,
               disposal: int = 1) -> bytes:
    """Shared writer: one GLOBAL palette over all frames' colors, one
    image block per frame (GCE with ``disposal`` between frames when
    animated)."""
    palette = sorted(
        {(r & 0xFF, g & 0xFF, b & 0xFF) for pix in frame_pixel_lists for r, g, b in pix}
    )
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    index = {c: i for i, c in enumerate(palette)}
    size = 2
    while size < len(palette):
        size <<= 1
    mcs = max(2, size.bit_length() - 1)
    size = 1 << mcs

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (mcs - 1), 0, 0)
    for i in range(size):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    animated = len(frame_pixel_lists) > 1
    for pix in frame_pixel_lists:
        if animated:  # graphic control: disposal + 10ms delay
            out += b"\x21\xf9\x04" + bytes([(disposal & 7) << 2, 1, 0, 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(mcs)
        idxs = [index[(r & 0xFF, g & 0xFF, b & 0xFF)] for r, g, b in pix]
        out += _sub_blocks(_lzw_literal_stream(idxs, mcs))
    out += b"\x3b"
    return bytes(out)


def encode_gif(width: int, height: int, pixel_fn) -> bytes:
    """Minimal deterministic single-frame GIF89a writer: builds the
    palette from the image's distinct colors (<= 256 required) and
    emits literal LZW codes with clear codes before the width would
    grow — the standard uncompressed-GIF construction."""
    pixels = [pixel_fn(x, y) for y in range(height) for x in range(width)]
    return _build_gif(width, height, [pixels])


def encode_gif_animated(width: int, height: int, frame_fns: list,
                        disposal: int = 1) -> bytes:
    """Animated GIF89a from per-frame ``pixel_fn(x, y)`` callables
    (full-frame images, shared global palette, ``disposal`` applied
    between frames)."""
    frames = [
        [fn(x, y) for y in range(height) for x in range(width)]
        for fn in frame_fns
    ]
    return _build_gif(width, height, frames, disposal=disposal)
