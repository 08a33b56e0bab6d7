"""Multimodal column plumbing (SURVEY.md §2.K): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas functions over ``mapInPandas``.

The container has no third-party image/audio codecs, so the decode
surface splits in two:

- ``decode_image`` is a REAL pure-Python decoder for the formats
  decodable without third-party codecs — binary PPM (P6), 24-bit
  uncompressed BMP, (stdlib ``zlib``) non-interlaced 8-bit
  gray/RGB/RGBA PNG with full sub/up/average/paeth filter
  reconstruction, and (``operators.jpeg``, numpy DCT + standard
  Huffman tables) baseline sequential JPEG in grayscale or YCbCr
  4:4:4 — returning true header dimensions and packed top-down pixel
  bytes (BMP row padding stripped, bottom-up order normalized, BGR
  swapped to RGB; PNG scanline filters undone; JPEG fully
  entropy-decoded, dequantized, IDCT'd and color-converted).
  ``decode_features`` runs it over binary payload columns in the same
  Arrow ``mapInPandas`` shape as every other extractor here.
- remaining exotic variants (arithmetic-coded/12-bit JPEG, video)
  still raise — wire PIL/libvips into the same function in
  deployment; ``fake_feature_extract`` remains the deterministic
  stand-in where tests need a payload-agnostic feature tuple.

Everything around the decoders is the load-bearing part at 100 TB —
the binary schema, the Arrow batch shape, the mapInPandas iterator
contract, the partition sizing.

Scale design: mapInPandas streams Arrow record batches through the
Python worker — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size. Binary payloads ride the same columnar batches;
never collect them, never put them in a shuffle key. Feature
extraction is a narrow map — zero shuffles; repartition upstream only
to balance payload bytes (not row counts) across workers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, "
    "content_hash string"
)


_WS = b" \t\r\n\x0b\x0c"


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from packed RGB bytes."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixels must be 3*width*height packed RGB bytes")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER) from packed RGB
    bytes: rows flipped to the format's bottom-up order, channels
    swapped to BGR, each row padded to a 4-byte boundary."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixels must be 3*width*height packed RGB bytes")
    stride = (3 * width + 3) // 4 * 4
    pad = b"\x00" * (stride - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):
        row = pixels[3 * width * y : 3 * width * (y + 1)]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        rows.append(bytes(bgr) + pad)
    data = b"".join(rows)
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type ↔ channel count for the 8-bit truecolor/gray cases
_PNG_COLOR_TO_CH = {0: 1, 2: 3, 6: 4}
_PNG_CH_TO_COLOR = {1: 0, 3: 2, 4: 6}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): the neighbor — left a, above b,
    upper-left c — closest to the linear estimate a + b - c, ties
    broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(row: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    """Apply filter ``ft`` to one scanline (encode direction)."""
    out = bytearray(len(row))
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        x = row[i]
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _png_unfilter_row(line: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    """Reconstruct one scanline from its filtered form (decode
    direction). Inherently sequential within the row — each byte
    depends on the already-reconstructed left neighbor — which is why
    this runs per-row in Python rather than vectorized."""
    if ft == 0:
        return bytes(line)
    out = bytearray(line)
    for i in range(len(out)):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            out[i] = (out[i] + a) & 0xFF
        elif ft == 2:
            out[i] = (out[i] + b) & 0xFF
        elif ft == 3:
            out[i] = (out[i] + (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (out[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filter_cycle: bool = True,
) -> bytes:
    """Non-interlaced 8-bit PNG (gray/RGB/RGBA by ``channels``) from
    packed top-down pixel bytes. ``filter_cycle`` rotates the scanline
    filter none→sub→up→average→paeth per row so a round-trip exercises
    every reconstruction path; False writes filter 0 everywhere."""
    import zlib

    if channels not in _PNG_CH_TO_COLOR:
        raise ValueError("channels must be 1 (gray), 3 (RGB) or 4 (RGBA)")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixels must be channels*width*height packed bytes")
    prev = bytes(stride)
    raws = []
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = y % 5 if filter_cycle else 0
        raws.append(bytes([ft]) + _png_filter_row(row, prev, channels, ft))
        prev = row
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, _PNG_CH_TO_COLOR[channels], 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[str, int, int, int, bytes]:
    import zlib

    pos, hdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            hdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if hdr is None or len(hdr) < 13:
        raise ValueError("PNG missing IHDR")
    width = int.from_bytes(hdr[0:4], "big")
    height = int.from_bytes(hdr[4:8], "big")
    bit, color, comp, filt, interlace = hdr[8:13]
    if (
        bit != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or color not in _PNG_COLOR_TO_CH
    ):
        raise ValueError(
            "only non-interlaced 8-bit gray/RGB/RGBA PNG supported "
            "(palette/16-bit/Adam7 need PIL/libvips in deployment)"
        )
    channels = _PNG_COLOR_TO_CH[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prev = _png_unfilter_row(line, prev, channels, ft)
        out += prev
    return ("png", width, height, channels, bytes(out))


def _ppm_header_ints(buf: bytes, count: int) -> tuple[list[int], int]:
    """Parse ``count`` whitespace/comment-separated integers after the
    P6 magic; returns the values and the offset of the pixel data
    (one whitespace byte after the last header value, per spec)."""
    i, vals = 2, []
    while len(vals) < count:
        while i < len(buf) and buf[i] in _WS:
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < len(buf) and buf[j] not in _WS:
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1


def decode_image(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Decode an uncompressed image payload without third-party codecs.

    Returns ``(format, width, height, channels, pixels)`` with
    ``pixels`` as packed top-down bytes regardless of the on-disk
    layout (BMP's bottom-up BGR rows and 4-byte row padding are
    normalized away; PNG scanline filters are reconstructed). Supports
    binary PPM (P6, maxval ≤ 255), 24-bit uncompressed BMP,
    non-interlaced 8-bit gray/RGB/RGBA PNG (stdlib zlib inflate +
    sub/up/average/paeth unfiltering), baseline AND progressive
    JPEG (gray / YCbCr at 4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1, restart
    intervals, successive approximation — ``operators.jpeg``), and
    non-interlaced GIF87a/89a (real variable-width LZW, global or
    local palette); remaining exotic variants (arithmetic-coded /
    12-bit JPEG, palette/16-bit/Adam7 PNG, interlaced GIF, video)
    raise ValueError — PIL/libvips slot in here in deployment."""
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        w, h, ch, pixels = decode_jpeg(payload)
        return ("jpeg", w, h, ch, pixels)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"P6":
        (width, height, maxval), off = _ppm_header_ints(payload, 3)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        need = 3 * width * height
        pixels = payload[off : off + need]
        if len(pixels) != need:
            raise ValueError("truncated PPM pixel data")
        return ("ppm", width, height, 3, pixels)
    if payload[:2] == b"BM":
        data_off = int.from_bytes(payload[10:14], "little")
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise ValueError("only 24-bit uncompressed BMP supported")
        top_down = height < 0
        height = abs(height)
        stride = (3 * width + 3) // 4 * 4
        out = bytearray()
        ys = range(height) if top_down else range(height - 1, -1, -1)
        for y in ys:
            row = payload[data_off + y * stride :][: 3 * width]
            if len(row) != 3 * width:
                raise ValueError("truncated BMP pixel data")
            rgb = bytearray(row)
            rgb[0::3], rgb[2::3] = row[2::3], row[0::3]
            out += rgb
        return ("bmp", width, height, 3, bytes(out))
    # TGA has NO magic number: dispatch last, only when the 18-byte
    # header is self-consistent for the supported 24-bit truecolor
    # types (the risk of misrouting another format here is nil — all
    # formats above matched on real signatures first)
    if (
        len(payload) >= 18
        and payload[1] == 0
        and payload[2] in (2, 10)
        and payload[16] == 24
    ):
        return _decode_tga(payload)
    raise ValueError(
        "unsupported image format (PPM P6, 24-bit BMP, 8-bit PNG, "
        "baseline JPEG, GIF and 24-bit TGA decode here; wire "
        "PIL/libvips for other formats in deployment)"
    )


def fake_feature_extract(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decoded (width, height, channels):
    derived from payload bytes only, so every engine agrees."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, 1 + n % 3)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata has no binary media; synthesize an opaque payload from
    the text bytes (utf-8). In production this column comes straight
    from parquet BINARY — same schema, same plan shape."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Python worker pass, Arrow in/out, bounded batches; the
    content hash doubles as the exact-dedup key for media files.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            feats = [fake_feature_extract(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(p) for p in payloads],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "content_hash": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, "payload")
        .repartition(n_parts, id_col)  # spread single-file inputs across workers
        .mapInPandas(batches, schema=FEATURE_SCHEMA)
    )


DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, channels int, "
    "byte_len int, pixel_sum bigint"
)


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode over binary payload columns: one Arrow
    ``mapInPandas`` pass runs :func:`decode_image` per payload and
    emits the true header dimensions plus an exact integer pixel sum
    over the decoded (padding-stripped, RGB-normalized) bytes — the
    structural proof the decoder read actual pixel data, and the
    shape a real feature extractor (thumbnailer, embedder) slots
    into. Narrow map, zero shuffles, memory bounded per Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "fmt", "width", "height", "channels",
                    "byte_len", "pixel_sum")}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                fmt, w, h, ch, pixels = decode_image(payload)
                out["doc_id"].append(doc_id)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["byte_len"].append(len(payload))
                out["pixel_sum"].append(sum(pixels))
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, "payload")
        .repartition(n_parts, id_col)
        .mapInPandas(batches, schema=DECODE_SCHEMA)
    )


RESIZE_SCHEMA = (
    "doc_id bigint, byte_len int, out_len int, resized_hash string"
)


def resize_payload(
    df: DataFrame, id_col: str = "doc_id", target: int = 256
) -> DataFrame:
    """Resize plumbing: each payload is downsampled to ``target``
    bytes by nearest-neighbor index mapping (src = j·len // target) —
    the deterministic stand-in for an image resize, producing a NEW
    derived payload per row inside the same Arrow pass (the
    byte-transform shape; a real thumbnailer slots into the loop).

    Output carries the derived payload's length and hash (over the
    hex rendering, so VARCHAR-only oracle engines can recompute it);
    the resized bytes themselves stay in the Python worker — at scale
    they'd be written straight to a binary sink column, never
    collected."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out = {"doc_id": [], "byte_len": [], "out_len": [], "resized_hash": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                blen = len(payload)
                n = min(target, blen)
                resized = bytes(payload[(j * blen) // n] for j in range(n))
                out["doc_id"].append(doc_id)
                out["byte_len"].append(blen)
                out["out_len"].append(n)
                out["resized_hash"].append(
                    hashlib.md5(resized.hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, "payload")
        .repartition(n_parts, id_col)
        .mapInPandas(batches, schema=RESIZE_SCHEMA)
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int, frame_hash string"


def sample_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: each payload fans out to N frame rows — the
    flatMap shape of video/audio chunking, still one Arrow pass.

    The decoder stub derives N and per-frame offsets from payload
    bytes deterministically (real codecs slot into the same iterator:
    one input batch → many output rows, memory bounded per batch).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_hash": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload) % 5 + 1  # stub frame count
                for i in range(n):
                    off = (i * len(payload)) // n
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    # hash over the hex of the slice (not raw bytes):
                    # keeps the stub computable by VARCHAR-only hash
                    # implementations in oracle engines
                    out["frame_hash"].append(
                        hashlib.md5(payload[off : off + 16].hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, "payload")
        .repartition(n_parts, id_col)
        .mapInPandas(batches, schema=FRAME_SCHEMA)
    )


# -- GIF (LZW) ---------------------------------------------------------------

def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, clear/EOI
    codes, 12-bit table cap with an explicit clear on overflow."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = indices[:1]
    for k in indices[1:]:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # encoder leads the decoder's deferred first add by one,
            # hence the +1 vs the decoder's bump condition
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([k])
    emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = acc = nbits = 0

    def read(size: int) -> int | None:
        nonlocal pos, acc, nbits
        while nbits < size:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        c = read(code_size)
        if c is None or c == eoi:
            break
        if c == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[c]
        elif c < len(table):
            entry = table[c]
        elif c == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """GIF87a from packed RGB bytes: a deterministic sorted palette of
    the image's distinct colors (≤256 — GIF's hard limit), real LZW
    entropy coding, 255-byte sub-block framing."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixels must be 3*width*height packed RGB bytes")
    colors = sorted({pixels[i : i + 3] for i in range(0, len(pixels), 3)})
    if len(colors) > 256:
        raise ValueError("GIF supports at most 256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())
    lookup = {c: i for i, c in enumerate(colors)}
    indices = bytes(
        lookup[pixels[i : i + 3]] for i in range(0, len(pixels), 3)
    )
    palette = b"".join(colors) + b"\x00\x00\x00" * ((1 << depth) - len(colors))
    min_code_size = max(2, depth)
    lzw = _lzw_encode(indices, min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF87a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0x80 | (depth - 1), 0, 0])
        + palette
        + b"\x2c\x00\x00\x00\x00"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


def _decode_gif(payload: bytes) -> tuple[str, int, int, int, bytes]:
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF contains no image data")
        else:
            raise ValueError("corrupt GIF block stream")
    iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
    ipacked = payload[pos + 9]
    pos += 10
    if ipacked & 0x40:
        raise ValueError("interlaced GIF not supported")
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    min_code_size = payload[pos]
    pos += 1
    lzw = bytearray()
    while payload[pos]:
        ln = payload[pos]
        lzw += payload[pos + 1 : pos + 1 + ln]
        pos += ln + 1
    indices = _lzw_decode(bytes(lzw), min_code_size)
    if len(indices) < iw * ih:
        raise ValueError("truncated GIF pixel data")
    out = bytearray()
    for i in indices[: iw * ih]:
        out += palette[3 * i : 3 * i + 3]
    return ("gif", iw, ih, 3, bytes(out))


def resize_bilinear(
    pixels: bytes, w: int, h: int, ch: int, tw: int, th: int
) -> bytes:
    """Bilinear resize in PURE INTEGER fixed-point (Q16 coordinates,
    Q32 accumulation, round-half-up) — bit-deterministic on every
    platform, unlike float bilinear whose rounding differs by
    vectorization. Half-pixel center mapping (the OpenCV/PIL
    convention): src = (dst+0.5)·s/t − 0.5, clamped to the edge.

    Exactness properties the tests pin: a FLAT image resizes to the
    same constant (weights sum to one in exact Q32), and a same-size
    resize is the identity (the Q16 fraction is exactly zero when
    s == t). Vectorized numpy gathers — no Python per-pixel loop.
    """
    import numpy as np

    img = np.frombuffer(pixels, np.uint8).reshape(h, w, ch).astype(np.int64)

    def axis_map(t: int, s: int):
        pos = ((2 * np.arange(t, dtype=np.int64) + 1) * s * 65536) // (2 * t) - 32768
        pos = np.clip(pos, 0, (s - 1) * 65536)
        i0 = pos >> 16
        frac = pos & 0xFFFF
        i1 = np.minimum(i0 + 1, s - 1)
        return i0, i1, frac

    x0, x1, fx = axis_map(tw, w)
    y0, y1, fy = axis_map(th, h)
    fxc = fx[None, :, None]
    top = img[y0][:, x0] * (65536 - fxc) + img[y0][:, x1] * fxc
    bot = img[y1][:, x0] * (65536 - fxc) + img[y1][:, x1] * fxc
    fyc = fy[:, None, None]
    val = top * (65536 - fyc) + bot * fyc
    out = (val + (1 << 31)) >> 32
    return out.astype(np.uint8).tobytes()


# -- TGA (Truevision TARGA) --------------------------------------------------

def encode_tga(width: int, height: int, pixels: bytes, rle: bool = True) -> bytes:
    """24-bit TGA from packed RGB bytes — type 10 (real greedy RLE
    packets) by default, type 2 (uncompressed) otherwise. Rows are
    written in the format's default bottom-up order with BGR
    channels, so decoding exercises both normalizations."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixels must be 3*width*height packed RGB bytes")
    rows = []
    for y in range(height - 1, -1, -1):
        row = pixels[3 * width * y : 3 * width * (y + 1)]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        rows.append(bytes(bgr))
    header = (
        bytes([0, 0, 10 if rle else 2])
        + b"\x00" * 5
        + b"\x00" * 4
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([24, 0])
    )
    if not rle:
        return header + b"".join(rows)
    out = bytearray(header)
    for row in rows:  # RLE packets never cross row boundaries (spec)
        px = [row[i : i + 3] for i in range(0, len(row), 3)]
        i = 0
        while i < len(px):
            run = 1
            while i + run < len(px) and run < 128 and px[i + run] == px[i]:
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += px[i]
                i += run
            else:
                j = i + 1
                while (
                    j < len(px)
                    and (j - i) < 128
                    and not (j + 1 < len(px) and px[j + 1] == px[j])
                ):
                    j += 1
                out.append((j - i) - 1)
                out += b"".join(px[i:j])
                i = j
    return bytes(out)


def _decode_tga(payload: bytes) -> tuple[str, int, int, int, bytes]:
    id_len, cmap_type, img_type = payload[0], payload[1], payload[2]
    if cmap_type != 0 or img_type not in (2, 10):
        raise ValueError("only 24-bit truecolor TGA (type 2/10) supported")
    width = int.from_bytes(payload[12:14], "little")
    height = int.from_bytes(payload[14:16], "little")
    bpp, desc = payload[16], payload[17]
    if bpp != 24:
        raise ValueError("only 24-bit truecolor TGA (type 2/10) supported")
    top_down = bool(desc & 0x20)
    pos = 18 + id_len
    n = width * height
    if img_type == 2:
        data = payload[pos : pos + 3 * n]
        if len(data) != 3 * n:
            raise ValueError("truncated TGA pixel data")
    else:
        out = bytearray()
        while len(out) < 3 * n:
            if pos >= len(payload):
                raise ValueError("truncated TGA pixel data")
            packet = payload[pos]
            pos += 1
            count = (packet & 0x7F) + 1
            if packet & 0x80:
                out += payload[pos : pos + 3] * count
                pos += 3
            else:
                out += payload[pos : pos + 3 * count]
                pos += 3 * count
        data = bytes(out[: 3 * n])
    rows = [data[3 * width * y : 3 * width * (y + 1)] for y in range(height)]
    if not top_down:
        rows.reverse()
    rgb = bytearray()
    for row in rows:
        r = bytearray(row)
        r[0::3], r[2::3] = row[2::3], row[0::3]
        rgb += r
    return ("tga", width, height, 3, bytes(rgb))
