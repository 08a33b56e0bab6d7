"""Pure-Python image decode (operators.multimodal.decode_image):
round-trips through both real formats, format-structure edge cases
(PPM header comments, BMP bottom-up vs top-down rows, row padding,
BGR order), and the rejection paths. No SparkSession needed — the
decoder is plain Python; the Spark plumbing is covered by the
``multimodal_decode`` oracle query.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_processing_scd1_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_png,
    encode_ppm,
)


def _pixels(width: int, height: int, seed: int = 7, channels: int = 3) -> bytes:
    return bytes(
        (seed + 31 * i) % 256 for i in range(channels * width * height)
    )


@given(
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_both_formats(width, height, seed):
    px = _pixels(width, height, seed)
    for enc, name in ((encode_ppm, "ppm"), (encode_bmp, "bmp")):
        fmt, w, h, ch, out = decode_image(enc(width, height, px))
        assert (fmt, w, h, ch) == (name, width, height, 3)
        assert out == px  # exact pixel recovery, padding/BGR normalized


def test_ppm_header_comments_and_whitespace():
    px = _pixels(3, 2)
    payload = b"P6\n# a comment\n  3\t2 # trailing\n255\n" + px
    fmt, w, h, ch, out = decode_image(payload)
    assert (fmt, w, h, out) == ("ppm", 3, 2, px)


def test_bmp_padding_not_counted():
    # width 3 → row stride 12 with 3 padding bytes of zeros per row;
    # a decoder that forgets to strip padding inflates the pixel sum
    px = bytes([255]) * (3 * 3 * 2)
    fmt, w, h, ch, out = decode_image(encode_bmp(3, 2, px))
    assert sum(out) == 255 * 3 * 3 * 2
    assert len(out) == 3 * 3 * 2


def test_bmp_top_down_negative_height():
    px = _pixels(2, 3)
    payload = bytearray(encode_bmp(2, 3, px))
    # flip to top-down encoding: negate height and reorder data rows
    stride = (3 * 2 + 3) // 4 * 4
    data = payload[54:]
    rows = [bytes(data[i * stride : (i + 1) * stride]) for i in range(3)]
    payload[22:26] = (-3).to_bytes(4, "little", signed=True)
    payload[54:] = b"".join(reversed(rows))
    fmt, w, h, ch, out = decode_image(bytes(payload))
    assert (w, h) == (2, 3)
    assert out == px


@given(
    width=st.integers(min_value=1, max_value=24),
    height=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=255),
    channels=st.sampled_from([1, 3, 4]),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_all_filters(width, height, seed, channels):
    """filter_cycle rotates none→sub→up→average→paeth per scanline, so
    any height ≥ 5 exercises every reconstruction path in one image —
    exact pixel recovery proves the unfiltering, not just the inflate."""
    px = _pixels(width, height, seed, channels)
    fmt, w, h, ch, out = decode_image(
        encode_png(width, height, px, channels=channels)
    )
    assert (fmt, w, h, ch) == ("png", width, height, channels)
    assert out == px


def test_png_filter_zero_roundtrip():
    px = _pixels(5, 3)
    fmt, w, h, ch, out = decode_image(
        encode_png(5, 3, px, filter_cycle=False)
    )
    assert (fmt, w, h, ch, out) == ("png", 5, 3, 3, px)


def test_png_rejections():
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    base = bytearray(encode_png(2, 2, _pixels(2, 2)))
    # IHDR data starts at offset 16 (sig 8 + len 4 + type 4):
    # width/height 8 bytes, then bit depth, color type, comp, filter,
    # interlace — corrupt each gated field
    for off, val in ((24, 16), (25, 3), (28, 1)):  # 16-bit, palette, Adam7
        bad = bytearray(base)
        bad[off] = val
        with pytest.raises(ValueError, match="only non-interlaced 8-bit"):
            decode_image(bytes(bad))


def test_rejections():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"TIFF\x00\x00" + b"\x00" * 64)
    with pytest.raises(ValueError, match="corrupt GIF block stream"):
        decode_image(b"GIF89a" + b"\x00" * 64)  # GIF now decodes for real
    with pytest.raises(ValueError, match="16-bit"):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        decode_image(b"P6\n4 4\n255\n" + b"\x00" * 5)
    bad_bpp = bytearray(encode_bmp(2, 2, _pixels(2, 2)))
    bad_bpp[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="24-bit uncompressed"):
        decode_image(bytes(bad_bpp))


# ---------------------------------------------------------------------------
# Baseline JPEG (operators.jpeg)
# ---------------------------------------------------------------------------


def test_jpeg_flat_tiles_decode_exactly():
    """Quality-75 luma DC quantizer is 8, so flat 8x8 tiles survive
    the whole pipeline bit-exactly — the property the oracle-paired
    query leans on."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    vals = [0, 17, 128, 140, 200, 255, 63, 9]
    img = np.zeros((16, 32), dtype=np.uint8)
    for k in range(8):
        by, bx = divmod(k, 4)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = vals[k]
    w, h, ch, px = decode_jpeg(encode_jpeg(32, 16, img.tobytes(), 1, 75))
    assert (w, h, ch) == (32, 16, 1)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(16, 32)
    assert (dec == img).all()


def test_jpeg_gradient_roundtrip_bounded_error():
    """Smooth content at quality 90: every decoded pixel within a few
    quantization steps of the source (lossy, but bounded and
    deterministic)."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    src = np.zeros((24, 40, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(40):
            src[y, x] = [(2 * x + y) % 256, (3 * y) % 256, (x * 5) % 256]
    enc1 = encode_jpeg(40, 24, src.tobytes(), 3, 90)
    enc2 = encode_jpeg(40, 24, src.tobytes(), 3, 90)
    assert enc1 == enc2  # bit-deterministic
    w, h, ch, px = decode_jpeg(enc1)
    assert (w, h, ch) == (40, 24, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(24, 40, 3).astype(int)
    assert np.abs(dec - src.astype(int)).max() <= 8


def test_jpeg_odd_dimensions_crop():
    """Non-multiple-of-8 sizes: encoder pads by edge replication,
    decoder crops back to the true header dimensions."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    src = np.full((13, 21, 3), 77, dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg(21, 13, src.tobytes(), 3, 75))
    assert (w, h, ch) == (21, 13, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(13, 21, 3).astype(int)
    assert np.abs(dec - 77).max() <= 2  # flat color, near-exact through YCbCr


def test_jpeg_via_decode_image_dispatch():
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import encode_jpeg

    img = np.full((8, 8), 200, dtype=np.uint8)
    fmt, w, h, ch, px = decode_image(encode_jpeg(8, 8, img.tobytes(), 1, 75))
    assert (fmt, w, h, ch) == ("jpeg", 8, 8, 1)
    assert set(px) == {200}


def test_jpeg_rejections():
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8), 10, dtype=np.uint8)
    enc = bytearray(encode_jpeg(8, 8, img.tobytes(), 1, 75))
    # flip SOF0 to SOF9 (extended sequential, arithmetic coding):
    # must raise, not mis-decode
    i = enc.find(b"\xff\xc0")
    arith = bytes(enc[:i]) + b"\xff\xc9" + bytes(enc[i + 2 :])
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(arith)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    # a baseline single-scan inside an SOF2 frame is decoded by the
    # same unified coefficient-store path — byte-identical pixels
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2 :])
    assert decode_jpeg(prog) == decode_jpeg(bytes(enc))


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 (2x2 chroma subsampling — the camera-JPEG layout): MCU
    interleave 4xY + Cb + Cr, chroma downsample on encode, nearest
    upsample on decode; bounded error on smooth content and odd
    (non-MCU-multiple) dimensions crop correctly."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    src = np.zeros((24, 40, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(40):
            src[y, x] = [(2 * x + y) % 200 + 20, (3 * y) % 180 + 30, (x * 4) % 200 + 25]
    enc = encode_jpeg(40, 24, src.tobytes(), 3, 90, subsample=True)
    w, h, ch, px = decode_jpeg(enc)
    assert (w, h, ch) == (40, 24, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(24, 40, 3).astype(int)
    assert np.abs(dec - src.astype(int)).max() <= 10

    odd = np.full((11, 19, 3), 99, dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg(19, 11, odd.tobytes(), 3, 75, subsample=True))
    assert (w, h) == (19, 11)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(11, 19, 3).astype(int)
    assert np.abs(dec - 99).max() <= 1


def test_jpeg_sampling_layouts_roundtrip():
    """Every standard chroma layout (4:2:2 / 4:4:0 / 4:1:1 on top of
    the 4:4:4 / 4:2:0 cases above) round-trips with bounded error on
    smooth content, including odd (non-MCU-multiple) dimensions."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    src = np.zeros((21, 37, 3), dtype=np.uint8)
    for y in range(21):
        for x in range(37):
            src[y, x] = [(2 * x + y) % 200 + 20, (3 * y) % 180 + 30,
                         (x * 4) % 200 + 25]
    for samp in ("422", "440", "411"):
        w, h, ch, px = decode_jpeg(
            encode_jpeg(37, 21, src.tobytes(), 3, 90, sampling=samp)
        )
        assert (w, h, ch) == (37, 21, 3)
        dec = np.frombuffer(px, dtype=np.uint8).reshape(21, 37, 3).astype(int)
        assert np.abs(dec - src.astype(int)).max() <= 12, samp


def test_jpeg_restart_intervals():
    """DRI/RSTn: entropy stream restarts every N MCUs (DC predictors
    reset, bit reader realigned) — what camera firmware emits. A
    missing restart marker raises instead of mis-decoding."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import decode_jpeg, encode_jpeg

    src = np.zeros((24, 40, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(40):
            src[y, x] = [(x * 5) % 220, (y * 9) % 220, (x + y) % 220]
    for samp, dri in (("444", 3), ("420", 2), ("444", 1)):
        enc = encode_jpeg(40, 24, src.tobytes(), 3, 90, sampling=samp,
                          restart_interval=dri)
        assert b"\xff\xdd" in enc  # DRI marker present
        w, h, ch, px = decode_jpeg(enc)
        dec = np.frombuffer(px, dtype=np.uint8).reshape(24, 40, 3).astype(int)
        assert np.abs(dec - src.astype(int)).max() <= 10, (samp, dri)
    # restart-marker-agnostic plain decode of the same pixels agrees
    plain = decode_jpeg(encode_jpeg(40, 24, src.tobytes(), 3, 90))
    with_rst = decode_jpeg(encode_jpeg(40, 24, src.tobytes(), 3, 90,
                                       restart_interval=4))
    assert plain == with_rst
    # corrupt: strip the first RST marker -> decoder must notice
    enc = bytearray(encode_jpeg(40, 24, src.tobytes(), 3, 90,
                                restart_interval=1))
    j = enc.find(b"\xff\xd0")
    assert j > 0
    del enc[j : j + 2]
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) successive-approximation decode: the scan
    script (DC first/refine + per-component AC first/refine) carries
    exactly the same quantized coefficients as the baseline encoding,
    so decoded pixels must be BYTE-IDENTICAL to the baseline decode —
    a closed-loop proof of the whole multi-scan machinery."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    src = np.zeros((24, 40, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(40):
            src[y, x] = [(2 * x + y) % 200 + 20, (3 * y) % 180 + 30,
                         (x * 4) % 200 + 25]
    for samp in ("444", "420", "422", "440", "411"):
        base = decode_jpeg(encode_jpeg(40, 24, src.tobytes(), 3, 85,
                                       sampling=samp))
        prog = decode_jpeg(
            encode_jpeg_progressive(40, 24, src.tobytes(), 3, 85, sampling=samp)
        )
        assert base == prog, samp
    # grayscale + flat-tile DC exactness through the progressive path
    g = (np.arange(24 * 40, dtype=np.uint8) % 251).reshape(24, 40)
    assert decode_jpeg(encode_jpeg_progressive(40, 24, g.tobytes(), 1, 75)) == \
        decode_jpeg(encode_jpeg(40, 24, g.tobytes(), 1, 75))
    flat = np.full((8, 8), 200, dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg_progressive(8, 8, flat.tobytes(), 1, 75))
    assert set(px) == {200}


def test_jpeg_progressive_eob_runs_decode():
    """EOBn runs (r > 0) never appear in this module's own encoder
    output (standard Annex-K tables carry no EOBn symbols), so pin
    the decoder's run handling with a hand-assembled SOF2 file using
    a custom DHT: 4 luma blocks where block 1 carries one AC
    coefficient then opens an EOB2 run (covers blocks 2-3) and block
    4 ends with a plain EOB."""
    import numpy as np

    from etl_processing_scd1_spark.operators.jpeg import (
        ZIGZAG,
        _BitWriter,
        _build_codes,
        _C,
        _DC_LUM_BITS,
        _DC_LUM_VALS,
        _marker,
        decode_jpeg,
    )

    def seg(tag, payload):
        return _marker(tag, payload)

    # quant table 0: all ones (identity dequant)
    dqt = bytes([0]) + bytes([1] * 64)
    sof2 = bytes([8]) + (8).to_bytes(2, "big") + (32).to_bytes(2, "big") + \
        bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
    # custom AC table: 0x00 (EOB), 0x01 (run0/size1), 0x10 (EOB2run r=1)
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x00, 0x01, 0x10]
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)
    dc_codes = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)

    # scan 1: DC first (Ss=0 Se=0 Ah=0 Al=0), DC diffs all zero
    w1 = _BitWriter()
    for _ in range(4):
        code, length = dc_codes[0]
        w1.write(code, length)
    w1.flush()
    # scan 2: AC first (Ss=1 Se=63): block1 = coef 3 at k=1 then EOB2run
    w2 = _BitWriter()
    code, length = ac_codes[0x01]
    w2.write(code, length)
    w2.write(1, 1)  # amplitude +1 at k=1
    code, length = ac_codes[0x10]  # r=1: eobrun = (1<<1)-1 + 1 extra bit
    w2.write(code, length)
    w2.write(1, 1)  # extra bit -> eobrun = 2 (blocks 2 and 3)
    code, length = ac_codes[0x00]  # plain EOB for block 4
    w2.write(code, length)
    w2.flush()

    payload = (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof2) + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bytes(w1.buf)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes(w2.buf)
        + b"\xff\xd9"
    )
    w, h, ch, px = decode_jpeg(payload)
    assert (w, h, ch) == (32, 8, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 32)
    # expected: block 1 = IDCT of {DC=0, coef 1 at natural ZIGZAG[1]};
    # blocks 2-4 = IDCT of all-zero = flat 128
    coefs = np.zeros(64)
    coefs[ZIGZAG[1]] = 1.0
    block1 = np.clip(np.floor(_C.T @ coefs.reshape(8, 8) @ _C + 128.5), 0, 255)
    assert np.array_equal(got[:, :8], block1.astype(np.uint8))
    assert np.all(got[:, 8:] == 128)


def test_gif_roundtrip_random_palette():
    """Random 200-color image crosses LZW code-size boundaries; the
    decode must reproduce every pixel byte."""
    import random

    from etl_processing_scd1_spark.operators.multimodal import decode_image, encode_gif

    random.seed(7)
    w, h = 80, 60
    colors = [bytes([random.randrange(256) for _ in range(3)]) for _ in range(200)]
    px = b"".join(random.choice(colors) for _ in range(w * h))
    fmt, dw, dh, ch, out = decode_image(encode_gif(w, h, px))
    assert (fmt, dw, dh, ch) == ("gif", w, h, 3)
    assert out == px


def test_gif_lzw_table_overflow_clear():
    """A 19200-pixel random image overflows the 4096-entry LZW table,
    forcing the encoder's clear-code reset path; decode must still be
    byte-exact."""
    import random

    from etl_processing_scd1_spark.operators.multimodal import _decode_gif, encode_gif

    random.seed(11)
    w, h = 160, 120
    colors = [bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256)]
    px = b"".join(random.choice(colors) for _ in range(w * h))
    assert _decode_gif(encode_gif(w, h, px))[4] == px


def test_gif_kwkwk_case():
    """cScSc strings hit the LZW code == next_code (KwKwK) branch —
    the classic decoder edge; aaa...a input exercises it densely."""
    from etl_processing_scd1_spark.operators.multimodal import _decode_gif, encode_gif

    px = b"\x01\x02\x03" * 64  # one repeated color -> runs of index 0
    assert _decode_gif(encode_gif(8, 8, px))[4] == px


def test_resize_bilinear_identity_flat_and_reference():
    """Identity resize is byte-exact; a flat image stays constant at
    any target size (Q32 weights normalize exactly); a gradient stays
    within 1 LSB of the float half-pixel bilinear reference and is
    monotone along a ramp row."""
    import numpy as np

    from etl_processing_scd1_spark.operators.multimodal import resize_bilinear

    px = bytes(range(48))
    assert resize_bilinear(px, 4, 4, 3, 4, 4) == px

    flat = bytes([77]) * (3 * 5 * 7)
    assert resize_bilinear(flat, 5, 7, 3, 9, 4) == bytes([77]) * (3 * 9 * 4)

    row = list(resize_bilinear(bytes([0, 100, 200]), 3, 1, 1, 6, 1))
    assert row == sorted(row) and row[0] == 0 and row[-1] == 200

    img = (np.arange(24).reshape(6, 4, 1) * 9 % 256).astype(np.uint8)
    ys = np.clip((np.arange(3) + 0.5) * 6 / 3 - 0.5, 0, 5)
    xs = np.clip((np.arange(7) + 0.5) * 4 / 7 - 0.5, 0, 3)
    y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, 5); x1 = np.minimum(x0 + 1, 3)
    fy = (ys - y0)[:, None, None]; fx = (xs - x0)[None, :, None]
    fimg = img.astype(float)
    a = fimg[y0][:, x0] * (1 - fx) + fimg[y0][:, x1] * fx
    b = fimg[y1][:, x0] * (1 - fx) + fimg[y1][:, x1] * fx
    exp = a * (1 - fy) + b * fy
    got = np.frombuffer(
        resize_bilinear(img.tobytes(), 4, 6, 1, 7, 3), np.uint8
    ).reshape(3, 7, 1)
    assert np.abs(got.astype(float) - exp).max() <= 1.0


def test_tga_roundtrip_both_types_and_origins():
    """Type-2 and RLE type-10 must both reproduce every pixel byte
    (bottom-up BGR normalized), and the 128-pixel packet cap must
    split long runs correctly."""
    import random

    from etl_processing_scd1_spark.operators.multimodal import (
        _decode_tga,
        decode_image,
        encode_tga,
    )

    random.seed(3)
    px = bytes(random.randrange(256) for _ in range(3 * 7 * 3))
    for rle in (False, True):
        fmt, w, h, ch, out = decode_image(encode_tga(7, 3, px, rle=rle))
        assert (fmt, w, h, ch) == ("tga", 7, 3, 3)
        assert out == px
    flat = bytes([9, 8, 7]) * 1000  # 1000-px runs >> 128-px packet cap
    assert _decode_tga(encode_tga(200, 5, flat))[4] == flat


def test_tga_rejections():
    import pytest as _pytest

    from etl_processing_scd1_spark.operators.multimodal import _decode_tga, encode_tga

    bad = bytearray(encode_tga(2, 2, bytes(12)))
    bad[16] = 16  # 16-bit
    with _pytest.raises(ValueError, match="only 24-bit truecolor TGA"):
        _decode_tga(bytes(bad))
    with _pytest.raises(ValueError, match="truncated TGA pixel"):
        _decode_tga(encode_tga(4, 4, bytes(48), rle=False)[:-10])
