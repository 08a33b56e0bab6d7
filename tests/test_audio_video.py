"""Real WAV (RIFF PCM) and Y4M (YUV4MPEG2) parsing — chunk-walk and
container edge cases plus rejection paths. Plain Python, no
SparkSession; the Spark plumbing is covered by the
``multimodal_audio_features`` / ``multimodal_video_frames`` oracle
queries.
"""

from __future__ import annotations

import struct

import pytest

from etl_processing_scd1_spark.operators.audio import decode_wav, encode_wav
from etl_processing_scd1_spark.operators.video import decode_y4m, encode_y4m


def test_wav_roundtrip_16bit_mono():
    samples = [0, 100, -100, 32767, -32768, 7]
    rate, ch, bits, dec = decode_wav(encode_wav(samples, 44100, 1, 16))
    assert (rate, ch, bits) == (44100, 1, 16)
    assert dec == samples


def test_wav_roundtrip_8bit_centered():
    """8-bit PCM is unsigned on disk; decode centers by −128 so
    silence is 0 in both widths."""
    raw = [0, 128, 255, 64]
    rate, ch, bits, dec = decode_wav(encode_wav(raw, 8000, 1, 8))
    assert bits == 8
    assert dec == [-128, 0, 127, -64]


def test_wav_stereo_interleaving():
    samples = [1, -1, 2, -2, 3, -3]  # L R L R L R
    rate, ch, bits, dec = decode_wav(encode_wav(samples, 8000, 2, 16))
    assert ch == 2
    assert dec[::2] == [1, 2, 3]  # channel 0
    assert dec[1::2] == [-1, -2, -3]


def test_wav_skips_unknown_chunks_and_word_alignment():
    """A LIST chunk with an ODD size before data: the walker must skip
    it including the RIFF pad byte."""
    base = encode_wav([5, -5], 8000, 1, 16)
    # splice an odd-sized unknown chunk between fmt and data
    fmt_end = base.index(b"data")
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # pad
    doctored = base[:fmt_end] + odd + base[fmt_end:]
    rate, ch, bits, dec = decode_wav(doctored)
    assert dec == [5, -5]


def test_wav_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS\x00\x00")
    # non-PCM format code
    base = bytearray(encode_wav([1], 8000, 1, 16))
    i = base.index(b"fmt ") + 8
    base[i:i + 2] = struct.pack("<H", 85)  # MP3
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(base))


def test_y4m_roundtrip_mono_and_frame_headers():
    frames = [bytes(range(12)), bytes(range(12, 24))]
    payload = encode_y4m(4, 3, frames, "mono")
    w, h, fps, cs, dec = decode_y4m(payload)
    assert (w, h, fps, cs) == (4, 3, (25, 1), "mono")
    assert dec == frames
    # frame headers may carry parameters after FRAME
    doctored = payload.replace(b"FRAME\n", b"FRAME Ixyz\n", 1)
    assert decode_y4m(doctored)[4] == frames


def test_y4m_c444_and_c420_plane_sizes():
    w, h = 4, 2
    f444 = bytes(3 * w * h)
    assert decode_y4m(encode_y4m(w, h, [f444], "444"))[4] == [f444]
    f420 = bytes(w * h + 2 * (w // 2) * (h // 2))
    w2, h2, _, cs, frames = decode_y4m(encode_y4m(w, h, [f420], "420jpeg"))
    assert cs == "420jpeg" and frames == [f420]


def test_y4m_rejections():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42")  # MP4 container
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C410\nFRAME\n\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n\x00\x00")


def test_spectrogram_pure_tone_peak_and_centroid(spark):
    """A pure tone at bin k of a 256-sample frame must peak at bin k;
    a higher tone moves both the peak and the spectral centroid up;
    frame count follows 1 + (n - frame)//hop."""
    import math

    from etl_processing_scd1_spark.operators.audio import encode_wav, wav_spectrogram

    def tone(bin_k: int, n: int = 1024) -> bytes:
        # bin k of a 256-pt frame at rate 8000 -> freq = k*8000/256
        return encode_wav(
            [int(12000 * math.sin(2 * math.pi * bin_k * i / 256)) for i in range(n)],
            sample_rate=8000, channels=1, bits=16,
        )

    rows = [(1, tone(8)), (2, tone(40))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in wav_spectrogram(df).collect()}
    assert out[1].peak_bin == 8 and out[2].peak_bin == 40
    assert out[1].n_bins == 129
    assert out[1].n_frames == 1 + (1024 - 256) // 128
    assert out[2].spectral_centroid_milli > out[1].spectral_centroid_milli
