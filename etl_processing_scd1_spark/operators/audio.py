"""Audio column plumbing (SURVEY.md §2.K multimodal tier): real WAV
(RIFF PCM) parsing + exact-integer audio features, no third-party
codecs — the audio counterpart of ``operators.multimodal``'s image
decoders and ``operators.jpeg``.

``decode_wav`` is a REAL parser: RIFF/WAVE chunk walk (fmt / data,
unknown chunks skipped by size), PCM 8-bit unsigned and 16-bit
signed little-endian, any channel count and sample rate. Compressed
codecs (MP3, AAC, FLAC, IMA-ADPCM…) raise ValueError — the same
documented PIL/libvips-style deployment seam (ffmpeg/libsndfile slot
in here).

Features are EXACT INTEGERS so distributed results hash-match any
oracle: sum of |sample|, sum of sample², zero-crossing count — the
energy/ZCR pair every audio curation pipeline computes first (silence
trim, clipping detection, speech-vs-noise screens). No floats, no
windowing ambiguity.

Scale shape: payloads ride Arrow record batches through
``mapInPandas`` exactly like the image decoders — per-batch memory
bounded, pure narrow map, zero shuffles.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WAV_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, bits int, "
    "n_samples bigint, abs_sum bigint, sq_sum bigint, zero_crossings bigint"
)


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal canonical RIFF/WAVE writer (PCM), for tests and
    synthesized fixtures. ``samples`` are interleaved channel values:
    signed for 16-bit, unsigned 0..255 for 8-bit."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes(samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a RIFF/WAVE PCM payload → (sample_rate, channels, bits,
    samples) with samples as plain ints (16-bit: signed; 8-bit:
    centered by −128 so silence is 0 in both widths)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(
                    "only PCM WAV supported (compressed audio needs "
                    "ffmpeg/libsndfile in deployment)"
                )
            fmt = (rate, channels, bits)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    rate, channels, bits = fmt
    if bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    elif bits == 8:
        samples = [b - 128 for b in data]
    else:
        raise ValueError("only 8/16-bit PCM WAV supported")
    return (rate, channels, bits, samples)


def wav_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact-integer audio features over binary WAV payloads in one
    Arrow ``mapInPandas`` pass: Σ|s|, Σs² (the energy pair) and the
    zero-crossing count (sign flips between consecutive samples of
    channel 0; zeros carry the previous sign, the standard
    convention)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "bits",
                "n_samples", "abs_sum", "sq_sum", "zero_crossings",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                rate, channels, bits, samples = decode_wav(payload)
                ch0 = samples[::channels]
                zc = 0
                prev_sign = 0
                for s in ch0:
                    sign = 1 if s > 0 else (-1 if s < 0 else prev_sign)
                    if prev_sign != 0 and sign != 0 and sign != prev_sign:
                        zc += 1
                    if sign != 0:
                        prev_sign = sign
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["bits"].append(bits)
                out["n_samples"].append(len(samples))
                out["abs_sum"].append(sum(abs(s) for s in samples))
                out["sq_sum"].append(sum(s * s for s in samples))
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, id_col).mapInPandas(batches, schema=WAV_SCHEMA)


SPECTRO_SCHEMA = (
    "doc_id bigint, n_frames int, n_bins int, peak_bin int, "
    "peak_frame int, spectral_centroid_milli bigint"
)


def wav_spectrogram(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_len: int = 256,
    hop: int = 128,
) -> DataFrame:
    """STFT magnitude spectrogram over binary WAV payloads — the
    standard speech-curation front end (VAD, music/noise screens,
    language-ID features all start here). Hann-windowed frames of
    ``frame_len`` samples every ``hop``, numpy ``rfft`` per batch —
    vectorized across all frames of a payload at once, one Arrow
    ``mapInPandas`` pass, zero shuffles.

    Emits summary features rather than the (frames × bins) matrix:
    global peak bin/frame and the spectral centroid in milli-bins
    (floats floored to integers AFTER the physics, so the output is
    hash-stable). No SQL oracle — an FFT is not SQL-expressible; the
    pytest suite pins pure-tone peak location, centroid monotonicity
    in frequency, and frame-count arithmetic instead (the documented
    weaker rows-only check for non-relational operators).
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(frame_len)
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_frames", "n_bins", "peak_bin",
                "peak_frame", "spectral_centroid_milli",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                _rate, channels, _bits, samples = decode_wav(payload)
                ch0 = np.asarray(samples[::channels], dtype=np.float64)
                if len(ch0) < frame_len:
                    ch0 = np.pad(ch0, (0, frame_len - len(ch0)))
                n_frames = 1 + (len(ch0) - frame_len) // hop
                idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
                mag = np.abs(np.fft.rfft(ch0[idx] * win[None, :], axis=1))
                flat = int(np.argmax(mag))
                peak_frame, peak_bin = divmod(flat, mag.shape[1])
                power = mag.sum()
                bins = np.arange(mag.shape[1], dtype=np.float64)
                centroid = float((mag.sum(axis=0) * bins).sum() / power) if power > 0 else 0.0
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_bins"].append(mag.shape[1])
                out["peak_bin"].append(int(peak_bin))
                out["peak_frame"].append(int(peak_frame))
                out["spectral_centroid_milli"].append(int(centroid * 1000))
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, id_col).mapInPandas(batches, schema=SPECTRO_SCHEMA)
