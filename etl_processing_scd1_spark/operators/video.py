"""Video column plumbing (SURVEY.md §2.K multimodal tier): real
YUV4MPEG2 (.y4m) container parsing — the standard UNCOMPRESSED video
interchange format (ffmpeg's raw pipe format) — completing the
image (PPM/BMP/PNG/JPEG) / audio (WAV) / video trio of real
no-third-party-codec decoders.

``decode_y4m`` parses the stream header (W/H/F/C tags), walks FRAME
markers, and returns per-frame planar data for Cmono (luma only),
C444 (full-rate chroma) and C420/C420jpeg/C420mpeg2 (half-rate
chroma). Compressed codecs (H.264/VP9/AV1 in MP4/WebM containers)
raise ValueError — the ffmpeg deployment seam, same convention as
the JPEG/WAV decoders.

Scale shape: payloads ride Arrow batches through ``mapInPandas`` —
per-batch memory bounded, narrow map, zero shuffles; per-frame rows
explode only by the (bounded) sampled frame count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, "
    "colorspace string, luma_sum bigint"
)


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    colorspace: str = "mono",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Minimal YUV4MPEG2 writer for tests/fixtures. ``frames`` are
    planar bytes per frame: Y (mono), Y+Cb+Cr full-rate (444), or
    Y + quarter-size Cb+Cr (420jpeg)."""
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    ).encode()
    out = bytearray(header)
    for f in frames:
        out += b"FRAME\n" + f
    return bytes(out)


def _frame_size(width: int, height: int, colorspace: str) -> int:
    if colorspace == "mono":
        return width * height
    if colorspace == "444":
        return 3 * width * height
    if colorspace in ("420", "420jpeg", "420mpeg2"):
        return width * height + 2 * ((width + 1) // 2) * ((height + 1) // 2)
    raise ValueError(
        f"unsupported Y4M colorspace C{colorspace} (mono/444/420 parse "
        "here; compressed video needs ffmpeg in deployment)"
    )


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], str, list[bytes]]:
    """Parse a YUV4MPEG2 payload → (width, height, (fps_n, fps_d),
    colorspace, frames) with each frame as its raw planar bytes
    (luma first)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(
            "not a YUV4MPEG2 payload (compressed video containers need "
            "ffmpeg in deployment)"
        )
    nl = payload.index(b"\n")
    width = height = None
    fps = (25, 1)
    colorspace = "420jpeg"  # the spec default when C is absent
    for tag in payload[9:nl].split():
        t, v = tag[:1], tag[1:].decode()
        if t == b"W":
            width = int(v)
        elif t == b"H":
            height = int(v)
        elif t == b"F":
            num, den = v.split(":")
            fps = (int(num), int(den))
        elif t == b"C":
            colorspace = v
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    fsize = _frame_size(width, height, colorspace)
    frames: list[bytes] = []
    i = nl + 1
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: FRAME marker expected")
        j = payload.index(b"\n", i)  # frame headers may carry params
        frame = payload[j + 1 : j + 1 + fsize]
        if len(frame) != fsize:
            raise ValueError("truncated Y4M frame")
        frames.append(frame)
        i = j + 1 + fsize
    return (width, height, fps, colorspace, frames)


def y4m_frame_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per frame with the exact-integer luma sum — the
    brightness trace used for scene-cut detection and dead-frame
    screens; the frame loop is bounded by the video length, the map
    is narrow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "width", "height",
                "colorspace", "luma_sum",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, _fps, cs, frames = decode_y4m(payload)
                for fi, frame in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["colorspace"].append(cs)
                    out["luma_sum"].append(sum(frame[: w * h]))
            yield pd.DataFrame(out)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, id_col).mapInPandas(batches, schema=FRAME_SCHEMA)
