"""Multimodal column plumbing (SURVEY.md §2.K): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas functions over ``mapInPandas``.

The container has no image/audio codecs, so the decode step is
STUBBED: ``decode_image`` raises NotImplementedError and
``fake_feature_extract`` is the deterministic stand-in the tests and
registry use. Everything AROUND the stub is real and load-bearing —
the binary schema, the Arrow batch shape, the mapInPandas iterator
contract, the partition sizing — which is exactly the part that has
to be right at 100 TB (the codec swap is one function).

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


def decode_image(payload: bytes) -> object:
    """Real decode would go through PIL/libvips here. The container
    ships no codecs — callers use fake_feature_extract in tests."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "wire PIL/libvips here in deployment"
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
