"""Puffin file format + the Iceberg v3 ``deletion-vector-v1`` blob
codec — the format-version-3 replacement for position-delete parquet
files (one roaring bitmap per data file, many blobs per puffin).

All layouts are from the public Apache Iceberg specs (puffin-spec +
format v3 deletion vectors):

- Puffin file: ``Magic Blob^n Footer``; Magic = ``PFA1``.
  Footer = ``Magic FooterPayload FooterPayloadSize(int32 LE)
  Flags(4 bytes) Magic``; FooterPayload = JSON
  ``{"blobs": [...], "properties": {...}}``; Flags bit 0 of byte 0 =
  payload compressed (this engine writes uncompressed; reading
  compressed footers is refused loudly).
- Blob metadata: ``type``, ``fields``, ``snapshot-id``,
  ``sequence-number``, ``offset``, ``length``, ``properties``.
- ``deletion-vector-v1`` blob: combined length of magic+vector as
  int32 BE, magic ``0xD1 0xD3 0x39 0x64``, the vector as a PORTABLE
  64-bit roaring bitmap (u64 LE bucket count, then per bucket u32 LE
  high-bits key + standard 32-bit roaring serialization), CRC-32 of
  magic+vector as int32 BE. Blob properties carry
  ``referenced-data-file`` and ``cardinality``.

The 32-bit roaring codec is shared with the Delta deletion-vector
implementation (same RoaringFormatSpec serialization).
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from .delta import _roaring32_deserialize, _roaring32_serialize

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
DV_BLOB_TYPE = "deletion-vector-v1"


class PuffinError(RuntimeError):
    pass


def serialize_positions_64(positions) -> bytes:
    """Portable 64-bit roaring bitmap of sorted row positions."""
    buckets: dict[int, list[int]] = {}
    for p in positions:
        p = int(p)
        if p < 0:
            raise PuffinError(f"negative position {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<Q", len(buckets))]
    for high in sorted(buckets):
        out.append(struct.pack("<I", high))
        out.append(_roaring32_serialize(sorted(set(buckets[high]))))
    return b"".join(out)


def deserialize_positions_64(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, pos = _roaring32_deserialize(data, pos)
        out.extend((high << 32) | lo for lo in lows)
    if pos != len(data):
        raise PuffinError(
            f"trailing bytes in 64-bit roaring bitmap ({len(data) - pos})"
        )
    return sorted(out)


def dv_blob_bytes(positions) -> bytes:
    """deletion-vector-v1 blob payload for the given positions."""
    body = DV_MAGIC + serialize_positions_64(positions)
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_dv_blob(data: bytes) -> list[int]:
    if len(data) < 12:
        raise PuffinError(f"deletion vector blob too short ({len(data)})")
    (ln,) = struct.unpack_from(">I", data, 0)
    if 4 + ln + 4 != len(data):
        raise PuffinError(
            f"deletion vector length prefix {ln} inconsistent with blob "
            f"size {len(data)}"
        )
    body = data[4:4 + ln]
    if body[:4] != DV_MAGIC:
        raise PuffinError(f"bad deletion vector magic {body[:4]!r}")
    (crc,) = struct.unpack_from(">I", data, 4 + ln)
    if crc != zlib.crc32(body) & 0xFFFFFFFF:
        raise PuffinError("deletion vector CRC mismatch")
    return deserialize_positions_64(body[4:])


def write_puffin(path: str, blobs: list[dict],
                 properties: dict | None = None) -> list[dict]:
    """Write ``blobs`` (each: ``type``, ``data`` bytes,
    ``snapshot-id``, ``sequence-number``, optional ``fields`` /
    ``properties``) and the JSON footer; returns the footer's blob
    metadata (with final offsets/lengths) in input order."""
    metas: list[dict] = []
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        off = len(MAGIC)
        for b in blobs:
            data = b["data"]
            fh.write(data)
            metas.append({
                "type": b["type"],
                "fields": list(b.get("fields") or []),
                "snapshot-id": int(b["snapshot-id"]),
                "sequence-number": int(b["sequence-number"]),
                "offset": off,
                "length": len(data),
                "properties": dict(b.get("properties") or {}),
            })
            off += len(data)
        payload = json.dumps(
            {"blobs": metas, "properties": properties or {}},
            separators=(",", ":"),
        ).encode("utf-8")
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<I", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        fh.write(MAGIC)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    return metas


def read_puffin_footer(path: str) -> dict:
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != MAGIC:
            raise PuffinError(f"not a puffin file (head magic): {path}")
        fh.seek(size - 12)
        tail = fh.read(12)
        if tail[8:] != MAGIC:
            raise PuffinError(f"not a puffin file (tail magic): {path}")
        (psize,) = struct.unpack_from("<I", tail, 0)
        flags = tail[4:8]
        if flags[0] & 0x01:
            raise PuffinError(
                "compressed puffin footer not supported by this reader"
            )
        fh.seek(size - 12 - psize - 4)
        if fh.read(4) != MAGIC:
            raise PuffinError(f"footer start magic missing: {path}")
        payload = fh.read(psize)
    return json.loads(payload.decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        data = fh.read(int(length))
    if len(data) != int(length):
        raise PuffinError(
            f"short read at {offset}+{length} in {path}"
        )
    return data
