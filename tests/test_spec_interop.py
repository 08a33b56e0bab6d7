"""Spec-interop differential gate (VERDICT r10 §Next #5): a second,
INDEPENDENT reader path that replays ONLY public-spec rules — Delta
PROTOCOL.md (log replay, checkpoints V1+V2, deletion vectors, column
mapping), the Apache Iceberg table spec (metadata → manifest list →
manifests → data/delete files, sequence-number bounds), the Avro 1.11
object-container spec, RoaringFormatSpec, and Z85 (ZeroMQ RFC 32) —
sharing NO reading helpers with ``etl_processing_scd1_spark.sources``
(the engine is imported solely to BUILD fixtures and as the
comparison subject). Every fixture the engine's writers produce must
read byte-identically through this module.

DuckDB's ``delta_scan``/``iceberg_scan`` would be the ideal foreign
reader, but their extensions require a network install the sandbox
does not allow — this module is the in-repo equivalent.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pytest

SF0001 = "/root/testdata/sf0.001"


# ==========================================================================
# Independent Delta reader — PROTOCOL.md replay rules only
# ==========================================================================

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_LOOKUP = {ch: n for n, ch in enumerate(_Z85_ALPHABET)}


def z85_decode(text: str) -> bytes:
    assert len(text) % 5 == 0, "z85 length must be a multiple of 5"
    acc = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for ch in text[i:i + 5]:
            word = word * 85 + _Z85_LOOKUP[ch]
        acc += struct.pack(">I", word)
    return bytes(acc)


def roaring32_read(buf: bytes, pos: int) -> tuple[set, int]:
    """One serialized 32-bit RoaringBitmap (RoaringFormatSpec):
    either SERIAL_COOKIE_NO_RUNCONTAINER (12346, explicit size +
    offset header) or SERIAL_COOKIE (12347, size packed in the
    cookie, run-flag bitset, offsets only when size >= 4)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    runs = b""
    if cookie & 0xFFFF == 12347:
        n_containers = (cookie >> 16) + 1
        runs = buf[pos:pos + (n_containers + 7) // 8]
        pos += (n_containers + 7) // 8
        offsets = n_containers >= 4
    else:
        assert cookie == 12346, f"not a roaring bitmap (cookie {cookie})"
        (n_containers,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        offsets = True
    descr = []
    for _ in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        descr.append((key, card_m1 + 1))
        pos += 4
    if offsets:
        pos += 4 * n_containers
    out: set[int] = set()
    for idx, (key, card) in enumerate(descr):
        hi = key << 16
        if runs and runs[idx // 8] & (1 << (idx % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, extra = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.update(hi | x for x in range(start, start + extra + 1))
        elif card <= 4096:
            out.update(
                hi | v for v in struct.unpack_from(f"<{card}H", buf, pos)
            )
            pos += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    lsb = w & -w
                    out.add(hi | (w_i * 64 + lsb.bit_length() - 1))
                    w ^= lsb
    return out, pos


def rba64_decode(data: bytes) -> set:
    """64-bit RoaringBitmapArray, Delta's 'portable' format: LE magic
    1681511377, 8-byte bitmap count, then (4-byte high word, 32-bit
    roaring bitmap) per entry."""
    magic, count = struct.unpack_from("<iQ", data, 0)
    assert magic == 1681511377, f"bad DV magic {magic}"
    pos, out = 12, set()
    for _ in range(count):
        (high,) = struct.unpack_from("<I", data, pos)
        lows, pos = roaring32_read(data, pos + 4)
        out.update((high << 32) | x for x in lows)
    return out


def dv_positions(table: str, descriptor: dict) -> set:
    """DeletionVectorDescriptor → dead row indexes. storageType 'i':
    payload inline (z85). 'u': z85 uuid (optional random prefix),
    file ``deletion_vector_<uuid>.bin`` relative to the table. 'p':
    absolute path. On-disk layout: format-version byte, then at
    ``offset``: 4-byte BIG-endian size, the bitmap, 4-byte CRC32."""
    st = descriptor["storageType"]
    if st == "i":
        return rba64_decode(z85_decode(descriptor["pathOrInlineDv"]))
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        import uuid as _uuid

        name = f"deletion_vector_{_uuid.UUID(bytes=z85_decode(tail))}.bin"
        f = os.path.join(table, prefix, name) if prefix \
            else os.path.join(table, name)
    else:
        assert st == "p", f"unknown DV storageType {st}"
        f = descriptor["pathOrInlineDv"]
        if f.startswith("file:"):
            f = "/" + f[len("file:"):].lstrip("/")
    raw = open(f, "rb").read()
    off = descriptor["offset"]
    (size,) = struct.unpack_from(">i", raw, off)
    payload = raw[off + 4:off + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
    assert zlib.crc32(payload) & 0xFFFFFFFF == crc, "DV checksum mismatch"
    return rba64_decode(payload)


def _as_map(v) -> dict:
    """pyarrow MAP columns come back as [(k, v), ...]; JSON actions
    as dicts — normalize to dict."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return v
    return dict(v)


def _row_to_action(row: dict) -> list[tuple[str, dict]]:
    """One checkpoint-parquet row → its non-null action(s)."""
    out = []
    for kind in ("add", "remove", "metaData", "protocol", "sidecar"):
        v = row.get(kind)
        if v is not None and any(x is not None for x in v.values()):
            out.append((kind, v))
    return out


def delta_snapshot_rows(table: str) -> list[tuple]:
    """Replay the _delta_log per PROTOCOL.md and return every live
    row as a tuple in current-schema column order: newest checkpoint
    (classic single parquet OR a V2 uuid manifest + sidecars) seeds
    the state, later JSON commits mutate it; adds are keyed by path
    (a re-add replaces — that's how DVs attach); deletion vectors
    drop row indexes at read; column mapping resolves physical
    parquet columns by ``delta.columnMapping.id`` footer field ids
    (id mode) or ``physicalName`` (name mode)."""
    import pyarrow.parquet as pq

    log = os.path.join(table, "_delta_log")
    adds: dict[str, dict] = {}
    meta: dict | None = None
    start_after = -1

    last = os.path.join(log, "_last_checkpoint")
    if os.path.exists(last):
        ck = json.loads(open(last).read())
        v = int(ck["version"])
        start_after = v
        prefix = f"{v:020d}.checkpoint"
        parts = sorted(
            os.path.join(log, f) for f in os.listdir(log)
            if f.startswith(prefix) and f.endswith(".parquet")
        )
        rows: list[dict] = []
        for p in parts:
            rows.extend(pq.read_table(p).to_pylist())
        # V2: expand sidecar actions from _delta_log/_sidecars/
        expanded: list[dict] = []
        for r in rows:
            for kind, v_ in _row_to_action(r):
                if kind == "sidecar":
                    side = os.path.join(log, "_sidecars", v_["path"])
                    expanded.extend(pq.read_table(side).to_pylist())
                else:
                    expanded.append({kind: v_})
        for r in expanded:
            for kind, v_ in _row_to_action(r):
                if kind == "add":
                    adds[v_["path"]] = v_
                elif kind == "remove":
                    adds.pop(v_["path"], None)
                elif kind == "metaData":
                    meta = v_

    versions = sorted(
        int(f.split(".")[0]) for f in os.listdir(log)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    for v in versions:
        if v <= start_after:
            continue
        for line in open(os.path.join(log, f"{v:020d}.json")):
            a = json.loads(line)
            if "add" in a:
                adds[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                adds.pop(a["remove"]["path"], None)
            elif "metaData" in a:
                meta = a["metaData"]
    assert meta is not None, "no metaData action in the log"

    schema = json.loads(meta["schemaString"])
    mode = _as_map(meta.get("configuration")).get(
        "delta.columnMapping.mode", "none"
    )
    logical = [f["name"] for f in schema["fields"]]
    part_cols = list(meta.get("partitionColumns") or [])
    # partitionValues/stats use PHYSICAL names whenever mapping is on
    phys_name = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in schema["fields"]
    }

    out_rows: list[tuple] = []
    for rel, add in sorted(adds.items()):
        t = pq.read_table(os.path.join(table, rel))
        colmap = {}  # logical -> physical
        if mode == "id":
            fid_phys = {}
            for f in t.schema:
                fid = (f.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    fid_phys[int(fid)] = f.name
            for f in schema["fields"]:
                fid = (f.get("metadata") or {}).get("delta.columnMapping.id")
                if fid is not None and int(fid) in fid_phys:
                    colmap[f["name"]] = fid_phys[int(fid)]
        elif mode == "name":
            for f in schema["fields"]:
                phys = (f.get("metadata") or {}).get(
                    "delta.columnMapping.physicalName"
                )
                if phys and phys in t.column_names:
                    colmap[f["name"]] = phys
        dead = set()
        dv = add.get("deletionVector")
        if dv and dv.get("storageType") is not None:
            dead = dv_positions(table, dv)
        pv = _as_map(add.get("partitionValues"))
        data = t.to_pylist()
        for i, r in enumerate(data):
            if i in dead:
                continue
            vals = []
            for name, f in zip(logical, schema["fields"]):
                if name in part_cols and name not in t.column_names \
                        and colmap.get(name) not in t.column_names:
                    raw = pv.get(phys_name[name], pv.get(name))
                    vals.append(
                        None if raw is None
                        else int(raw) if f["type"] in ("long", "integer")
                        else raw
                    )
                else:
                    vals.append(r[colmap.get(name, name)])
            out_rows.append(tuple(vals))
    return sorted(out_rows, key=repr)


# ==========================================================================
# Independent Avro object-container decoder — Avro 1.11 spec
# ==========================================================================


class _AvroCursor:
    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def raw(self, n: int) -> bytes:
        v = self.b[self.p:self.p + n]
        self.p += n
        return v

    def zlong(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def zbytes(self) -> bytes:
        return self.raw(self.zlong())


def _avro_value(cur: _AvroCursor, schema):
    if isinstance(schema, list):  # union: zigzag branch index
        return _avro_value(cur, schema[cur.zlong()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _avro_value(cur, f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = cur.zlong()
                if n == 0:
                    return out
                if n < 0:
                    cur.zlong()  # block byte size — skip
                    n = -n
                out.extend(
                    _avro_value(cur, schema["items"]) for _ in range(n)
                )
        if t == "map":
            out = {}
            while True:
                n = cur.zlong()
                if n == 0:
                    return out
                if n < 0:
                    cur.zlong()
                    n = -n
                for _ in range(n):
                    k = cur.zbytes().decode()
                    out[k] = _avro_value(cur, schema["values"])
        if t == "fixed":
            return cur.raw(schema["size"])
        return _avro_value(cur, t)  # logical-type wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return cur.raw(1) == b"\x01"
    if schema in ("int", "long"):
        return cur.zlong()
    if schema == "float":
        return struct.unpack("<f", cur.raw(4))[0]
    if schema == "double":
        return struct.unpack("<d", cur.raw(8))[0]
    if schema == "bytes":
        return cur.zbytes()
    if schema == "string":
        return cur.zbytes().decode()
    raise AssertionError(f"unhandled avro type {schema!r}")


def avro_records(path: str) -> list[dict]:
    cur = _AvroCursor(open(path, "rb").read())
    assert cur.raw(4) == b"Obj\x01", "not an avro container"
    metadata = {}
    while True:
        n = cur.zlong()
        if n == 0:
            break
        if n < 0:
            cur.zlong()
            n = -n
        for _ in range(n):
            k = cur.zbytes().decode()
            metadata[k] = cur.zbytes()
    schema = json.loads(metadata["avro.schema"])
    codec = metadata.get("avro.codec", b"null").decode()
    sync = cur.raw(16)
    out: list[dict] = []
    while cur.p < len(cur.b):
        n_records = cur.zlong()
        payload = cur.zbytes()
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        else:
            assert codec == "null", f"unhandled codec {codec}"
        block = _AvroCursor(payload)
        out.extend(_avro_value(block, schema) for _ in range(n_records))
        assert cur.raw(16) == sync, "avro sync marker mismatch"
    return out


# ==========================================================================
# Independent Iceberg reader — table-spec scan planning only
# ==========================================================================


def _ice_norm(p: str, table: str) -> str:
    if p.startswith("file:"):
        p = "/" + p[len("file:"):].lstrip("/")
    return p if os.path.isabs(p) else os.path.join(table, p)


def iceberg_snapshot_rows(table: str) -> list[tuple]:
    """Plan per the Iceberg spec: version-hint → metadata.json →
    current snapshot → manifest list (avro) → manifests (avro) →
    live data-file entries (status != 2) with v2 sequence-number
    inheritance; read parquet resolving columns footer-field-id
    first, then name-mapping, then name; apply position deletes by
    (file_path, pos) and equality deletes to data files with a
    STRICTLY smaller data sequence number."""
    import pyarrow.parquet as pq

    mdir = os.path.join(table, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        version = int(open(hint).read().strip())
    else:
        version = max(
            int(f[1:].split(".")[0]) for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".metadata.json")
        )
    meta = json.loads(open(
        os.path.join(mdir, f"v{version}.metadata.json")
    ).read())
    schema = meta.get("schema") or next(
        s for s in meta["schemas"]
        if s.get("schema-id") == meta.get("current-schema-id")
    )
    fields = schema["fields"]
    by_id = {int(f["id"]): f["name"] for f in fields}
    mapping = {
        int(m["field-id"]): list(m.get("names") or [])
        for m in json.loads(
            (meta.get("properties") or {}).get(
                "schema.name-mapping.default", "[]"
            )
        )
    }

    snap_id = meta.get("current-snapshot-id")
    if snap_id in (None, -1):
        return []
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == snap_id
    )
    data_files: list[tuple] = []   # (path, data_seq, partition tuple)
    pos_delete_files: list[str] = []
    eq_delete_files: list[tuple[str, int, list[int]]] = []
    for m in avro_records(_ice_norm(snap["manifest-list"], table)):
        m_seq = int(m.get("sequence_number") or 0)
        content = int(m.get("content") or 0)
        for e in avro_records(_ice_norm(m["manifest_path"], table)):
            if int(e.get("status") or 0) == 2:     # DELETED entry
                continue
            df = e["data_file"]
            seq = e.get("sequence_number")
            seq = m_seq if seq is None else int(seq)  # v2 inheritance
            fpath = _ice_norm(df["file_path"], table)
            fcontent = int(df.get("content") or 0)
            if content == 0 and fcontent == 0:
                data_files.append((fpath, seq, dict(df.get("partition") or {})))
            elif fcontent == 1:
                pos_delete_files.append(fpath)
            elif fcontent == 2:
                eq_delete_files.append(
                    (fpath, seq, [int(i) for i in df["equality_ids"]])
                )

    dead_by_file: dict[str, set] = {}
    for p in pos_delete_files:
        for r in pq.read_table(p).to_pylist():
            key = _ice_norm(str(r["file_path"]), table)
            dead_by_file.setdefault(key, set()).add(int(r["pos"]))

    def resolve(t, want_ids: list[int]) -> dict[int, str]:
        fid_phys = {}
        for f in t.schema:
            v = (f.metadata or {}).get(b"PARQUET:field_id")
            if v is not None:
                fid_phys[int(v)] = f.name
        out = {}
        for i in want_ids:
            if i in fid_phys:
                out[i] = fid_phys[i]
                continue
            cands = [by_id[i]] + mapping.get(i, [])
            out[i] = next(
                (n for n in cands if n in t.column_names), None
            )
        return out

    eq_keys = []  # (seq, {fid: set-of-key-tuples})
    for p, seq, ids in eq_delete_files:
        t = pq.read_table(p)
        sel = resolve(t, ids)
        cols = [t.column(sel[i]).to_pylist() for i in ids]
        eq_keys.append((seq, tuple(ids), set(zip(*cols))))

    out_rows: list[tuple] = []
    for fpath, fseq, part in data_files:
        t = pq.read_table(fpath)
        sel = resolve(t, [int(f["id"]) for f in fields])
        cols = {}
        for f in fields:
            phys = sel[int(f["id"])]
            if phys is not None:
                cols[f["name"]] = t.column(phys).to_pylist()
            elif f["name"] in part:
                # spec §Column Projection: a column absent from the
                # data file whose id is an IDENTITY partition source
                # reads the manifest's partition tuple value
                # (hive-migrated add_files layouts omit the column)
                cols[f["name"]] = [part[f["name"]]] * t.num_rows
            else:
                cols[f["name"]] = [None] * t.num_rows
        dead = dead_by_file.get(fpath, set())
        for i in range(t.num_rows):
            if i in dead:
                continue
            row = tuple(cols[f["name"]][i] for f in fields)
            erased = False
            for dseq, ids, keys in eq_keys:
                if fseq < dseq:
                    kt = tuple(cols[by_id[j]][i] for j in ids)
                    if kt in keys:
                        erased = True
                        break
            if erased:
                continue
            out_rows.append(row)
    return sorted(out_rows, key=repr)


# ==========================================================================
# Fixtures + differential assertions
# ==========================================================================


def _norm(rows) -> list[tuple]:
    import datetime

    def one(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat()
        if hasattr(v, "asDict"):  # pyspark Row (struct value)
            return tuple(
                sorted((n, one(x)) for n, x in v.asDict().items())
            )
        if isinstance(v, dict):  # arrow struct / Spark map
            return tuple(sorted((one(k), one(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            items = tuple(one(x) for x in v)
            # arrow MAP values arrive as a list of (key, value) pairs
            # while Spark maps arrive as dicts — canonicalize both to
            # key-sorted pair tuples
            if items and all(
                isinstance(x, tuple) and len(x) == 2 for x in items
            ):
                return tuple(sorted(items))
            return items
        return v

    return sorted((tuple(one(v) for v in r) for r in rows), key=repr)


def _spark_rows(df) -> list[tuple]:
    return _norm(tuple(r) for r in df.collect())


class TestDeltaInterop:
    def test_dv_delete_roundtrip(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources.delta import (
            delete_delta_rows,
            read_delta_table,
            write_delta_table,
        )

        path = str(tmp_path / "d1")
        df = spark.range(0, 500).selectExpr(
            "id AS k", "id * 3 AS v", "CAST(id % 7 AS STRING) AS s"
        )
        write_delta_table(df, path)
        write_delta_table(
            spark.range(500, 600).selectExpr(
                "id AS k", "id * 3 AS v", "CAST(id % 7 AS STRING) AS s"
            ),
            path, mode="append",
        )
        delete_delta_rows(spark, path, "k % 5 = 0")
        assert _norm(delta_snapshot_rows(path)) == _spark_rows(
            read_delta_table(spark, path)
        )
        # OPTIMIZE (dataChange=false rewrite) must replay identically
        from etl_processing_scd1_spark.sources.delta import (
            optimize_delta_table,
        )

        optimize_delta_table(spark, path, target_files=2)
        assert _norm(delta_snapshot_rows(path)) == _spark_rows(
            read_delta_table(spark, path)
        )

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_column_mapping_partitioned_dv(self, spark, tmp_path, mode):
        from etl_processing_scd1_spark.sources.delta import (
            delete_delta_rows,
            read_delta_table,
            write_delta_table,
        )

        from etl_processing_scd1_spark.sources.delta import (
            rename_delta_column,
        )

        path = str(tmp_path / f"d2{mode}")
        df = spark.range(0, 90).selectExpr(
            "id AS k", "id * 2 AS v", "CAST(id % 3 AS STRING) AS part"
        )
        write_delta_table(
            df, path, column_mapping=mode, partition_by=["part"]
        )
        rename_delta_column(spark, path, "v", "val")
        write_delta_table(
            spark.range(90, 140).selectExpr(
                "id AS k", "id * 2 AS val", "CAST(id % 3 AS STRING) AS part"
            ),
            path, mode="append",
        )
        delete_delta_rows(spark, path, "k % 4 = 1")
        assert _norm(delta_snapshot_rows(path)) == _spark_rows(
            read_delta_table(spark, path)
        )

    def test_v2_checkpoint_after_log_expiry(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources.delta import (
            delete_delta_rows,
            expire_delta_log,
            read_delta_table,
            write_checkpoint,
            write_delta_table,
        )

        path = str(tmp_path / "d3")
        for lo in (0, 200, 400):
            write_delta_table(
                spark.range(lo, lo + 200).selectExpr("id AS k", "id AS v"),
                path, mode="append" if lo else "overwrite",
            )
        delete_delta_rows(spark, path, "k % 9 = 0")
        from etl_processing_scd1_spark.sources.delta import (
            delta_table_version,
        )

        write_checkpoint(spark, path, delta_table_version(path), v2=True)
        expire_delta_log(spark, path, keep_last=1)
        assert _norm(delta_snapshot_rows(path)) == _spark_rows(
            read_delta_table(spark, path)
        )


class TestIcebergInterop:
    def test_partitioned_append_and_pos_delete(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources.iceberg import (
            delete_iceberg_rows,
            read_iceberg_table,
            write_iceberg_table,
        )

        path = str(tmp_path / "i1")
        df = spark.range(0, 400).selectExpr(
            "id AS k", "id * 5 AS v", "CAST(id % 4 AS STRING) AS part"
        )
        write_iceberg_table(df, path, partition_by=["part"])
        write_iceberg_table(
            spark.range(400, 500).selectExpr(
                "id AS k", "id * 5 AS v", "CAST(id % 4 AS STRING) AS part"
            ),
            path, mode="append",
        )
        delete_iceberg_rows(spark, path, "k % 6 = 0")
        assert _norm(iceberg_snapshot_rows(path)) == _spark_rows(
            read_iceberg_table(spark, path)
        )

    def test_upsert_rename_addcolumn(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources.iceberg import (
            read_iceberg_table,
            rename_iceberg_column,
            upsert_iceberg_table,
            write_iceberg_table,
        )

        path = str(tmp_path / "i2")
        df = spark.range(0, 100).selectExpr(
            "id AS k", "id * 2 AS v", "CAST(id % 3 AS STRING) AS part"
        )
        write_iceberg_table(df, path)
        upsert_iceberg_table(
            spark.range(0, 120, 2).selectExpr(
                "id AS k", "id * 20 AS v", "CAST(id % 3 AS STRING) AS part"
            ),
            path, ["k"],
        )
        rename_iceberg_column(path, "k", "key")
        # add-column inside a second upsert, under the new key name
        upsert_iceberg_table(
            spark.range(1, 60, 2).selectExpr(
                "id AS key", "id * 200 AS v",
                "CAST(id % 3 AS STRING) AS part", "'x' AS tag"
            ),
            path, ["key"],
        )
        assert _norm(iceberg_snapshot_rows(path)) == _spark_rows(
            read_iceberg_table(spark, path)
        )

    def test_bucket_and_hour_transform_layout(self, spark, tmp_path):
        import datetime

        from etl_processing_scd1_spark.sources.iceberg import (
            read_iceberg_table,
            write_iceberg_table,
        )

        path = str(tmp_path / "i3")
        utc = datetime.timezone.utc
        rows = [
            (i, datetime.datetime(2024, 3, 1 + i % 9, i % 24, 11, tzinfo=utc),
             i * 7)
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "k long, ts timestamp, v long")
        write_iceberg_table(
            df, path, partition_by=["hour(ts)", "bucket(4, k)"]
        )
        got = iceberg_snapshot_rows(path)
        want = _spark_rows(
            read_iceberg_table(spark, path).selectExpr(
                "k", "CAST(ts AS STRING) AS ts", "v"
            )
        )
        norm_got = _norm(
            (k, str(t).replace("T", " ")[:19], v) for k, t, v in got
        )
        norm_want = _norm(
            (k, str(t)[:19], v) for k, t, v in want
        )
        assert norm_got == norm_want


class TestNestedInterop:
    """Nested struct/array/map fixtures read through the independent
    spec-replay path: the engine's writers claim stock-reader
    compatibility, and nested schema nodes (element-id/key-id/
    value-id, struct-member ids) are exactly where a non-spec-shaped
    schema JSON or a mis-resolved column would surface."""

    @staticmethod
    def _nested(spark, lo, hi):
        from pyspark.sql import functions as F

        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.array(
                (F.col("id") * 0.5).cast("double"),
                (F.col("id") * 2.0).cast("double"),
            ).alias("emb"),
            F.struct(
                F.col("id").alias("id"),
                F.concat(F.lit("t"), (F.col("id") % 3)).alias("tag"),
            ).alias("meta"),
            F.create_map(F.lit("a"), F.col("id")).alias("m"),
        )

    def test_delta_nested_dv_delete(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources.delta import (
            delete_delta_rows,
            read_delta_table,
            write_delta_table,
        )

        path = str(tmp_path / "dn")
        write_delta_table(self._nested(spark, 0, 80), path)
        write_delta_table(
            self._nested(spark, 80, 100), path, mode="append"
        )
        delete_delta_rows(spark, path, "k % 5 = 0")
        assert _norm(delta_snapshot_rows(path)) == _spark_rows(
            read_delta_table(spark, path)
        )

    def test_iceberg_nested_upsert(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from etl_processing_scd1_spark.sources.iceberg import (
            read_iceberg_table,
            upsert_iceberg_table,
            write_iceberg_table,
        )

        path = str(tmp_path / "in")
        write_iceberg_table(self._nested(spark, 0, 80), path)
        upsert_iceberg_table(
            self._nested(spark, 40, 90).withColumn("v", F.lit(-1).cast("long")),
            path, ["k"],
        )
        assert _norm(iceberg_snapshot_rows(path)) == _spark_rows(
            read_iceberg_table(spark, path)
        )
