"""Nested types (struct / array / map) through the lakehouse
writers and readers (sources/delta.py, sources/iceberg.py).

The reference pipeline's tables are flat, but an LLM-data lakehouse
is not: embeddings are ``array<float>``, document metadata is a
struct, tags are maps. This module pins:

- Delta: round trip, DML (DELETE/UPDATE/MERGE incl. map-valued
  payload diffs), CDF over nested tables, spec-shaped stats staying
  top-level, the column-mapping gate (mapping ids on nested fields
  are not assigned — fail loud, never write an off-spec table).
- Iceberg: schema JSON carries spec-correct nested nodes with unique
  ids (element-id / key-id / value-id), ids are STABLE across
  appends and evolution commits, ``last-column-id`` covers nested
  ids, DML + upsert with nested payload, rename of a nested-typed
  column, and the scalar-only gates (partition transforms,
  equality-delete keys).
- Both Python DataSources read and write nested tables through the
  Arrow path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_processing_scd1_spark.sources.delta import (
    DeltaProtocolError,
    delta_changes,
    merge_delta_table,
    read_delta_table,
    update_delta_rows,
    write_delta_table,
)
from etl_processing_scd1_spark.sources.delta import (
    delete_delta_rows,
)
from etl_processing_scd1_spark.sources.iceberg import (
    IcebergProtocolError,
    _load_metadata,
    _max_field_id,
    delete_iceberg_rows,
    read_iceberg_table,
    rename_iceberg_column,
    update_iceberg_rows,
    upsert_iceberg_table,
    write_iceberg_table,
)


def _nested_df(spark, lo, hi):
    """k, v, emb array<double>, meta struct<id,tag>, m map<string,long>."""
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


def _canon(df):
    """Order-insensitive canonical rows (maps via sorted entries)."""
    return sorted(
        (
            r.k,
            r.v,
            tuple(r.emb),
            (r.meta.id, r.meta.tag),
            tuple(sorted(r.m.items())),
        )
        for r in df.select("k", "v", "emb", "meta", "m").collect()
    )


class TestDeltaNested:
    def test_round_trip_append_timetravel(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 20), path)
        assert _canon(read_delta_table(spark, path)) == _canon(
            _nested_df(spark, 0, 20)
        )
        write_delta_table(_nested_df(spark, 20, 25), path, mode="append")
        assert _canon(read_delta_table(spark, path)) == _canon(
            _nested_df(spark, 0, 25)
        )
        assert _canon(read_delta_table(spark, path, version=0)) == _canon(
            _nested_df(spark, 0, 20)
        )

    def test_stats_stay_top_level(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 20), path)
        with open(
            os.path.join(path, "_delta_log", "0" * 20 + ".json")
        ) as fh:
            adds = [
                json.loads(ln)["add"]
                for ln in fh
                if "\"add\"" in ln
            ]
        assert adds
        for add in adds:
            st = json.loads(add["stats"])
            # nested leaves (emb.list.element, meta.id, m.key_value.*)
            # must NOT leak as dotted flat keys — the spec shape nests
            # minValues by struct, and we only record top-level scalars
            assert all("." not in k for k in st["minValues"])
            assert set(st["minValues"]) <= {"k", "v"}

    def test_dml_delete_update(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 20), path)
        delete_delta_rows(spark, path, "k % 2 = 0")
        assert read_delta_table(spark, path).count() == 10
        update_delta_rows(spark, path, "k % 3 = 0", {"v": "-1"})
        r = read_delta_table(spark, path)
        assert r.filter("v = -1").count() == 3  # k in {3, 9, 15}
        # nested payload rides through the rewrite untouched
        row = r.filter("k = 3").first()
        assert row.meta.id == 3 and list(row.emb) == [1.5, 6.0]

    def test_merge_map_diff_and_idempotence(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 10), path)
        # change ONLY the map value of k=1; k=2 identical → no-op row
        src = _nested_df(spark, 1, 3).withColumn(
            "m",
            F.when(
                F.col("k") == 1, F.create_map(F.lit("a"), F.lit(999))
            ).otherwise(F.col("m")),
        )
        v1 = merge_delta_table(spark, src, path, ["k"])
        r = read_delta_table(spark, path)
        assert r.count() == 10
        assert r.filter("m['a'] = 999").count() == 1
        # identical replay commits nothing (map compare is canonical)
        assert merge_delta_table(spark, src, path, ["k"]) == v1

    def test_merge_map_key_refused(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 5), path)
        with pytest.raises(ValueError, match="map"):
            merge_delta_table(
                spark, _nested_df(spark, 0, 2), path, ["m"]
            )

    def test_cdf_over_nested(self, spark, tmp_path):
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 10), path)
        delete_delta_rows(spark, path, "k = 4")
        ch = delta_changes(spark, path, 0, 1)
        rows = ch.collect()
        assert [r["_change_type"] for r in rows] == ["delete"]
        assert rows[0].meta.id == 4

    def test_column_mapping_gate(self, spark, tmp_path):
        with pytest.raises(DeltaProtocolError, match="nested"):
            write_delta_table(
                _nested_df(spark, 0, 5),
                str(tmp_path / "d"),
                column_mapping="name",
            )

    def test_non_nullable_nested_declaration_reads(self, spark, tmp_path):
        # F.lit/struct produce NOT NULL nested fields; the log keeps
        # the declaration, the reader must still read (parquet scans
        # return nullable — this was an analysis error before)
        path = str(tmp_path / "d")
        df = spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.struct(F.lit("x").alias("tag")).alias("s"),
        )
        assert any(
            not f.nullable for f in df.schema["s"].dataType.fields
        )
        write_delta_table(df, path)
        got = read_delta_table(spark, path)
        assert got.count() == 5
        assert got.select("s.tag").distinct().first()[0] == "x"


class TestIcebergNested:
    def test_schema_json_nested_ids(self, spark, tmp_path):
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 20), path)
        meta = _load_metadata(path, None)
        fields = {f["name"]: f for f in meta["schema"]["fields"]}
        emb = fields["emb"]["type"]
        assert emb["type"] == "list" and isinstance(emb["element-id"], int)
        st = fields["meta"]["type"]
        assert st["type"] == "struct"
        inner_ids = [f["id"] for f in st["fields"]]
        mp = fields["m"]["type"]
        assert mp["type"] == "map"
        all_ids = (
            [f["id"] for f in meta["schema"]["fields"]]
            + [emb["element-id"], mp["key-id"], mp["value-id"]]
            + inner_ids
        )
        # unique ids table-wide, last-column-id covers every one
        assert len(set(all_ids)) == len(all_ids)
        assert meta["last-column-id"] == max(all_ids)
        assert meta["last-column-id"] == _max_field_id(meta["schema"])

    def test_nested_ids_stable_across_commits(self, spark, tmp_path):
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 10), path)
        m1 = _load_metadata(path, None)
        write_iceberg_table(_nested_df(spark, 10, 15), path, mode="append")
        delete_iceberg_rows(spark, path, "k = 1")
        update_iceberg_rows(spark, path, "k = 2", {"v": "0"})
        upsert_iceberg_table(_nested_df(spark, 3, 5), path, ["k"])
        m2 = _load_metadata(path, None)
        assert m2["schema"]["fields"] == m1["schema"]["fields"]
        assert m2["last-column-id"] == m1["last-column-id"]

    def test_round_trip_dml_upsert(self, spark, tmp_path):
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 20), path)
        assert _canon(read_iceberg_table(spark, path)) == _canon(
            _nested_df(spark, 0, 20)
        )
        delete_iceberg_rows(spark, path, "k >= 15")
        assert read_iceberg_table(spark, path).count() == 15
        update_iceberg_rows(spark, path, "k = 1", {"v": "111"})
        src = _nested_df(spark, 10, 12).withColumn("v", F.lit(777))
        upsert_iceberg_table(src, path, ["k"])
        r = read_iceberg_table(spark, path)
        assert r.count() == 15
        assert r.filter("v = 777").count() == 2
        assert r.filter("v = 111").count() == 1
        # nested payload of an upserted row is the SOURCE's
        row = r.filter("k = 10").first()
        assert row.meta.id == 10 and list(row.emb) == [5.0, 20.0]

    def test_add_nested_column_evolution(self, spark, tmp_path):
        path = str(tmp_path / "i")
        flat = spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        write_iceberg_table(flat, path)
        m1 = _load_metadata(path, None)
        evolved = flat.withColumn(
            "tags", F.array(F.lit("x"), F.lit("y"))
        )
        write_iceberg_table(evolved, path, mode="append")
        m2 = _load_metadata(path, None)
        tags = next(
            f for f in m2["schema"]["fields"] if f["name"] == "tags"
        )
        # fresh top-level id past the old last-column-id, element id
        # past that, last-column-id bumped over both
        assert tags["id"] > m1["last-column-id"]
        assert tags["type"]["element-id"] > tags["id"]
        assert m2["last-column-id"] == tags["type"]["element-id"]
        r = read_iceberg_table(spark, path)
        assert r.count() == 10
        # pre-evolution files read NULL for the new column
        assert r.filter(F.col("tags").isNull()).count() == 5

    def test_rename_nested_typed_column(self, spark, tmp_path):
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 10), path)
        before = _load_metadata(path, None)
        node_before = next(
            f for f in before["schema"]["fields"] if f["name"] == "meta"
        )["type"]
        rename_iceberg_column(path, "meta", "info")
        r = read_iceberg_table(spark, path)
        assert "info" in r.columns and "meta" not in r.columns
        assert r.select(F.sum("info.id")).first()[0] == sum(range(10))
        after = _load_metadata(path, None)
        node_after = next(
            f for f in after["schema"]["fields"] if f["name"] == "info"
        )["type"]
        # rename keeps the nested node (ids included) verbatim
        assert node_after == node_before
        # and a write after the rename still reuses it
        write_iceberg_table(
            _nested_df(spark, 10, 12).withColumnRenamed("meta", "info"),
            path,
            mode="append",
        )
        final = _load_metadata(path, None)
        assert next(
            f for f in final["schema"]["fields"] if f["name"] == "info"
        )["type"] == node_before

    def test_scalar_only_gates(self, spark, tmp_path):
        df = _nested_df(spark, 0, 5)
        with pytest.raises(ValueError, match="scalar"):
            write_iceberg_table(
                df, str(tmp_path / "p"), partition_by=["meta"]
            )
        path = str(tmp_path / "i")
        write_iceberg_table(df, path)
        with pytest.raises(ValueError, match="nested"):
            upsert_iceberg_table(df, path, ["meta"])
        with pytest.raises(ValueError, match="nested"):
            upsert_iceberg_table(df, str(tmp_path / "fresh"), ["m"])

    def test_write_type_alignment(self, spark, tmp_path):
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 5), path)
        # int source into a long column: lossless promotion, cast on
        # the way in so every file's physical type agrees
        narrow = _nested_df(spark, 5, 7).withColumn(
            "v", F.col("v").cast("int")
        )
        write_iceberg_table(narrow, path, mode="append")
        r = read_iceberg_table(spark, path)
        assert r.count() == 7
        assert dict(r.dtypes)["v"] == "bigint"
        # lossy source type: refuse, never null silently
        bad = _nested_df(spark, 7, 8).withColumn("v", F.lit("oops"))
        with pytest.raises(IcebergProtocolError, match="lossless"):
            write_iceberg_table(bad, path, mode="append")

    def test_partition_by_scalar_with_nested_payload(self, spark, tmp_path):
        path = str(tmp_path / "i")
        df = _nested_df(spark, 0, 12).withColumn(
            "part", (F.col("k") % 3).cast("string")
        )
        write_iceberg_table(df, path, partition_by=["part"])
        r = read_iceberg_table(
            spark, path, predicates={"part": ("1", "1")}
        )
        assert r.count() == 4
        assert r.select(F.sum("meta.id")).first()[0] == 1 + 4 + 7 + 10


class TestNestedDataSources:
    def test_deltalog_read_write(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources import ensure_datasources

        ensure_datasources(spark)
        path = str(tmp_path / "d")
        write_delta_table(_nested_df(spark, 0, 10), path)
        got = spark.read.format("deltalog").load(path)
        assert _canon(got) == _canon(_nested_df(spark, 0, 10))
        _nested_df(spark, 10, 15).write.format("deltalog").mode(
            "append"
        ).save(path)
        assert _canon(read_delta_table(spark, path)) == _canon(
            _nested_df(spark, 0, 15)
        )

    def test_iceberglog_read_write(self, spark, tmp_path):
        from etl_processing_scd1_spark.sources import ensure_datasources

        ensure_datasources(spark)
        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 10), path)
        got = spark.read.format("iceberglog").load(path)
        assert _canon(got) == _canon(_nested_df(spark, 0, 10))
        _nested_df(spark, 10, 15).write.format("iceberglog").mode(
            "append"
        ).save(path)
        assert _canon(read_iceberg_table(spark, path)) == _canon(
            _nested_df(spark, 0, 15)
        )
        # DataSource write reused the nested ids too
        meta = _load_metadata(path, None)
        assert meta["last-column-id"] == _max_field_id(meta["schema"])


class TestNestedFooterIds:
    def test_struct_member_ids_stamped(self, spark, tmp_path):
        """Stock id-first readers resolve struct members from the
        parquet footer: the writer stamps every struct member's spec
        field id via schema metadata (list/map inner ids stay
        name-mapped — Spark has no StructField to carry them)."""
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = str(tmp_path / "i")
        write_iceberg_table(_nested_df(spark, 0, 10), path)
        meta = _load_metadata(path, None)
        node = next(
            f for f in meta["schema"]["fields"] if f["name"] == "meta"
        )
        want = {
            f["name"]: f["id"] for f in node["type"]["fields"]
        }
        f = glob.glob(os.path.join(path, "data", "*.parquet"))[0]
        sch = pq.read_schema(f)
        meta_field = sch.field("meta")
        assert pa.types.is_struct(meta_field.type)
        got = {}
        for i in range(meta_field.type.num_fields):
            c = meta_field.type.field(i)
            fid = (c.metadata or {}).get(b"PARQUET:field_id")
            got[c.name] = int(fid) if fid is not None else None
        assert got == want
        # top-level ids still stamped alongside
        top = (meta_field.metadata or {}).get(b"PARQUET:field_id")
        assert int(top) == node["id"]
