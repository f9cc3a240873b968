"""Generated columns, invariants, merge schema evolution
(reference test model: write/generated_columns.rs tests,
kernel/schema/schema.rs invariants, test_merge.py schema evolution)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.log.commit import DeltaError
from delta_rs_spark.writer import GENERATION_KEY, INVARIANTS_KEY


def _gen_schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField(
                "price_bucket",
                T.LongType(),
                True,
                {GENERATION_KEY: "CAST(price / 10 AS BIGINT)"},
            ),
        ]
    )


def test_generated_column_computed_on_write(spark, tmp_table):
    DeltaTable.create(tmp_table, _gen_schema())
    df = spark.createDataFrame([(1, 25.0), (2, 7.0)], "id long, price double")
    write_deltalake(tmp_table, df, mode="append")
    rows = {r.id: r.price_bucket for r in DeltaTable(tmp_table).to_df().collect()}
    assert rows == {1: 2, 2: 0}


def test_generated_column_validated_when_provided(spark, tmp_table):
    DeltaTable.create(tmp_table, _gen_schema())
    good = spark.createDataFrame([(1, 25.0, 2)], "id long, price double, price_bucket long")
    write_deltalake(tmp_table, good, mode="append")
    bad = spark.createDataFrame([(2, 25.0, 99)], "id long, price double, price_bucket long")
    with pytest.raises(DeltaError, match="generated column"):
        write_deltalake(tmp_table, bad, mode="append")


def test_invariant_enforced(spark, tmp_table):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "qty",
                T.LongType(),
                True,
                {INVARIANTS_KEY: json.dumps({"expression": {"expression": "qty >= 0"}})},
            ),
        ]
    )
    DeltaTable.create(tmp_table, schema)
    write_deltalake(tmp_table, spark.createDataFrame([(1, 5)], "id long, qty long"), mode="append")
    with pytest.raises(DeltaError, match="invariant"):
        write_deltalake(
            tmp_table, spark.createDataFrame([(2, -1)], "id long, qty long"), mode="append"
        )


def test_merge_schema_evolution(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    src = spark.createDataFrame(
        [("1", 100, 1, False, "gold"), ("9", 900, 9, False, "silver")],
        "id string, price long, sold int, deleted boolean, tier string",
    )
    (
        t.merge(src, "target.id = source.id", merge_schema=True)
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute()
    )
    assert "tier" in [f.name for f in t.schema().fields]
    rows = {r.id: r.tier for r in t.to_df().collect()}
    assert rows["1"] == "gold" and rows["9"] == "silver"
    assert rows["2"] is None  # untouched rows read evolved column as null


def test_merge_without_schema_evolution_rejects_new_col(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    src = spark.createDataFrame([("1", "gold")], "id string, tier string")
    # *_all expansion simply ignores unknown source columns when evolution is off
    m = (
        t.merge(src, "target.id = source.id")
        .when_matched_update_all()
        .execute()
    )
    assert "tier" not in [f.name for f in t.schema().fields]
    assert m["num_target_rows_updated"] == 1


def test_variant_type_roundtrip():
    """Variant mirrors the reference's VariantType (python/src/schema.rs:189):
    serializes as the primitive string "variant" — the same JSON Spark 4's
    T.VariantType emits — and round-trips through both layers."""
    from pyspark.sql import types as T

    from delta_rs_spark.schema import Field, PrimitiveType, Schema, VariantType

    assert VariantType() == VariantType()
    assert VariantType().to_json() == '"variant"'
    assert VariantType.from_json('"variant"') == VariantType()

    s = Schema([Field("id", PrimitiveType("long")), Field("payload", VariantType())])
    assert Schema.from_json(s.to_json()) == s
    sp = s.to_pyspark()
    assert isinstance(sp["payload"].dataType, T.VariantType)
    assert Schema.from_pyspark(sp) == s


def _variant_df(spark, n=10):
    return spark.range(n).select(
        F.col("id"),
        F.parse_json(
            F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("v"),
    )


def test_variant_write_full_plane(spark, tmp_path):
    """Variant-typed column WRITES (r05): create derives the
    variantType feature-bearing protocol from the schema, per-file
    stats come from the Spark-side fallback (pyarrow 16 cannot parse
    VARIANT footers), and scan/delete/update/append/time-travel all
    work on the variant table."""
    path = str(tmp_path / "variant_full")
    write_deltalake(path, _variant_df(spark).coalesce(2))
    t = DeltaTable(path, spark=spark)
    p = t.protocol()
    assert "variantType" in (p.reader_features or [])
    assert "variantType" in (p.writer_features or [])
    # stats fallback produced real numRecords + min/max for the long col
    add = next(iter(t._snapshot.files.values()))
    st = json.loads(add.stats)
    assert st["numRecords"] == 5
    assert "id" in st["minValues"] and "v" not in st["minValues"]
    # values survive the round trip
    got = t.to_df().select(
        F.try_variant_get("v", "$.a", "long").alias("a")
    )
    assert got.agg(F.sum("a")).collect()[0][0] == 45
    # mutations
    t.delete("id >= 8")
    t.refresh()
    assert t.count() == 8
    t.update({"v": "parse_json('{\"a\": 99}')"}, predicate="id = 0")
    t.refresh()
    assert (
        t.to_df(predicate="id = 0")
        .select(F.try_variant_get("v", "$.a", "long").alias("a"))
        .collect()[0]
        .a
        == 99
    )
    write_deltalake(
        path,
        _variant_df(spark, 2).withColumn("id", F.col("id") + 100),
        mode="append",
    )
    t.refresh()
    assert t.count() == 10
    t.load_as_version(0)
    assert t.count() == 10


def test_variant_stats_fallback_skips_pruning_soundly(spark, tmp_path):
    """File skipping on the fallback stats: a predicate on the long
    column prunes variant-bearing files by the Spark-computed min/max."""
    path = str(tmp_path / "variant_prune")
    write_deltalake(path, _variant_df(spark, 100).repartition(4, "id"))
    t = DeltaTable(path, spark=spark)
    n_all = len(t.files())
    assert n_all == 4
    rows = t.to_df(predicate="id = 57").collect()
    assert [r.id for r in rows] == [57]


def test_variant_write_partitioned(spark, tmp_path):
    """Variant write to a PARTITIONED table: the stats fallback must not
    reference partition columns (directory-encoded, absent from the
    scanned files — r05 advice). Stats carry the physical columns only;
    partition pruning and value round-trip still work."""
    path = str(tmp_path / "variant_part")
    df = _variant_df(spark, 20).withColumn("bucket", F.col("id") % 2)
    write_deltalake(path, df, partition_by=["bucket"])
    t = DeltaTable(path, spark=spark)
    add = next(iter(t._snapshot.files.values()))
    st = json.loads(add.stats)
    assert st["numRecords"] > 0
    assert "id" in st["minValues"] and "bucket" not in st["minValues"]
    assert add.partition_values.get("bucket") in {"0", "1"}
    got = t.to_df(predicate="bucket = 1").select(
        F.try_variant_get("v", "$.a", "long").alias("a")
    )
    assert sorted(r.a for r in got.collect()) == list(range(1, 20, 2))
    # mutation on the partitioned variant table exercises the fallback
    # again through the rewrite path
    t.update({"v": "parse_json('{\"a\": -1}')"}, predicate="id = 3")
    t.refresh()
    assert (
        t.to_df(predicate="id = 3")
        .select(F.try_variant_get("v", "$.a", "long").alias("a"))
        .collect()[0]
        .a
        == -1
    )


def test_update_recomputes_generated_columns(spark, tmp_path):
    """UPDATE must recompute generated columns it did not assign, from
    the post-update values (delta-spark semantics; MERGE already did via
    _recompute_generated) — on both the rewrite and DV variants, with
    non-matching rows untouched."""
    for dv in (False, True):
        path = str(tmp_path / f"gen_upd_{dv}")
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("price", T.LongType()),
            T.StructField(
                "double_price", T.LongType(),
                metadata={"delta.generationExpression": "price * 2"},
            ),
        ])
        df = spark.createDataFrame(
            [(1, 10), (2, 20)], "id long, price long"
        ).withColumn("double_price", F.col("price") * 2)
        cfg = {"delta.enableDeletionVectors": "true"} if dv else {}
        write_deltalake(
            path, spark.createDataFrame(df.collect(), schema), configuration=cfg
        )
        t = DeltaTable(path, spark=spark)
        t.update({"price": "price + 5"}, predicate="id = 1")
        t.refresh()
        got = sorted((r.id, r.price, r.double_price) for r in t.to_df().collect())
        assert got == [(1, 15, 30), (2, 20, 40)], (dv, got)


def test_update_rejects_wrong_generated_assignment(spark, tmp_path):
    """Explicitly SETting a generated column to a value that contradicts
    its expression must abort the UPDATE (write-side generated-equality
    rule, same as the append path)."""
    path = str(tmp_path / "gen_wrong")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.LongType()),
        T.StructField(
            "double_price", T.LongType(),
            metadata={"delta.generationExpression": "price * 2"},
        ),
    ])
    df = spark.createDataFrame(
        [(1, 10)], "id long, price long"
    ).withColumn("double_price", F.col("price") * 2)
    write_deltalake(path, spark.createDataFrame(df.collect(), schema))
    t = DeltaTable(path, spark=spark)
    with pytest.raises(DeltaError, match="double_price"):
        t.update({"double_price": "999"}, predicate="id = 1")
    # consistent explicit assignment passes
    t.refresh()
    t.update({"price": "30", "double_price": "60"}, predicate="id = 1")
    t.refresh()
    assert [(r.price, r.double_price) for r in t.to_df().collect()] == [(30, 60)]
