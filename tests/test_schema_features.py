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
