"""Load-time schema guard over the driver's testdata (sources/tpch.py).

The driver regenerated testdata once already (events.ts flipped ns->us
between rounds); the guard turns any future silent layout drift into one
loud load-time error instead of a round of baffling oracle mismatches.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from delta_rs_spark.sources import tpch

SF = "/root/testdata/sf0.001"


def test_all_tables_pass_guard_and_load(spark):
    for name in tpch.TABLES:
        df = tpch.load_table(spark, SF, name)
        assert df.columns  # schema resolved; guard did not fire


def test_guard_rejects_dtype_drift(spark, tmp_path):
    # documents.n_chars shipped as int64; ship it as string -> loud error
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": ["x"],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": ["1"],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with pytest.raises(RuntimeError, match="n_chars.*expected int"):
        tpch.load_table(spark, str(tmp_path), "documents")


def test_guard_rejects_missing_column(spark, tmp_path):
    pq.write_table(
        pa.table({"vec_id": pa.array([1], pa.int64()), "label": pa.array([0], pa.int32())}),
        str(tmp_path / "embeddings.parquet"),
    )
    with pytest.raises(RuntimeError, match="missing column 'embedding'"):
        tpch.load_table(spark, str(tmp_path), "embeddings")


def test_guard_allows_width_and_unit_drift(spark, tmp_path):
    # int32->int64 and timestamp unit changes are semantic no-ops: allowed
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([1], pa.int64()),  # shipped int32
                "r_name": ["EUROPE"],
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    assert tpch.load_table(spark, str(tmp_path), "region").count() == 1


def test_guard_reports_observed_footer(spark, tmp_path):
    pq.write_table(
        pa.table({"r_regionkey": [1.5], "r_name": ["x"]}),
        str(tmp_path / "region.parquet"),
    )
    with pytest.raises(RuntimeError, match="Observed footer"):
        tpch.load_table(spark, str(tmp_path), "region")
