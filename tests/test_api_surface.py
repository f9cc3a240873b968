"""deltalake-API-compat surface: QueryBuilder, pandas/arrow input,
pyarrow output, DNF partition filters (reference: python/deltalake API)."""

import pandas as pd
import pyarrow as pa

from delta_rs_spark import DeltaTable, QueryBuilder, write_deltalake


def test_querybuilder_multi_table(spark, tmp_path, sample_df, lineitem):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_deltalake(p1, sample_df)
    write_deltalake(p2, lineitem.limit(100))
    qb = (
        QueryBuilder(spark)
        .register("biz", DeltaTable(p1))
        .register("li", DeltaTable(p2))
    )
    rows = qb.execute(
        "SELECT count(*) AS n FROM biz CROSS JOIN (SELECT DISTINCT l_returnflag FROM li)"
    ).collect()
    assert rows[0].n % 5 == 0 and rows[0].n > 0


def test_write_from_pandas_and_arrow(spark, tmp_path):
    p = str(tmp_path / "pdtab")
    pdf = pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]})
    write_deltalake(p, pdf, spark=spark)
    t = DeltaTable(p)
    assert t.count() == 3
    tbl = pa.table({"id": [4, 5], "name": ["d", "e"]})
    write_deltalake(p, tbl, spark=spark, mode="append")
    t.refresh()
    assert t.count() == 5


def test_to_pyarrow_table(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    tbl = DeltaTable(tmp_table).to_pyarrow_table(columns=["id", "price"])
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 5 and tbl.column_names == ["id", "price"]


def test_dnf_partition_filters(spark, tmp_table, lineitem):
    write_deltalake(tmp_table, lineitem, partition_by=["l_returnflag"])
    t = DeltaTable(tmp_table)
    files_in = t.files([("l_returnflag", "in", ["A", "N"])])
    files_eq = t.files([("l_returnflag", "=", "A")])
    assert set(files_eq) < set(files_in)
    # disjunction of conjunctions
    df = t.to_df(partition_filters=[[("l_returnflag", "=", "A")], [("l_returnflag", "=", "N")]])
    assert df.select("l_returnflag").distinct().count() == 2


def test_count_and_schema_api(spark, tmp_table, sample_df):
    write_deltalake(tmp_table, sample_df)
    t = DeltaTable(tmp_table)
    assert t.count() == 5
    assert [f.name for f in t.schema().fields] == ["id", "price", "sold", "deleted"]
    assert t.protocol().min_reader_version == 1
    assert t.metadata().partition_columns == []
