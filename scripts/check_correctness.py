"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01, the matching
``oracle_sql()`` on DuckDB over the same parquet, and compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, doubles rounded to 9 sig places
before hashing to absorb representation noise that real drivers may or
may not tolerate — we aim for exact row-level equality anyway and
report max numeric deltas when rows differ).

Usage: python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def rows_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        if a[c].dtype == "float64":
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = pd.isna(av) & pd.isna(bv)
            neq = ~(both_nan | (av == bv))
            if neq.any():
                mx = float(max(abs(x - y) for x, y in zip(av[neq], bv[neq]) if not (math.isnan(x) or math.isnan(y))) if neq.any() else 0)
                return False, f"col {c}: {int(neq.sum())} diffs, max abs delta {mx:.3e}"
        else:
            neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                i = int(neq.idxmax())
                return False, f"col {c}: {int(neq.sum())} diffs, first at row {i}: {a[c][i]!r} vs {b[c][i]!r}"
    return True, "ok"


def main() -> int:
    import __spark_entry__ as entry_mod
    from delta_rs_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = rows_equal(canon(sdf), canon(odf))
        if ok:
            # Driver hashes raw values, so an int64 Spark column vs a
            # float64 oracle column (DuckDB sum(INTEGER) -> HUGEINT ->
            # float64 in fetchdf) hashes `8570` vs `8570.0` and fails
            # even when canon()'s numeric compare passes. This exact
            # class produced the q12 (r02) and llm_source_mix (r04) red
            # rows, so treat dtype-kind divergence as a failure here.
            for c in set(sdf.columns) & set(odf.columns):
                sk, ok_ = sdf[c].dtype.kind, odf[c].dtype.kind
                int_kinds, float_kinds = {"i", "u"}, {"f"}
                if (sk in int_kinds and ok_ in float_kinds) or (
                    sk in float_kinds and ok_ in int_kinds
                ):
                    ok = False
                    msg = (
                        f"dtype divergence col {c}: spark {sdf[c].dtype}"
                        f" vs oracle {odf[c].dtype} (driver hash would differ)"
                    )
                    break
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) {'' if ok else msg}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
