"""The reference's 13-case MERGE benchmark suite, mirrored on Spark.

Mirrors crates/benchmarks/src/merge.rs (itself a port of delta-io/delta
#1835): target = the full table; source = a deterministic
``rowsMatchedFraction`` sample of target rows (keys unchanged -> match)
UNION a ``rowsNotMatchedFraction`` sample with shifted keys (-> no
match). Scenarios: single insert-only, multiple insert-only (two insert
clauses split by key parity), delete-only, upsert. Each case validates
the same metric invariants the reference asserts (insert-only updates/
deletes nothing, etc.) and reports wall seconds for the merge only.

Target data: sf0.1 lineitem deduped on (l_orderkey, l_linenumber) (the
testdata is not key-unique; the reference's web_returns is). Fresh Delta
table per case, like the reference's per-iteration temp tables.

Usage: python scripts/merge_cases.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_rs_spark import DeltaTable, write_deltalake
from delta_rs_spark.session import get_spark
from delta_rs_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/mergecases"
SHIFT = 1_000_000_000

CASES = [
    ("single_insert_only", 0.0, 0.05),
    ("single_insert_only", 0.0, 0.5),
    ("single_insert_only", 0.0, 1.0),
    ("multiple_insert_only", 0.0, 0.05),
    ("multiple_insert_only", 0.0, 0.5),
    ("multiple_insert_only", 0.0, 1.0),
    ("delete_only", 0.05, 0.0),
    ("upsert", 0.0, 0.1),
    ("upsert", 0.01, 0.1),
    ("upsert", 0.1, 0.1),
    ("upsert", 0.1, 0.0),
    ("upsert", 0.5, 0.001),
    ("upsert", 0.99, 0.001),
]


def _sample(df, fraction: float, salt: str):
    """Deterministic fraction by md5 bucket (reference uses random();
    determinism keeps reruns comparable)."""
    if fraction <= 0.0:
        return df.limit(0)
    if fraction >= 1.0:
        return df
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.lit(salt), "l_orderkey", "l_linenumber")), 1, 8),
        16,
        10,
    ).cast("long") % 10000
    return df.filter(bucket < int(fraction * 10000))


def build_source(base, mf: float, nmf: float):
    matched = _sample(base, mf, "m")
    not_matched = _sample(base, nmf, "n").withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(SHIFT)
    )
    return matched.unionByName(not_matched)


def run_case(spark, base, scenario: str, mf: float, nmf: float) -> dict:
    path = os.path.join(WORK, "t")
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake(path, base.repartition(8))
    src = build_source(base, mf, nmf)
    t = DeltaTable(path, spark=spark)
    m = t.merge(
        src,
        "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber",
        source_alias="s",
        target_alias="t",
    )
    if scenario == "single_insert_only":
        m = m.when_not_matched_insert_all()
    elif scenario == "multiple_insert_only":
        m = m.when_not_matched_insert_all(
            predicate="s.l_orderkey % 2 = 0"
        ).when_not_matched_insert_all()
    elif scenario == "delete_only":
        m = m.when_matched_delete()
    elif scenario == "upsert":
        m = m.when_matched_update_all().when_not_matched_insert_all()
    t0 = time.time()
    metrics = m.execute()
    secs = round(time.time() - t0, 2)

    # the reference's validators
    if "insert_only" in scenario:
        assert metrics["num_target_rows_updated"] == 0
        assert metrics["num_target_rows_deleted"] == 0
    elif scenario == "delete_only":
        assert metrics["num_target_rows_inserted"] == 0
        assert metrics["num_target_rows_updated"] == 0
    else:
        assert metrics["num_target_rows_deleted"] == 0
    name = (
        f"{scenario}_filesMatchedFraction_0.05"
        + (f"_rowsMatchedFraction_{mf}" if scenario != "single_insert_only" and scenario != "multiple_insert_only" else "")
        + (f"_rowsNotMatchedFraction_{nmf}" if nmf else "")
    )
    return {
        "name": name,
        "secs": secs,
        "inserted": metrics["num_target_rows_inserted"],
        "updated": metrics["num_target_rows_updated"],
        "deleted": metrics["num_target_rows_deleted"],
    }


def main() -> None:
    spark = get_spark("merge_cases")
    base = (
        load_table(spark, SF_DIR, "lineitem")
        .dropDuplicates(["l_orderkey", "l_linenumber"])
        .cache()
    )
    base.count()
    out = []
    for scenario, mf, nmf in CASES:
        r = run_case(spark, base, scenario, mf, nmf)
        out.append(r)
        print(json.dumps(r), flush=True)
    shutil.rmtree(WORK, ignore_errors=True)
    print(json.dumps({"merge_cases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
