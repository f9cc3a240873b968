"""Capture .explain('formatted') for declared queries -> plans/r12/.

Usage: python scripts/capture_plans.py before|after [name ...]

Only BATCH queries are captured by default (building the DataFrame for
the delta_*/sync/stream gates executes their whole mutation sequence;
pass names explicitly to capture those too — the capture then runs the
sequence once and explains the final frame).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# gates whose fn() executes a full Delta-commit / streaming sequence;
# skipped unless named explicitly
_SEQUENCE_GATES = (
    "llm_fp_index_sync",
    "llm_fp_index_sync_nocdf",
    "llm_band_index_sync",
    "llm_ivf_index_sync",
    "llm_ivf_recluster",
    "llm_incremental_agg_nocdf",
    "llm_stream_",
    "q_events_stream_",
    "q_events_late_watermark",
    "q_events_session_watermark",
    "q_events_dedup_within_watermark",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import __spark_entry__ as entry
    from delta_rs_spark.session import get_spark

    spark = get_spark("capture_plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    targets = names or [
        n
        for n in qs
        if not n.startswith("delta_")
        and not any(n.startswith(p) or n == p for p in _SEQUENCE_GATES)
    ]
    for name in targets:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
