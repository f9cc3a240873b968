"""Profile one declared query: wall time, Spark job/stage counts, and a
driver-side cProfile (top cumulative).

Usage: python scripts/profile_query.py <query_name> [n_runs]

The first run is a warm-up (JIT/codegen/worker pool); the profiled run
is the second, matching bench.py's warm methodology. Job/stage counts
come from a SparkListener registered on the JVM side via the status
tracker's job IDs delta.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import __spark_entry__ as entry
    from delta_rs_spark.session import get_spark

    spark = get_spark("profile")
    qs = entry.queries()
    fn = qs[name]

    def run():
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    t0 = time.time()
    run()
    print(f"warmup: {time.time() - t0:.3f}s")

    st = spark.sparkContext.statusTracker()
    before_jobs = set(st.getJobIdsForGroup(None) or [])
    for i in range(n_runs):
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        run()
        pr.disable()
        wall = time.time() - t0
        after_jobs = set(st.getJobIdsForGroup(None) or [])
        print(f"run {i}: {wall:.3f}s, spark jobs: {len(after_jobs - before_jobs)}")
        before_jobs = after_jobs
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(45)
        print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
