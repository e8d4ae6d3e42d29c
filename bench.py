"""Benchmark runner. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pipeline": {...}, "scaling": {...}}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The scaling section evidences the north-rule
two-cluster-size criterion in-sandbox: the same pipeline job at local[8]
vs local[32] on identical input (subprocesses, JVM startup excluded from
the measured window), reporting sequences/sec at both and the efficiency
  eff = (throughput_4N / throughput_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_ROWS = int(os.environ.get("QSVSPARK_BENCH_SCALE_ROWS", "2000000"))
SKIP_SCALING = os.environ.get("QSVSPARK_BENCH_SKIP_SCALING", "") == "1"

HEADLINE = [
    "select", "isin_numeric", "grep", "sed", "sort_head", "uniq", "count",
    "pivot", "timeline", "timeline_sum", "timeslice", "join", "stats",
    "changetz", "convert",
]


def _scaling_worker(cores: int, rows: int) -> None:
    """Subprocess entry: run the pipeline at local[cores], print one JSON."""
    from qsvspark.session import get_spark
    from qsvspark.pipeline import NorthStarPipeline, synth_tokens

    wh = tempfile.mkdtemp(prefix=f"bench_ns_{cores}_")
    try:
        spark = get_spark(f"bench-scale-{cores}", parallelism=cores,
                          shuffle_partitions=cores)
        # JIT/codegen warmup on a tiny input — we measure steady-state
        # throughput (what a long-running cluster job sees), not JVM
        # compilation; without this the 4N run pays ~2x warmup noise.
        warm_wh = tempfile.mkdtemp(prefix="bench_warm_")
        NorthStarPipeline(spark, warm_wh, parse_mode="pandas").run(
            synth_tokens(spark, 2000, seed=1), "warmup")
        shutil.rmtree(warm_wh, ignore_errors=True)

        tokens = synth_tokens(spark, rows, seed=42, num_partitions=cores * 2)
        pipe = NorthStarPipeline(spark, wh, parse_mode="pandas")
        t0 = time.time()
        m = pipe.run(tokens, input_fingerprint=f"bench-{rows}-42-{cores}")
        wall = time.time() - t0
        print(json.dumps({
            "cores": cores, "rows": rows, "seconds": round(wall, 3),
            "sequences_per_sec": round(rows / wall, 1),
            "per_sink_counts": m["per_sink_counts"],
        }))
        spark.stop()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _run_scaling(rows: int) -> dict:
    out: dict = {"rows": rows, "runs": {}}
    for cores in (8, 32):
        r = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", str(cores), str(rows)],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            out["runs"][f"local[{cores}]"] = {"error": r.stderr[-500:]}
            continue
        out["runs"][f"local[{cores}]"] = json.loads(line[-1])
    n8 = out["runs"].get("local[8]", {})
    n32 = out["runs"].get("local[32]", {})
    if "sequences_per_sec" in n8 and "sequences_per_sec" in n32:
        out["scaling_efficiency"] = round(
            (n32["sequences_per_sec"] / n8["sequences_per_sec"]) / 4.0, 3
        )
        out["counts_match"] = n8["per_sink_counts"] == n32["per_sink_counts"]
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        _scaling_worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    from qsvspark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("qsvspark-bench", parallelism=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        t0 = time.time()
        # a real action that materializes every row without driver collect
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)

    # pipeline throughput at full parallelism on a fixed synthetic input
    from qsvspark.pipeline import NorthStarPipeline, synth_tokens

    wh = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        tokens = synth_tokens(spark, SCALE_ROWS, seed=42, num_partitions=CPUS * 2)
        pipe = NorthStarPipeline(spark, wh, parse_mode="pandas")
        t0 = time.time()
        pm = pipe.run(tokens, input_fingerprint=f"bench-pipe-{SCALE_ROWS}")
        pipe_wall = round(time.time() - t0, 3)
        pipeline = {
            "rows": SCALE_ROWS,
            "seconds": pipe_wall,
            "sequences_per_sec": round(SCALE_ROWS / pipe_wall, 1),
            "per_sink_counts": pm["per_sink_counts"],
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()

    scaling = None if SKIP_SCALING else _run_scaling(SCALE_ROWS)

    print(json.dumps({
        "metric": "qsvspark headline operator suite + parse-route-aggregate pipeline",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
        "pipeline": pipeline,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
