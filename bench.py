"""Benchmark runner. Prints ONE bounded-size JSON summary line:
  {"metric": ..., "value": total_sec, "value_steady": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "extensions": {...}, "sf": ...,
   "pipeline": {rows, seconds, sequences_per_sec},
   "scaling": {scaling_efficiency, hw_pair_efficiency,
               job_vs_hw_ceiling, bandwidth_capped, phase, ...},
   "detail_file": "BENCH_DETAIL.json"}
and writes the full detail (per-level runs, bandwidth-probe history,
calibration, per-sink counts) to BENCH_DETAIL.json next to this file.

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The scaling section evidences the north-rule
two-cluster-size criterion in-sandbox: the same pipeline job at N vs 4N
taskset-pinned cores (primary pair 1v4 — faithful executor emulation
below this VM's DRAM-bandwidth ceiling; secondary pair 8v32 — the
bandwidth-capped regime, emitted for transparency) on the SAME
pre-materialized parquet input (fresh JVM per run, JVM/Python startup
excluded, best of $QSVSPARK_BENCH_REPS reps to strip single-box
scheduling noise), reporting sequences/sec at both and
  eff = (throughput_4N / throughput_N) / 4.
Every rep is individually fenced (timeout / crash → recorded in
``scaling.errors``); the bench ALWAYS emits its final JSON line.
Delivery is additionally kill-proof (round 4's driver artifact was
rc=124/parsed:null): the summary line is (re)printed after EVERY
completed section with ``"partial": true``, SIGTERM/SIGINT flush the
current state before exiting, and $QSVSPARK_BENCH_TOTAL_BUDGET
(default 6600 s, 0 = off) is a total-run deadline the scaling section
and its clean-pair hunt respect with margin — so a consumer that takes
the last parseable stdout line always gets the most complete state.

Methodology notes (full analysis in BASELINE.md):
  - the input table is materialized ONCE (untimed) and read by every
    timed run — the north-rule job reads an existing Iceberg table, so
    timing synthetic-data generation would measure the wrong thing;
  - the warehouse + input live on tmpfs when available: a single local
    disk serializes concurrent writers, which measures the disk, not the
    pipeline — on a real cluster the sinks are distributed storage whose
    aggregate bandwidth scales with executors;
  - each measurement is a fresh JVM at steady state (small warmup run
    first) — mirroring long-running executors, not cold starts.
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
SCALE_ROWS = int(os.environ.get("QSVSPARK_BENCH_SCALE_ROWS", "4000000"))
# the scaling input row count is CALIBRATED to the host: a quick
# 4-core probe measures actual throughput, then rows are sized so the
# 1-pinned-core rep takes ~TARGET_LO_SECONDS (round 1: a fixed 4M-row
# 1-core rep took 166 s locally but blew a 1800 s cap on the >10×
# slower driver host). Bigger inputs amortize fixed per-job overhead
# (eff 0.83 at 4M vs 0.76 at 1M locally), so we want the LARGEST input
# the slow rep can safely finish. Override with a fixed row count via
# QSVSPARK_BENCH_SCALING_ROWS.
SCALING_ROWS_FIXED = int(os.environ.get("QSVSPARK_BENCH_SCALING_ROWS", "0"))
# ~600 s at the low level: long enough that per-job fixed overhead
# (JVM scheduling, snapshot commits — ~10 s) is <2% of the measurement
# (a 1.56M-row sizing produced 30 s hi-level reps and a 0.72 "efficiency"
# that was really overhead+noise), short enough for a 4× margin under the
# low level's WORKER_TIMEOUT×4 fence
TARGET_LO_SECONDS = int(os.environ.get("QSVSPARK_BENCH_TARGET_LO_SECONDS", "600"))
N_INPUT_FILES = 64  # _materialize_input writes 64 equal range slices
SKIP_SCALING = os.environ.get("QSVSPARK_BENCH_SKIP_SCALING", "") == "1"
# best-of-3: run-to-run variance on this virtualized box is ±30% on
# identical jobs (host-level noise, BASELINE.md §4.4) — the minimum is
# the steady-state estimate, the mean would measure the neighbors
REPS = int(os.environ.get("QSVSPARK_BENCH_REPS", "3"))
# per-rep timeout at the HIGH core count; low-core reps get it scaled
# by (max_cores / cores). A timed-out or crashed rep is recorded and
# skipped — the bench always emits its final JSON line.
WORKER_TIMEOUT = int(os.environ.get("QSVSPARK_BENCH_WORKER_TIMEOUT", "600"))
# hard wall-clock budget for the whole scaling section; remaining reps
# are skipped (and noted) once it is exhausted. Sized for 3 interleaved
# (hi, lo) pairs at TARGET_LO_SECONDS plus the extra hi reps and the
# informational 8v32 pair.
SCALING_BUDGET = int(os.environ.get("QSVSPARK_BENCH_SCALING_BUDGET", "5400"))
# total-run deadline: the scaling section (and especially its open-ended
# clean-pair hunt) must leave the process time to flush the final
# summary line BEFORE the driver's outer timeout kills it — round 4's
# recorded artifact was rc=124/parsed:null because the hunt slept
# through 14 degraded host phases and the summary never printed. The
# budget is measured from process start; 0 disables it.
_RUN_T0 = time.time()
TOTAL_BUDGET = int(os.environ.get("QSVSPARK_BENCH_TOTAL_BUDGET", "6600"))


def _total_deadline() -> float:
    """Absolute unix time the whole bench run must respect; +inf when
    the total budget is disabled."""
    return _RUN_T0 + TOTAL_BUDGET if TOTAL_BUDGET > 0 else float("inf")

HEADLINE = [
    "select", "isin_numeric", "grep", "sed", "sort_head", "uniq", "count",
    "pivot", "timeline", "timeline_sum", "timeslice", "join", "stats",
    "changetz", "convert",
]

# training-data-pipeline extension ops, timed separately (the headline
# total stays comparable across rounds / to BASELINE.md §4.1)
EXTENSIONS = [
    "dedup_exact", "minhash_pairs", "simhash", "text_quality", "lang_id",
    "similarity_topk", "similarity_ivf", "multimodal_features",
    # r4 token-pipeline ops
    "seq_pack", "contamination", "pii_scrub", "text_repetition",
    # r5: the materialized training-sequence table (full value oracle)
    "pack_sequences",
    # r5 wave 2: line-dup signals, vocabulary head, exact span pairs,
    # SemDeDup-style semantic dedup, pair-graph connected components
    "line_dups", "vocab_topk", "span_pairs", "semdedup", "dedup_groups",
]

# skew stress: salted vs unsalted on a deliberately hot key (50% of rows
# on one source). Row count sized so the aggregate/join dominates noise.
SKIP_SKEW = os.environ.get("QSVSPARK_BENCH_SKIP_SKEW", "") == "1"
SKEW_ROWS = int(os.environ.get("QSVSPARK_BENCH_SKEW_ROWS", "16000000"))

# sf1 decade-of-scale section: pipeline + increment at 10× the standard
# scaling rows, plus a headline-query subset over 10×-replicated
# lineitem/orders (= TPC-H sf1 row counts). One direct decade of evidence
# that per-row rates stay flat (manifest JSON, footer enumeration, and
# IVF sampling caps are all exercised at the larger size).
SKIP_SF1 = os.environ.get("QSVSPARK_BENCH_SKIP_SF1", "") == "1"
SF1_ROWS = int(os.environ.get("QSVSPARK_BENCH_SF1_ROWS", "20000000"))
SF1_QUERIES = ["select", "isin_numeric", "uniq", "count", "pivot", "stats"]
SF1_COPIES = 10

# ~bytes of snappy parquet per synth-token row (avg 264 int32 tokens,
# near-incompressible); the sf1 section holds input + routed ≈ 2 copies
SF1_BYTES_PER_ROW = 1100


def _default_driver_mem() -> str:
    """Size the local-mode driver heap from the box: this one JVM stands
    in for a whole cluster's executors, so the 8g library default (fine
    for tests at parallelism 4) starves 32 concurrent tasks routing tens
    of GB — the first r4 full run OOMed the route write's parquet
    buffers at sf1. A quarter of RAM, capped at 32g, leaves the rest for
    tmpfs working sets and the OS."""
    try:
        with open("/proc/meminfo") as f:
            kb = int(next(ln for ln in f if ln.startswith("MemTotal")).split()[1])
        gb = kb >> 20
    except (OSError, StopIteration, ValueError):
        gb = 16
    return f"{min(32, max(8, gb // 4))}g"


os.environ.setdefault("QSVSPARK_DRIVER_MEM", _default_driver_mem())


def _fast_dir() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _fit_sf1_rows(rows: int) -> tuple[int, str | None]:
    """Largest-that-fits guard: the sf1 working set is ~2 copies of the
    token table on _fast_dir (often tmpfs = RAM). Shrink the row count
    (in 1M steps) until input+routed fits in 60% of the free space, so
    the decade run degrades to largest-that-fits instead of ENOSPC/OOM
    — the 40M default needs ~84 GB free; this box's /dev/shm plus a
    32 GB driver heap cannot hold it, which killed the first r4 run."""
    try:
        st = os.statvfs(_fast_dir())
        free = st.f_bavail * st.f_frsize
    except OSError:
        return rows, None
    budget = int(free * 0.6)
    fitted = min(rows, max(1_000_000, budget // (2 * SF1_BYTES_PER_ROW)))
    fitted = (fitted // 1_000_000) * 1_000_000
    if fitted < rows:
        return fitted, (
            f"sf1 rows reduced {rows} -> {fitted}: working set ~"
            f"{2 * rows * SF1_BYTES_PER_ROW >> 30} GiB vs "
            f"{free >> 30} GiB free on {_fast_dir()}"
        )
    return rows, None


def _materialize_input(spark, rows: int, path: str) -> None:
    from qsvspark.pipeline import synth_tokens

    (
        synth_tokens(spark, rows, seed=42, num_partitions=64)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.writer.version", "v2")
        .parquet(path, compression="snappy")
    )


def _input_files(input_path: str, n_files: int) -> list[str]:
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(input_path, "part-*")))
    return parts[:n_files] if 0 < n_files < len(parts) else parts


def _scaling_worker(cores: int, rows: int, input_path: str, n_files: int) -> None:
    """Subprocess entry: read the first n_files range slices of the
    shared input at local[cores], run the pipeline, print one JSON line."""
    from qsvspark.session import get_spark
    from qsvspark.pipeline import NorthStarPipeline

    base = _fast_dir()
    wh = tempfile.mkdtemp(prefix=f"bench_ns_{cores}_", dir=base)
    try:
        spark = get_spark(f"bench-scale-{cores}", parallelism=cores,
                          shuffle_partitions=cores)
        # JIT/codegen + Python-worker warmup on a tiny slice — we measure
        # steady-state throughput (what a long-running cluster job sees).
        warm_wh = tempfile.mkdtemp(prefix="bench_warm_", dir=base)
        warm = spark.read.parquet(input_path).limit(4000)
        NorthStarPipeline(spark, warm_wh).run(warm, "warmup")
        shutil.rmtree(warm_wh, ignore_errors=True)

        tokens = spark.read.parquet(*_input_files(input_path, n_files))
        pipe = NorthStarPipeline(spark, wh)
        t0 = time.time()
        m = pipe.run(tokens, input_fingerprint=f"bench-{rows}-42-{cores}")
        wall = time.time() - t0
        print(json.dumps({
            "cores": cores, "rows": rows, "seconds": round(wall, 3),
            "sequences_per_sec": round(rows / wall, 1),
            "stages": m["stages"],
            "per_sink_counts": m["per_sink_counts"],
        }))
        spark.stop()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _worker_cmd(cores: int, rows: int, input_path: str, n_files: int) -> list[str]:
    cmd = [sys.executable, __file__, "--scaling-worker", str(cores),
           str(rows), input_path, str(n_files)]
    # Pin the WHOLE process tree (JVM task threads + GC + Python workers)
    # to exactly `cores` CPUs: a real N-core executor container confines
    # all of that to N cores, whereas unpinned local[N] lets Python/GC
    # free-ride on idle host cores — inflating low-N throughput and
    # understating scaling efficiency.
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    return cmd


def _worker_env(cores: int) -> dict:
    # The JVM sizes GC/JIT/netty pools from the MACHINE's 32 CPUs unless
    # told otherwise — ~23 ParallelGC threads inside a 4-core pin churns
    # the pin with context switches (measured: ~10% route-stage work
    # inflation). ActiveProcessorCount makes the JVM size itself for the
    # container, exactly as a cgroup-limited executor would.
    env = dict(os.environ)
    env["QSVSPARK_DRIVER_JAVA_OPTS"] = (
        "-XX:+UseParallelGC -Dio.netty.allocator.maxOrder=12 "
        f"-XX:ActiveProcessorCount={cores}"
    )
    return env


# Primary N vs 4N pair: 1 vs 4 pinned cores. Higher pairs measure this
# VM's DRAM-bandwidth saturation, not the engine: aggregate memcpy
# bandwidth on this box scales 8→32 procs at only ~0.57 efficiency, and
# the pipeline tracks that hardware ceiling (full curve + analysis in
# BASELINE.md §4). On a real cluster each 4N-executor node brings its own
# memory controllers, so the low-N pair is the faithful proxy. The 8v32
# pair is ALSO measured and emitted so the bandwidth-capped regime is
# visible in the artifact itself, not only in BASELINE.md prose.
SCALING_PAIR = tuple(
    int(x) for x in os.environ.get("QSVSPARK_BENCH_PAIR", "1,4").split(",")
)
EXTRA_PAIRS = [
    tuple(int(x) for x in p.split("v"))
    for p in os.environ.get("QSVSPARK_BENCH_EXTRA_PAIRS", "8v32").split(";")
    if p
]


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_BW_SNIPPET = (
    "import numpy, time, sys\n"
    "a = numpy.ones(8 << 20, dtype=numpy.float64)\n"
    "b = numpy.empty_like(a)\n"
    "t0 = time.time(); n = 0\n"
    "while time.time() - t0 < 1.5:\n"
    "    numpy.copyto(b, a); n += 1\n"
    "print(n * a.nbytes * 2 / (time.time() - t0))\n"
)


def _bandwidth_probe(procs: int) -> float | None:
    """Aggregate memcpy GB/s with `procs` concurrent processes pinned to
    cores 0..procs-1 — the same pin the scaling rep at that level uses.
    Emitted alongside each efficiency number so a run that lands in a
    bandwidth-degraded host phase (neighbors saturating the memory
    controller) is visible in the artifact: the route stage is copy-bound
    (BASELINE.md §4.3), so the job's scaling tracks this curve."""
    try:
        ps = []
        for i in range(procs):
            cmd = [sys.executable, "-c", _BW_SNIPPET]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", str(i % procs)] + cmd
            ps.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
        total = 0.0
        for p in ps:
            out, _ = p.communicate(timeout=30)
            total += float(out.strip().splitlines()[-1])
        return round(total / 1e9, 2)
    except Exception:  # noqa: BLE001 — context metric only, never fatal
        return None


# a pair probe below this hardware efficiency marks a bandwidth-degraded
# host phase (neighbors saturating the memory controller): the copy-bound
# route stage cannot scale past the machine's own memcpy curve, so the
# bench WAITS for a cleaner phase before burning the primary-pair budget
# and prefers reps whose bracketing probes were cleanest.
CLEAN_HW_EFF = float(os.environ.get("QSVSPARK_BENCH_CLEAN_HW_EFF", "0.85"))
PHASE_WAIT_S = int(os.environ.get("QSVSPARK_BENCH_PHASE_WAIT", "90"))
PHASE_ATTEMPTS = int(os.environ.get("QSVSPARK_BENCH_PHASE_ATTEMPTS", "4"))


def _pair_probe(p_lo: int, p_hi: int) -> dict | None:
    """One memcpy-bandwidth measurement at both primary-pair levels →
    {lo_gbps, hi_gbps, hw_eff, plausible}.

    plausible=False marks a reading the scheduler ruined rather than the
    memory bus: a 1-proc memcpy that reports < 1 GB/s was CPU-STARVED
    (descheduled by co-tenants — this host measures ~20 GB/s idle), and a
    pair efficiency > 1.15 is physically impossible for memcpy scaling
    (observed: a starved lo probe of 0.07 GB/s yielding 'eff 133').
    Consumers treat implausible probes as degraded-phase evidence, never
    as a clean bracket — otherwise one starved probe mislabels a noisy
    phase as clean and poisons the recorded scaling artifact."""
    bw_lo, bw_hi = _bandwidth_probe(p_lo), _bandwidth_probe(p_hi)
    if not (bw_lo and bw_hi):
        return None
    eff = round((bw_hi / bw_lo) / (p_hi / p_lo), 3)
    return {
        "lo_gbps": bw_lo, "hi_gbps": bw_hi, "hw_eff": eff,
        "plausible": bw_lo >= 1.0 and eff <= 1.15,
    }


def _wait_clean_phase(p_lo: int, p_hi: int, deadline: float) -> list[dict]:
    """Probe the hardware pair efficiency and, while it shows a degraded
    phase, wait and re-probe (bounded attempts + budget share) before the
    primary pair starts. Returns the probe history (first entry = initial
    state, last entry = the phase the pair actually ran in)."""
    history: list[dict] = []
    for attempt in range(PHASE_ATTEMPTS):
        probe = _pair_probe(p_lo, p_hi)
        if probe is None:
            return history
        probe["unix"] = int(time.time())
        history.append(probe)
        if probe["hw_eff"] >= CLEAN_HW_EFF and probe.get("plausible", True):
            break
        # don't spend more than ~1/4 of the scaling budget waiting
        if attempt == PHASE_ATTEMPTS - 1 or time.time() + PHASE_WAIT_S > deadline:
            break
        _log(f"[bench] degraded host phase (hw pair eff {probe['hw_eff']} < "
             f"{CLEAN_HW_EFF}); waiting {PHASE_WAIT_S}s for a cleaner phase "
             f"({attempt + 1}/{PHASE_ATTEMPTS - 1} waits)")
        time.sleep(PHASE_WAIT_S)
    return history


def _one_rep(
    cores: int, rows: int, input_path: str, n_files: int,
    timeout: float, errors: list, tag: str,
) -> dict | None:
    """Run one fenced worker rep; any failure is recorded and returns None.

    The worker runs in its own process group and the WHOLE group is
    killed on timeout — subprocess.run's timeout only kills the direct
    child (taskset), leaving the JVM grandchild alive to eat cores and
    contaminate every later rep. A timed-out worker's partial stdout is
    still parsed: the worker prints its result line BEFORE spark.stop(),
    so a JVM that hangs on shutdown (observed: a 45 s job blowing a
    600 s fence) does not lose an already-finished measurement.
    """
    import signal

    stdout = ""
    try:
        p = subprocess.Popen(
            _worker_cmd(cores, rows, input_path, n_files),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_worker_env(cores), start_new_session=True,
        )
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            try:
                # process group is dead; this reaps and returns whatever
                # the worker had already written (docs: retrying
                # communicate after a timeout loses no output)
                stdout, _ = p.communicate(timeout=10)
            except Exception:  # noqa: BLE001
                stdout = ""
            lines = [l for l in (stdout or "").splitlines() if l.startswith("{")]
            if lines:  # job finished; only shutdown hung
                errors.append(f"{tag} JVM shutdown hung (result salvaged)")
                return json.loads(lines[-1])
            errors.append(f"{tag} timed out after {int(timeout)}s")
            return None
    except Exception as e:  # noqa: BLE001 — bench must always emit
        errors.append(f"{tag}: {e!r}"[:300])
        return None
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    if not lines:
        errors.append(f"{tag} rc={p.returncode}: " + stderr[-300:].replace("\n", " "))
        return None
    return json.loads(lines[-1])


def _run_scaling(input_path: str, total_rows: int) -> dict:
    """Measure pipeline throughput at each core level in the requested
    pairs. Every failure mode (rep timeout, worker crash, budget
    exhaustion) is recorded in ``errors`` and the function ALWAYS returns
    a dict — one bad rep can no longer lose the whole bench artifact.

    Row-count calibration: a 4-core probe on a small file subset measures
    this host's actual throughput, then the scaling input is sized so the
    slowest (1-pinned-core) rep takes ~TARGET_LO_SECONDS — the largest
    input (best overhead amortization) that cannot blow its timeout even
    on a 10×-contended host. Workers read the first K of the input's 64
    equal range-slice files, so every level sees the identical rows.
    """
    pairs = [tuple(SCALING_PAIR)] + [p for p in EXTRA_PAIRS if p != tuple(SCALING_PAIR)]
    # primary pair first, cheap (high-core) level before the expensive
    # low-core level inside each pair, so budget exhaustion costs the
    # secondary pair, not the headline number
    levels: list[int] = []
    for lo, hi in pairs:
        for c in (hi, lo):
            if c not in levels:
                levels.append(c)
    # timeout scale: a c-core run takes ~(baseline/c)× the baseline-core
    # run; key it off the PRIMARY pair's high level so the cheap extra-
    # pair levels don't inflate the slow-level budget
    baseline = max(SCALING_PAIR)
    lo_cores = min(SCALING_PAIR)
    # the section deadline respects BOTH its own budget and the
    # total-run deadline (less a flush margin), so the driver's outer
    # timeout can never catch the bench mid-hunt with nothing printed
    deadline = min(time.time() + SCALING_BUDGET, _total_deadline() - 60)
    rows_per_file = total_rows // N_INPUT_FILES
    out: dict = {"reps": REPS, "runs": {}, "errors": []}

    if SCALING_ROWS_FIXED:
        rows = min(SCALING_ROWS_FIXED, total_rows)
    else:
        cal_files = max(1, (500_000 // rows_per_file) or 1)
        cal_rows = cal_files * rows_per_file
        _log(f"[bench] calibration: local[{baseline}] on {cal_rows} rows")
        cal = _one_rep(baseline, cal_rows, input_path, cal_files,
                       WORKER_TIMEOUT, out["errors"], "calibration")
        if cal:
            tput_hi = cal["sequences_per_sec"]
            # est lo-core throughput ≈ tput_hi / (baseline/lo) / 0.8(eff guess)
            tput_lo_est = tput_hi * lo_cores / (baseline * 0.8)
            rows = int(TARGET_LO_SECONDS * tput_lo_est)
            # FLOOR: a small input lets per-job fixed overhead (~10 s)
            # masquerade as lost scaling (measured 0.72 at 1.56M rows vs
            # 0.83+ at 4M on the same box). Prefer ≥2M rows whenever the
            # lo-level fence can still absorb them at half-capacity —
            # the largest safe input is the best estimator.
            lo_fence = WORKER_TIMEOUT * max(1, baseline // lo_cores)
            safe_floor = min(2_000_000, int(tput_lo_est * 0.5 * lo_fence))
            rows = max(rows, safe_floor)
            out["calibration"] = {
                "probe_rows": cal_rows, "probe_seconds": cal["seconds"],
                "probe_sequences_per_sec": tput_hi,
            }
        else:
            rows = 500_000  # calibration failed: smallest safe input
    n_files = min(N_INPUT_FILES, max(8, rows // rows_per_file))
    rows = n_files * rows_per_file
    out["rows"] = rows
    _log(f"[bench] scaling rows={rows} ({n_files}/{N_INPUT_FILES} input files)")

    # PRIMARY pair: REACTIVE to host phase, then INTERLEAVED (hi, lo)
    # rep pairs so a slow phase cannot land entirely on one level.
    #   1. Before spending the budget, probe the hardware's own memcpy
    #      pair efficiency and WAIT (bounded) while the host is in a
    #      bandwidth-degraded phase — the copy-bound route stage tracks
    #      that ceiling, so measuring during degradation measures the
    #      neighbors, not the engine (round 2 recorded 0.687 with the
    #      hardware itself at 0.674).
    #   2. Bracket every rep with probes; the reported efficiency is the
    #      ratio of per-level MINIMA over the reps whose bracketing
    #      probes were clean (falling back to all reps when no clean
    #      bracket exists), and job_vs_hw_ceiling = job eff / hw eff of
    #      the selected phase is emitted machine-readable.
    p_lo, p_hi = lo_cores, max(SCALING_PAIR)
    probe_hist = _wait_clean_phase(p_lo, p_hi, deadline - 2 * WORKER_TIMEOUT)
    out["probe_history"] = probe_hist
    if probe_hist:
        start = probe_hist[-1]
        out["bandwidth_gbps"] = {
            f"procs_{p_lo}": start["lo_gbps"], f"procs_{p_hi}": start["hi_gbps"],
            "hw_pair_efficiency": start["hw_eff"],
            "probe_plausible": start.get("plausible", True),
        }
        _log(f"[bench] memcpy bandwidth at pair start: {p_lo} proc "
             f"{start['lo_gbps']} GB/s, {p_hi} proc {start['hi_gbps']} GB/s "
             f"(hw pair eff {start['hw_eff']})")
    entries: list[dict] = []  # every primary-level run + bracketing probes
    last_probe = (
        probe_hist[-1]["hw_eff"]
        if probe_hist and probe_hist[-1].get("plausible", True)
        else None
    )

    def _probe_between() -> float | None:
        p = _pair_probe(p_lo, p_hi)
        if p:
            p["unix"] = int(time.time())
            out["probe_history"].append(p)
            # a starved/implausible probe is degraded-phase evidence, not
            # a usable bracket value
            return p["hw_eff"] if p.get("plausible", True) else None
        return None

    ratios = []
    for i in range(REPS):
        remaining = deadline - time.time()
        if remaining < 60:
            if not ratios:
                out["errors"].append(
                    f"scaling budget ({SCALING_BUDGET}s) exhausted before pair rep {i + 1}"
                )
            break
        pair_runs = {}
        before = last_probe
        for cores in (p_hi, p_lo):
            timeout = min(deadline - time.time(),
                          WORKER_TIMEOUT * max(1, baseline // cores))
            if timeout < 30:
                break
            _log(f"[bench] primary pair rep {i + 1}/{REPS}: local[{cores}] "
                 f"(timeout {int(timeout)}s)")
            run = _one_rep(cores, rows, input_path, n_files, timeout,
                           out["errors"], f"local[{cores}] pair-rep {i + 1}")
            if run is None:
                continue
            _log(f"[bench] local[{cores}] pair-rep {i + 1}: {run['seconds']}s")
            pair_runs[cores] = run
        after = _probe_between()
        last_probe = after if after is not None else last_probe
        for cores, run in pair_runs.items():
            entries.append({"cores": cores, "run": run,
                            "hw_before": before, "hw_after": after})
        if p_hi in pair_runs and p_lo in pair_runs:
            r = (pair_runs[p_hi]["sequences_per_sec"]
                 / pair_runs[p_lo]["sequences_per_sec"]) / (p_hi / p_lo)
            ratios.append(round(r, 3))
    # the hi level's noise spread is ~4× the lo level's (short runs catch
    # more one-sided spikes), so its min needs more samples to converge —
    # two extra cheap hi-level reps buy the same estimator precision the
    # lo level already has from the interleave
    for i in range(2):
        remaining = deadline - time.time()
        if remaining < 60:
            break
        timeout = min(remaining, WORKER_TIMEOUT)
        _log(f"[bench] extra local[{p_hi}] rep {i + 1}/2 (timeout {int(timeout)}s)")
        before = last_probe
        run = _one_rep(p_hi, rows, input_path, n_files, timeout,
                       out["errors"], f"local[{p_hi}] extra-rep {i + 1}")
        after = _probe_between()
        last_probe = after if after is not None else last_probe
        if run is None:
            continue
        _log(f"[bench] local[{p_hi}] extra-rep {i + 1}: {run['seconds']}s")
        entries.append({"cores": p_hi, "run": run,
                        "hw_before": before, "hw_after": after})

    def _bracket(e: dict) -> float | None:
        vals = [v for v in (e["hw_before"], e["hw_after"]) if v is not None]
        return min(vals) if vals else None

    def _minima(pool: list[dict]) -> tuple[dict, dict] | None:
        lo = [e for e in pool if e["cores"] == p_lo]
        hi = [e for e in pool if e["cores"] == p_hi]
        if not (lo and hi):
            return None
        key = lambda e: e["run"]["seconds"]  # noqa: E731
        return min(lo, key=key), min(hi, key=key)

    # Clean-pair hunt: if no rep pair has clean bandwidth brackets yet,
    # convert leftover budget into ADDITIONAL (hi, lo) attempts taken
    # only when a fresh probe shows a clean phase — a degraded-phase rep
    # can never become the reported pair, so waiting strictly beats
    # burning budget on one. Capped at a share of what remains so the
    # informational extra levels still run.
    # the hunt additionally keeps a 2×WORKER_TIMEOUT margin to the
    # total-run deadline: its reps are the longest fenced work in the
    # bench, and an outer kill mid-hunt is exactly what lost round 4's
    # driver artifact
    hunt_deadline = min(
        time.time() + 0.5 * max(0.0, deadline - time.time()),
        _total_deadline() - 2 * WORKER_TIMEOUT,
    )
    lo_obs = [e["run"]["seconds"] for e in entries if e["cores"] == p_lo]
    hi_obs = [e["run"]["seconds"] for e in entries if e["cores"] == p_hi]
    pair_cost = 1.3 * (min(lo_obs or [WORKER_TIMEOUT]) + min(hi_obs or [WORKER_TIMEOUT]))
    hunt_round = 0
    while (_minima([e for e in entries if (_bracket(e) or 0) >= CLEAN_HW_EFF]) is None
           and time.time() + pair_cost < hunt_deadline):
        p = _pair_probe(p_lo, p_hi)
        if p is not None:
            p["unix"] = int(time.time())
            out["probe_history"].append(p)
        if p is None or p["hw_eff"] < CLEAN_HW_EFF or not p.get("plausible", True):
            hunt_round += 1
            _log(f"[bench] clean-pair hunt: phase still degraded "
                 f"(hw eff {p['hw_eff'] if p else '?'}); waiting {PHASE_WAIT_S}s "
                 f"(round {hunt_round})")
            time.sleep(min(PHASE_WAIT_S, max(0.0, hunt_deadline - time.time())))
            continue
        before = p["hw_eff"]
        last_probe = before
        hunt_runs: dict[int, dict] = {}
        for cores in (p_hi, p_lo):
            timeout = min(hunt_deadline - time.time(),
                          WORKER_TIMEOUT * max(1, baseline // cores))
            if timeout < 30:
                break
            _log(f"[bench] clean-pair hunt rep: local[{cores}] "
                 f"(timeout {int(timeout)}s)")
            run = _one_rep(cores, rows, input_path, n_files, timeout,
                           out["errors"], f"local[{cores}] hunt-rep")
            if run is None:
                continue
            _log(f"[bench] local[{cores}] hunt-rep: {run['seconds']}s")
            hunt_runs[cores] = run
        after = _probe_between()
        last_probe = after if after is not None else last_probe
        for cores, run in hunt_runs.items():
            entries.append({"cores": cores, "run": run,
                            "hw_before": before, "hw_after": after})
        if p_hi in hunt_runs and p_lo in hunt_runs:
            r = (hunt_runs[p_hi]["sequences_per_sec"]
                 / hunt_runs[p_lo]["sequences_per_sec"]) / (p_hi / p_lo)
            ratios.append(round(r, 3))

    best: dict[int, dict] = {}
    for c in (p_lo, p_hi):
        lvl = [e for e in entries if e["cores"] == c]
        if lvl:
            best[c] = min(lvl, key=lambda e: e["run"]["seconds"])["run"]
    for cores, run in best.items():
        out["runs"][f"local[{cores}]"] = run
    out["pairs"] = {}
    clean = [e for e in entries if (_bracket(e) or 0) >= CLEAN_HW_EFF]
    chosen = _minima(clean) or _minima(entries)
    if chosen:
        e_lo, e_hi = chosen
        eff = round(
            (e_hi["run"]["sequences_per_sec"] / e_lo["run"]["sequences_per_sec"])
            / (p_hi / p_lo), 3,
        )
        hw_effs = [b for b in (_bracket(e_lo), _bracket(e_hi)) if b is not None]
        hw_sel = round(sum(hw_effs) / len(hw_effs), 3) if hw_effs else None
        out["pairs"][f"{p_lo}v{p_hi}"] = {
            "scaling_efficiency": eff,
            "per_rep_ratios": sorted(ratios),
            "counts_match": e_lo["run"]["per_sink_counts"] == e_hi["run"]["per_sink_counts"],
            "phase": "clean" if _minima(clean) else "degraded",
            "hw_pair_efficiency": hw_sel,
            "job_vs_hw_ceiling": (
                round(eff / hw_sel, 3) if hw_sel else None
            ),
            "bandwidth_capped": hw_sel is not None and hw_sel < CLEAN_HW_EFF,
        }

    # EXTRA pairs (informational — the bandwidth-capped regime): simple
    # best-of per level, run after the primary so budget exhaustion
    # never costs the headline number
    extra_levels = [c for c in levels if c not in (p_lo, p_hi)]
    if extra_levels and "bandwidth_gbps" in out:
        for c in extra_levels:
            bw = _bandwidth_probe(c)
            if bw:
                out["bandwidth_gbps"][f"procs_{c}"] = bw
    for cores in extra_levels:
        attempts = []
        for i in range(REPS):
            remaining = deadline - time.time()
            if remaining < 30:
                if not attempts:
                    out["errors"].append(
                        f"scaling budget ({SCALING_BUDGET}s) exhausted before local[{cores}]"
                    )
                break
            timeout = min(remaining, WORKER_TIMEOUT * max(1, baseline // cores))
            _log(f"[bench] scaling local[{cores}] rep {i + 1}/{REPS} "
                 f"(timeout {int(timeout)}s)")
            run = _one_rep(cores, rows, input_path, n_files, timeout,
                           out["errors"], f"local[{cores}] rep {i + 1}")
            if run is None:
                continue
            attempts.append(run)
            _log(f"[bench] local[{cores}] rep {i + 1}: {run['seconds']}s")
            # a long rep IS the steady-state estimate; don't burn the
            # budget re-measuring it
            if run["seconds"] > 0.5 * timeout:
                break
        if attempts:
            out["runs"][f"local[{cores}]"] = min(attempts, key=lambda a: a["seconds"])
    for lo, hi in pairs:
        key = f"{lo}v{hi}"
        if key in out["pairs"]:
            continue
        n_lo = out["runs"].get(f"local[{lo}]", {})
        n_hi = out["runs"].get(f"local[{hi}]", {})
        if "sequences_per_sec" in n_lo and "sequences_per_sec" in n_hi:
            out["pairs"][key] = {
                "scaling_efficiency": round(
                    (n_hi["sequences_per_sec"] / n_lo["sequences_per_sec"]) / (hi / lo), 3
                ),
                "counts_match": n_lo["per_sink_counts"] == n_hi["per_sink_counts"],
            }
    lo, hi = SCALING_PAIR
    primary = out["pairs"].get(f"{lo}v{hi}")
    if primary:
        out["pair"] = (f"{lo} vs {hi} cores (process tree pinned via taskset;"
                       " probe-bracketed interleaved reps, ratio of"
                       " per-level minima over the cleanest-phase reps)")
        for k in ("scaling_efficiency", "counts_match", "phase",
                  "hw_pair_efficiency", "job_vs_hw_ceiling", "bandwidth_capped"):
            out[k] = primary.get(k)
    return out


def _noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _run_skew(spark) -> dict:
    """Salted vs unsalted on a hot-key distribution (50% of rows on one
    source, and for the aggregate also one (sink, source, bucket) group).

    Two measurements, reported honestly:
      agg  — aggregate_stage vs aggregate_stage_salted. Catalyst's
             count_distinct expand shuffles on (group, doc_id) and
             partial aggregation collapses the second exchange, so the
             aggregate is skew-NEUTRAL by plan — salting neither helps
             nor hurts; the section records that plan fact rather than
             manufacturing a win.
      join — a sort-merge enrich join with broadcast disabled (the
             dim-outgrew-broadcast regime at 10^12 rows): the hot key
             lands on one reducer, and salted_join spreads it. This is
             where the north rule's salted-repartition requirement has
             teeth; measured ~3× on this box.
    Identical results are asserted for both pairs (collected — outputs
    are aggregate-sized).
    """
    from pyspark.sql import functions as F
    from qsvspark.pipeline.northstar import (
        aggregate_stage, aggregate_stage_salted, salted_join,
    )

    base = _fast_dir()
    d = tempfile.mkdtemp(prefix="bench_skew_", dir=base)
    out: dict = {"rows": SKEW_ROWS, "hot_fraction": 0.5}
    try:
        df = spark.range(0, SKEW_ROWS, numPartitions=64)
        rid = F.col("id")
        u = F.pmod(F.xxhash64(rid, F.lit(7)), F.lit(1000)) / 1000.0
        hotmask = u < 0.5
        source = F.when(hotmask, F.lit("src-00")).otherwise(
            F.format_string(
                "src-%02d", F.pmod(F.xxhash64(rid, F.lit(8)), F.lit(19)) + 1
            )
        )
        n_tok = F.when(hotmask, F.lit(64)).otherwise(
            F.lit(16) + F.pmod(F.xxhash64(rid, F.lit(9)), F.lit(497))
        ).cast("int")
        sink = F.when(hotmask, F.lit("sink-0")).otherwise(
            F.format_string("sink-%d", F.pmod(F.xxhash64(rid, F.lit(10)), F.lit(4)))
        )
        fact_path = os.path.join(d, "fact")
        df.select(
            F.format_string("doc-%012d", rid).alias("doc_id"),
            n_tok.alias("n_tok"), source.alias("source"), sink.alias("sink"),
        ).write.mode("overwrite").parquet(fact_path)
        dim_path = os.path.join(d, "dim")
        spark.range(0, 20).select(
            F.format_string("src-%02d", F.col("id")).alias("source"),
            F.sha2(F.col("id").cast("string"), 256).alias("dim_payload"),
        ).write.mode("overwrite").parquet(dim_path)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        fact.limit(1000).groupBy("sink").count().collect()  # warm

        # aggregate pair: best of 2 reps each, interleaved
        agg_t = {"unsalted": [], "salted": []}
        for _ in range(2):
            agg_t["unsalted"].append(_noop_time(aggregate_stage(fact)))
            agg_t["salted"].append(_noop_time(aggregate_stage_salted(fact)))
        a = sorted(map(tuple, aggregate_stage(fact).collect()))
        b = sorted(map(tuple, aggregate_stage_salted(fact).collect()))
        out["agg"] = {
            "unsalted_sec": min(agg_t["unsalted"]),
            "salted_sec": min(agg_t["salted"]),
            "speedup": round(min(agg_t["unsalted"]) / min(agg_t["salted"]), 2),
            "results_match": a == b,
            "skew_neutral_by_plan": True,
            "note": ("count_distinct expand shuffles on (group keys, doc_id) "
                     "and partial agg collapses the second exchange — the hot "
                     "group is already spread; salting is a no-op BY PLAN"),
        }

        # join pair: broadcast disabled = the dim-too-big regime
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            def plain():
                return fact.join(dim, "source").groupBy("source").agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum(F.length("dim_payload")).alias("s"),
                )

            def salted():
                return salted_join(
                    fact, dim, "source", salt_buckets=32, salt_from=["doc_id"]
                ).groupBy("source").agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum(F.length("dim_payload")).alias("s"),
                )

            join_t = {"plain": [], "salted": []}
            for _ in range(2):
                join_t["plain"].append(_noop_time(plain()))
                join_t["salted"].append(_noop_time(salted()))
            ja = sorted(map(tuple, plain().collect()))
            jb = sorted(map(tuple, salted().collect()))
            out["join"] = {
                "plain_smj_sec": min(join_t["plain"]),
                "salted_sec": min(join_t["salted"]),
                "speedup": round(min(join_t["plain"]) / min(join_t["salted"]), 2),
                "results_match": ja == jb,
                "dim_rows": 20,
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _run_sf1(spark, queries: dict, sf01_steady: dict) -> dict:
    """One decade of direct scale evidence: the pipeline + an increment at
    SF1_ROWS (10× the standard bench pipeline), and a headline-query
    subset over 10×-replicated lineitem/orders (TPC-H sf1 row counts,
    built deterministically by unioning key-shifted copies of the sf0.1
    parquet). Reports per-row rate ratios vs the same-run sf0.1 steady
    timings — flat constants show as ratios ≈ 1."""
    from pyspark.sql import functions as F
    from qsvspark.pipeline import NorthStarPipeline
    from qsvspark.pipeline.tokens import synth_tokens

    base = _fast_dir()
    d = tempfile.mkdtemp(prefix="bench_sf1_", dir=base)
    rows, fit_note = _fit_sf1_rows(SF1_ROWS)
    out: dict = {"rows_tokens": rows, "table_copies": SF1_COPIES}
    if fit_note:
        out["fit_note"] = fit_note
        _log(f"[bench] {fit_note}")
    try:
        # -- pipeline at 10× ------------------------------------------
        input_path = os.path.join(d, "tokens")
        _materialize_input(spark, rows, input_path)
        wh = os.path.join(d, "wh")
        pipe = NorthStarPipeline(spark, wh)
        tokens = spark.read.parquet(input_path)
        t0 = time.time()
        pipe.run(tokens, input_fingerprint=f"bench-sf1-{rows}")
        wall = round(time.time() - t0, 3)
        out["pipeline"] = {
            "seconds": wall,
            "sequences_per_sec": round(rows / wall, 1),
        }
        inc_rows = rows // 10
        day2 = synth_tokens(spark, inc_rows, id_offset=rows)
        t0 = time.time()
        im = pipe.run_increment(day2, f"bench-sf1-inc-{inc_rows}")
        wall = round(time.time() - t0, 3)
        out["increment"] = {
            "delta_rows": im["delta_rows"],
            "seconds": wall,
            "sequences_per_sec": round(im["delta_rows"] / wall, 1),
        }
        shutil.rmtree(os.path.join(d, "tokens"), ignore_errors=True)

        # -- headline subset over 10× tables --------------------------
        for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            src = spark.read.parquet(os.path.join(SF_DIR, f"{tbl}.parquet"))
            shift = src.agg(F.max(key)).first()[0] + 1
            parts = [
                src.withColumn(key, F.col(key) + F.lit(i * shift))
                for i in range(SF1_COPIES)
            ]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.write.mode("overwrite").parquet(os.path.join(d, f"{tbl}.parquet"))
        q_cold, q_steady, ratios = {}, {}, {}
        for name in SF1_QUERIES:
            df = queries[name](spark, d)
            q_cold[name] = _noop_time(df)
            q_steady[name] = _noop_time(df)
            base_s = sf01_steady.get(name)
            if base_s and base_s > 0:
                ratios[name] = round((q_steady[name] / SF1_COPIES) / base_s, 2)
        out["queries"] = q_cold
        out["queries_steady"] = q_steady
        # per-row rate at sf1 / per-row rate at sf0.1 (steady); ≈1 = flat
        out["per_row_rate_ratio"] = ratios
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _emit_artifacts(
    summary: dict, detail: dict, detail_path: str, max_line: int = 2800
) -> str:
    """Stamp BOTH artifacts with one shared run id and write the detail
    file atomically (tmp + rename), so BENCH_r*.json and
    BENCH_DETAIL.json can never describe different executions (round-3's
    committed detail file was from an earlier run than its summary).
    Returns the bounded summary line to print."""
    run_id = (summary.get("run_id") or detail.get("run_id")
              or f"run-{int(time.time())}-{os.getpid()}")
    summary["run_id"] = run_id
    detail["run_id"] = run_id
    tmp = detail_path + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(detail, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, detail_path)
    except OSError as e:  # noqa: PERF203 — the summary line must still print
        summary.setdefault("errors_count", 0)
        summary["detail_write_error"] = repr(e)[:200]
    # belt-and-braces: never outgrow the driver's tail-capture window.
    # Drop order keeps the round-4 evidence sections (sf1, skew,
    # extensions_steady) over the per-query cold timings, which the
    # detail file always carries.
    line = json.dumps(summary)
    for drop in ("queries", "extensions", "extensions_steady", "skew", "sf1"):
        if len(line) <= max_line:
            break
        summary.pop(drop, None)
        line = json.dumps(summary)
    return line


def _assemble(state: dict) -> tuple[dict, dict]:
    """Build the (summary, detail) artifact pair from whatever sections
    have completed so far. Called after EVERY section (and from the
    signal handler), so a kill at any point leaves the last flushed
    stdout line parseable — round 4's driver artifact was rc=124 /
    parsed:null because the one-shot summary at the end never ran."""
    timings = state.get("timings") or {}
    steady = state.get("steady") or {}
    ext_timings = state.get("ext_timings") or {}
    ext_steady = state.get("ext_steady") or {}
    query_errors = state.get("query_errors") or {}
    pipeline = state.get("pipeline")
    skew = state.get("skew")
    sf1 = state.get("sf1")
    scaling = state.get("scaling")
    total = round(sum(timings.values()), 3)
    total_steady = round(sum(steady.values()), 3) if steady else None

    detail = {
        "metric": "qsvspark headline operator suite + parse-route-aggregate pipeline",
        "value": total,
        "value_steady": total_steady,
        "unit": "sec",
        "queries": timings,
        "queries_steady": steady,
        "extensions": ext_timings,
        "extensions_steady": ext_steady,
        "section_probes": state.get("section_probes") or {},
        "sf": state["sf"],
        "pipeline": pipeline,
        "skew": skew,
        "sf1": sf1,
        "scaling": scaling,
        "run_id": state["run_id"],
    }
    if query_errors:
        detail["errors"] = query_errors

    scaling_summary = None
    if scaling:
        scaling_summary = {
            k: scaling.get(k)
            for k in ("rows", "scaling_efficiency", "counts_match", "phase",
                      "hw_pair_efficiency", "job_vs_hw_ceiling",
                      "bandwidth_capped")
        }
        scaling_summary["pairs"] = {
            k: v.get("scaling_efficiency") for k, v in
            (scaling.get("pairs") or {}).items()
        }
        scaling_summary["rep_errors"] = len(scaling.get("errors") or [])
    pipeline_summary = None
    if pipeline:
        pipeline_summary = {k: pipeline[k]
                            for k in ("rows", "seconds", "sequences_per_sec")
                            if k in pipeline}
        if "increment" in pipeline:
            pipeline_summary["increment_seq_per_sec"] = (
                pipeline["increment"]["sequences_per_sec"]
            )
        if "pack" in pipeline:
            pipeline_summary["pack_rows_per_sec"] = (
                pipeline["pack"]["rows_per_sec"]
            )
        if "sequences" in pipeline:
            pipeline_summary["materialize_tokens_per_sec"] = (
                pipeline["sequences"]["tokens_per_sec"]
            )
    skew_summary = None
    if skew:
        skew_summary = {
            "rows": skew["rows"],
            "agg_salted_speedup": skew.get("agg", {}).get("speedup"),
            "agg_skew_neutral_by_plan": skew.get("agg", {}).get(
                "skew_neutral_by_plan"
            ),
            "join_salted_speedup": skew.get("join", {}).get("speedup"),
            "results_match": (
                skew.get("agg", {}).get("results_match")
                and skew.get("join", {}).get("results_match")
            ),
        }
    sf1_summary = None
    if sf1:
        sf1_summary = {
            "rows_tokens": sf1["rows_tokens"],
            "pipeline_seq_per_sec": sf1.get("pipeline", {}).get(
                "sequences_per_sec"
            ),
            "increment_seq_per_sec": sf1.get("increment", {}).get(
                "sequences_per_sec"
            ),
            "per_row_rate_ratio": sf1.get("per_row_rate_ratio"),
        }
    summary = {
        "metric": detail["metric"],
        "value": total,
        "value_steady": total_steady,
        "unit": "sec",
        "queries": timings,
        "extensions": ext_timings,
        "extensions_steady": ext_steady,
        "section_probes": state.get("section_probes") or {},
        "sf": state["sf"],
        "pipeline": pipeline_summary,
        "skew": skew_summary,
        "sf1": sf1_summary,
        "scaling": scaling_summary,
        "errors_count": len(query_errors),
        "detail_file": "BENCH_DETAIL.json",
        "run_id": state["run_id"],
        "sections_done": list(state.get("sections_done") or []),
    }
    return summary, detail


def _flush_state(state: dict, detail_path: str, final: bool = False) -> str:
    """Emit the current artifacts: write the detail file (atomic) and
    print the bounded summary line to stdout. Non-final flushes carry
    ``"partial": true``; a consumer that takes the LAST parseable JSON
    line therefore always sees the most complete state the run reached."""
    summary, detail = _assemble(state)
    if not final:
        summary["partial"] = True
    line = _emit_artifacts(summary, detail, detail_path)
    print(line, flush=True)
    return line


def _install_signal_flush(state: dict, detail_path: str):
    """SIGTERM/SIGINT → flush whatever sections completed, then exit
    128+sig. The driver kills the bench with `timeout` (SIGTERM first);
    without this trap the in-flight section's results and the summary
    line die with the process."""
    import signal

    def handler(sig, frame):  # noqa: ARG001
        try:
            state.setdefault("query_errors", {})["__signal__"] = (
                f"killed by signal {sig} after "
                f"{round(time.time() - _RUN_T0, 1)}s"
            )
            _flush_state(state, detail_path, final=False)
        finally:
            os._exit(128 + sig)

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, handler)
    return handler


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        _scaling_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                        int(sys.argv[5]))
        return

    from qsvspark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("qsvspark-bench", parallelism=CPUS, shuffle_partitions=CPUS)
    qs = dict(entrymod.queries())
    # registry-retired variants (e.g. timeline_sum, rotated out of the
    # 50-slot driver budget) keep their module-level q_<name> functions —
    # resolve them so the 15-query headline total stays comparable to
    # every earlier round's artifact
    for _section_names in (HEADLINE, EXTENSIONS):
        for _n in _section_names:
            if _n not in qs and hasattr(entrymod, f"q_{_n}"):
                qs[_n] = getattr(entrymod, f"q_{_n}")
    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    ext_timings: dict[str, float] = {}
    ext_steady: dict[str, float] = {}
    query_errors: dict[str, str] = {}
    section_probes: dict[str, float | None] = {}
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    state: dict = {
        "run_id": f"run-{int(time.time())}-{os.getpid()}",
        "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
        "sections_done": [],
        "timings": timings,
        "steady": steady,
        "ext_timings": ext_timings,
        "ext_steady": ext_steady,
        "query_errors": query_errors,
        "section_probes": section_probes,
    }
    _install_signal_flush(state, detail_path)

    def _section_done(name: str) -> None:
        state["sections_done"].append(name)
        _flush_state(state, detail_path)
    # Untimed warmup: first-use JVM costs (codegen JIT, noop-sink init,
    # Arrow Python-worker spawn) land on whichever query runs first —
    # rounds 1–2 charged ~1.4 s of it to `select`. Steady state is what
    # the suite measures (the scaling section already excludes warmup);
    # noted for cross-round comparability in BASELINE.md §4.
    try:
        import pandas as _wpd
        from pyspark.sql.functions import pandas_udf as _wpudf

        # real annotation OBJECTS, not `s: _wpd.Series` hints: this
        # module has `from __future__ import annotations`, which turns
        # hints into strings that pandas_udf's get_type_hints cannot
        # resolve (the alias lives in main()'s locals, not module
        # globals) — the warmup silently failed UNSUPPORTED_SIGNATURE in
        # every round until r5, charging first-use JVM costs to the
        # first queries' cold numbers
        def _warm_fn(s):
            return s * 1.0

        _warm_fn.__annotations__ = {"s": _wpd.Series, "return": _wpd.Series}
        _warm_udf = _wpudf(_warm_fn, "double")

        warm = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        warm = warm.limit(20000).withColumn("__w", _warm_udf(warm["value"]))
        warm.write.format("noop").mode("overwrite").save()
        # warm EVERY Python worker, not just the one task limit() leaves:
        # the first mapInPandas op otherwise pays CPUS × fork+import-pandas
        # (measured: 13 s charged to multimodal_features at 32 threads)
        def _warm_all(it):
            import hashlib  # noqa: F401 — warm the module cache the
            import numpy    # noqa: F401 — extension UDFs import on first use

            for b in it:
                yield b

        spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(
            _warm_all, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception as e:  # noqa: BLE001 — warmup must never fail the bench
        _log(f"[bench] warmup skipped: {e!r}")
    # 1-proc memcpy probes bracketing each timed section: a cold shot
    # that lands in a host-degraded phase (neighbors saturating the
    # memory bus — this box measures ~20 GB/s idle, observed dips to
    # 4 GB/s) is attributable from the artifact alone, not only from
    # BASELINE.md prose (round-3 extension regressions were exactly this
    # ambiguity).
    section_probes["before_headline_gbps"] = _bandwidth_probe(1)
    for name in HEADLINE:
        try:
            df = qs[name](spark, SF_DIR)
            t0 = time.time()
            # a real action that materializes every row without driver collect
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            # steady-state rep: same plan re-executed — separates per-query
            # fixed costs (first file listing, codegen JIT, Arrow worker
            # spin-up) from throughput. Fixed costs are irrelevant at
            # 100 TB where a query runs for minutes; `value` stays the
            # cold single-shot for cross-round comparability.
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            steady[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — one bad query must not kill the artifact
            query_errors[name] = repr(e)[:300]
        _log(f"[bench] headline {name}: {timings.get(name, 'ERROR')} "
             f"(steady {steady.get(name, '-')})")
    section_probes["between_gbps"] = _bandwidth_probe(1)
    _section_done("headline")

    # iterative ops run their driver loop (convergence-checked label
    # propagation) at BUILD time — timing only the returned frame's scan
    # would miss all the real work, so their reps re-run the build
    iterative = {"dedup_groups"}
    for name in EXTENSIONS:
        try:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ext_timings[name] = round(
                time.time() - t0 + (build if name in iterative else 0), 3
            )
            # steady rep, same rationale as the headline: fixed per-query
            # costs are irrelevant at 100 TB; the cold shot stays for
            # cross-round comparability (round-3's extension "regressions"
            # were unbracketed cold shots in a degraded host phase)
            t0 = time.time()
            if name in iterative:
                df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            ext_steady[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            query_errors[name] = repr(e)[:300]
        _log(f"[bench] extension {name}: {ext_timings.get(name, 'ERROR')} "
             f"(steady {ext_steady.get(name, '-')})")
    # minhash_pairs above runs the md5-60 hash family (slow by design —
    # it exists so DuckDB can replicate every value); this is the
    # PRODUCTION family (native xxhash64, same plan shape)
    try:
        from qsvspark.functions import minhash_lsh_pairs

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        fast = minhash_lsh_pairs(docs, hash_fn="xxhash64", max_bucket_size=64)
        t0 = time.time()
        fast.write.format("noop").mode("overwrite").save()
        ext_timings["minhash_pairs_xxhash"] = round(time.time() - t0, 3)
        t0 = time.time()
        fast.write.format("noop").mode("overwrite").save()
        ext_steady["minhash_pairs_xxhash"] = round(time.time() - t0, 3)
    except Exception as e:  # noqa: BLE001
        query_errors["minhash_pairs_xxhash"] = repr(e)[:300]
    _log(f"[bench] extension minhash_pairs_xxhash: "
         f"{ext_timings.get('minhash_pairs_xxhash', 'ERROR')}")
    section_probes["after_extensions_gbps"] = _bandwidth_probe(1)
    _section_done("extensions")

    skew: dict | None = None
    if not SKIP_SKEW:
        try:
            _log(f"[bench] skew section ({SKEW_ROWS} rows, 50% hot)")
            skew = _run_skew(spark)
            state["skew"] = skew
            _log(f"[bench] skew: agg {skew['agg']['speedup']}x, "
                 f"join {skew['join']['speedup']}x salted speedup")
        except Exception as e:  # noqa: BLE001
            query_errors["__skew__"] = repr(e)[:300]
        _section_done("skew")

    # materialize the pipeline inputs ONCE (untimed setup — the north-rule
    # job reads an existing table; generation is not part of the pipeline)
    base = _fast_dir()
    input_dir = tempfile.mkdtemp(prefix="bench_input_", dir=base)
    input_path = os.path.join(input_dir, "tokens")
    wh = tempfile.mkdtemp(prefix="bench_pipe_", dir=base)
    pipeline: dict | None = None
    scaling: dict | None = None
    sf1: dict | None = None
    try:
        _materialize_input(spark, SCALE_ROWS, input_path)

        # pipeline throughput at full parallelism
        from qsvspark.pipeline import NorthStarPipeline

        tokens = spark.read.parquet(input_path)
        pipe = NorthStarPipeline(spark, wh)
        t0 = time.time()
        pm = pipe.run(tokens, input_fingerprint=f"bench-pipe-{SCALE_ROWS}")
        pipe_wall = round(time.time() - t0, 3)
        pipeline = {
            "rows": SCALE_ROWS,
            "seconds": pipe_wall,
            "sequences_per_sec": round(SCALE_ROWS / pipe_wall, 1),
            "per_sink_counts": pm["per_sink_counts"],
        }
        state["pipeline"] = pipeline

        # steady-state increment: route a 10% "day 2" batch and append it
        # onto the committed table — the operating mode where the bulk is
        # never re-read; throughput is per DELTA row
        inc_rows = max(SCALE_ROWS // 10, 1)
        from qsvspark.pipeline.tokens import synth_tokens

        day2 = synth_tokens(spark, inc_rows, id_offset=SCALE_ROWS)
        t0 = time.time()
        im = pipe.run_increment(day2, f"bench-inc-{inc_rows}")
        inc_wall = round(time.time() - t0, 3)
        pipeline["increment"] = {
            "delta_rows": im["delta_rows"],
            "seconds": inc_wall,
            "sequences_per_sec": round(im["delta_rows"] / inc_wall, 1),
            "cumulative_rows": im["rows"],
        }

        # pack the routed corpus into fixed-length training sequences —
        # the north-star deliverable; throughput is per routed row
        t0 = time.time()
        pk = pipe.pack_sinks(seq_len=2048)
        pack_wall = round(time.time() - t0, 3)
        packed_rows = (pk or {}).get("row_count") or 0
        pipeline["pack"] = {
            "rows": packed_rows,
            "seconds": pack_wall,
            "rows_per_sec": round(packed_rows / pack_wall, 1) if pack_wall else None,
        }

        # materialize the physical sequence table from the committed
        # layout (the north-star deliverable: ~SCALE_ROWS×264 tokens
        # flattened through one keyed join + one groupBy(seq_id));
        # throughput is per INPUT token
        t0 = time.time()
        sm = pipe.pack_sinks(seq_len=2048, materialize=True, pad_id=0)
        seq_wall = round(time.time() - t0, 3)
        seq_manifest = (sm or {}).get("sequences") or {}
        n_seq = seq_manifest.get("row_count") or 0
        total_toks = n_seq * 2048  # upper bound incl. pad; exact enough
        pipeline["sequences"] = {
            "rows": n_seq,
            "seconds": seq_wall,
            "tokens_per_sec": round(total_toks / seq_wall, 1) if seq_wall else None,
        }
        _section_done("pipeline")

        if not SKIP_SF1:
            try:
                _log(f"[bench] sf1 section ({SF1_ROWS} pipeline rows, "
                     f"{SF1_COPIES}x tables)")
                sf1 = _run_sf1(spark, qs, steady)
                state["sf1"] = sf1
                _log(f"[bench] sf1 pipeline "
                     f"{sf1['pipeline']['sequences_per_sec']} seq/s, "
                     f"rate ratios {sf1.get('per_row_rate_ratio')}")
            except Exception as e:  # noqa: BLE001
                query_errors["__sf1__"] = repr(e)[:500]
            _section_done("sf1")
        spark.stop()

        if not SKIP_SCALING:
            scaling = _run_scaling(input_path, SCALE_ROWS)
            state["scaling"] = scaling
    except Exception as e:  # noqa: BLE001 — always emit the final JSON line
        query_errors["__pipeline__"] = repr(e)[:500]
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(input_dir, ignore_errors=True)

    # Full detail (per-level runs, probe history, calibration, per-sink
    # counts) goes to a SIDE FILE; the printed line is a bounded summary —
    # round 2's inlined detail grew past the driver's tail-capture window
    # and the artifact recorded parsed:null despite rc=0. The final flush
    # re-emits with partial=false; every earlier section already printed
    # its own line, so the LAST parseable stdout line is always current.
    if not SKIP_SCALING and scaling is not None:
        state["sections_done"].append("scaling")
    _flush_state(state, detail_path, final=True)


if __name__ == "__main__":
    main()
