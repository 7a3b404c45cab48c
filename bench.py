#!/usr/bin/env python
"""Benchmark harness: run EVERY registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output shape (round-7 fix — the r6 single-line output outgrew the
driver's tail-capture buffer and the round's official total was lost):
per-query timings stream to stdout as they complete, one short JSON line
each ({"bench_query": name, "sec": t}), and the FINAL stdout line is a
SHORT summary the driver's tail capture always holds intact:

    {"metric": "headline_queries_total", "value": total, "unit": "sec",
     "sf": sf, "n_queries": N}

The full per-query map is additionally written to bench_detail.json next
to this script.

Each query is executed to completion (count of the result) so the full
plan — scan, shuffle, agg — runs; results are not collected to the driver.

Measurement regime: WARM, best-of-two, per query. Each query gets one
untimed warm run (codegen compilation, parquet footer caching, and
materialization of the query's own plan-level persists), then two timed
runs of which the MINIMUM is reported — steady-state throughput, the
number that scales to a long-lived cluster; min is the right estimator
because the local box's contention noise is one-sided (runs are sometimes
slower than the plan's steady state, never faster). Caches are released
BEFORE each query's warm run (previous query's entries must not inflate
this one's GC) and never between the warm and timed runs — the r4 bench
evicted warm caches at the start of the timed run and over-reported
cache-reliant queries by up to 3.9×. Queries whose contract releases their
own stage pins on exit (training_pipeline_summary) intentionally pay their
full pipeline cost in each timed run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from big_data_processing_with_aws_glue_workshop_spark.util import (
    keep_tracked_caches,
    release_tracked_caches,
)

# The bench covers the FULL registered surface (scored window + tail, in
# registry order) so no registered query can regress invisibly — the r6
# verdict flagged 33 registered-but-never-benched queries; deriving the
# list from the registry keeps coverage complete across every future
# rotation with no drift.
HEADLINE = list(QUERIES)


def _box_calibration(spark) -> float:
    """Best-of-two seconds for a FIXED synthetic workload — a box-state
    thermometer, not a query benchmark.

    Motivation (r9, docs/SCALE.md "r9 full-surface bench"): three
    same-code full-suite runs landed at 65.3 s / 73.5 s / 82.6 s with
    UNIFORM inflation across all 100 queries — the shared box's ambient
    speed drifts by >1.25x between runs, and every such drift has cost a
    worktree-bisect investigation to rule out a plan regression (r5, r6,
    r8, r9 all record one). Measuring a constant workload inside the same
    session turns "is the box slow or did the code regress?" into
    arithmetic: tools/bench_diff.py divides per-query ratios by the
    calibration ratio when both detail files carry one.

    The workload is deterministic and cache-free: 100M synthetic rows
    through whole-stage-codegen arithmetic into a 1M-group hash aggregate
    and a 32-partition shuffle — the same CPU + shuffle machinery the
    suite exercises, with zero I/O so parquet cache state cannot leak in.
    Sized to ~1 s on this box quiet: large enough that the one-sided
    contention noise the regime documents shows up in it exactly as it
    does in the suite, small enough that two measurements add ~5 s.
    """
    from pyspark.sql import functions as F

    def run() -> None:
        (
            spark.range(0, 100_000_000, 1, 32)
            .select((F.col("id") * 2654435761 % 1048576).alias("k"))
            .groupBy("k")
            .agg(F.sum("k").alias("s"), F.count("*").alias("n"))
            .count()
        )

    run()  # warm: codegen compile for this one plan
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _micro_calibration(spark, warm: bool = False) -> float:
    """Quarter-size thermometer (25M rows, ~0.25 s quiet) interleaved
    every ~20 queries DURING the suite (r15, r14 verdict #4a): the r14
    driver run's box speed drifted 32% BETWEEN the pre and post probes,
    so a single pre/post average normalizes the total honestly but makes
    per-query cross-round diffs mostly noise — 3 of its 4 flags read
    clean on a quiet box. Per-segment readings let tools/bench_diff.py
    normalize each query by the box state NEAREST ITS POSITION instead
    of a run-wide mean. Same plan shape as _box_calibration (codegen
    arithmetic -> 1M-group hash agg -> 32-partition shuffle), distinct
    row count so it compiles once on its own; ~6 segments x 2 runs add
    ~3-6 s to a ~70 s suite."""
    from pyspark.sql import functions as F

    def run() -> None:
        (
            spark.range(0, 25_000_000, 1, 32)
            .select((F.col("id") * 2654435761 % 1048576).alias("k"))
            .groupBy("k")
            .agg(F.sum("k").alias("s"), F.count("*").alias("n"))
            .count()
        )

    if warm:
        run()  # first call only: codegen compile for this plan
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


# interleave a micro-calibration after every N timed queries
_CALIB_SEGMENT_EVERY = 20

# record-adjudication bound (r16, r15 verdict #3): a run whose box speed
# drifted more than this between its fastest and slowest segment is not
# comparable as a record — the r15 close-out's run 1 (90.15 s, segments
# 2.14 -> 1.41 = 52% drift) was correctly discarded by HAND-RUN quiet-box
# confirms; this makes that regime mechanical. 1.3 sits above the flat
# driver-run band actually observed (1.12-1.36 read max/min 1.21) and
# well below the drifting run's 1.52.
_SEGMENT_FLAT_BOUND = 1.3


def segments_verdict(calib_segments, bound: float = _SEGMENT_FLAT_BOUND) -> dict:
    """Mechanical record adjudication from the interleaved segment
    calibrations: ``flat`` is True when max/min segment <= bound, False
    when the box drifted past it (the run is real data but NOT
    record-grade — rerun on a quiet box before citing it as a record),
    and None when the run carries fewer than 2 segments (pre-r15 files:
    nothing to adjudicate with)."""
    secs = [s["sec"] for s in (calib_segments or []) if s.get("sec")]
    if len(secs) < 2:
        return {"flat": None, "max_over_min": None, "bound": bound}
    ratio = max(secs) / min(secs)
    return {"flat": ratio <= bound, "max_over_min": round(ratio, 4), "bound": bound}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_session(app_name="bench")

    names = [n for n in HEADLINE if n in QUERIES]

    # Suite-level warm-up BEFORE the first timed entry: per-query warm runs
    # absorb each query's own codegen/footer costs, but JVM-wide ramp (JIT
    # background compilation, GC sizing, shuffle service init) still lands
    # on whichever queries run first — the r5 driver bench measured the
    # first-position query at 3.6x its quiet-box time while a quiet-box
    # rerun showed no plan regression (docs/SCALE.md r6 confirm-run). The
    # ramp is also PATH-specific: window exec and the Arrow/Python runner
    # are compiled on first use, so a scan+agg warm-up alone leaves the
    # first window query ~2-3x over steady state (measured: the r6
    # close-out bench timed latest_order_per_customer at 1.41s in early
    # suite position vs 0.33s re-measured late-session). One throwaway
    # query per major execution path takes those hits instead.
    # r14: one pass was not enough — the first SCORED slot still read
    # 2.01x normalized in the r13 driver bench (asof at position 0; the
    # r12 first slot showed 1.36x), because HotSpot's background C2
    # compilation keeps running for several seconds after first use and
    # the first query's timed runs overlap it. The preamble now executes
    # the path-covering trio THREE times (plus a join-path query): the
    # repeat executions are what promotes the hot loops to C2 before any
    # timed run, and the whole preamble is FIXED (independent of which
    # query the rotation put first), so cross-round per-query diffs stop
    # being polluted at the window boundary. Measured collapse in
    # docs/SCALE.md (r14 first-slot preamble note).
    # r15: + one broadcast-anti-join execution (verdict #4b) — the r14
    # first slot (customers_without_orders, a broadcast anti join) read a
    # CONSISTENT ~1.3x normalized in both full-suite runs because the
    # quartet covered no anti-join shape; the list stays FIXED regardless
    # of rotation order, so the preamble is rotation-independent.
    _WARMUP = [
        "pricing_summary",  # scan + partial/final hash agg codegen
        "latest_order_per_customer",  # shuffle + WindowExec path
        "media_pixel_stats",  # Arrow batch + Python-runner startup
        "asof_last_click_before_error",  # sort-merge/as-of join path
        "customers_without_orders",  # broadcast anti-join path
    ]
    _JIT_RAMP_ROUNDS = 3
    for _ in range(_JIT_RAMP_ROUNDS):
        for w in _WARMUP:
            if w in QUERIES:
                QUERIES[w](spark, sf_dir).count()

    # box-state thermometer BEFORE the suite (and again after: the state
    # can drift DURING a ~10-minute run) — see _box_calibration
    calib_pre = _box_calibration(spark)
    print(json.dumps({"bench_calibration": "pre", "sec": calib_pre}), flush=True)

    # segment thermometer at position 0 (warm compiles its plan), then
    # after every _CALIB_SEGMENT_EVERY queries, then after the last —
    # bench_diff normalizes each query by its nearest segment
    calib_segments: list[dict] = []

    def _segment(after: int, warm: bool = False) -> None:
        # same cross-query hygiene the timed loop applies (r15 review
        # finding): without it each segment is measured with the
        # just-finished query's cache entries resident, so the reading
        # absorbs query-dependent GC pressure (the documented tfidf
        # 0.9s-vs-4.0s effect) and per-query normalization would UN-flag
        # real regressions behind a cache-inflated segment
        release_tracked_caches()
        spark.catalog.clearCache()
        sec = _micro_calibration(spark, warm=warm)
        calib_segments.append({"after": after, "sec": sec})
        print(
            json.dumps({"bench_calibration_segment": after, "sec": sec}),
            flush=True,
        )

    _segment(0, warm=True)

    timings: dict[str, float] = {}
    for name in names:
        # cross-query hygiene BEFORE the warm run: the previous query's
        # cache entries must not inflate this one's GC (measured: tfidf
        # 0.9s isolated vs 4.0s late in the suite without this), but the
        # warm run's own entries must survive into the timed run
        release_tracked_caches()
        spark.catalog.clearCache()
        with keep_tracked_caches():
            # untimed warm run: codegen compilation + parquet footer
            # caching are one-time JVM costs, not per-query throughput
            QUERIES[name](spark, sf_dir).count()
            # best of two timed runs: this box shows one-sided contention
            # noise (a run is sometimes 1.3-2x SLOWER, never faster, than
            # the plan's steady state — measured in docs/SCALE.md), and
            # min() is the standard estimator under one-sided noise
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        # stream each timing immediately: the per-query data survives in
        # the driver's log even if a later query hangs or the tail buffer
        # truncates, and the final summary line stays short
        print(json.dumps({"bench_query": name, "sec": timings[name]}), flush=True)
        if len(timings) % _CALIB_SEGMENT_EVERY == 0 and len(timings) < len(names):
            _segment(len(timings))

    _segment(len(timings))
    calib_post = _box_calibration(spark)
    print(json.dumps({"bench_calibration": "post", "sec": calib_post}), flush=True)

    total = round(sum(timings.values()), 4)
    verdict = segments_verdict(calib_segments)
    if verdict["flat"] is False:
        # loud, mechanical, and recorded in both outputs: the run is
        # valid data but NOT record-grade — do not cite it as a record
        print(
            json.dumps(
                {
                    "bench_warning": "segments_drifting",
                    "max_over_min": verdict["max_over_min"],
                    "bound": verdict["bound"],
                    "note": "box speed drifted past the record bound "
                    "during this run; rerun on a quiet box before "
                    "citing totals as a record",
                }
            ),
            flush=True,
        )
    # bench_detail.json is the HEADLINE (sf0.1) record that bench_diff and
    # the round notes key on — a smoke run at another SF must not clobber
    # it (it did once, r9: an sf0.001 verify run overwrote the quiet-box
    # sf0.1 detail and it had to be rebuilt from the streamed log lines)
    detail_name = (
        "bench_detail.json" if abs(sf - 0.1) < 1e-9 else f"bench_detail_sf{sf}.json"
    )
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calib_pre": calib_pre,
                "calib_post": calib_post,
                "calib_segments": calib_segments,
                "segments_flat": verdict["flat"],
                "segment_drift": verdict["max_over_min"],
            },
            f,
            indent=1,
        )
    # the LAST stdout line is deliberately short (no per-query map): the
    # r6 driver lost the whole bench to tail truncation of one giant line
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "calib_pre": calib_pre,
                "calib_post": calib_post,
                "segments_flat": verdict["flat"],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
