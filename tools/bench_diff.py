"""Round-over-round bench diff with the SCALE.md measurement regime
baked in — the tool the r7 review reconstructed by hand.

Compares two ``bench_detail.json``-shaped files (``{"value": total,
"sf": ..., "queries": {name: sec}}``) and reports, per query: prior
sec, current sec, ratio. Queries above the flag ratio AND the absolute
floor are listed with the confirm-run protocol, because on this box
contention noise is one-sided (runs are only ever slower than steady
state) — a >1.5x driver-run outlier on an unchanged plan is usually
measurement, not regression, and the regime says: quiet-box rerun
FIRST, record the confirm in docs/SCALE.md, only then touch the plan.

Usage:
    python tools/bench_diff.py PRIOR.json [CURRENT.json] \
        [--flag-ratio 1.5] [--abs-floor 0.2] [--fail-on-flagged]

CURRENT defaults to ./bench_detail.json (the latest local run). Exit
status is 0 unless --fail-on-flagged is given and flags exist.

Quiet-box confirm for a flagged query NAME:

    python - <<'PY'
    import time
    from big_data_processing_with_aws_glue_workshop_spark.session import get_session
    from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES
    from big_data_processing_with_aws_glue_workshop_spark import util
    spark = get_session()
    with util.keep_tracked_caches():
        QUERIES["NAME"](spark, "/root/testdata/sf0.1").count()   # warm
        t0 = time.time()
        QUERIES["NAME"](spark, "/root/testdata/sf0.1").count()   # timed
    print(time.time() - t0)
    PY
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ONE flat-bound definition (r16-ADVICE low): import bench.py's constant so
# the two record adjudicators cannot drift if the bound is retuned. Falls
# back to the documented 1.3 bound only if bench.py is unimportable (r17
# ADVICE: the claim used to be a comment over an unconditional import).
try:
    from bench import _SEGMENT_FLAT_BOUND
except ImportError:
    _SEGMENT_FLAT_BOUND = 1.3


def load_detail(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "queries" not in data or not isinstance(data["queries"], dict):
        raise SystemExit(f"{path}: not a bench_detail file (no 'queries' map)")
    return data


def calib_factor(prior: dict, current: dict) -> float | None:
    """current-box speed relative to prior-box speed, from the fixed
    synthetic calibration workload bench.py times before and after each
    suite run (``calib_pre``/``calib_post``; r9 addition — three
    same-code suite runs spanned 65.3-82.6 s with uniform per-query
    inflation, so raw ratios conflate box state with plan changes).
    Returns None when either file predates the calibration fields."""

    def mean_calib(d: dict) -> float | None:
        vals = [d[k] for k in ("calib_pre", "calib_post") if d.get(k)]
        return sum(vals) / len(vals) if vals else None

    p, c = mean_calib(prior), mean_calib(current)
    return (c / p) if (p and c) else None


def segment_lookup(detail: dict):
    """Position -> box-speed reading from the interleaved segment
    calibrations bench.py records every ~20 queries (r15; the r14 run's
    box drifted 32% INTRA-run, so the run-wide mean mis-normalized
    early-position queries by up to that much). Returns
    ``at(position) -> sec`` using the segment nearest the position in
    THIS file's own suite order, or None when the file predates
    ``calib_segments``."""
    segs = detail.get("calib_segments")
    if not segs:
        return None
    pts = sorted((s["after"], s["sec"]) for s in segs)

    def at(pos: int) -> float:
        return min(pts, key=lambda p: abs(p[0] - pos))[1]

    return at


def diff(
    prior: dict,
    current: dict,
    flag_ratio: float,
    abs_floor: float,
    factor: float | None = None,
) -> dict:
    """factor = calib_factor(...): per-query ratios are divided by it
    (and the abs-floor slowdown deflated by it) so a uniformly slower box
    doesn't flag every query; raw ratios are kept in rows for display.

    When BOTH files carry ``calib_segments``, each query normalizes by
    the segment nearest its own position in each file instead of the
    run-wide mean — intra-run drift (32% in the r14 driver run) stops
    polluting per-query flags. Positions come from each file's OWN query
    order, so a rotation reordering the suite still normalizes each
    query by the box state it actually ran under."""
    p, c = prior["queries"], current["queries"]
    norm = factor or 1.0
    p_at, c_at = segment_lookup(prior), segment_lookup(current)
    p_pos = {name: i for i, name in enumerate(p)}
    c_pos = {name: i for i, name in enumerate(c)}
    use_segments = p_at is not None and c_at is not None
    common = sorted(set(p) & set(c))
    rows = []
    flagged = []
    for name in common:
        ratio = c[name] / p[name] if p[name] > 0 else float("inf")
        rows.append((name, p[name], c[name], ratio))
        if use_segments:
            qnorm = c_at(c_pos[name]) / p_at(p_pos[name])
        else:
            qnorm = norm
        if ratio / qnorm > flag_ratio and (c[name] / qnorm - p[name]) > abs_floor:
            flagged.append(name)
    return {
        "segment_normalized": use_segments,
        "common": common,
        "rows": rows,
        "flagged": flagged,
        "added": sorted(set(c) - set(p)),
        "removed": sorted(set(p) - set(c)),
        "prior_common_total": sum(p[n] for n in common),
        "current_common_total": sum(c[n] for n in common),
        "calib_factor": factor,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("prior", help="prior round's bench_detail.json")
    ap.add_argument("current", nargs="?", default="bench_detail.json")
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument(
        "--abs-floor",
        type=float,
        default=0.2,
        help="ignore ratio outliers whose absolute slowdown is below this "
        "(sub-second queries ratio-flip on pure noise)",
    )
    ap.add_argument("--fail-on-flagged", action="store_true")
    args = ap.parse_args(argv)

    prior, current = load_detail(args.prior), load_detail(args.current)
    factor = calib_factor(prior, current)
    d = diff(prior, current, args.flag_ratio, args.abs_floor, factor)

    # record adjudication (r16): bench.py stamps each run flat/drifting
    # from its own segment spread — surface the label so a drifting run
    # is never silently cited as a record (the r15 close-out discarded
    # its 52%-drift run 1 by hand; this is that regime, mechanical).
    # Files that carry segments but predate the stamp (r15) are
    # adjudicated here with the same arithmetic and bound.
    for label, detail in (("prior", prior), ("current", current)):
        flat, drift = detail.get("segments_flat"), detail.get("segment_drift")
        if flat is None:
            secs = [
                s["sec"] for s in detail.get("calib_segments") or []
                if s.get("sec")
            ]
            if len(secs) >= 2:
                drift = round(max(secs) / min(secs), 4)
                flat = drift <= _SEGMENT_FLAT_BOUND
                print(
                    f"note: {label} run predates the segments_flat stamp — "
                    f"derived from its segments: drift {drift}x, "
                    f"{'flat' if flat else 'DRIFTING'}"
                )
        if flat is False:
            print(
                f"WARNING: {label} run is NOT record-grade — its segment "
                f"calibrations drifted {drift}x (> the "
                f"{_SEGMENT_FLAT_BOUND}x flat bound); "
                "totals below are real data but must not be cited as a "
                "record. Quiet-box rerun first."
            )

    pct = d["prior_common_total"] or 1.0
    print(
        f"common set ({len(d['common'])} queries): "
        f"{d['current_common_total']:.2f}s vs {d['prior_common_total']:.2f}s "
        f"= {d['current_common_total'] / pct:.2f}x"
    )
    if factor is not None:
        seg_note = (
            "per-query flags use NEAREST-SEGMENT normalization"
            if d.get("segment_normalized")
            else "flags are run-mean calibration-normalized"
        )
        print(
            f"box calibration: current box {factor:.2f}x prior "
            f"(ratios below are raw; {seg_note} — "
            f"normalized common-set ratio "
            f"{d['current_common_total'] / pct / factor:.2f}x)"
        )
    else:
        print(
            "box calibration: unavailable (one file predates "
            "calib_pre/calib_post) — flags use raw ratios"
        )
    if d["added"]:
        print(f"added ({len(d['added'])}): {', '.join(d['added'])}")
    if d["removed"]:
        print(f"removed ({len(d['removed'])}): {', '.join(d['removed'])}")

    slowest = sorted(d["rows"], key=lambda r: -r[2])[:10]
    print("\nslowest current queries:")
    for name, ps, cs, ratio in slowest:
        print(f"  {name:40s} {cs:7.2f}s  (prior {ps:6.2f}s, {ratio:4.2f}x)")

    if d["flagged"]:
        print(
            f"\nFLAGGED >{args.flag_ratio}x and >{args.abs_floor}s slower "
            f"({len(d['flagged'])}):"
        )
        for name in d["flagged"]:
            ps = prior["queries"][name]
            cs = current["queries"][name]
            print(f"  {name}: {ps:.2f}s -> {cs:.2f}s ({cs / ps:.2f}x)")
        print(
            "\nRegime (docs/SCALE.md): contention noise on this box is "
            "one-sided, so confirm each flagged query with a quiet-box "
            "warm+timed rerun (recipe in this tool's docstring) and record "
            "the confirm in docs/SCALE.md BEFORE treating it as a plan "
            "regression. git log the query's source: unchanged code + "
            "clean confirm = suite noise, not a regression."
        )
    else:
        print("\nno flagged regressions")
    return 1 if (d["flagged"] and args.fail_on_flagged) else 0


if __name__ == "__main__":
    sys.exit(main())
