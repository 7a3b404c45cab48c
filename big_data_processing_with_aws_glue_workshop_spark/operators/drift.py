"""Distribution drift between corpus refreshes: Population Stability
Index over bucket histograms.

The operational question at a 100 TB crawl cadence is not "is the new
wave clean" (the DQ validators answer that row-by-row) but "does the new
wave LOOK like the standing corpus" — a length distribution that
suddenly shifts, a language mix that collapses, a value histogram that
grows a spike, all signal an upstream change worth stopping the pipeline
for. The standard industry statistic is PSI:

    PSI = Σ_buckets (q_b - p_b) * ln(q_b / p_b)

with p = baseline share, q = candidate share per bucket. Conventional
reading (public credit-scoring practice): < 0.10 stable, 0.10-0.25
moderate shift, > 0.25 significant drift.

This composes directly with the incremental machinery: the baseline is
the maintained histogram state (``incremental_agg_refresh`` with
``log2_bucket`` in the group keys — see plans/incremental.py), the
candidate is the increment's histogram, so the drift check costs one
broadcast-small join over bucket counts — no corpus re-read, runnable on
every refresh.

Zero-count buckets are smoothed with ``epsilon`` share (a bucket present
on only one side would otherwise send ln to ±inf); the smoothing is part
of the contract and the test's reference computes the identical formula.

Bucket-granularity caveat (measured, sf0.01 events): PSI needs adequate
counts PER BUCKET or sampling noise reads as drift — at 8 buckets/octave
(~90 buckets, ~22 rows each) a random half-vs-half split of the SAME
population scored 0.23-0.41, above the 0.25 line, pure noise; at 1
bucket/octave the same split scores <= 0.067 (stable) while a genuine
4x value shift scores >= 1.96. Rule of thumb from the public PSI
literature: >= ~100 samples per bucket before the thresholds mean
anything; prefer coarse buckets for drift (and keep the fine-grained
histogram for percentile readout — both derive from the same counts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def psi_drift(
    baseline: DataFrame,
    candidate: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str = "bucket",
    count_col: str = "n",
    epsilon: float = 1e-6,
) -> DataFrame:
    """Per-key PSI between two bucket histograms (rows: keys + bucket +
    count). Returns ``keys + psi + n_buckets`` — one row per key present
    in EITHER histogram; a key entirely missing from one side yields its
    maximal-drift PSI rather than being dropped (full outer joins all
    the way down)."""
    keys = list(key_cols)

    def shares(df, share_name):
        tot = df.groupBy(*keys).agg(F.sum(count_col).alias("__tot"))
        return (
            df.join(tot, keys)
            .select(
                *keys,
                F.col(bucket_col),
                (F.col(count_col) / F.col("__tot")).alias(share_name),
            )
        )

    p = shares(baseline, "p")
    q = shares(candidate, "q")
    joined = p.join(q, keys + [bucket_col], "full_outer").select(
        *keys,
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
    )
    pe = F.greatest("p", F.lit(epsilon))
    qe = F.greatest("q", F.lit(epsilon))
    return (
        joined.withColumn("__term", (qe - pe) * F.log(qe / pe))
        .groupBy(*keys)
        .agg(
            F.sum("__term").alias("psi"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def _psi_from_counts(p_counts: dict, q_counts: dict, epsilon: float) -> float:
    """Driver-side twin of ``psi_drift``'s per-key formula over two
    bucket->count dicts — IDENTICAL shares/epsilon/ln algebra (pinned by
    tests/test_drift.py interop), for the tiny maintained-state path
    where a Spark job per refresh would be overhead."""
    import math

    p_tot = sum(p_counts.values()) or 1
    q_tot = sum(q_counts.values()) or 1
    psi = 0.0
    for b in set(p_counts) | set(q_counts):
        pe = max(p_counts.get(b, 0) / p_tot, epsilon)
        qe = max(q_counts.get(b, 0) / q_tot, epsilon)
        psi += (qe - pe) * math.log(qe / pe)
    return psi


def update_drift_state(
    df: DataFrame,
    state_path: str,
    value_col: str,
    key_col: str | None = None,
    per_octave: int = 1,
    epsilon: float = 1e-6,
    batch_id: int | None = None,
) -> dict:
    """The refresh-CLI drift gate: maintain a log2-bucket histogram of
    ``value_col`` at ``state_path`` (tiny JSON, atomic rename) and return
    the per-key PSI of ``df``'s histogram against the state BEFORE this
    increment is merged in.

    This is the composition the module docstring describes, packaged for
    ``dedup-refresh`` / ``neardup-refresh``: the baseline is the standing
    histogram (bytes — one int per (key, bucket), never corpus text), the
    candidate is the increment, so the drift check rides every refresh
    for one groupBy over the increment plus a driver-side merge. Buckets
    default to 1/octave per the granularity caveat above (coarse for
    drift; keep fine-grained histograms for percentiles). The state pins
    {value_col, key_col, per_octave} and refuses a mismatched reconfig —
    histograms across calibrations are not comparable. Advisory-only
    state: it sits OUTSIDE the corpus pointer flip, so a crash between
    the flip and this write under-counts one increment's histogram —
    acceptable for a drift signal, never for corpus contents.

    ``batch_id`` (optional) makes the update IDEMPOTENT per increment:
    the state records the last batch it histogrammed, and a call for an
    already-recorded batch returns ``{"already_recorded": True}``
    without touching the state or running a job. This is what lets the
    refresh CLIs histogram on heal-only reruns — recovering the
    increment a crash between the pointer flip and this write would
    otherwise lose — while remaining double-count-proof if the drift
    write DID land before the crash (r9 review: an n>0 gate alone must
    choose between losing that recovery and risking the double count).

    Returns ``{"first_refresh", "psi": {key: psi}, "n_rows"}``.
    """
    import json
    import os

    from ..plans.incremental import log2_bucket
    from ..util import atomic_write_json

    config = {"value_col": value_col, "key_col": key_col, "per_octave": per_octave}
    standing: dict = {}
    stored_batch = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            data = json.load(f)
        stored = {k: data[k] for k in config}
        if stored != config:
            raise ValueError(
                f"drift state {state_path!r} was built with {stored}, "
                f"called with {config} — histograms across calibrations "
                "are not comparable; match the stored config or remove "
                "the state file"
            )
        stored_batch = data.get("last_batch_id")
        if batch_id is not None and stored_batch == batch_id:
            return {
                "first_refresh": False,
                "psi": {},
                "n_rows": 0,
                "already_recorded": True,
            }
        standing = {(k, b): n for k, b, n in data["hist"]}

    key = F.col(key_col) if key_col else F.lit("all")
    rows = (
        df.select(
            key.cast("string").alias("k"),
            log2_bucket(F.col(value_col), per_octave=per_octave).alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    inc: dict = {}
    for r in rows:
        inc[(r["k"], r["bucket"])] = r["n"]

    psi: dict = {}
    if standing:
        for kk in {k for k, _ in standing} | {k for k, _ in inc}:
            psi[kk] = _psi_from_counts(
                {b: n for (k, b), n in standing.items() if k == kk},
                {b: n for (k, b), n in inc.items() if k == kk},
                epsilon,
            )

    merged = dict(standing)
    for kb, n in inc.items():
        merged[kb] = merged.get(kb, 0) + n
    out_state = {
        **config,
        "hist": sorted([k, b, n] for (k, b), n in merged.items()),
    }
    # a batch-less call must PRESERVE the stored marker, not erase it —
    # dropping it would re-arm double-counting for the next keyed call
    # (r9 review)
    marker = batch_id if batch_id is not None else stored_batch
    if marker is not None:
        out_state["last_batch_id"] = marker
    atomic_write_json(state_path, out_state)
    return {
        "first_refresh": not standing,
        "psi": psi,
        "n_rows": sum(inc.values()),
    }


def corpus_drift_report(
    spark,
    target_dir: str,
    text_col: str,
    drift_key: str | None = None,
    delta_subdir: str = "accepted",
) -> dict | None:
    """The corpus-refresh drift protocol, shared by BOTH ingestion
    tempos (the refresh CLIs' ``--drift`` gate and the streaming corpus
    sinks' ``drift=True``) so the protocol can never diverge between
    copies again (r9 review: the two hand-rolled twins already
    differed on the missing-delta guard).

    PSI of the just-accepted delta's doc-length histogram against the
    maintained standing distribution: re-reads ONLY the pointer's
    CURRENT accepted delta (O(increment), never the corpus),
    batch-id-keyed so a rerun/replay after the pointer flip is a no-op
    rather than a double count. Returns the report, or None when there
    is nothing to record: no pointer yet, no accepted delta dir for the
    current batch, an empty delta (PSI against an empty side reads as
    spurious max drift), or an already-recorded batch.

    ``delta_subdir`` names the target family's delta layout: the doc-
    and near-dup refreshes publish survivors under ``accepted/``, the
    passage rewrite under ``docs/`` (its rows are rewritten, not
    dropped — the length histogram there measures the POST-excision
    text, still the incoming-shift signal the gate wants)."""
    import os

    from ..streaming.sinks import read_pointer

    pointer = read_pointer(target_dir)
    if pointer is None:
        return None
    path = os.path.join(target_dir, f"{delta_subdir}/delta_{pointer['batch_id']}")
    if not os.path.exists(path):
        return None
    delta = spark.read.parquet(path)
    if delta.limit(1).count() == 0:
        return None
    rep = update_drift_state(
        delta.withColumn("__len", F.length(text_col)),
        os.path.join(target_dir, "drift_hist.json"),
        "__len",
        key_col=drift_key,
        batch_id=pointer["batch_id"],
    )
    return None if rep.get("already_recorded") else rep
