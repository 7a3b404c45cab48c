"""Join-key skew: measure it, then join through it.

At 100 TB the single most common cluster-killer is one hot key: a
shuffle join hashes every row of key k to ONE reducer, so a key holding
1% of a 100 TB fact is a 1 TB partition — hours behind the p50 task.
AQE's skew-join split (enabled in this repo's session defaults) handles
much of this for sort-merge joins by splitting oversized partitions,
but it cannot help when the hot side must ALSO be joined per-row with a
large build side (split partitions still replay the same build rows),
in stream-static joins where AQE is unavailable, or when you want the
mitigation pinned in the plan rather than discovered at runtime. The
classic manual fix is SPLIT + SALT, implemented here generically:

- ``skew_profile``: per-key mass for the top-N keys plus summary
  metrics (max key share, top-N share, a suggested salt factor =
  ceil(max_key_rows / rows_per_healthy_partition)). One groupBy — the
  diagnostic IS a shuffle, run it on a sample or reuse it as the
  heavy-key detector it feeds.
- ``skew_resilient_join``: equality join that splits the LEFT (fact)
  side into heavy-key and light-key subsets via a broadcast heavy-key
  list, joins the light part normally (AQE/broadcast applies as
  usual), and joins the heavy part SALTED: each heavy left row gets a
  deterministic salt in [0, n_salts), the right side's heavy-key rows
  are replicated once per salt value, and the join key becomes
  (key, salt) — the hot key's rows now land on n_salts reducers
  instead of one. The union of both parts is row-identical to the
  plain join (pinned by tests/test_skew.py for inner and left joins,
  including duplicate right-side keys).

Salting replicates only ``|right heavy rows| x n_salts`` build rows —
heavy keys are by definition few, so the replication is bounded; the
light path pays nothing. Salt is ``pmod(xxhash64(whole left row key +
a disambiguator), n_salts)`` — deterministic, no rand(), stable under
repartitioning.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
    rows_per_partition: int = 5_000_000,
) -> dict:
    """Key-mass diagnostic: returns {"total_rows", "n_keys",
    "max_key_share", "top_share", "suggested_salts", "top_keys":
    [(key values..., n), ...]}. ``suggested_salts`` sizes the salt
    factor so the hottest key spreads to ~``rows_per_partition``-row
    tasks (1 means: don't bother salting)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    agg = counts.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    ).first()
    top = counts.orderBy(F.desc("n"), *key_cols).limit(top_n).collect()
    total = agg["total"] or 0
    return {
        "total_rows": total,
        "n_keys": agg["n_keys"],
        "max_key_share": (agg["max_n"] / total) if total else 0.0,
        "top_share": (sum(r["n"] for r in top) / total) if total else 0.0,
        "suggested_salts": max(1, math.ceil((agg["max_n"] or 0) / rows_per_partition)),
        "top_keys": [tuple(r)[:-1] + (r["n"],) for r in top],
    }


def skew_resilient_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    heavy_keys: DataFrame | None = None,
    heavy_threshold_rows: int | None = None,
) -> DataFrame:
    """Equality join with heavy-key split + salt (see module docstring).

    ``heavy_keys``: a DataFrame holding just the key columns of the
    keys to treat as hot (broadcast; keep it small — that is the point).
    If omitted, keys with more than ``heavy_threshold_rows`` left rows
    are detected with one extra groupBy (default threshold: left rows
    / 200 — a key holding >0.5% of the fact is hot).

    Supports ``inner``, ``left``, ``left_semi`` and ``left_anti`` joins.
    Output columns = plain ``left.join(right, on, how)``; row multiset
    is identical. The existence joins (semi/anti — the
    referential-integrity shapes of operators/joins.py) hit the same
    single-reducer wall on a hot key as inner joins do; their salted
    path replicates only the DISTINCT heavy right keys per salt
    (existence depends on the key alone), so (key, salt) exists iff
    the key exists and per-salt lookups stay equivalent.
    """
    on = list(on)
    if not on:
        raise ValueError("skew_resilient_join requires at least one join key")
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            "skew_resilient_join supports inner/left/left_semi/left_anti, "
            f"got {how!r}"
        )
    if heavy_keys is None:
        if heavy_threshold_rows is None:
            heavy_threshold_rows = max(1, left.count() // 200)
        heavy_keys = (
            left.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > heavy_threshold_rows)
            .select(*on)
        )
    heavy_keys = heavy_keys.select(*on)

    left_heavy = left.join(F.broadcast(heavy_keys), on, "left_semi")
    left_light = left.join(F.broadcast(heavy_keys), on, "left_anti")
    right_heavy = right.join(F.broadcast(heavy_keys), on, "left_semi")
    if how in ("left_semi", "left_anti"):
        # existence joins care only whether the key is present: collapse
        # the heavy build side to distinct keys before replication
        right_heavy = right_heavy.select(*on).distinct()

    light = left_light.join(right, on, how)

    # deterministic left-row salt: hash every left column so equal key
    # rows still spread (row content varies); right heavy rows replicate
    # once per salt value
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left_heavy.columns]), F.lit(n_salts))
    lh = left_heavy.withColumn("__salt", salt)
    rh = right_heavy.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    heavy = lh.join(rh, on + ["__salt"], how).drop("__salt")

    return light.unionByName(heavy)


def plan_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    broadcast_threshold_rows: int = 1_000_000,
    rows_per_partition: int = 5_000_000,
    left_cms: DataFrame | None = None,
    right_cms: DataFrame | None = None,
    right_rows_upper_bound: int | None = None,
) -> dict:
    """Measure, then pick the join strategy — the decision procedure the
    module docstring's three mitigations feed. Returns a decision record:

        {"strategy": "broadcast" | "salted" | "shuffle",
         "right_rows": int, "left_rows": int | None,
         "left_max_key_rows": int | None, "left_n_keys": int | None,
         "n_salts": int, "est_output_rows": int | None,
         "output_amplified": bool | None, "reason": str}

    Probe ladder, cheapest exit first — every probe is a bounded job:

    0. ``right_rows_upper_bound`` (optional, caller-supplied, zero
       cost): a bound already <= the broadcast threshold decides
       broadcast without evaluating the right side — the true count is
       only smaller (``probe: "bound"``). A bound above the threshold
       proves nothing and falls through.
    1. ``right.count()`` (parquet sources answer from footer metadata;
       no row scan). Small build side => **broadcast**: the join moves
       only the dim, no fact shuffle at all, and a hot fact key is
       harmless because fact rows never co-locate by key.
    2. Otherwise ONE groupBy over the left key columns (max key mass,
       key count, total). Hottest key above ``rows_per_partition`` =>
       **salted** via :func:`skew_resilient_join`, with the salt factor
       sized so the hot key spreads to ~healthy-partition tasks.
       AQE's skew split covers much of this at runtime; pinning it in
       the plan is for the stream-static and replayed-build cases the
       module docstring names.
    3. Else => **shuffle**: both sides are big and no key dominates —
       the sort-merge exchange IS the right plan; AQE handles residual
       imbalance.

    If maintained CMS tables for BOTH sides are supplied (the bounded
    depth*width frequency sketches ``incremental_agg_refresh`` keeps),
    probe 2's fact shuffle is REPLACED by driver-cheap sketch reads
    (``probe: "cms"`` in the decision): each side's row total is any
    sketch row's bucket sum (exact — every key is counted once per
    row), and the hottest key's mass is bounded above by
    min-over-rows(max bucket in row) — for any key, every row's bucket
    holding it is >= its true count, so the hottest key cannot exceed
    the smallest row-max. Collisions only INFLATE the bound, so the
    salted decision errs toward a few extra salts, never toward missing
    a hot key. The right count also comes from the sketch (zero touch
    of either input). The CMS pair additionally records the
    Cormode-Muthukrishnan join OUTPUT estimate and flags
    ``output_amplified`` when the estimate exceeds ``4 * (|left| +
    |right|)`` — the "small inputs, trillion-row output" regime
    docs/SCALE.md measures, where the right fix is upstream
    pre-aggregation, not a join strategy (advisory: strategy still
    follows the ladder).

    NULL join keys: rows whose key is NULL never match an equi-join
    (and the salted path's heavy-key broadcast semi-join could not
    route them anyway), so the probe EXCLUDES them from the hot-key
    statistics and reports them as ``left_null_key_rows``. A
    NULL-heavy left side in a LEFT OUTER join still funnels its NULL
    rows through one hash partition inside the join — that skew is
    AQE's skew-split to handle (it replays an empty build for them),
    or the caller's to pre-split; salting cannot reach it. The CMS
    probe is consistent: ``cms_sketch`` never counts NULL keys.
    """
    on = list(on)
    if not on:
        raise ValueError("plan_equi_join requires at least one join key")
    cms_probe = left_cms is not None and right_cms is not None

    # Probe 0 (caller-supplied, zero marginal cost): a right-row-count
    # UPPER BOUND that already fits the broadcast threshold decides
    # broadcast without evaluating the right side at all — the true
    # count can only be smaller. Callers derive the bound from state
    # they have anyway (e.g. textpipe: sum of per-doc shingle-instance
    # counts over an already-cached frame bounds the distinct eval
    # shingle set). A bound ABOVE the threshold proves nothing and
    # falls through to the measured ladder below.
    if (
        not cms_probe
        and right_rows_upper_bound is not None
        and right_rows_upper_bound <= broadcast_threshold_rows
    ):
        return {
            "strategy": "broadcast",
            "right_rows": int(right_rows_upper_bound),
            "right_rows_basis": "upper bound (caller-supplied)",
            "left_rows": None,
            "left_max_key_rows": None,
            "left_n_keys": None,
            "left_null_key_rows": None,
            "n_salts": 1,
            "est_output_rows": None,
            "output_amplified": None,
            "probe": "bound",
            "reason": (
                f"caller-supplied right-row upper bound "
                f"{right_rows_upper_bound} <= broadcast threshold "
                f"{broadcast_threshold_rows} (true count only smaller)"
            ),
        }

    def _cms_stats(cms: DataFrame) -> tuple[int, int]:
        rows = cms.groupBy("row").agg(
            F.max("n").alias("mx"), F.sum("n").alias("tot")
        ).collect()
        if not rows:
            return 0, 0
        return min(int(r["tot"] or 0) for r in rows), min(
            int(r["mx"] or 0) for r in rows
        )

    if cms_probe:
        right_rows, _ = _cms_stats(right_cms)
    else:
        right_rows = right.count()
    # CMS undercount caveat (r10 advice): cms_sketch never counts NULL
    # keys, so under probe: "cms" right_rows is the NON-NULL-key row
    # count — a NULL-heavy right side can pass the broadcast threshold
    # while its true broadcast size (NULL rows included) is far larger.
    # The basis field makes the undercount explicit in the record;
    # callers gating memory-critical broadcasts on a NULL-heavy dim
    # should supply the exact count instead (probe: "exact" counts all
    # rows from parquet footers).
    decision: dict = {
        "strategy": "shuffle",
        "right_rows": right_rows,
        "right_rows_basis": "non-null keys (cms)" if cms_probe else "all rows (exact)",
        "left_rows": None,
        "left_max_key_rows": None,
        "left_n_keys": None,
        "left_null_key_rows": None,
        "n_salts": 1,
        "est_output_rows": None,
        "output_amplified": None,
        "probe": "cms" if cms_probe else "exact",
        "reason": "",
    }
    non_null = None
    if right_rows <= broadcast_threshold_rows:
        decision["strategy"] = "broadcast"
        decision["reason"] = (
            f"right side {right_rows} rows <= broadcast threshold "
            f"{broadcast_threshold_rows}"
        )
    elif cms_probe:
        left_rows, max_upper = _cms_stats(left_cms)
        decision["left_rows"] = left_rows
        decision["left_max_key_rows"] = max_upper
        if max_upper > rows_per_partition:
            decision["strategy"] = "salted"
            decision["n_salts"] = math.ceil(max_upper / rows_per_partition)
            decision["reason"] = (
                f"CMS bounds the hottest left key at <= {max_upper} rows > "
                f"{rows_per_partition}/partition budget (collisions only "
                "widen the bound)"
            )
        else:
            decision["reason"] = (
                f"right side {right_rows} rows too big to broadcast; CMS "
                f"bounds the hottest left key at <= {max_upper} rows, "
                "within budget"
            )
    else:
        non_null_pred = None
        for c in on:
            p = F.col(c).isNotNull()
            non_null_pred = p if non_null_pred is None else (non_null_pred & p)
        stats = (
            left.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("nn", non_null_pred)
            .agg(
                F.sum(F.when(F.col("nn"), F.col("n"))).alias("total"),
                F.count(F.when(F.col("nn"), 1)).alias("n_keys"),
                F.max(F.when(F.col("nn"), F.col("n"))).alias("max_n"),
                F.sum(F.when(~F.col("nn"), F.col("n"))).alias("null_rows"),
            )
            .first()
        )
        decision["left_rows"] = stats["total"] or 0
        decision["left_max_key_rows"] = stats["max_n"] or 0
        decision["left_n_keys"] = stats["n_keys"]
        decision["left_null_key_rows"] = stats["null_rows"] or 0
        if (stats["max_n"] or 0) > rows_per_partition:
            decision["strategy"] = "salted"
            decision["n_salts"] = math.ceil(stats["max_n"] / rows_per_partition)
            decision["reason"] = (
                f"hottest left key holds {stats['max_n']} rows > "
                f"{rows_per_partition}/partition budget"
            )
        else:
            decision["reason"] = (
                f"right side {right_rows} rows too big to broadcast; "
                f"hottest left key {stats['max_n']} rows within budget"
            )
    if cms_probe:
        from .sketch import cms_join_size_estimate

        est = cms_join_size_estimate(left_cms, right_cms)
        decision["est_output_rows"] = est
        if decision["left_rows"] is None:  # broadcast exit skipped the probe
            decision["left_rows"] = _cms_stats(left_cms)[0]
        decision["output_amplified"] = est > 4 * (
            decision["left_rows"] + right_rows
        )
    return decision


def adaptive_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    decision: dict | None = None,
    rows_per_partition: int = 5_000_000,
    **plan_kwargs,
) -> DataFrame:
    """Execute the :func:`plan_equi_join` decision (computing it first if
    not supplied). All three strategies produce the identical row
    multiset as ``left.join(right, on, how)`` — broadcast and shuffle
    trivially, salted by :func:`skew_resilient_join`'s pinned
    equivalence — so callers can adopt this wherever a plain equi-join
    stands. Supports the joins the salted path supports: inner, left,
    left_semi, left_anti. Pass maintained counts/CMS via ``decision``
    (or ``plan_kwargs``) at scale so the planner reads bounded sketch
    state instead of probing the fact with a shuffle per call."""
    on = list(on)
    if decision is None:
        decision = plan_equi_join(
            left, right, on, rows_per_partition=rows_per_partition, **plan_kwargs
        )
    strategy = decision["strategy"]
    if strategy == "broadcast":
        return left.join(F.broadcast(right), on, how)
    if strategy == "salted":
        return skew_resilient_join(
            left,
            right,
            on,
            how=how,
            n_salts=max(2, decision["n_salts"]),
            heavy_threshold_rows=rows_per_partition,
        )
    return left.join(right, on, how)
