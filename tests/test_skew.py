"""Skew toolkit: the split+salt join must be row-multiset-identical to
the plain join on a hot-keyed dataset (inner/left/left_semi/left_anti,
duplicate right keys, missing right keys), and the profile must report
the hot key."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.skew import (
    adaptive_join,
    plan_equi_join,
    skew_profile,
    skew_resilient_join,
)


@pytest.fixture()
def skewed(spark):
    # 20k rows: 50% key 1, the rest spread over 2..999; key 999 absent
    # from the right side (exercises left-join null extension)
    left = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, 1)
        .otherwise(F.pmod(F.xxhash64("id"), 998) + 2)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(2, 999).select(F.col("id").alias("k")).union(
        spark.createDataFrame([(1,), (1,), (7,)], "k long")
    ).withColumn("dim", F.concat(F.lit("d"), F.col("k").cast("string")))
    return left, right


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain_join(spark, skewed, how):
    left, right = skewed
    plain = left.join(right, ["k"], how)
    salted = skew_resilient_join(left, right, ["k"], how=how, n_salts=8)
    assert salted.columns == plain.columns
    assert _multiset(salted) == _multiset(plain)


def test_explicit_heavy_keys_and_salt_spread(spark, skewed):
    left, right = skewed
    hot = spark.createDataFrame([(1,)], "k long")
    salted = skew_resilient_join(left, right, ["k"], heavy_keys=hot, n_salts=8)
    plain = left.join(right, ["k"], "inner")
    assert _multiset(salted) == _multiset(plain)
    # the hot key's left rows actually spread over the salt domain
    from big_data_processing_with_aws_glue_workshop_spark.operators.skew import F as _F  # noqa: F401

    lh = left.join(F.broadcast(hot), ["k"], "left_semi").withColumn(
        "s", F.pmod(F.xxhash64("k", "payload"), F.lit(8))
    )
    assert lh.select("s").distinct().count() == 8


def test_skew_profile_reports_hot_key(spark, skewed):
    left, _ = skewed
    prof = skew_profile(left, ["k"], top_n=3, rows_per_partition=1_000)
    assert prof["total_rows"] == 20_000
    assert prof["top_keys"][0][0] == 1 and prof["top_keys"][0][-1] == 10_000
    assert 0.49 <= prof["max_key_share"] <= 0.51
    assert prof["suggested_salts"] == 10  # ceil(10_000 / 1_000)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_null_keys_and_all_heavy(spark, how):
    """Null join keys must follow plain-join semantics (dropped on
    inner, null-extended on left — they route through the light path
    because a null never matches the heavy-key semi join), and a
    threshold of 0 rows (every key heavy) must still be exact."""
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c"), (2, "d"), (None, "e")],
        "k long, payload string",
    )
    right = spark.createDataFrame([(1, "d1"), (2, "d2")], "k long, dim string")
    plain = left.join(right, ["k"], how)
    salted = skew_resilient_join(
        left, right, ["k"], how=how, n_salts=4, heavy_threshold_rows=0
    )
    assert _multiset(salted) == _multiset(plain)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_composite_keys(spark, how):
    """Multi-column equality keys: parity with the plain join, heavy
    key auto-detected on the composite."""
    left = spark.range(5_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 50).alias("k1"),
        F.when(F.col("id") % 2 == 0, F.lit("x")).otherwise(F.lit("y")).alias("k2"),
        F.col("id").alias("payload"),
    )
    right = (
        spark.range(50)
        .select(F.col("id").alias("k1"))
        .crossJoin(spark.createDataFrame([("x",), ("y",)], "k2 string"))
        .withColumn("dim", F.concat_ws("-", "k1", "k2"))
    )
    plain = left.join(right, ["k1", "k2"], how)
    salted = skew_resilient_join(left, right, ["k1", "k2"], how=how, n_salts=4)
    assert salted.columns == plain.columns
    assert _multiset(salted) == _multiset(plain)


def test_plan_equi_join_strategy_ladder(spark, skewed):
    """The probe ladder picks the right strategy in each regime: small
    build side => broadcast (no left probe paid: left stats stay None);
    big build + hot left key => salted with the right salt factor; big
    build + flat keys => shuffle."""
    left, right = skewed  # right is ~1000 rows
    d = plan_equi_join(left, right, ["k"], broadcast_threshold_rows=2_000)
    assert d["strategy"] == "broadcast" and d["left_rows"] is None

    d = plan_equi_join(
        left, right, ["k"], broadcast_threshold_rows=10, rows_per_partition=1_000
    )
    assert d["strategy"] == "salted"
    assert d["left_max_key_rows"] == 10_000 and d["n_salts"] == 10

    d = plan_equi_join(
        left, right, ["k"], broadcast_threshold_rows=10, rows_per_partition=50_000
    )
    assert d["strategy"] == "shuffle" and d["left_rows"] == 20_000


def test_plan_equi_join_upper_bound_short_circuit(spark):
    """Probe 0: a caller-supplied right-row upper bound at/below the
    broadcast threshold pins a broadcast WITHOUT evaluating the right
    side (the true count is only smaller); a bound above the threshold
    proves nothing and the planner falls through to the measured
    ladder. The no-evaluation claim is pinned with a right side whose
    evaluation would throw."""
    left = spark.range(1_000).select(F.col("id").alias("k"))
    # any action on this frame raises (ANSI division by zero)
    poisoned = spark.range(10).select(
        (F.lit(1) / (F.col("id") - F.col("id"))).cast("long").alias("k")
    )
    d = plan_equi_join(
        left, poisoned, ["k"],
        broadcast_threshold_rows=100, right_rows_upper_bound=100,
    )
    assert d["probe"] == "bound" and d["strategy"] == "broadcast"
    assert d["right_rows"] == 100
    assert "upper bound" in d["right_rows_basis"]

    # bound above the threshold: falls through to the exact right count
    small = spark.range(5).select(F.col("id").alias("k"))
    d = plan_equi_join(
        left, small, ["k"],
        broadcast_threshold_rows=100, right_rows_upper_bound=10_000,
    )
    assert d["probe"] == "exact" and d["strategy"] == "broadcast"
    assert d["right_rows"] == 5  # the real count, not the useless bound


def test_plan_equi_join_cms_replaces_probe_shuffle(spark):
    """With maintained CMS tables for both sides and a non-broadcastable
    right side, the planner reads bounded sketch state (probe: cms) —
    the hottest-key bound is min-over-rows(max bucket), row totals are
    the per-row bucket sums — and still lands the right strategy in
    both regimes."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import cms_sketch

    hot = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, 1)
        .otherwise(F.pmod(F.xxhash64("id"), 998) + 2)
        .alias("k")
    )
    flat = spark.range(20_000).select(F.col("id").alias("k"))
    big_right = spark.range(20_000).select(F.col("id").alias("k"))
    cms_right = cms_sketch(big_right, "k")

    d = plan_equi_join(
        hot, big_right, ["k"],
        broadcast_threshold_rows=10, rows_per_partition=1_000,
        left_cms=cms_sketch(hot, "k"), right_cms=cms_right,
    )
    assert d["probe"] == "cms" and d["strategy"] == "salted"
    assert d["right_rows"] == 20_000 and d["left_rows"] == 20_000  # exact totals
    assert d["left_max_key_rows"] >= 10_000      # bound never under the truth
    assert d["n_salts"] >= 10

    d = plan_equi_join(
        flat, big_right, ["k"],
        broadcast_threshold_rows=10, rows_per_partition=1_000,
        left_cms=cms_sketch(flat, "k"), right_cms=cms_right,
    )
    assert d["probe"] == "cms" and d["strategy"] == "shuffle"


def test_plan_equi_join_null_keys_excluded(spark):
    """A NULL-heavy left side must not trigger (or size) salting — NULL
    keys never match an equi-join and the heavy-key broadcast semi-join
    could not route them; they are counted separately."""
    left = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, None)
        .otherwise(F.pmod(F.xxhash64("id"), 500))
        .alias("k")
    )
    right = spark.range(5_000).select(F.col("id").alias("k"))
    d = plan_equi_join(
        left, right, ["k"], broadcast_threshold_rows=10, rows_per_partition=1_000
    )
    assert d["strategy"] == "shuffle"           # no non-null key is hot
    assert d["left_null_key_rows"] == 5_000
    assert d["left_rows"] == 5_000              # non-null rows only
    assert d["left_max_key_rows"] < 1_000


def test_plan_equi_join_cms_output_flag(spark):
    """With maintained CMS tables for both sides, the decision records
    the join-output estimate and flags amplification: a shared hot key
    makes two 2k-row inputs produce ~1M output rows."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import cms_sketch

    hot = spark.range(2_000).select(F.lit(1).alias("k"))
    flat = spark.range(2_000).select(F.col("id").alias("k"))
    cms_hot = cms_sketch(hot, "k")
    cms_flat = cms_sketch(flat, "k")
    amplified = plan_equi_join(
        hot, hot, ["k"], broadcast_threshold_rows=10_000,
        left_cms=cms_hot, right_cms=cms_hot,
    )
    assert amplified["est_output_rows"] >= 4_000_000
    assert amplified["output_amplified"] is True
    benign = plan_equi_join(
        flat, flat, ["k"], broadcast_threshold_rows=10_000,
        left_cms=cms_flat, right_cms=cms_flat,
    )
    assert benign["output_amplified"] is False


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_adaptive_join_equals_plain_join_all_strategies(spark, skewed, how):
    """Whatever the planner picks, the output row multiset must equal the
    plain join — all three strategies forced via thresholds."""
    left, right = skewed
    plain = left.join(right, ["k"], how)
    expected = _multiset(plain)
    for kwargs in (
        {"broadcast_threshold_rows": 2_000},                               # broadcast
        {"broadcast_threshold_rows": 10, "rows_per_partition": 1_000},     # salted
        {"broadcast_threshold_rows": 10, "rows_per_partition": 50_000},    # shuffle
    ):
        got = adaptive_join(left, right, ["k"], how=how, **kwargs)
        assert got.columns == plain.columns, kwargs
        assert _multiset(got) == expected, kwargs


def test_adaptive_join_broadcast_plan_is_broadcast(spark, skewed):
    """The broadcast decision must reach the physical plan: a
    BroadcastHashJoin node, not a sort-merge exchange of the fact."""
    left, right = skewed
    df = adaptive_join(left, right, ["k"], broadcast_threshold_rows=2_000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_salted_join_randomized_parity(spark, seed):
    """Randomized-equality sweep (the graph-family test style): random
    key domains, salt counts, thresholds and right-side duplication —
    all four join types must stay row-multiset-identical to the plain
    join."""
    import random

    rng = random.Random(seed)
    n_left = rng.randint(200, 2_000)
    domain = rng.randint(3, 40)
    n_salts = rng.choice([2, 3, 8, 16])
    left = spark.range(n_left).select(
        F.when(F.col("id") % 3 == 0, rng.randrange(domain))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(seed)), domain))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    # right side: random subset of the domain, some keys duplicated
    right_rows = [
        (k, f"d{k}_{i}")
        for k in range(domain)
        if rng.random() < 0.7
        for i in range(rng.choice([1, 1, 2]))
    ]
    right = spark.createDataFrame(right_rows or [(0, "d0")], "k long, dim string")
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = left.join(right, ["k"], how)
        salted = skew_resilient_join(
            left,
            right,
            ["k"],
            how=how,
            n_salts=n_salts,
            heavy_threshold_rows=rng.choice([0, 5, n_left // 10]),
        )
        assert _multiset(salted) == _multiset(plain), (how, seed)


@pytest.mark.parametrize("seed", [2, 9])
def test_cms_hot_key_bound_never_under(spark, seed):
    """The planner's CMS hottest-key bound (min over rows of the row's
    max bucket) must never undercut the true hottest key mass — the
    property the salted decision's safety rests on — and the per-row
    bucket sum must equal the exact row total."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import cms_sketch

    rng = random.Random(seed)
    domain = rng.randint(5, 5_000)
    hot_share = rng.choice([2, 3, 10])
    left = spark.range(30_000).select(
        F.when(F.col("id") % hot_share == 0, 7)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(seed)), domain))
        .alias("k")
    )
    true_max = (
        left.groupBy("k").count().agg(F.max("count").alias("m")).first()["m"]
    )
    rows = (
        cms_sketch(left, "k")
        .groupBy("row")
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .collect()
    )
    bound = min(int(r["mx"]) for r in rows)
    assert bound >= true_max, (seed, bound, true_max)
    assert all(int(r["tot"]) == 30_000 for r in rows)
