"""Temperature mixture resampling: copy counts must match an
independent per-doc reference calculation exactly (determinism), τ = 1
must be the identity mixture, τ < 1 must upsample the rare source above
1x, and realized token mass must track the tempered targets."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.mixture import (
    materialize_epoch,
    temperature_mixture_plan,
)


def _h(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000


@pytest.fixture()
def corpus(spark):
    # big source: 900 docs x 100 tokens; rare source: 60 docs x 50 tokens
    rows = [(i, "big", 100) for i in range(900)] + [
        (10_000 + i, "rare", 50) for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def _ref_rates(corpus_rows, tau, budget=None):
    mass = {}
    for _, s, n in corpus_rows:
        mass[s] = mass.get(s, 0) + n
    denom = sum(m**tau for m in mass.values())
    total = budget if budget is not None else sum(mass.values())
    return {s: total * (m**tau / denom) / m for s, m in mass.items()}


def test_copy_counts_match_reference_exactly(spark, corpus):
    rows = [(r["doc_id"], r["source"], r["n_tokens"]) for r in corpus.collect()]
    rates = _ref_rates(rows, 0.5)
    plan = temperature_mixture_plan(corpus, temperature=0.5)
    for r in plan.collect():
        rr = rates[r["source"]]
        want = math.floor(rr) + (1 if _h(r["doc_id"]) < (rr - math.floor(rr)) * 1_000_000 else 0)
        assert r["n_copies"] == want
        assert abs(r["repeat_rate"] - rr) < 1e-9


def test_tau_one_is_identity(spark, corpus):
    plan = temperature_mixture_plan(corpus, temperature=1.0)
    got = plan.agg(
        F.min("n_copies").alias("lo"), F.max("n_copies").alias("hi")
    ).first()
    assert (got["lo"], got["hi"]) == (1, 1)  # r_s == 1.0 for every source


def test_flattening_upsamples_rare_source(spark, corpus):
    plan = temperature_mixture_plan(corpus, temperature=0.3)
    rates = {
        r["source"]: r["repeat_rate"]
        for r in plan.select("source", "repeat_rate").distinct().collect()
    }
    assert rates["rare"] > 1.5  # rare source repeated
    assert rates["big"] < 1.0  # big source thinned
    # realized token mass tracks the tempered target within hash noise
    realized = {
        r["source"]: r["m"]
        for r in plan.groupBy("source")
        .agg(F.sum(F.col("n_copies") * F.col("n_tokens")).alias("m"))
        .collect()
    }
    rows = [(r["doc_id"], r["source"], r["n_tokens"]) for r in corpus.collect()]
    mass = {"big": 90_000, "rare": 3_000}
    for s, rr in _ref_rates(rows, 0.3).items():
        target = rr * mass[s]
        assert abs(realized[s] - target) / target < 0.12


def test_materialize_epoch_copies_and_reshuffles(spark, corpus):
    plan = temperature_mixture_plan(corpus, temperature=0.3)
    e0 = materialize_epoch(plan, epoch=0)
    # one row per copy
    want = plan.agg(F.sum("n_copies")).first()[0]
    assert e0.count() == want
    # a doc with n_copies = k appears with copy_idx 1..k
    k_doc = plan.filter(F.col("n_copies") >= 2).first()
    got = sorted(
        r["copy_idx"]
        for r in e0.filter(F.col("doc_id") == k_doc["doc_id"]).collect()
    )
    assert got == list(range(1, k_doc["n_copies"] + 1))
    # epochs permute differently but deterministically
    order0 = [r["doc_id"] for r in e0.orderBy("shuffle_key").limit(50).collect()]
    order1 = [
        r["doc_id"]
        for r in materialize_epoch(plan, epoch=1).orderBy("shuffle_key").limit(50).collect()
    ]
    order0_again = [
        r["doc_id"]
        for r in materialize_epoch(plan, epoch=0).orderBy("shuffle_key").limit(50).collect()
    ]
    assert order0 != order1
    assert order0 == order0_again


def test_write_epoch_shards_is_the_global_permutation(spark, corpus, tmp_path):
    """Reading shards in file order, rows in stored order, must equal the
    epoch's global sort by shuffle_key — and rerunning the same epoch
    reproduces it exactly."""
    import os

    from big_data_processing_with_aws_glue_workshop_spark.operators.mixture import (
        write_epoch_shards,
    )

    plan = temperature_mixture_plan(corpus, temperature=0.3)
    out = str(tmp_path / "epoch0")
    write_epoch_shards(plan, out, n_shards=4, epoch=0)
    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == 4

    seq = []
    import pyarrow.parquet as pq

    shard_maxes = []
    for f in files:
        t = pq.read_table(os.path.join(out, f)).to_pylist()
        keys = [r["shuffle_key"] for r in t]
        assert keys == sorted(keys)  # sorted within shard
        if keys:
            shard_maxes.append((keys[0], keys[-1]))
        seq += [(r["doc_id"], r["copy_idx"]) for r in t]
    # part-file name order IS range order: shard i's max key <= shard
    # i+1's min key, so concatenation in name order is the global sort
    for (_, hi), (lo, _) in zip(shard_maxes[:-1], shard_maxes[1:]):
        assert hi <= lo
    want = [
        (r["doc_id"], r["copy_idx"])
        for r in materialize_epoch(plan, epoch=0).orderBy("shuffle_key").collect()
    ]
    assert sorted(seq) == sorted(want) and len(seq) == len(want)
    # rerun reproduces the identical byte order
    out2 = str(tmp_path / "epoch0b")
    write_epoch_shards(plan, out2, n_shards=4, epoch=0)
    files2 = sorted(f for f in os.listdir(out2) if f.endswith(".parquet"))
    seq2 = []
    for f in files2:
        t = pq.read_table(os.path.join(out2, f)).to_pylist()
        seq2 += [(r["doc_id"], r["copy_idx"]) for r in t]
    assert seq2 == seq


def test_weighted_sample_matches_python_reference_and_bias(spark):
    """Efraimidis-Spirakis sampling: exact parity with a pure-Python
    reference over the same hash construction (determinism under any
    partitioning), per-group k, zero-weight exclusion — and the bias
    property: across seeds, heavy rows are selected far more often."""
    import hashlib
    import math

    from big_data_processing_with_aws_glue_workshop_spark.operators.mixture import (
        weighted_sample_without_replacement,
    )

    rows = [(i, "g1" if i < 40 else "g2", float(1 + (i % 7))) for i in range(80)]
    rows += [(900, "g1", 0.0), (901, "g2", 0.0)]  # never selected
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    def py_u(doc_id, seed):
        h = int(hashlib.md5(f"{doc_id}#{seed}".encode()).hexdigest()[:15], 16)
        return (h % 1_000_000 + 1) / 1_000_000.0

    def py_sample(seed, k):
        out = {}
        for i, g, w in rows:
            if w <= 0:
                continue
            key = math.log(py_u(i, seed)) / w
            out.setdefault(g, []).append((-key, i))
        return {
            g: {i for _, i in sorted(v)[:k]} for g, v in out.items()
        }

    for seed in (1, 42, 99):
        got = {}
        sampled = weighted_sample_without_replacement(
            df, "w", k=10, group_cols=["grp"], seed=seed
        )
        for r in sampled.collect():
            got.setdefault(r["grp"], set()).add(r["doc_id"])
        assert got == py_sample(seed, 10), seed
        assert all(len(v) == 10 for v in got.values())
        assert 900 not in got.get("g1", set()) and 901 not in got.get("g2", set())

    # bias: over many seeds (pure-Python twin — same construction), a
    # weight-7 row is selected as top-1 ~7x as often as a weight-1 row
    heavy = {1: 0, 7: 0}
    trials = 2000
    for seed in range(trials):
        best = max(
            (math.log(py_u(i, seed)) / w, w)
            for i, g, w in rows
            if g == "g1" and w in (1.0, 7.0)
        )
        heavy[best[1]] += 1
    ratio = heavy[7.0] / max(heavy[1.0], 1)
    # g1 has ~6 rows of weight 7 and ~6 of weight 1 -> expected ratio ~7
    assert 4.0 < ratio < 12.0, ratio
