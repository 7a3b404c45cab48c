"""PSI drift: exact parity with a Python reference over the identical
smoothed formula; identical distributions read ~0; a real shift crosses
the industry 0.25 line; a one-sided key still yields a row."""

from __future__ import annotations

import math

from big_data_processing_with_aws_glue_workshop_spark.operators.drift import psi_drift


def _hist(spark, rows):
    return spark.createDataFrame(rows, "svc string, bucket long, n long")


def _ref_psi(base, cand, eps=1e-6):
    buckets = {b for _, b, _ in base} | {b for _, b, _ in cand}
    tb = sum(n for _, _, n in base)
    tc = sum(n for _, _, n in cand)
    pm = {b: n / tb for _, b, n in base}
    qm = {b: n / tc for _, b, n in cand}
    psi = 0.0
    for b in buckets:
        p = max(pm.get(b, 0.0), eps)
        q = max(qm.get(b, 0.0), eps)
        psi += (q - p) * math.log(q / p)
    return psi


def test_psi_matches_reference_and_thresholds(spark):
    base = [("api", b, n) for b, n in [(0, 500), (1, 300), (2, 150), (3, 50)]]
    same = [("api", b, n) for b, n in [(0, 1000), (1, 600), (2, 300), (3, 100)]]
    shifted = [("api", b, n) for b, n in [(0, 50), (1, 150), (2, 300), (3, 500)]]

    got_same = psi_drift(_hist(spark, base), _hist(spark, same), ["svc"]).first()
    assert abs(got_same["psi"] - _ref_psi(base, same)) < 1e-9
    assert got_same["psi"] < 1e-12  # identical shares -> zero

    got_shift = psi_drift(_hist(spark, base), _hist(spark, shifted), ["svc"]).first()
    assert abs(got_shift["psi"] - _ref_psi(base, shifted)) < 1e-9
    assert got_shift["psi"] > 0.25  # significant drift
    assert got_shift["n_buckets"] == 4


def test_psi_one_sided_key_and_new_bucket(spark):
    """A key only in the candidate still produces a (maximal) PSI row;
    a bucket new to the candidate contributes via the smoothed term."""
    base = _hist(spark, [("api", 0, 100), ("api", 1, 100)])
    cand = _hist(
        spark,
        [("api", 0, 100), ("api", 1, 90), ("api", 7, 10), ("fresh", 0, 50)],
    )
    rows = {r["svc"]: r for r in psi_drift(base, cand, ["svc"]).collect()}
    assert set(rows) == {"api", "fresh"}
    # new bucket 7 holds 5% of candidate mass vs epsilon baseline: large term
    assert rows["api"]["psi"] > 0.25
    assert rows["fresh"]["psi"] > 10  # entirely new key: maximal drift


def test_update_drift_state_matches_psi_drift_interop(spark, tmp_path):
    """The maintained-state driver-side PSI must equal the DataFrame
    operator's PSI on the same histograms — one formula, two surfaces."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.operators.drift import (
        update_drift_state,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        log2_bucket,
    )

    state = str(tmp_path / "drift_hist.json")
    base = spark.range(2_000).select(
        (F.pmod(F.col("id"), 37) + 3).cast("double").alias("v")
    )
    cand = spark.range(2_000).select(
        ((F.pmod(F.col("id"), 37) + 3) * 4).cast("double").alias("v")
    )
    first = update_drift_state(base, state, "v", per_octave=1)
    assert first["first_refresh"] and first["psi"] == {}
    second = update_drift_state(cand, state, "v", per_octave=1)

    def hist(df):
        return (
            df.select(
                F.lit("all").alias("k"),
                log2_bucket(F.col("v"), per_octave=1).alias("bucket"),
            )
            .groupBy("k", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    df_psi = psi_drift(hist(base), hist(cand), ["k"]).collect()[0]["psi"]
    assert abs(second["psi"]["all"] - df_psi) < 1e-12
    assert second["psi"]["all"] > 0.25  # a genuine 4x shift reads as drift

    # reconfiguring the bucketing against standing state is refused
    import pytest

    with pytest.raises(ValueError, match="calibration"):
        update_drift_state(cand, state, "v", per_octave=8)
