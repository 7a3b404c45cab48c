"""Z-order layout: multi-column clustering must be MEASURABLE, not
asserted. The metric is the number of files CONTAINING matching rows —
the lower bound on what any stats-based file skipper must read, and the
quantity the layout controls (engines skip a file exactly when its
min/max exclude the predicate, so fewer match-bearing files = more
skippable files)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.layout import (
    zorder_dataframe,
    zorder_key,
)

N_FILES = 16


def _files_with_matches(spark, path: str, predicate) -> int:
    df = spark.read.parquet(path).filter(predicate)
    return df.select(F.input_file_name()).distinct().count()


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Baseline: sorted by suppkey only — a partkey filter touches every
    file. Z-ordered by (suppkey, partkey): a comparable range filter on
    EITHER column touches at most half the files."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    lo_s, hi_s = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    lo_p, hi_p = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    # ~1/16 of each key range: narrow enough that clustering matters
    s_pred = F.col("l_suppkey").between(lo_s, lo_s + max(1, (hi_s - lo_s) // 16))
    p_pred = F.col("l_partkey").between(lo_p, lo_p + max(1, (hi_p - lo_p) // 16))

    base_path = str(tmp_path / "sorted_one_col")
    (
        li.repartitionByRange(N_FILES, "l_suppkey")
        .sortWithinPartitions("l_suppkey")
        .write.parquet(base_path)
    )
    z_path = str(tmp_path / "zordered")
    zorder_dataframe(li, ["l_suppkey", "l_partkey"], N_FILES).write.parquet(z_path)

    # the baseline layout prunes its own sort column but not the other
    assert _files_with_matches(spark, base_path, s_pred) <= N_FILES // 4
    assert _files_with_matches(spark, base_path, p_pred) >= N_FILES - 1

    z_s = _files_with_matches(spark, z_path, s_pred)
    z_p = _files_with_matches(spark, z_path, p_pred)
    assert z_s <= N_FILES // 2, f"suppkey filter touched {z_s}/{N_FILES} files"
    assert z_p <= N_FILES // 2, f"partkey filter touched {z_p}/{N_FILES} files"

    # layout must not change content
    assert (
        spark.read.parquet(z_path).count()
        == li.count()
        == spark.read.parquet(base_path).count()
    )


def test_zorder_quantile_handles_heavy_tail(spark, tmp_path):
    """Heavy-tailed dimension: 99% of values sit in [0, 1000) with a 1%
    tail at 1e9. Min/max scaling collapses the bulk into bucket 0 — the
    curve degenerates and a filter over the bulk's lower half touches
    every file. Equi-depth (quantile) binning keeps both dimensions
    clustered."""
    # hash-decorrelated dimensions: no accidental modulus correlation
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))
    df = spark.range(40_000).select(
        F.col("id"),
        F.when(h(0) % 100 == 0, F.lit(1_000_000_000))
        .otherwise(h(1) % 1000)
        .alias("skewed"),
        (h(2) % 4000).alias("uniform"),
    )
    pred = F.col("skewed").between(0, 1000 // 16)  # 1/16 of the bulk range

    minmax_path = str(tmp_path / "minmax")
    zorder_dataframe(df, ["skewed", "uniform"], N_FILES).write.parquet(minmax_path)
    quant_path = str(tmp_path / "quantile")
    zorder_dataframe(df, ["skewed", "uniform"], N_FILES, quantile=True).write.parquet(
        quant_path
    )

    minmax_files = _files_with_matches(spark, minmax_path, pred)
    quant_files = _files_with_matches(spark, quant_path, pred)
    # min/max scaling collapses the whole bulk into z-bucket 0 of the
    # skewed axis: the curve carries no information about it and the
    # filter's matches spread across every file
    assert minmax_files >= N_FILES - 2, "expected min/max scaling to degenerate"
    assert quant_files <= N_FILES // 2, (
        f"quantile z-order should cluster the bulk: {quant_files}/{N_FILES}"
    )
    # the other dimension must stay clustered too
    u_pred = F.col("uniform").between(0, 4000 // 16)
    assert _files_with_matches(spark, quant_path, u_pred) <= N_FILES // 2
    assert spark.read.parquet(quant_path).count() == 40_000


def test_zorder_key_interleaves_bits(spark):
    """2-bit sanity: key(a=0b11, b=0b01) = b1 a1 b0 a0 = 0b0111."""
    df = spark.range(1).select(
        zorder_key([F.lit(3).cast("long"), F.lit(1).cast("long")], bits=2).alias("z")
    )
    assert df.collect()[0]["z"] == 0b0111


def _ref_morton(a: int, b: int, bits: int = 16) -> int:
    """Independent pure-python Morton reference (column i bit j -> 2j+i)."""
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_key_matches_reference_and_is_monotone(spark):
    """One Spark pass over a seeded corpus: the Column expression must equal
    the independent reference for every pair (bijectivity follows), and the
    reference must be monotone under componentwise dominance — the property
    that makes per-file min/max stats usable for every participating
    column."""
    import random

    rng = random.Random(42)
    pairs = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _ref_morton(r["a"], r["b"])
    # dominance monotonicity, checked on the reference across the corpus
    for (a1, b1), (a2, b2) in zip(pairs[:-1], pairs[1:]):
        lo = (min(a1, a2), min(b1, b2))
        hi = (max(a1, a2), max(b1, b2))
        assert _ref_morton(*lo) <= _ref_morton(*hi)


def test_zone_map_profile_quantifies_layout(spark, tmp_path):
    """The footer-only audit must separate the three layouts on the same
    data: range layout -> disjoint chain, overlap ~1; hash scatter ->
    overlap ~n_row_groups; z-order -> strictly in between on BOTH
    indexed columns (the G^((d-1)/d) regime)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.layout import (
        zone_map_profile,
    )

    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))
    df = spark.range(100_000).select(
        (h(1) % 100_000).alias("x"), (h(2) % 100_000).alias("y")
    )
    rp, nn, zz = (str(tmp_path / d) for d in ("range", "none", "zorder"))
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(rp)
    df.repartition(8).write.parquet(nn)
    zorder_dataframe(df, ["x", "y"], 16).write.parquet(zz)

    pr = zone_map_profile(rp, ["x", "y"])
    assert pr["x"]["disjoint"] and pr["x"]["overlap_factor"] <= 1.5
    assert pr["y"]["overlap_factor"] >= pr["y"]["n_row_groups"] * 0.7

    pn = zone_map_profile(nn, ["x"])
    assert not pn["x"]["disjoint"]
    assert pn["x"]["overlap_factor"] >= pn["x"]["n_row_groups"] * 0.7

    pz = zone_map_profile(zz, ["x", "y"])
    for c in ("x", "y"):
        g = pz[c]["n_row_groups"]
        assert 1.0 < pz[c]["overlap_factor"] <= g * 0.6, (c, pz[c])


def test_zone_map_profile_native_types_and_nested_layout(spark, tmp_path):
    """String/date columns must not crash the footer audit (native-type
    compare, overlap_factor None but disjointness real), and a
    hive-partitioned layout must be walked recursively (r7 advisory)."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.operators.layout import zone_map_profile

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("key_"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
            "name"
        ),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("d"),
        (F.col("id") % 4).alias("part"),
    )
    out = str(tmp_path / "hive")
    df.repartitionByRange(4, "k").sortWithinPartitions("k").write.partitionBy(
        "part"
    ).parquet(out)

    prof = zone_map_profile(out, ["k", "name", "d"])
    # recursive walk found the partitioned files
    assert prof["k"]["n_row_groups"] >= 4
    # numeric column keeps the overlap factor
    assert prof["k"]["overlap_factor"] is not None
    # string column: no float() crash, disjointness computed in native order
    assert prof["name"]["overlap_factor"] is None
    assert prof["name"]["n_row_groups"] == prof["k"]["n_row_groups"]
    assert isinstance(prof["name"]["disjoint"], bool)
    # date column likewise
    assert prof["d"]["overlap_factor"] is None
