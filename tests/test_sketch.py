"""Count-Min sketch (operators/sketch.py): never-underestimate (an
exact invariant, not probabilistic), bounded overestimate on Zipf data,
exact monoid merge, heavy-hitter recall 1.0 over candidates, and the
selling point — the sketch rides incremental_agg_refresh as bounded
frequency state."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
    cms_sketch,
)

DEPTH, WIDTH = 5, 2048


def _zipf(spark, n=30_000, offset=0):
    # key k appears ~ n/k times: heavy head, long tail
    return spark.range(n).select(
        F.concat(
            F.lit("key_"),
            F.floor(
                F.lit(500) / (F.pmod(F.xxhash64(F.col("id") + offset), 500) + 1)
            ).cast("string"),
        ).alias("k")
    )


def _truth(df):
    return {
        r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }


def test_never_underestimates_and_bounded_overestimate(spark):
    df = _zipf(spark)
    truth = _truth(df)
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, df, "k", depth=DEPTH, width=WIDTH).collect()
    }
    n_total = sum(truth.values())
    eps_n = (2.718 / WIDTH) * n_total  # the classic e/w bound
    overs = [est[k] - truth[k] for k in truth]
    assert all(o >= 0 for o in overs)  # exact invariant: never under
    assert max(overs) <= eps_n  # deterministic with the fixed seed


def test_cms_join_size_never_underestimates_and_exact_when_collisionless(spark):
    """The inner-product readout: est >= |A join B| is an exact
    invariant (collision cross-terms are nonnegative), and with a width
    wide enough that no two keys collide in any row the estimate IS the
    true join output cardinality."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        cms_join_size_estimate,
    )

    a, b = _zipf(spark, 8_000, 0), _zipf(spark, 8_000, 7_777)
    true_size = a.join(b, "k").count()

    # production-ish width: bounded overestimate, never under
    sa = cms_sketch(a, "k", depth=DEPTH, width=WIDTH)
    sb = cms_sketch(b, "k", depth=DEPTH, width=WIDTH)
    est = cms_join_size_estimate(sa, sb, depth=DEPTH)
    assert est >= true_size
    eps = 2.718 / WIDTH
    assert est - true_size <= eps * 8_000 * 8_000

    # ~500 distinct keys into 2^20 buckets: collision-free in practice
    # for this fixture, so the estimate is exact
    wide = 1 << 20
    est_wide = cms_join_size_estimate(
        cms_sketch(a, "k", depth=DEPTH, width=wide),
        cms_sketch(b, "k", depth=DEPTH, width=wide),
        depth=DEPTH,
    )
    assert est_wide == true_size


def test_cms_join_size_zero_for_disjoint_keys_at_wide_width(spark):
    """Disjoint key sets at collision-free width: the min over rows
    must reach 0 — including the case where a whole sketch row shares
    no occupied bucket with the other side (absent from the inner
    join), which must read as 0, not be skipped."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        cms_join_size_estimate,
    )

    a = spark.range(500).select(F.concat(F.lit("left_"), F.col("id")).alias("k"))
    b = spark.range(500).select(F.concat(F.lit("right_"), F.col("id")).alias("k"))
    est = cms_join_size_estimate(
        cms_sketch(a, "k", depth=DEPTH, width=1 << 20),
        cms_sketch(b, "k", depth=DEPTH, width=1 << 20),
        depth=DEPTH,
    )
    assert est == 0


def test_hll_intersection_estimate_tracks_true_overlap(spark):
    """Inclusion-exclusion over the max-monoid union: two 6k-key sets
    with a 2k-key true intersection estimate within the p=12 error
    budget (three ~1.6% terms compound through the subtraction — allow
    15% of the true intersection)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        hll_intersection_estimate,
        hll_sketch,
    )

    a = spark.range(0, 6_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(4_000, 10_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    est = hll_intersection_estimate(hll_sketch(a, "k"), hll_sketch(b, "k"))
    assert abs(est - 2_000) <= 300


def test_merge_is_exactly_the_combined_sketch(spark):
    a, b = _zipf(spark, 10_000, 0), _zipf(spark, 10_000, 7_777)
    merged = cms_merge(
        cms_sketch(a, "k", depth=DEPTH, width=WIDTH),
        cms_sketch(b, "k", depth=DEPTH, width=WIDTH),
    )
    combined = cms_sketch(a.unionByName(b), "k", depth=DEPTH, width=WIDTH)
    left = {(r["row"], r["bucket"]): r["n"] for r in merged.collect()}
    right = {(r["row"], r["bucket"]): r["n"] for r in combined.collect()}
    assert left == right  # monoid equality is exact, not approximate


def test_heavy_hitters_perfect_recall_over_candidates(spark):
    df = _zipf(spark)
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    truth = _truth(df)
    threshold = 500
    hot_true = {k for k, n in truth.items() if n >= threshold}
    got = {
        r["k"]
        for r in cms_heavy_hitters(
            sketch, df, "k", threshold, depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert hot_true <= got  # recall 1.0 by construction
    # precision: false positives only from bounded overestimates
    n_total = sum(truth.values())
    eps_n = (2.718 / WIDTH) * n_total
    assert all(truth[k] >= threshold - eps_n for k in got)


def test_sketch_rides_incremental_agg_refresh(spark, tmp_path):
    """The 100 TB story: (row, bucket) are ordinary group keys, n an
    ordinary count — landing each wave's sketch PAIRS and running
    incremental_agg_refresh maintains the sketch with O(increment)
    reads and bounded state, exactly equal to a one-shot sketch of all
    data ever landed."""
    import pandas as pd  # noqa: F401  (pyarrow from_pandas path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "pairs"
    landing.mkdir()
    bm = JobBookmark(str(tmp_path / "bm.json"), "cms")
    target = str(tmp_path / "sketch_state")

    waves = [_zipf(spark, 5_000, 0), _zipf(spark, 5_000, 999)]
    for i, w in enumerate(waves):
        pairs = w.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            F.pmod(
                                F.xxhash64(F.lit(42 + r), "k"), F.lit(WIDTH)
                            ).alias("bucket"),
                        )
                        for r in range(DEPTH)
                    ]
                )
            ).alias("rb")
        ).select("rb.row", "rb.bucket")
        pq.write_table(
            pa.Table.from_pandas(pairs.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        incremental_agg_refresh(
            spark,
            bm,
            str(landing / "*.parquet"),
            ["row", "bucket"],
            {"n": ("count", "*")},
            target,
        )

    state = read_refreshed(spark, target)
    oneshot = cms_sketch(
        waves[0].unionByName(waves[1]), "k", depth=DEPTH, width=WIDTH
    )
    assert {(r["row"], r["bucket"]): r["n"] for r in state.collect()} == {
        (r["row"], r["bucket"]): r["n"] for r in oneshot.collect()
    }


def test_streaming_sketch_sink_equals_oneshot(spark, tmp_path):
    """Streaming composition: two drained waves through the foreachBatch
    sink leave a standing sketch EXACTLY equal to a one-shot sketch of
    all data; a replayed batch id is a no-op; a different checkpoint and
    a recalibrated sink are refused."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        CmsSketchSink,
        read_stream_sketch,
        run_stream_cms_sketch,
    )

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    waves = [_zipf(spark, 4_000, 0), _zipf(spark, 4_000, 123)]

    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        stream = spark.readStream.schema("k string").parquet(str(landing))
        run_stream_cms_sketch(
            stream, target, "k", checkpoint_dir=ckpt, depth=DEPTH, width=WIDTH
        )

    standing = {
        (r["row"], r["bucket"]): r["n"]
        for r in read_stream_sketch(spark, target).collect()
    }
    oneshot = {
        (r["row"], r["bucket"]): r["n"]
        for r in cms_sketch(
            waves[0].unionByName(waves[1]), "k", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert standing == oneshot

    # replayed batch id: no-op
    sink = CmsSketchSink(target, "k", depth=DEPTH, width=WIDTH)
    sink(waves[0], 0)
    assert {
        (r["row"], r["bucket"]): r["n"]
        for r in read_stream_sketch(spark, target).collect()
    } == oneshot

    # fresh checkpoint refused
    stream = spark.readStream.schema("k string").parquet(str(landing))
    with pytest.raises(ValueError, match="different checkpoint"):
        run_stream_cms_sketch(
            stream, target, "k",
            checkpoint_dir=str(tmp_path / "ckptB"), depth=DEPTH, width=WIDTH,
        )

    # recalibrated sink refused
    with pytest.raises(ValueError, match="calibration mismatch"):
        CmsSketchSink(target, "k", depth=DEPTH, width=WIDTH * 2)(waves[0], 99)


def test_hll_estimate_accuracy_and_exact_merge(spark):
    """HLL register table: estimate within the expected relative error
    (~1.04/sqrt(m) std at p=12), merge register-exact vs the combined
    sketch."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    a = spark.range(0, 40_000).select(F.concat(F.lit("u"), "id").alias("k"))
    b = spark.range(30_000, 70_000).select(F.concat(F.lit("u"), "id").alias("k"))

    est_a = hll_estimate(hll_sketch(a, "k"))
    assert abs(est_a - 40_000) / 40_000 < 0.05

    merged = hll_merge(hll_sketch(a, "k"), hll_sketch(b, "k"))
    combined = hll_sketch(a.unionByName(b), "k")
    assert {
        (r["register"], r["rho"]) for r in merged.collect()
    } == {(r["register"], r["rho"]) for r in combined.collect()}
    # true distinct of the union is 70k (overlap 30k..40k)
    assert abs(hll_estimate(merged) - 70_000) / 70_000 < 0.05


def test_hll_rides_incremental_agg_refresh(spark, tmp_path):
    """Distinct counting across refreshes without re-reading history:
    land each wave's register PAIRS, maintain with the max monoid, and
    the standing state equals the one-shot sketch of everything."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        hll_estimate,
        hll_register_pairs,
        hll_sketch,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "pairs"
    landing.mkdir()
    bm = JobBookmark(str(tmp_path / "bm.json"), "hll")
    target = str(tmp_path / "hll_state")

    waves = [
        spark.range(0, 20_000).select(F.concat(F.lit("u"), "id").alias("k")),
        spark.range(15_000, 45_000).select(F.concat(F.lit("u"), "id").alias("k")),
    ]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(
                hll_register_pairs(w, "k").toPandas(), preserve_index=False
            ),
            str(landing / f"w{i}.parquet"),
        )
        incremental_agg_refresh(
            spark,
            bm,
            str(landing / "*.parquet"),
            ["register"],
            {"rho": ("max", "rho")},
            target,
        )

    state = read_refreshed(spark, target)
    oneshot = hll_sketch(waves[0].unionByName(waves[1]), "k")
    assert {
        (r["register"], r["rho"]) for r in state.collect()
    } == {(r["register"], r["rho"]) for r in oneshot.collect()}
    assert abs(hll_estimate(state) - 45_000) / 45_000 < 0.05


def test_bloom_zero_false_negatives_and_bounded_fp(spark):
    """Bloom membership: every true member is bloom-positive (exact
    invariant), the false-positive rate on non-members is near the
    (1 - e^{-kn/m})^k theory, and duplicate probe rows survive."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    n_bits, k = 1 << 16, 5
    members = spark.range(4_000).select(F.concat(F.lit("m"), "id").alias("s"))
    bloom = bloom_build(members, "s", n_bits=n_bits, k=k)
    assert bloom.count() <= n_bits // 64

    # zero false negatives, including duplicated probe rows
    dup_members = members.unionByName(members.limit(100))
    pos = bloom_probe(bloom, dup_members, "s", n_bits=n_bits, k=k)
    assert pos.count() == dup_members.count()

    # false positives bounded: theory ~ (1 - e^{-kn/m})^k = 2.2% here
    others = spark.range(10_000).select(F.concat(F.lit("x"), "id").alias("s"))
    fp = bloom_probe(bloom, others, "s", n_bits=n_bits, k=k).count()
    assert fp / 10_000 < 0.05


def test_bloom_probe_tolerates_word_and_bits_probe_columns(spark):
    """r8 advisory regression: the probe path's internals are all
    __-prefixed, so a probes frame that ALREADY carries ``word`` /
    ``bits`` columns joins cleanly and keeps them untouched."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.range(200).select(F.concat(F.lit("m"), "id").alias("s"))
    bloom = bloom_build(members, "s")
    probes = members.select(
        "s", F.lit("w").alias("word"), F.lit(7).alias("bits")
    )
    out = bloom_probe(bloom, probes, "s")
    assert out.columns == ["s", "word", "bits"]
    rows = out.collect()
    assert len(rows) == 200
    assert all(r["word"] == "w" and r["bits"] == 7 for r in rows)


def test_bloom_probe_refuses_unbroadcastable_n_bits(spark):
    """n_bits beyond 2^28 would pack into a multi-hundred-MB single
    collect_list row and OOM the broadcast — refuse with the scale-path
    pointer instead of failing deep in the exchange."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(df, "k")
    with pytest.raises(ValueError, match="shard the filter"):
        bloom_probe(bloom, df, "k", n_bits=1 << 33)


def test_bloom_decontamination_flow_matches_exact_join(spark):
    """The decontamination composition: bloom-positive candidates +
    exact verify == the exact semi-join, with the bloom having filtered
    the probe side map-side."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    bench = spark.range(500).select(F.concat(F.lit("gram"), "id").alias("s"))
    corpus = spark.range(20_000).select(
        F.concat(F.lit("gram"), (F.col("id") * 7).cast("string")).alias("s")
    )
    bloom = bloom_build(bench, "s")
    candidates = bloom_probe(bloom, corpus, "s")
    verified = candidates.join(bench, "s", "left_semi")
    exact = corpus.join(bench, "s", "left_semi")
    assert sorted(r["s"] for r in verified.collect()) == sorted(
        r["s"] for r in exact.collect()
    )


def test_sketches_maintain_from_raw_files_via_transform(spark, tmp_path):
    """The transform hook: HLL and CMS states maintain directly from RAW
    key files — the refresh expands rows to monoid pairs itself, no
    pre-landing step — and still equal the one-shot sketches."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        hll_estimate,
        hll_register_pairs,
        hll_sketch,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "raw"
    landing.mkdir()
    bm = JobBookmark(str(tmp_path / "bm.json"), "hll-raw")
    target = str(tmp_path / "state")

    waves = [
        spark.range(0, 15_000).select(F.concat(F.lit("u"), "id").alias("k")),
        spark.range(10_000, 30_000).select(F.concat(F.lit("u"), "id").alias("k")),
    ]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        incremental_agg_refresh(
            spark,
            bm,
            str(landing / "*.parquet"),
            ["register"],
            {"rho": ("max", "rho")},
            target,
            transform=lambda df: hll_register_pairs(df, "k"),
        )

    state = read_refreshed(spark, target)
    oneshot = hll_sketch(waves[0].unionByName(waves[1]), "k")
    assert {
        (r["register"], r["rho"]) for r in state.collect()
    } == {(r["register"], r["rho"]) for r in oneshot.collect()}
    assert abs(hll_estimate(state) - 30_000) / 30_000 < 0.05


def test_bloom_state_maintains_via_refresh_bit_or(spark, tmp_path):
    """The Bloom (word, bits) bit-or monoid rides incremental_agg_refresh
    via the row-wise bloom_mask_pairs transform: after two waves the
    state equals the one-shot bloom_build of the union, and probing the
    refreshed state still has zero false negatives."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_mask_pairs,
        bloom_probe,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "raw"
    landing.mkdir()
    bm = JobBookmark(str(tmp_path / "bm.json"), "bloom-raw")
    target = str(tmp_path / "state")

    waves = [
        spark.range(0, 3_000).select(F.concat(F.lit("g"), "id").alias("k")),
        spark.range(2_000, 6_000).select(F.concat(F.lit("g"), "id").alias("k")),
    ]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        incremental_agg_refresh(
            spark,
            bm,
            str(landing / "*.parquet"),
            ["word"],
            {"bits": ("bit_or", "mask")},
            target,
            transform=lambda df: bloom_mask_pairs(df, "k"),
        )

    state = read_refreshed(spark, target)
    union = waves[0].unionByName(waves[1])
    oneshot = bloom_build(union, "k")
    assert {
        (r["word"], r["bits"]) for r in state.collect()
    } == {(r["word"], r["bits"]) for r in oneshot.collect()}
    # zero false negatives against the REFRESHED state
    members = union.distinct()
    pos = bloom_probe(state.select("word", "bits"), members, "k")
    assert pos.count() == members.count()


def test_cli_agg_refresh_bloom_key(spark, tmp_path, capsys):
    """agg-refresh --bloom-key: the filter maintains from raw files and
    the summary reports fill ratio + implied FP rate."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"url": [f"u{i}" for i in range(5_000)]}),
            preserve_index=False,
        ),
        str(landing / "f1.parquet"),
    )
    main([
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
        "--bloom-key", "url",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_files"] == 1
    # 5k keys x 5 hashes in 2^20 bits: fill ~ 2.4%, fp ~ (0.024)^5
    assert 0.01 < out["bloom_fill_ratio"] < 0.05
    assert out["bloom_fp_rate_est"] < 1e-6

    # r9 review regression: the pointer pins the sketch calibration —
    # merging a DIFFERENT sketch kind (or a plain agg) into this target
    # is refused, the same contract the streaming sinks enforce
    import pytest

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"url": ["x1", "x2"]}), preserve_index=False
        ),
        str(landing / "f2.parquet"),
    )
    base = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
    ]
    with pytest.raises(SystemExit, match="calibration mismatch"):
        main(base + ["--hll-key", "url"])
    with pytest.raises(SystemExit, match="calibration mismatch"):
        main(base + ["--keys", "url", "--agg", "n=count:*"])
    # the matching calibration still refreshes fine
    main(base + ["--bloom-key", "url"])
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["new_files"] == 1


def test_streaming_bloom_sink_equals_oneshot(spark, tmp_path):
    """Streaming Bloom maintenance: two drained waves leave a standing
    filter EXACTLY equal to the one-shot bloom_build of all data (the
    crawl stream continuously maintaining the decontamination filter);
    replay/checkpoint/calibration contracts mirror the CMS sink's."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        BloomFilterSink,
        read_stream_sketch,
        run_stream_bloom_filter,
    )

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    waves = [
        spark.range(0, 2_000).select(F.concat(F.lit("g"), "id").alias("k")),
        spark.range(1_500, 4_000).select(F.concat(F.lit("g"), "id").alias("k")),
    ]

    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        stream = spark.readStream.schema("k string").parquet(str(landing))
        run_stream_bloom_filter(stream, target, "k", checkpoint_dir=ckpt)

    union = waves[0].unionByName(waves[1])
    standing = {
        (r["word"], r["bits"])
        for r in read_stream_sketch(spark, target).collect()
    }
    oneshot = {
        (r["word"], r["bits"]) for r in bloom_build(union, "k").collect()
    }
    assert standing == oneshot

    # zero false negatives probing the STREAMED state
    members = union.distinct()
    assert (
        bloom_probe(read_stream_sketch(spark, target), members, "k").count()
        == members.count()
    )

    # replayed batch id: no-op; fresh checkpoint + recalibration refused
    BloomFilterSink(target, "k")(waves[0], 0)
    assert {
        (r["word"], r["bits"])
        for r in read_stream_sketch(spark, target).collect()
    } == oneshot
    stream = spark.readStream.schema("k string").parquet(str(landing))
    with pytest.raises(ValueError, match="different checkpoint"):
        run_stream_bloom_filter(
            stream, target, "k", checkpoint_dir=str(tmp_path / "ckptB")
        )
    with pytest.raises(ValueError, match="calibration mismatch"):
        BloomFilterSink(target, "k", k=7)(waves[0], 99)


def test_cli_agg_refresh_cms_key(spark, tmp_path, capsys):
    """agg-refresh --cms-key: the frequency sketch maintains from raw
    files at the module calibration, equals the one-shot sketch, and
    heavy-hitter queries work against the refreshed state."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_heavy_hitters,
        cms_sketch,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_refreshed,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    rows = ["hot"] * 500 + [f"tail{i}" for i in range(300)]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"url": rows}), preserve_index=False),
        str(landing / "f1.parquet"),
    )
    main([
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
        "--cms-key", "url",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cms_rows_counted"] == 800

    state = read_refreshed(spark, tmp_path.joinpath("state").as_posix())
    src = spark.createDataFrame([(r,) for r in rows], "url string")
    oneshot = cms_sketch(src, "url", depth=CMS_DEPTH, width=CMS_WIDTH)
    assert {
        (r["row"], r["bucket"]): r["n"] for r in state.collect()
    } == {(r["row"], r["bucket"]): r["n"] for r in oneshot.collect()}

    cands = spark.createDataFrame([("hot",), ("tail1",)], "url string")
    hh = cms_heavy_hitters(
        state, cands, "url", threshold=100, depth=CMS_DEPTH, width=CMS_WIDTH
    )
    assert [r["url"] for r in hh.collect()] == ["hot"]


def test_cli_sketch_refused_on_calibrationless_target(spark, tmp_path, capsys):
    """r9 review regression: a committed PLAIN-agg target carries no
    calibration — a sketch run onto it must be refused (merging would
    corrupt the state and then stamp a calibration over it), not
    silently accepted."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"url": ["a", "b", "b"]}), preserve_index=False
        ),
        str(landing / "f1.parquet"),
    )
    base = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
    ]
    main(base + ["--keys", "url", "--agg", "n=count:*"])
    capsys.readouterr()
    with pytest.raises(SystemExit, match="calibration mismatch"):
        main(base + ["--bloom-key", "url"])


# ---------------------------------------------------------------------------
# Slot-minima coordinated sample (the fourth sketch: uniform sample /
# quantiles / distinct / Jaccard from one <= slots-row min-monoid state)
# ---------------------------------------------------------------------------


def _minima_mod():
    from big_data_processing_with_aws_glue_workshop_spark.operators import sketch

    return sketch


def _keys(spark, lo, hi, payload=True):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("doc_"), "id").alias("k"),
        (F.col("id") * 7 % 1000).cast("double").alias("v"),
    )
    return df if payload else df.select("k")


def test_minima_sample_merge_equals_oneshot_and_duplicate_collapse(spark):
    """Min-monoid laws on the struct state: any split of the input
    merges to EXACTLY the one-shot state (associativity + commutativity
    + idempotence), and duplicated input rows change nothing — the
    sample is of the distinct key set."""
    S = _minima_mod()
    df = _keys(spark, 0, 20_000)
    oneshot = S.minima_sample(df, "k", ["v"], slots=512)

    parts = [
        df.filter(F.crc32(F.col("k")) % 3 == i) for i in range(3)
    ]
    merged = S.minima_merge(
        S.minima_sample(parts[2], "k", ["v"], slots=512),
        S.minima_merge(
            S.minima_sample(parts[0], "k", ["v"], slots=512),
            S.minima_sample(parts[1], "k", ["v"], slots=512),
        ),
    )
    assert merged.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(merged).count() == 0

    doubled = S.minima_sample(df.unionByName(df), "k", ["v"], slots=512)
    assert doubled.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(doubled).count() == 0


def test_minima_distinct_estimate_both_regimes(spark):
    """Rank-minima distinct estimator: linear-counting regime (empty
    slots exist) and order-statistics regime (all slots filled), each
    within ~4 std errors of truth (deterministic given the fixed
    seed — these are exact pins, not flaky tolerances)."""
    S = _minima_mod()
    small = S.minima_sample(_keys(spark, 0, 300), "k", slots=1024)
    est_small = S.minima_distinct_estimate(small, 1024)
    assert abs(est_small - 300) / 300 < 0.10

    big = S.minima_sample(_keys(spark, 0, 60_000), "k", slots=1024)
    est_big = S.minima_distinct_estimate(big, 1024)
    assert abs(est_big - 60_000) / 60_000 < 0.13  # se ~ 1/sqrt(1024) ~ 3%


def test_minima_jaccard_matches_exact_overlap(spark):
    """Same-calibration states are coordinated samples: slot-wise min
    agreement estimates the Jaccard of the two distinct key sets."""
    S = _minima_mod()
    a = S.minima_sample(_keys(spark, 0, 30_000), "k", slots=1024)
    b = S.minima_sample(_keys(spark, 10_000, 40_000), "k", slots=1024)
    est = S.minima_jaccard(a, b)
    exact = 20_000 / 40_000
    assert abs(est - exact) < 0.06  # se ~ sqrt(J(1-J)/1024) ~ 1.6%


def test_sample_quantiles_within_dkw_band(spark):
    """Quantile readout: the sample's empirical quantile of v sits
    within a few DKW standard errors of the exact quantile IN RANK
    TERMS, independent of the value distribution (v here is heavily
    skewed: v^3)."""
    S = _minima_mod()
    df = spark.range(100_000).select(
        F.concat(F.lit("r"), "id").alias("k"),
        (F.pow(F.col("id").cast("double") / 100_000, 3)).alias("v"),
    )
    st = S.minima_sample(df, "k", ["v"], slots=1024)
    qs = S.sample_quantiles(st, "v", [0.1, 0.5, 0.9])
    for q, val in qs.items():
        # invert: the exact rank of the sampled value
        rank = (val ** (1.0 / 3))
        assert abs(rank - q) < 0.05, (q, val, rank)


def test_minima_sample_is_uniform_across_strata(spark):
    """Uniformity: a stratum holding half the distinct keys contributes
    ~half the sample (binomial se ~ 1.6% at 1024 slots)."""
    S = _minima_mod()
    df = _keys(spark, 0, 50_000)
    st = S.minima_sample(df, "k", slots=1024)
    rows = S.sample_rows(st)
    frac = (
        rows.filter(F.substring("key", 5, 9).cast("long") % 2 == 0).count()
        / rows.count()
    )
    assert abs(frac - 0.5) < 0.06


def test_minima_rides_incremental_agg_refresh_from_raw_files(spark, tmp_path):
    """The no-new-framework property: group key = slot, agg = min over
    the struct, transform = sample_minima_pairs — the maintained sample
    EXACTLY equals the one-shot sample of every row ever landed, with
    O(increment) reads and <= slots state rows."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    S = _minima_mod()
    landing = tmp_path / "facts"
    landing.mkdir()
    bm = JobBookmark(str(tmp_path / "bm.json"), "sample")
    target = str(tmp_path / "sample_state")

    waves = [_keys(spark, 0, 8_000), _keys(spark, 6_000, 15_000)]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        incremental_agg_refresh(
            spark,
            bm,
            str(landing / "*.parquet"),
            ["slot"],
            {"r": ("min", "r")},
            target,
            transform=lambda df: S.sample_minima_pairs(
                df, "k", ["v"], slots=512
            ),
        )

    state = read_refreshed(spark, target)
    oneshot = S.minima_sample(
        waves[0].unionByName(waves[1]), "k", ["v"], slots=512
    )
    assert state.count() <= 512
    assert state.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(state).count() == 0


def test_cli_agg_refresh_sample_key(spark, tmp_path, capsys):
    """agg-refresh --sample-key: maintains the sample from raw files,
    reports the rank-minima distinct estimate, pins calibration (a
    later --cms-key run onto the sample target is refused)."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    base = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
    ]
    for i, (lo, hi) in enumerate([(0, 4_000), (3_000, 9_000)]):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"url": [f"u{j}" for j in range(lo, hi)]}),
                preserve_index=False,
            ),
            str(landing / f"w{i}.parquet"),
        )
        main(base + ["--sample-key", "url"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_files"] == 1
    est = out["distinct_estimate_minima"]
    assert abs(est - 9_000) / 9_000 < 0.10
    assert out["state_rows"] <= 4_096

    with pytest.raises(SystemExit, match="calibration mismatch"):
        main(base + ["--cms-key", "url"])


def test_streaming_minima_sink_equals_oneshot(spark, tmp_path):
    """Streaming sample maintenance: drained waves leave a standing
    sample EXACTLY equal to the one-shot build over all data; replay is
    a no-op; fresh checkpoint and recalibration are refused."""
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        MinimaSampleSink,
        read_stream_sketch,
        run_stream_minima_sample,
    )

    S = _minima_mod()
    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "sample")
    ckpt = str(tmp_path / "ckpt")
    waves = [
        spark.range(0, 3_000).select(F.concat(F.lit("s"), "id").alias("k")),
        spark.range(2_000, 7_000).select(F.concat(F.lit("s"), "id").alias("k")),
    ]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        stream = spark.readStream.schema("k string").parquet(str(landing))
        run_stream_minima_sample(stream, target, "k", checkpoint_dir=ckpt)

    union = waves[0].unionByName(waves[1])
    oneshot = {
        (r["slot"], tuple(r["r"]))
        for r in S.minima_sample(union, "k").collect()
    }
    standing = {
        (r["slot"], tuple(r["r"]))
        for r in read_stream_sketch(spark, target).collect()
    }
    assert standing == oneshot

    MinimaSampleSink(target, "k")(waves[0], 0)  # replayed batch: no-op
    assert {
        (r["slot"], tuple(r["r"]))
        for r in read_stream_sketch(spark, target).collect()
    } == oneshot
    stream = spark.readStream.schema("k string").parquet(str(landing))
    with pytest.raises(ValueError, match="different checkpoint"):
        run_stream_minima_sample(
            stream, target, "k", checkpoint_dir=str(tmp_path / "ckptB")
        )
    with pytest.raises(ValueError, match="calibration mismatch"):
        MinimaSampleSink(target, "k", slots=128)(waves[0], 99)


def test_sampled_quantile_profile_matches_duckdb_oracle(spark):
    """The r10-bound driver query (PENDING registration — paired with
    the deterministic_sample retirement, see queries/__init__.py):
    Spark slot-minima sample + positional quantile readout hash-equals
    the DuckDB twin at sf0.01 AND sf0.001 under the driver's exact
    compare semantics (oracle_harness is dtype-kind-strict)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.relational import (
        SAMPLED_QUANTILE_PROFILE_ORACLE,
        q_sampled_quantile_profile,
    )
    from tests.oracle_harness import compare

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        compare(
            q_sampled_quantile_profile(spark, sf),
            SAMPLED_QUANTILE_PROFILE_ORACLE,
            sf,
        )


def test_minima_distinct_estimate_refuses_wrong_slots(spark):
    """A slots value that contradicts the state raises instead of
    silently skewing the estimate."""
    import pytest

    S = _minima_mod()
    st = S.minima_sample(_keys(spark, 0, 5_000), "k", slots=1024)
    with pytest.raises(ValueError, match="inconsistent with slots"):
        S.minima_distinct_estimate(st, 256)


def test_streaming_ngram_histogram_drift_monitor(spark, tmp_path):
    """The streaming drift monitor: two drained document waves leave a
    standing (source, bucket) histogram whose drift report is
    BYTE-IDENTICAL to source_divergence_audit over everything streamed
    (the shared jsd_from_histogram core); the standing histogram equals
    the one-shot histogram of the union; a replayed batch id is a no-op;
    a recalibrated sink is refused."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        ngram_bucket_histogram,
        source_divergence_audit,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        NgramHistogramSink,
        read_stream_sketch,
        run_stream_ngram_histogram,
        stream_drift_report,
    )

    rng = random.Random(23)
    va = [f"apple{j}" for j in range(60)]
    vb = [f"zebra{j}" for j in range(60)]

    def _wave(n, off):
        rows = []
        for i in range(n):
            vocab = va if (off + i) % 2 == 0 else vb
            src = "even_src" if (off + i) % 2 == 0 else "odd_src"
            rows.append((src, " ".join(rng.choice(vocab) for _ in range(15))))
        return spark.createDataFrame(rows, "source string, text string")

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target_dir = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    waves = [_wave(150, 0), _wave(150, 300)]
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        stream = spark.readStream.schema("source string, text string").parquet(
            str(landing)
        )
        run_stream_ngram_histogram(
            stream, target_dir, checkpoint_dir=ckpt, n_buckets=512
        )

    union = waves[0].unionByName(waves[1])
    standing = {
        (r["source"], r["b"]): r["c"]
        for r in read_stream_sketch(spark, target_dir).collect()
    }
    oneshot = {
        (r["source"], r["b"]): r["c"]
        for r in ngram_bucket_histogram(union, n_buckets=512).collect()
    }
    assert standing == oneshot

    # the live drift report == the batch audit over everything streamed
    target = spark.createDataFrame(
        [(" ".join(rng.choice(va) for _ in range(15)),) for _ in range(40)],
        "text string",
    )
    live = {
        r["source"]: (r["n_grams"], r["jsd_micro"])
        for r in stream_drift_report(spark, target_dir, target).collect()
    }
    batch = {
        r["source"]: (r["n_grams"], r["jsd_micro"])
        for r in source_divergence_audit(union, target, n_buckets=512).collect()
    }
    assert live == batch
    # and the apple-matched source drifts far less than the zebra one
    assert live["even_src"][1] * 5 < live["odd_src"][1]

    # replayed batch id: no-op
    NgramHistogramSink(target_dir, n_buckets=512)(waves[0], 0)
    assert {
        (r["source"], r["b"]): r["c"]
        for r in read_stream_sketch(spark, target_dir).collect()
    } == oneshot

    # recalibrated sink refused
    with pytest.raises(ValueError, match="calibration mismatch"):
        NgramHistogramSink(target_dir, n_buckets=256)(waves[0], 99)


@pytest.mark.slow
def test_streaming_budget_admission(spark, tmp_path):
    """r14 streaming selection: each drained wave takes the BATCH
    stratified cut against the budgets remaining after earlier waves —
    the sink state must equal a driver-side fold of
    stratified_budget_selection over the same waves (the math cannot
    fork), per-source mass never exceeds its budget at any point,
    exhausted sources admit nothing, replayed batch ids are no-ops, a
    recalibrated sink is refused, and the wave-greedy contract is shown
    honestly: the streaming admitted set DIFFERS from the batch
    operator over the union when later waves carry better documents."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_report,
        read_admitted,
        run_stream_budget_admission,
    )

    # wave 0 is mediocre (score 50), wave 1 excellent (score 90): the
    # greedy stream must fill budgets from wave 0; the global batch
    # ranking would prefer wave 1 — both facts are asserted
    def wave(n, off, score):
        rows = [
            (off + i, "a" if i % 2 == 0 else "b", float(score), 10)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, score double, n_tokens long"
        )

    budgets = {"a": 100, "b": 60}
    waves = [wave(30, 0, 50.0), wave(30, 100, 90.0), wave(30, 200, 70.0)]

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target_dir = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    for i, w in enumerate(waves):
        pq.write_table(
            pa.Table.from_pandas(w.toPandas(), preserve_index=False),
            str(landing / f"w{i}.parquet"),
        )
        run_stream_budget_admission(
            spark.readStream.schema(
                "doc_id long, source string, score double, n_tokens long"
            ).parquet(str(landing)),
            target_dir,
            budgets,
            "score",
            checkpoint_dir=ckpt,
        )

    # driver-side fold of the BATCH operator over the same waves
    spent = {s: 0 for s in budgets}
    expected = []
    for i, w in enumerate(waves):
        rem = {s: budgets[s] - spent[s] for s in budgets}
        adm = stratified_budget_selection(w, rem, "score").collect()
        for r in adm:
            expected.append(
                (
                    r["doc_id"],
                    r["source"],
                    r["score"],
                    r["n_tokens"],
                    r["cum_tokens"] + spent[r["source"]],
                    i,
                )
            )
        for s in budgets:
            spent[s] += sum(r["n_tokens"] for r in adm if r["source"] == s)
    got = [
        (
            r["doc_id"],
            r["source"],
            r["score"],
            r["n_tokens"],
            r["cum_tokens"],
            r["admitted_batch"],
        )
        for r in read_admitted(spark, target_dir).collect()
    ]
    assert sorted(got) == sorted(expected)

    # budgets respected and exhausted: 10 a-docs (100) + 6 b-docs (60),
    # all from wave 0 (its 15+15 docs already cover both budgets)
    rep = admission_report(target_dir)
    assert rep == {
        "a": {"budget": 100, "spent": 100, "remaining": 0},
        "b": {"budget": 60, "spent": 60, "remaining": 0},
    }
    assert all(r[5] == 0 for r in got)  # later waves admitted nothing
    assert {r[0] for r in got} <= set(range(0, 30))

    # wave-greedy honesty: the global batch ranking prefers wave 1
    union = waves[0].unionByName(waves[1]).unionByName(waves[2])
    global_sel = {
        r["doc_id"]
        for r in stratified_budget_selection(union, budgets, "score").collect()
    }
    assert global_sel <= set(range(100, 130))
    assert global_sel.isdisjoint({r[0] for r in got})

    # replayed batch id: no-op
    BudgetAdmissionSink(target_dir, budgets, "score")(waves[1], 0)
    assert sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in read_admitted(spark, target_dir).collect()
    ) == sorted((g[0], g[4]) for g in got)

    # recalibrated sink refused
    with pytest.raises(ValueError, match="calibration mismatch"):
        BudgetAdmissionSink(target_dir, {"a": 9, "b": 9}, "score")(waves[0], 99)


@pytest.mark.slow
def test_streaming_curriculum_admission(spark, tmp_path):
    """r16 (r15 verdict stretch #5): phase-ordered wave-greedy admission.
    Pinned: (1) the sink's standing state equals a DRIVER-SIDE fold of
    the batch curriculum operator over the same waves against remaining
    budgets (the per-wave cut IS the batch op — semantics cannot fork);
    (2) exclusivity: each doc admitted to at most one phase, wave docs
    overflow to the next-priority phase only when the better phase's
    source budget is exhausted; (3) per-(phase, source) spent <= budget
    after every wave; (4) replayed batch ids are no-ops; (5) a
    recalibrated phase list is refused; (6) zero-token docs are
    inadmissible; (7) the per-wave phase caches are released (no pin
    accumulation across waves)."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        curriculum_phase_selection,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        CurriculumAdmissionSink,
        curriculum_admission_report,
        read_admitted,
        run_stream_curriculum_admission,
    )
    from big_data_processing_with_aws_glue_workshop_spark.util import _LIVE_CACHES

    schema = "doc_id long, source string, score double, n_tokens long"
    phases = [
        ("anneal", {"a": 30, "b": 20}),
        ("bulk", {"a": 50, "b": 40}),
    ]
    # wave 0: a's best docs fill anneal(a) exactly (3 x 10), next two
    # overflow to bulk(a); b sends 2 docs -> anneal(b)
    w0_rows = (
        [(i, "a", 100.0 - i, 10) for i in range(1, 6)]
        + [(i, "b", 80.0 - i, 10) for i in range(6, 8)]
        + [(99, "a", 999.0, 0)]  # zero-token: inadmissible at any score
    )
    # wave 1: anneal(a) is exhausted -> a docs go to bulk(a) until IT
    # exhausts; b fills anneal(b) then bulk(b)
    w1_rows = [(i, "a", 200.0 - i, 10) for i in range(10, 16)] + [
        (i, "b", 90.0 - i, 10) for i in range(16, 22)
    ]
    waves = [
        spark.createDataFrame(w0_rows, schema),
        spark.createDataFrame(w1_rows, schema),
    ]

    target_dir = str(tmp_path / "cadmitted")
    sink = CurriculumAdmissionSink(target_dir, phases, "score")
    n_cached_before = len(_LIVE_CACHES)
    for i, w in enumerate(waves):
        sink(w, i)
        # (7) no cache-pin accumulation across waves
        assert len(_LIVE_CACHES) == n_cached_before

    got = {
        (r["doc_id"], r["source"]): (r["phase"], r["admitted_batch"])
        for r in read_admitted(spark, target_dir).collect()
    }

    # (1) driver-side fold of the BATCH operator over the same waves
    spent: dict = {p: {s: 0 for s in b} for p, b in phases}
    want: dict = {}
    for i, w in enumerate(waves):
        remaining = [
            (p, {s: b[s] - spent[p][s] for s in b}) for p, b in phases
        ]
        cut = curriculum_phase_selection(
            w.filter("n_tokens > 0"), remaining, "score"
        ).collect()
        for r in cut:
            want[(r["doc_id"], r["source"])] = (r["phase"], i)
            spent[r["phase"]][r["source"]] += r["n_tokens"]
    assert got == want

    # (2) exclusivity + the constructed overflow story
    assert len(got) == len(set(got))  # one row per (doc, source)
    by_phase = {}
    for (doc, src), (phase, _) in got.items():
        by_phase.setdefault((phase, src), set()).add(doc)
    assert by_phase[("anneal", "a")] == {1, 2, 3}  # wave-0 best three
    assert by_phase[("bulk", "a")] == {4, 5, 10, 11, 12}  # overflow + w1
    # w0 spent anneal(b)'s full 20 -> exhausted BEFORE wave 1, so every
    # wave-1 b doc lands in bulk (best four of six fit its 40)
    assert by_phase[("anneal", "b")] == {6, 7}
    assert by_phase[("bulk", "b")] == {16, 17, 18, 19}
    assert (99, "a") not in got  # (6) zero-token inadmissible

    # (3) per-(phase, source) spent <= budget, and the report agrees
    rep = curriculum_admission_report(target_dir)
    for p, budgets in phases:
        for s, b in budgets.items():
            assert rep[p][s]["spent"] <= b
    assert rep["anneal"]["a"] == {"budget": 30, "spent": 30, "remaining": 0}
    assert rep["bulk"]["a"] == {"budget": 50, "spent": 50, "remaining": 0}
    assert rep["anneal"]["b"] == {"budget": 20, "spent": 20, "remaining": 0}
    assert rep["bulk"]["b"] == {"budget": 40, "spent": 40, "remaining": 0}

    # (4) replay no-op
    before = sorted(got)
    sink(waves[1], 1)
    after = sorted(
        (r["doc_id"], r["source"])
        for r in read_admitted(spark, target_dir).collect()
    )
    assert after == before

    # (5) recalibrated phase list refused (same budgets, different order)
    with pytest.raises(ValueError, match="calibration mismatch"):
        CurriculumAdmissionSink(
            target_dir, list(reversed(phases)), "score"
        )(waves[0], 5)

    # constructor refusals
    with pytest.raises(ValueError, match="non-empty"):
        CurriculumAdmissionSink(str(tmp_path / "x"), [], "score")
    with pytest.raises(ValueError, match="duplicate phase names"):
        CurriculumAdmissionSink(
            str(tmp_path / "x"), [("p", {"a": 1}), ("p", {"a": 2})], "score"
        )
    with pytest.raises(ValueError, match="phase-label column"):
        CurriculumAdmissionSink(
            str(tmp_path / "x"), phases, "score", source_col="phase"
        )

    # availableNow drain path (run_stream_curriculum_admission) composes
    # on a fresh target: one landing, drained via readStream
    landing = tmp_path / "landing"
    landing.mkdir()
    waves[0].coalesce(1).write.parquet(str(landing / "w0"))
    stream = spark.readStream.schema(waves[0].schema).parquet(
        str(landing / "*")
    )
    t2 = str(tmp_path / "cadmitted2")
    run_stream_curriculum_admission(
        stream, t2, phases, "score",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    rep2 = curriculum_admission_report(t2)
    assert rep2["anneal"]["a"]["spent"] == 30
    assert rep2["bulk"]["a"]["spent"] == 20  # docs 4, 5 overflowed


def test_recalibrate_admission(spark, tmp_path):
    """r15: the sink refuses a recalibrated configuration by design;
    recalibrate_admission is the sanctioned migration path. Pinned:
    shrinking evicts exactly the quality re-cut's complement (score
    DESC, tiebreak — NOT admission order), growing keeps every admitted
    doc and raises headroom, a source with admitted rows missing from
    the new budgets raises (evict explicitly with 0, never by
    omission), the next drain composes against the new remaining
    budgets under a sink built with the new config while the old config
    is refused, and stream replay gating survives the maintenance
    commit (the version bump consumes no stream id)."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_report,
        read_admitted,
        recalibrate_admission,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "admitted")
    budgets = {"a": 50, "b": 30}
    sink = BudgetAdmissionSink(target_dir, budgets, "score")
    # wave 0: a gets docs 1-5 (scores 50..46), b gets 6-8 (scores 40..38)
    w0 = spark.createDataFrame(
        [(i, "a", 51.0 - i, 10) for i in range(1, 6)]
        + [(i, "b", 46.0 - i, 10) for i in range(6, 9)],
        schema,
    )
    sink(w0, 0)
    assert admission_report(target_dir) == {
        "a": {"budget": 50, "spent": 50, "remaining": 0},
        "b": {"budget": 30, "spent": 30, "remaining": 0},
    }

    # no state / bad budget refusals
    with pytest.raises(ValueError, match="no committed admission state"):
        recalibrate_admission(spark, str(tmp_path / "nope"), {"a": 1})
    with pytest.raises(ValueError, match="must be >= 0"):
        recalibrate_admission(spark, target_dir, {"a": -1, "b": 0})
    # coverage rule: b has admitted rows, must be named
    with pytest.raises(ValueError, match="missing from budgets"):
        recalibrate_admission(spark, target_dir, {"a": 50})

    # shrink a to 30 (evicts its two LOWEST-scoring docs: 4, 5), grow b
    # to 60, add a brand-new source c
    out = recalibrate_admission(
        spark, target_dir, {"a": 30, "b": 60, "c": 40}
    )
    assert out == {
        "evicted_docs": 2,
        "kept_docs": 6,
        "spent": {"a": 30, "b": 30, "c": 0},
    }
    got = {
        r["doc_id"]: r["admitted_batch"]
        for r in read_admitted(spark, target_dir).collect()
    }
    assert sorted(got) == [1, 2, 3, 6, 7, 8]  # 4 and 5 evicted
    assert set(got.values()) == {0}  # original provenance carried
    rep = admission_report(target_dir)
    assert rep["a"] == {"budget": 30, "spent": 30, "remaining": 0}
    assert rep["b"] == {"budget": 60, "spent": 30, "remaining": 30}
    assert rep["c"] == {"budget": 40, "spent": 0, "remaining": 40}

    # the OLD sink config is now refused; the NEW one composes: wave 1
    # fills b's new headroom and starts c, a admits nothing
    with pytest.raises(ValueError, match="calibration mismatch"):
        sink(w0, 1)
    sink2 = BudgetAdmissionSink(target_dir, {"a": 30, "b": 60, "c": 40}, "score")
    w1 = spark.createDataFrame(
        [(20, "a", 99.0, 10), (21, "b", 99.0, 10), (22, "b", 98.0, 10),
         (23, "b", 97.0, 10), (24, "c", 99.0, 10)],
        schema,
    )
    sink2(w1, 1)
    rep = admission_report(target_dir)
    assert rep["a"]["spent"] == 30  # exhausted: doc 20 rejected
    assert rep["b"]["spent"] == 60  # 21, 22, 23 admitted
    assert rep["c"]["spent"] == 10  # 24 admitted
    # replay gate keyed on the stream id, not the (bumped) version:
    # re-delivering batch 1 is a no-op
    before = sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    )
    sink2(w1, 1)
    after = sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    )
    assert after == before == [1, 2, 3, 6, 7, 8, 21, 22, 23, 24]


def test_dsir_fit_from_stream_parity(spark, tmp_path):
    """r15: the standing NgramHistogramSink grid uses the exact DSIR
    featurizer, so summing it over sources IS the corpus-side model —
    dsir_fit_from_stream must be BYTE-IDENTICAL to dsir_log_ratio_table
    over everything ever streamed (the shared _log_ratio_from_histograms
    arithmetic), and a selector fed the stream-fitted table must pick
    the same documents as a fit-inline run. Also pinned: the per-source
    restriction equals a batch fit on that source's slice, unknown
    sources raise, and the sink's pinned bucketing governs the target
    featurization."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_log_ratio_table,
        dsir_select,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        NgramHistogramSink,
        dsir_fit_from_stream,
    )

    def wave(n, off, stem_even, stem_odd):
        rows = []
        for i in range(n):
            stem = stem_even if (off + i) % 2 == 0 else stem_odd
            src = "even_src" if (off + i) % 2 == 0 else "odd_src"
            rows.append(
                (
                    off + i,
                    src,
                    " ".join(f"{stem}{(off + i + j) % 40}" for j in range(12)),
                )
            )
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    target_dir = str(tmp_path / "hist")
    sink = NgramHistogramSink(target_dir, n_buckets=512)
    waves = [wave(120, 0, "apple", "zebra"), wave(120, 200, "apple", "zebra")]
    for i, w in enumerate(waves):
        sink(w, i)

    target = spark.createDataFrame(
        [(k, " ".join(f"apple{j % 40}" for j in range(12))) for k in range(8)],
        "tid long, text string",
    )
    union = waves[0].unionByName(waves[1])

    stream_lam = dsir_fit_from_stream(spark, target_dir, target)
    batch_lam = dsir_log_ratio_table(union, target, n_buckets=512)
    assert stream_lam == batch_lam  # bit-for-bit, all 512 buckets

    # the stream-fitted table drives selection identically to fit-inline
    got = {
        r["doc_id"]
        for r in dsir_select(
            union, None, k=30, seed=7, n_buckets=512, log_ratio=stream_lam
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in dsir_select(union, target, k=30, seed=7, n_buckets=512).collect()
    }
    assert got == want

    # per-source restriction == batch fit on that slice alone
    even_lam = dsir_fit_from_stream(
        spark, target_dir, target, sources=["even_src"]
    )
    even_batch = dsir_log_ratio_table(
        union.filter("source = 'even_src'"), target, n_buckets=512
    )
    assert even_lam == even_batch
    assert even_lam != stream_lam  # the restriction actually bites

    # a target whose text lives in a differently-named column fits
    # identically through target_text_col (bucketing stays pinned by the
    # sink calibration; column naming is the caller's — r15 review)
    renamed = target.withColumnRenamed("text", "body")
    assert (
        dsir_fit_from_stream(
            spark, target_dir, renamed, target_text_col="body"
        )
        == stream_lam
    )

    # refusals: unknown source, bad alpha, no committed state
    import pytest

    with pytest.raises(ValueError, match="not present in the streamed"):
        dsir_fit_from_stream(spark, target_dir, target, sources=["ghost"])
    with pytest.raises(ValueError, match="alpha"):
        dsir_fit_from_stream(spark, target_dir, target, alpha=0)
    with pytest.raises(ValueError, match="no committed histogram"):
        dsir_fit_from_stream(spark, str(tmp_path / "nowhere"), target)


@pytest.mark.slow
def test_recalibrate_admission_refuses_inflight_drain(spark, tmp_path, monkeypatch):
    """r15-ADVICE medium: recalibrate_admission and the drain sink both
    commit at pointer.batch_id + 1 from their own pointer read, so a
    drain landing while a recalibration computes would make the two
    commits collide on one version id — commit_snapshot would rmtree the
    loser's just-published dir and the new budgets/spent would be lost
    SILENTLY. Pinned: the pre-commit pointer re-read detects the
    interleaving and the recalibration refuses cleanly (nothing written),
    leaving the drain's commit fully intact; re-running after the drain
    settles succeeds."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries import textops
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_report,
        read_admitted,
        recalibrate_admission,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "admitted")
    budgets = {"a": 50}
    sink = BudgetAdmissionSink(target_dir, budgets, "score")
    w0 = spark.createDataFrame(
        [(i, "a", 10.0 - i, 10) for i in range(1, 4)], schema
    )
    sink(w0, 0)

    # simulate the race: while the recalibration is mid-computation
    # (inside its re-cut), a drain commits wave 1 against the CURRENT
    # calibration. The wrapper interleaves exactly once, then delegates.
    real = textops.stratified_budget_selection
    w1 = spark.createDataFrame([(9, "a", 9.5, 10)], schema)
    state = {"fired": False}

    def interleaving(*args, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            sink(w1, 1)  # the in-flight drain lands mid-recalibration
        return real(*args, **kwargs)

    monkeypatch.setattr(textops, "stratified_budget_selection", interleaving)
    with pytest.raises(RuntimeError, match="changed while"):
        recalibrate_admission(spark, target_dir, {"a": 20})

    # the drain's commit survived untouched: wave-1 doc admitted, spent
    # counters include it, standing table readable
    assert state["fired"]
    rep = admission_report(target_dir)
    assert rep["a"]["spent"] == 40
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    ) == [1, 2, 3, 9]

    # after the drain settles the same recalibration succeeds (keeps the
    # two best-scoring docs within the shrunk budget: 9 at 9.5, 1 at 9.0)
    out = recalibrate_admission(spark, target_dir, {"a": 20})
    assert out == {"evicted_docs": 2, "kept_docs": 2, "spent": {"a": 20}}
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    ) == [1, 9]


def test_recalibrate_admission_duplicate_doc_rows(spark, tmp_path):
    """r15-ADVICE low: the sink never dedups doc ids across waves, so a
    doc delivered (and admitted) in two waves has two standing rows.
    recalibrate_admission recovers admitted_batch by joining back to the
    standing table on (id, source) — unaggregated, that join fans out
    multiplicatively and inflates kept_docs/spent past the re-cut mass
    (spent could then exceed the new budget). Pinned: the lookup is
    aggregated to one row per (id, source) first (F.min = earliest
    admitting wave), so kept/spent equal the re-cut exactly."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        read_admitted,
        recalibrate_admission,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "admitted")
    sink = BudgetAdmissionSink(target_dir, {"a": 50}, "score")
    # the SAME doc 1 arrives in waves 0 and 1; both admissions land
    w = spark.createDataFrame([(1, "a", 9.0, 10)], schema)
    sink(w, 0)
    sink(w, 1)
    standing = read_admitted(spark, target_dir).collect()
    assert len(standing) == 2  # the duplicate standing rows are real

    # recalibration over the 2-row standing table: the re-cut keeps both
    # rows (mass 20 <= 50); without the lookup aggregation each re-cut
    # row would join 2 standing rows -> kept=4, spent=40
    out = recalibrate_admission(spark, target_dir, {"a": 50})
    assert out == {"evicted_docs": 0, "kept_docs": 2, "spent": {"a": 20}}
    rows = read_admitted(spark, target_dir).collect()
    assert len(rows) == 2
    # provenance resolves to the EARLIEST admitting wave for both rows
    assert sorted(r["admitted_batch"] for r in rows) == [0, 0]


def test_admission_regret_readout(spark, tmp_path):
    """r14 verdict stretch #7: the wave-greedy vs global-ranking
    divergence was documented and pinned as a fact; admission_regret
    turns it into per-source numbers. Constructed divergence fixture
    (wave 0 mediocre score 50, wave 1 excellent score 90, budgets filled
    entirely by wave 0): hindsight swaps EVERY admitted doc, and the
    counts/masses are Python-mirrored exactly. Also pinned: regret in
    score mass is non-negative per source, zero-token docs in the corpus
    never show up as false regret, and an un-admitted budgeted source
    still gets a zero-filled report row."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_regret,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    # source a: budget 30 (3 docs); source ghost: budgeted, never seen
    budgets = {"a": 30, "ghost": 100}
    target_dir = str(tmp_path / "admitted")
    sink = BudgetAdmissionSink(target_dir, budgets, "score")
    w0 = spark.createDataFrame(
        [(1, "a", 50.0, 10), (2, "a", 49.0, 10), (3, "a", 48.0, 10),
         (4, "a", 47.0, 10)],
        schema,
    )
    w1 = spark.createDataFrame(
        [(11, "a", 90.0, 10), (12, "a", 89.0, 10), (13, "a", 88.0, 10),
         # zero-token doc with a TOP score: excluded from admission AND
         # from the hindsight cut — must not appear as regret
         (14, "a", 99.0, 0)],
        schema,
    )
    sink(w0, 0)
    sink(w1, 1)

    corpus = w0.unionByName(w1)
    rows = {r["source"]: r.asDict() for r in admission_regret(
        spark, target_dir, corpus
    ).collect()}
    a = rows["a"]
    # greedy admitted docs 1,2,3 (wave 0); hindsight picks 11,12,13
    assert a["admitted_docs"] == 3 and a["hindsight_docs"] == 3
    assert a["common_docs"] == 0
    assert a["only_streaming_docs"] == 3 and a["only_hindsight_docs"] == 3
    assert a["admitted_tokens"] == 30 and a["hindsight_tokens"] == 30
    assert a["admitted_score_sum"] == 50.0 + 49.0 + 48.0
    assert a["hindsight_score_sum"] == 90.0 + 89.0 + 88.0
    assert a["hindsight_score_sum"] >= a["admitted_score_sum"]
    # budgeted-but-never-seen source: zero-filled row, not absent
    g = rows["ghost"]
    assert g["admitted_docs"] == 0 and g["hindsight_docs"] == 0
    assert g["admitted_score_sum"] == 0.0
    # no admission state yet -> loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no committed admission state"):
        admission_regret(spark, str(tmp_path / "nowhere"), corpus)


def test_admission_regret_duplicate_doc_rows_not_fanned(spark, tmp_path):
    """r16-ADVICE low: a doc admitted in two waves has two standing rows;
    unaggregated, the full_outer regret join fanned the single hindsight
    row across them — inflating hindsight_docs/common_docs/
    hindsight_tokens for that cell. Pinned: the admitted side is
    aggregated to one row per (id, source) first, so the readout counts
    the doc once on both sides."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_regret,
        read_admitted,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "admitted")
    sink = BudgetAdmissionSink(target_dir, {"a": 50}, "score")
    w = spark.createDataFrame([(1, "a", 9.0, 10)], schema)
    sink(w, 0)
    sink(w, 1)  # same doc re-delivered and re-admitted: 2 standing rows
    assert read_admitted(spark, target_dir).count() == 2
    rows = {
        r["source"]: r.asDict()
        for r in admission_regret(spark, target_dir, w).collect()
    }
    a = rows["a"]
    # one doc, both sides; NOT hindsight_docs == 2 / common_docs == 2
    assert a["admitted_docs"] == 1 and a["hindsight_docs"] == 1
    assert a["common_docs"] == 1
    assert a["admitted_tokens"] == 10 and a["hindsight_tokens"] == 10


@pytest.mark.slow
def test_curriculum_regret_duplicate_doc_rows_not_fanned(spark, tmp_path):
    """Same pin for the curriculum readout: duplicate standing rows in
    one (phase, source) cell must not fan the hindsight row out."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        CurriculumAdmissionSink,
        curriculum_admission_regret,
        read_admitted,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "cadm")
    sink = CurriculumAdmissionSink(target_dir, [("p1", {"a": 50})], "score")
    w = spark.createDataFrame([(1, "a", 9.0, 10)], schema)
    sink(w, 0)
    sink(w, 1)
    assert read_admitted(spark, target_dir).count() == 2
    rows = {
        (r["phase"], r["source"]): r.asDict()
        for r in curriculum_admission_regret(spark, target_dir, w).collect()
    }
    c = rows[("p1", "a")]
    assert c["admitted_docs"] == 1 and c["hindsight_docs"] == 1
    assert c["common_docs"] == 1
    assert c["admitted_tokens"] == 10 and c["hindsight_tokens"] == 10


def test_drain_refuses_mid_batch_recalibration(spark, tmp_path, monkeypatch):
    """r16-ADVICE low: the drain side of the recalibrate-vs-drain race —
    a recalibration that commits while a batch is draining must make the
    DRAIN refuse loudly at its pre-commit pointer re-read (otherwise the
    drain writes at the stale version and commit_snapshot's stale-leftover
    cleanup silently destroys the recalibration's newer snapshot)."""
    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming import (
        selection as sel,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "raced")
    sink = sel.BudgetAdmissionSink(target_dir, {"a": 100}, "score")
    sink(spark.createDataFrame([(1, "a", 9.0, 10)], schema), 0)

    orig = sel.read_pointer
    state = {"raced": False}

    def racing_read(path):
        p = orig(path)
        if not state["raced"]:
            # fire exactly once, at the SINK's initial read: a
            # recalibration commits while this batch is mid-drain
            state["raced"] = True
            sel.recalibrate_admission(spark, target_dir, {"a": 100})
        return p

    monkeypatch.setattr(sel, "read_pointer", racing_read)
    before = orig(target_dir)
    with _pytest.raises(RuntimeError, match="changed while"):
        sink(spark.createDataFrame([(2, "a", 8.0, 10)], schema), 1)
    # nothing written by the refused drain: the recalibration's commit
    # is the live pointer, intact
    monkeypatch.setattr(sel, "read_pointer", orig)
    after = orig(target_dir)
    assert after["batch_id"] == before["batch_id"] + 1
    assert sel.read_admitted(spark, target_dir).count() == 1


def test_simhash_sweep_refuses_insufficient_blocks(spark):
    """r16-ADVICE low: the docstring's 'refuses' promise for an explicit
    n_blocks <= max(hammings) is an eager ValueError (not the pair
    pass's assert, which python -O strips)."""
    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        simhash_threshold_sweep,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="must exceed max"):
        simhash_threshold_sweep(docs, [2, 3], n_blocks=3)


@pytest.mark.slow
def test_recalibrate_curriculum_admission(spark, tmp_path, monkeypatch):
    """r16: the curriculum sink's sanctioned migration path, with the
    r15-ADVICE hardening built in from day one. Pinned: phase
    membership is recomputed from scratch under the new priority order
    (docs MOVE between phases — counted), shrinking evicts exactly the
    re-cut complement, provenance keeps the earliest admitted_batch,
    the per-phase coverage rule refuses an omitted source, the flat
    table / dup names / negative budget / no-state refusals, the
    in-flight-drain commit guard (pointer re-read), the replay gate
    carries forward, and the next drain composes under a sink built
    with the new calibration while the old one is refused."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries import textops
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        CurriculumAdmissionSink,
        curriculum_admission_report,
        read_admitted,
        recalibrate_curriculum_admission,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    phases = [("anneal", {"a": 30}), ("bulk", {"a": 20})]
    target_dir = str(tmp_path / "cadm")
    sink = CurriculumAdmissionSink(target_dir, phases, "score")
    w0 = spark.createDataFrame(
        [(i, "a", 10.0 - i, 10) for i in range(1, 6)], schema
    )
    sink(w0, 0)  # anneal {1,2,3}, bulk {4,5}

    # refusals first (state untouched)
    with pytest.raises(ValueError, match="no committed admission state"):
        recalibrate_curriculum_admission(
            spark, str(tmp_path / "nope"), phases
        )
    with pytest.raises(ValueError, match="non-empty"):
        recalibrate_curriculum_admission(spark, target_dir, [])
    with pytest.raises(ValueError, match="duplicate phase names"):
        recalibrate_curriculum_admission(
            spark, target_dir, [("p", {"a": 1}), ("p", {"a": 2})]
        )
    with pytest.raises(ValueError, match="must be >= 0"):
        recalibrate_curriculum_admission(
            spark, target_dir, [("p", {"a": -1})]
        )
    # coverage: source a has admitted rows — every phase must name it
    with pytest.raises(ValueError, match="missing from budgets"):
        recalibrate_curriculum_admission(
            spark, target_dir, [("anneal", {"b": 10}), ("bulk", {"a": 20})]
        )
    flat_dir = str(tmp_path / "flat")
    BudgetAdmissionSink(flat_dir, {"a": 20}, "score")(w0, 0)
    with pytest.raises(ValueError, match="FLAT admission table"):
        recalibrate_curriculum_admission(spark, flat_dir, phases)

    # re-cut under a reshaped curriculum: anneal shrinks to 20 (top two
    # docs), bulk grows to 30 — doc 3 MOVES anneal -> bulk, nothing
    # evicted; a brand-new source b appears with headroom
    out = recalibrate_curriculum_admission(
        spark, target_dir,
        [("anneal", {"a": 20, "b": 10}), ("bulk", {"a": 30, "b": 0})],
    )
    assert out == {
        "evicted_docs": 0,
        "kept_docs": 5,
        "moved_docs": 1,
        "spent": {"anneal": {"a": 20, "b": 0}, "bulk": {"a": 30, "b": 0}},
    }
    got = {
        r["doc_id"]: (r["phase"], r["admitted_batch"])
        for r in read_admitted(spark, target_dir).collect()
    }
    assert got == {
        1: ("anneal", 0), 2: ("anneal", 0),
        3: ("bulk", 0), 4: ("bulk", 0), 5: ("bulk", 0),
    }
    rep = curriculum_admission_report(target_dir)
    assert rep["anneal"]["b"] == {"budget": 10, "spent": 0, "remaining": 10}

    # shrink both: anneal {1}, bulk {2} — three evicted, doc 2 moves
    out2 = recalibrate_curriculum_admission(
        spark, target_dir,
        [("anneal", {"a": 10, "b": 0}), ("bulk", {"a": 10, "b": 0})],
    )
    assert out2 == {
        "evicted_docs": 3,
        "kept_docs": 2,
        "moved_docs": 1,
        "spent": {"anneal": {"a": 10, "b": 0}, "bulk": {"a": 10, "b": 0}},
    }

    # old sink config refused; the NEW one composes and the replay gate
    # survived both maintenance commits (wave 0 re-delivery is a no-op)
    with pytest.raises(ValueError, match="calibration mismatch"):
        sink(w0, 1)
    sink2 = CurriculumAdmissionSink(
        target_dir,
        [("anneal", {"a": 10, "b": 0}), ("bulk", {"a": 10, "b": 0})],
        "score",
    )
    sink2(w0, 0)  # replay: no-op
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    ) == [1, 2]
    w1 = spark.createDataFrame([(20, "a", 99.0, 10)], schema)
    sink2(w1, 1)  # both phases exhausted for a: rejected
    rep2 = curriculum_admission_report(target_dir)
    assert rep2["anneal"]["a"]["spent"] == 10
    assert rep2["bulk"]["a"]["spent"] == 10

    # in-flight drain guard: a drain landing mid-recalibration is
    # detected by the pre-commit pointer re-read and the recalibration
    # refuses cleanly, leaving the drain's commit intact
    real = textops.curriculum_phase_selection
    state = {"fired": False}
    w2 = spark.createDataFrame([(30, "b", 9.0, 10)], schema)

    def interleaving(*args, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            sink2(w2, 2)
        return real(*args, **kwargs)

    monkeypatch.setattr(textops, "curriculum_phase_selection", interleaving)
    with pytest.raises(RuntimeError, match="changed while"):
        recalibrate_curriculum_admission(
            spark, target_dir,
            [("anneal", {"a": 10, "b": 10}), ("bulk", {"a": 10, "b": 0})],
        )
    assert state["fired"]
    # b=0 budgets in the standing calibration: doc 30 was rejected, but
    # the drain's commit (the stream id consumption) survived
    assert curriculum_admission_report(target_dir)["anneal"]["b"] == {
        "budget": 0, "spent": 0, "remaining": 0,
    }


@pytest.mark.slow
def test_curriculum_admission_regret_readout(spark, tmp_path):
    """r16: the admission_regret shape applied to the curriculum sink.
    Constructed divergence fixture: wave 0's mediocre docs fill BOTH
    phases before wave 1's excellent docs arrive — hindsight assigns
    wave 1 to the top phase and demotes wave 0's best to bulk, so every
    (phase, source) cell diverges. Pinned exactly (Python-mirrored
    dicts): per-(phase, source) doc/token/score accounting, the
    phase-SWAP convention (a doc streamed into one phase and hindsight-
    assigned to another counts only_streaming there and only_hindsight
    here), the first-phase regret bound (hindsight_score_sum >=
    admitted_score_sum), zero-token corpus docs never surfacing as
    false regret, zero-filled rows for budgeted sources never seen,
    and the flat-table refusal."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        CurriculumAdmissionSink,
        curriculum_admission_regret,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    phases = [("anneal", {"a": 20, "b": 10}), ("bulk", {"a": 20, "b": 10})]
    target_dir = str(tmp_path / "cadm")
    sink = CurriculumAdmissionSink(target_dir, phases, "score")
    w0 = spark.createDataFrame(
        [(1, "a", 5.0, 10), (2, "a", 5.0, 10), (3, "a", 4.0, 10), (4, "a", 4.0, 10)],
        schema,
    )
    w1 = spark.createDataFrame(
        [(11, "a", 9.0, 10), (12, "a", 9.0, 10)], schema
    )
    sink(w0, 0)
    sink(w1, 1)  # both phases exhausted: 11, 12 rejected forever

    corpus = w0.unionByName(w1).unionByName(
        spark.createDataFrame([(99, "a", 999.0, 0)], schema)  # zero-token
    )
    got = {
        (r["phase"], r["source"]): {
            k: r[k]
            for k in (
                "admitted_docs", "hindsight_docs", "common_docs",
                "only_streaming_docs", "only_hindsight_docs",
                "admitted_tokens", "hindsight_tokens",
                "admitted_score_sum", "hindsight_score_sum",
            )
        }
        for r in curriculum_admission_regret(spark, target_dir, corpus).collect()
    }
    zero_b = {
        "admitted_docs": 0, "hindsight_docs": 0, "common_docs": 0,
        "only_streaming_docs": 0, "only_hindsight_docs": 0,
        "admitted_tokens": 0, "hindsight_tokens": 0,
        "admitted_score_sum": 0.0, "hindsight_score_sum": 0.0,
    }
    assert got == {
        # streamed {1,2}; hindsight {11,12} — full swap, 999-score
        # zero-token doc never appears
        ("anneal", "a"): {
            "admitted_docs": 2, "hindsight_docs": 2, "common_docs": 0,
            "only_streaming_docs": 2, "only_hindsight_docs": 2,
            "admitted_tokens": 20, "hindsight_tokens": 20,
            "admitted_score_sum": 10.0, "hindsight_score_sum": 18.0,
        },
        # streamed {3,4}; hindsight demotes {1,2} here — the phase-swap
        # convention: 1,2 count only_hindsight in bulk AND
        # only_streaming in anneal
        ("bulk", "a"): {
            "admitted_docs": 2, "hindsight_docs": 2, "common_docs": 0,
            "only_streaming_docs": 2, "only_hindsight_docs": 2,
            "admitted_tokens": 20, "hindsight_tokens": 20,
            "admitted_score_sum": 8.0, "hindsight_score_sum": 10.0,
        },
        ("anneal", "b"): zero_b,
        ("bulk", "b"): zero_b,
    }
    # first-phase bound (documented; later phases carry no such claim)
    assert (
        got[("anneal", "a")]["hindsight_score_sum"]
        >= got[("anneal", "a")]["admitted_score_sum"]
    )

    # refusals: no state; a FLAT admission table
    with pytest.raises(ValueError, match="no committed admission state"):
        curriculum_admission_regret(spark, str(tmp_path / "nope"), corpus)
    flat_dir = str(tmp_path / "flat")
    BudgetAdmissionSink(flat_dir, {"a": 20}, "score")(w0, 0)
    with pytest.raises(ValueError, match="FLAT admission table"):
        curriculum_admission_regret(spark, flat_dir, corpus)


def test_streaming_budget_admission_zero_token_bounded(spark, tmp_path):
    """r14 ADVICE finding, closed: the batch operator's inclusive
    boundary admits zero-token docs (they spend nothing), so a stream of
    them would grow the standing admitted table without bound even after
    every budget is exhausted. The sink therefore admits only
    TOKEN-BEARING documents: zero-token rows never enter the standing
    table — before exhaustion, after exhaustion, or from a source whose
    budget was 0 all along — which makes the boundedness claim exact
    (admitted rows <= total budget mass)."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_report,
        read_admitted,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    target_dir = str(tmp_path / "admitted")
    sink = BudgetAdmissionSink(target_dir, {"a": 30, "z": 0}, "score")

    # wave 0: token-bearing docs fill a's budget; zero-token rows ride
    # along with TOP scores in both sources and must still not be
    # admitted (z's budget is 0 — the old inclusive rule admitted its
    # zero-token doc anyway)
    w0 = spark.createDataFrame(
        [
            (1, "a", 99.0, 0),
            (2, "a", 50.0, 10),
            (3, "a", 40.0, 10),
            (4, "a", 30.0, 10),
            (5, "a", 20.0, 10),
            (6, "z", 99.0, 0),
            (7, "a", 10.0, None),
        ],
        schema,
    )
    sink(w0, 0)
    got = sorted(r["doc_id"] for r in read_admitted(spark, target_dir).collect())
    assert got == [2, 3, 4]  # 30 tokens spent, no zero/NULL-token rows
    assert admission_report(target_dir)["a"]["remaining"] == 0

    # wave 1: budgets exhausted — an all-zero-token wave admits nothing
    # and the standing table does not grow (this is the unbounded-growth
    # scenario from the finding)
    w1 = spark.createDataFrame(
        [(100 + i, "a", 99.0, 0) for i in range(5)], schema
    )
    sink(w1, 1)
    after = sorted(r["doc_id"] for r in read_admitted(spark, target_dir).collect())
    assert after == [2, 3, 4]
    assert admission_report(target_dir) == {
        "a": {"budget": 30, "spent": 30, "remaining": 0},
        "z": {"budget": 0, "spent": 0, "remaining": 0},
    }

    # corollary (documented): a source carrying ONLY zero-token rows is
    # filtered before the batch operator's coverage raise — no budget
    # entry needed, nothing admitted, nothing raised
    w2 = spark.createDataFrame([(200, "ghost", 99.0, 0)], schema)
    sink(w2, 2)
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, target_dir).collect()
    ) == [2, 3, 4]
