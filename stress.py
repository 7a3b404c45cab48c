#!/usr/bin/env python
"""Scale-stress smoke: inflate the sf0.1 tables N-fold in-plan (explode a
replica index — no disk writes) and run the shuffle-heavy operator families.
Validates that plans scale linearly-ish before they meet a real cluster;
not part of the default test suite.

Usage: python stress.py [replication_factor]
       python stress.py lsh [n_docs ...]      # high-duplication LSH stress

The ``lsh`` mode is the adversarial case for banded MinHash: a corpus where
50% of documents are near-duplicates of another document. The danger at
scale is candidate-set blowup — if banding degraded toward all-pairs, the
verify join would be O(n^2). The planted corpus has exactly n/3 true dup
pairs, so the probe reports candidates / n^2 (must stay tiny) and recall
over the planted pairs (must be 1.0: each dup shares ~59 of 61 shingles,
far above the 0.8 threshold, and 8 bands x 4 rows catches >0.999 of pairs
at that similarity).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def inflate(df, factor: int, key_cols: list[str]):
    """Replicate rows factor-x, perturbing keys so group/join cardinality
    scales too (replica i shifts keys by i * 10^9)."""
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    out = df.select("*", replicas)
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(1_000_000_000))
    return out.drop("__rep")


DUP_OFFSET = 1_000_000_000  # planted dup of doc i gets id i + DUP_OFFSET


def dup_corpus(spark, n_docs: int):
    """Deterministic corpus, 50% near-duplicates: 2n/3 base docs of 60
    seeded vocab tokens; every even-id base doc (n/3 of the corpus) is
    repeated with two extra tokens appended (Jaccard ~ 59/63 ~ 0.94)."""
    n_base = (2 * n_docs) // 3
    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(F.col("id"), F.lit(i))) % 500).cast("string"),
                )
                for i in range(60)
            ],
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zza zzb")).alias("text"),
    )
    return base.union(dups)


def lsh_stress(sizes: list[int]) -> None:
    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        lsh_candidate_pairs,
        minhash_near_duplicates,
        minhash_signatures,
    )
    from big_data_processing_with_aws_glue_workshop_spark.util import (
        release_tracked_caches,
    )

    spark = get_session(app_name="lsh-stress")
    # warm codegen/shuffle machinery
    minhash_near_duplicates(dup_corpus(spark, 300)).count()
    release_tracked_caches()

    print("| n docs | planted pairs | candidates | cand/n^2 | found | recall | wall (s) |")
    print("|---|---|---|---|---|---|---|")
    for n in sizes:
        corpus = dup_corpus(spark, n).localCheckpoint()
        n_total = corpus.count()
        planted = corpus.filter(F.col("doc_id") >= DUP_OFFSET).count()

        sigs = minhash_signatures(corpus)
        n_cand = lsh_candidate_pairs(sigs, 8, 4, n_hashes=32).count()

        t0 = time.perf_counter()
        found = minhash_near_duplicates(corpus, threshold=0.8)
        hits = found.filter(
            (F.col("d2") - F.col("d1") == DUP_OFFSET)
            | (F.col("d1") - F.col("d2") == DUP_OFFSET)
        ).count()
        n_found = found.count()
        dt = time.perf_counter() - t0
        release_tracked_caches()

        print(
            f"| {n_total} | {planted} | {n_cand} | "
            f"{n_cand / (n_total * n_total):.2e} | {n_found} | "
            f"{hits / planted:.3f} | {dt:.2f} |"
        )
    spark.stop()


def interval_corpus(spark, n_users: int, events_per_user: int, spacing_s: int):
    """Deterministic click/error stream: per user, one event every
    ``spacing_s`` seconds alternating click/error. With the join's 600 s
    bound, each error matches ~300/spacing_s preceding clicks — spacing
    dials the match density independently of the row count."""
    e = spark.range(n_users * events_per_user)
    seq = F.col("id") % events_per_user
    return e.select(
        F.col("id").alias("event_id"),
        (F.col("id") / events_per_user).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + seq * spacing_s).alias("ts"),
        F.when(seq % 2 == 0, "click").otherwise("error").alias("event_type"),
    )


def interval_stress(cases: list[tuple[int, int, int]], bucketized: bool) -> None:
    """Density scaling of the (batch-mode) stream-stream interval join: the
    danger case is hot users — the direct equality-join-plus-residual plan
    is per-key quadratic in history depth (measured: 20 users x 100k
    events -> 496 s). ``bucketized`` runs the time-bucketed rewrite
    (operators/rangejoin.py::bucketized_interval_join), which bounds
    candidates to adjacent buckets."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.rangejoin import (
        bucketized_interval_join,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        streaming_interval_join,
    )

    def run(ev):
        if not bucketized:
            return streaming_interval_join(ev)
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            F.col("user_id"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
        )
        return bucketized_interval_join(
            clicks, errors, ["user_id"], "l_ts", "r_ts", within_seconds=600
        )

    spark = get_session(app_name="interval-stress")
    run(interval_corpus(spark, 100, 20, 60)).count()  # warm

    print(f"impl: {'bucketized' if bucketized else 'direct (streaming twin)'}")
    print("| users | events/user | spacing (s) | rows | pairs | wall (s) | pairs/s |")
    print("|---|---|---|---|---|---|---|")
    for n_users, epu, spacing in cases:
        ev = interval_corpus(spark, n_users, epu, spacing).localCheckpoint()
        n_rows = ev.count()
        t0 = time.perf_counter()
        pairs = run(ev).count()
        dt = time.perf_counter() - t0
        print(
            f"| {n_users} | {epu} | {spacing} | {n_rows} | {pairs} | "
            f"{dt:.2f} | {pairs / dt:,.0f} |"
        )
    spark.stop()


def funnel_corpus(spark, n_users: int, events_per_user: int):
    """view/click/purchase cycle per user, one event a minute."""
    e = spark.range(n_users * events_per_user)
    seq = F.col("id") % events_per_user
    stage = seq % 3
    return e.select(
        (F.col("id") / events_per_user).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + seq * 60).alias("ts"),
        F.when(stage == 0, "view")
        .when(stage == 1, "click")
        .otherwise("purchase")
        .alias("event_type"),
    )


def funnel_stress(cases: list[tuple[int, int]]) -> None:
    """History-depth scaling of the conversion funnel: the per-user
    collect_list is the skew unit — wall time must stay bounded by total
    rows, and the deep-history shapes show the per-user array cost."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.events import (
        funnel_stages,
    )

    spark = get_session(app_name="funnel-stress")
    funnel_stages(funnel_corpus(spark, 100, 30)).collect()  # warm

    print("| users | events/user | rows | wall (s) |")
    print("|---|---|---|---|")
    for n_users, epu in cases:
        ev = funnel_corpus(spark, n_users, epu).localCheckpoint()
        n_rows = ev.count()
        t0 = time.perf_counter()
        funnel_stages(ev).collect()
        dt = time.perf_counter() - t0
        print(f"| {n_users} | {epu} | {n_rows} | {dt:.2f} |")
    spark.stop()


def overlap_corpus(spark, n_sources: int, docs_per_source: int):
    """Cross-source overlap worst case: every doc opens with the SAME
    40-token boilerplate header (licence banner / site chrome), so ~38
    shingles are present in ALL sources; each doc then carries 30 unique
    tokens, and source pairs (2k, 2k+1) share 10 genuine-overlap tokens."""
    boiler = " ".join(f"b{i}" for i in range(40))
    d = spark.range(n_sources * docs_per_source)
    src = (F.col("id") / docs_per_source).cast("long")
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("u"),
                F.abs(F.xxhash64(F.col("id"), F.lit(i))).cast("string"),
            )
            for i in range(30)
        ],
    )
    shared = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("p"), (src / 2).cast("long").cast("string"), F.lit("x"), F.lit(str(i)))
            for i in range(10)
        ],
    )
    return d.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), src.cast("string")).alias("source"),
        F.concat_ws(" ", F.lit(boiler), shared, uniq).alias("text"),
    )


def overlap_stress(cases: list[tuple[int, int]]) -> None:
    """Measures the ubiquity cap's effect on the cross-source overlap
    self-join: boilerplate shingles present in all S sources produce
    S(S-1)/2 pair rows EACH when uncapped — quadratic in source count —
    while the capped plan drops them before the join. Reports wall time
    and the pair-join output row count for both variants."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        source_overlap_matrix,
    )

    spark = get_session(app_name="overlap-stress")
    source_overlap_matrix(overlap_corpus(spark, 8, 20), 10).collect()  # warm

    print("| sources | docs | capped (s) | pairs | uncapped (s) | pairs |")
    print("|---|---|---|---|---|---|")
    for n_sources, dps in cases:
        d = overlap_corpus(spark, n_sources, dps).localCheckpoint()
        row = [str(n_sources), str(n_sources * dps)]
        for cap in (10, 1 << 40):
            t0 = time.perf_counter()
            res = source_overlap_matrix(d, cap).agg(
                F.count(F.lit(1)), F.sum("n_shared")
            ).collect()[0]
            dt = time.perf_counter() - t0
            row += [f"{dt:.2f}", str(res[1])]
        print("| " + " | ".join(row) + " |")
    spark.stop()


def quantile_stress(sizes: list[int]) -> None:
    """Exact percentile vs approx_percentile (GK sketch) on a heavy-tailed
    column: wall time and worst relative value error across p50/p90/p99/
    p999. Exact percentile materializes per-group sorted state (memory
    O(n) on the reducer at these shapes); the sketch is fixed-width —
    the 100 TB variant — and the probe quantifies what its accuracy knob
    actually buys."""
    spark = get_session(app_name="quantile-stress")
    ps = [0.5, 0.9, 0.99, 0.999]

    print("| rows | exact (s) | approx@1k (s) | err@1k | approx@10k (s) | err@10k |")
    print("|---|---|---|---|---|---|")
    for n in sizes:
        # deterministic heavy tail: exp(6 * u^4), u uniform from a hash
        u = (F.abs(F.xxhash64("id")) % 1_000_000) / 1_000_000.0
        df = spark.range(n).select(F.exp(u * u * u * u * 6).alias("v"))
        df = df.localCheckpoint()

        t0 = time.perf_counter()
        exact = df.agg(F.percentile("v", ps).alias("q")).first()["q"]
        t_exact = time.perf_counter() - t0

        cells = [str(n), f"{t_exact:.1f}"]
        for acc in (1_000, 10_000):
            t0 = time.perf_counter()
            approx = df.agg(
                F.percentile_approx("v", ps, F.lit(acc)).alias("q")
            ).first()["q"]
            dt = time.perf_counter() - t0
            err = max(abs(a - e) / e for a, e in zip(approx, exact))
            cells += [f"{dt:.1f}", f"{err:.2e}"]
        print("| " + " | ".join(cells) + " |")
    spark.stop()


def compaction_stress(file_counts: list[int]) -> None:
    """Fragmentation cost curve: the same lineitem bytes laid out as n
    small files, scan-agg time per layout, then the compaction pass
    (operators/compaction.py) and the recovered scan time. Quantifies the
    'file count, not data volume' failure mode the compactor exists for —
    at 100 TB the per-file open/footer/listing overhead multiplies by the
    task count, so the local curve is the lower bound on the damage."""
    import shutil
    import tempfile

    from big_data_processing_with_aws_glue_workshop_spark.operators.compaction import (
        compact_parquet_lake,
        list_data_files,
    )

    spark = get_session(app_name="compaction-stress")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def scan_time(path: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice"))
            .collect()
        )
        return time.perf_counter() - t0

    print("| files | scan (s) | compact (s) | files after | scan after (s) |")
    print("|---|---|---|---|---|")
    for n in file_counts:
        lake = tempfile.mkdtemp(prefix=f"frag{n}-")
        try:
            src.repartition(n).write.mode("overwrite").parquet(lake)
            t_frag = scan_time(lake)
            t0 = time.perf_counter()
            compact_parquet_lake(spark, lake)  # default 128 MB target
            t_compact = time.perf_counter() - t0
            n_after = len(list_data_files(spark, lake)[""])
            t_comp = scan_time(lake)
            print(
                f"| {n} | {t_frag:.2f} | {t_compact:.2f} "
                f"| {n_after} | {t_comp:.2f} |"
            )
        finally:
            shutil.rmtree(lake, ignore_errors=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "compaction":
        compaction_stress(
            [int(s) for s in sys.argv[2:]] or [16, 256, 2048, 8192]
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "quantile":
        quantile_stress([int(s) for s in sys.argv[2:]] or [10_000_000, 60_000_000])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "overlap":
        overlap_stress([(50, 40), (200, 40), (800, 40), (3200, 10)])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "lsh":
        lsh_stress([int(s) for s in sys.argv[2:]] or [3000, 12000, 48000])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "interval":
        interval_stress(
            [
                # row-count scaling at fixed density (~5 matches/error)
                (2_000, 100, 60),
                (20_000, 100, 60),
                # density scaling at fixed rows: ~1 -> ~20 -> ~75 matches
                (20_000, 100, 600),
                (20_000, 100, 15),
                (20_000, 100, 4),
                # one pathological hot-user shape: few users, long history
                (20, 100_000, 4),
            ],
            bucketized="bucketized" in sys.argv[2:],
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "funnel":
        funnel_stress(
            [
                (100_000, 20),
                (10_000, 200),
                (100, 20_000),
                # hot-user pathology: 3 users own the whole stream
                (3, 666_666),
            ]
        )
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="stress")

    lineitem = inflate(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), factor, ["l_orderkey"]
    )
    orders = inflate(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), factor, ["o_orderkey", "o_custkey"]
    )

    n_li = lineitem.count()
    results: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        results[name] = round(time.perf_counter() - t0, 2)

    # partial-agg heavy: group on low-cardinality keys
    timed(
        "groupby_agg",
        lambda: lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .count(),
    )
    # wide shuffle: high-cardinality window dedup
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc())
    timed(
        "window_dedup",
        lambda: orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .count(),
    )
    # fact-fact join on the inflated key
    timed(
        "big_join",
        lambda: lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count(),
    )
    # distinct on high-cardinality composite
    timed(
        "count_distinct",
        lambda: lineitem.select("l_orderkey", "l_linenumber").distinct().count(),
    )

    print(
        json.dumps(
            {
                "rows_lineitem": n_li,
                "replication": factor,
                "timings_sec": results,
                "rows_per_sec_join": round(n_li / results["big_join"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
