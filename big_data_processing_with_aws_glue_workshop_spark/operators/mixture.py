"""Temperature-based mixture resampling WITH replacement — the
upsampling counterpart to the membership-downsampling mixture plan
(queries/textops.py::q_source_mixture_plan, which can only thin a
source toward a budget).

Public recipe (the multilingual-sampling scheme popularized by
mBERT/XLM-R and used for source mixing in LLM corpora): sample source
``s`` with probability p_s ∝ (mass_s)^τ. τ = 1 keeps natural
proportions; τ -> 0 flattens toward uniform, which UPSAMPLES rare
sources — a doc from a tiny source must then appear multiple times per
epoch. That repetition factor is r_s = B * p_s / mass_s for a total
token budget B, and can exceed 1: the part the downsampling plan cannot
express.

Determinism contract (same discipline as every sampling op in this
repo): a doc's copy count depends only on (doc id, its source's r_s) —
``floor(r_s)`` copies plus one more iff an md5-derived uniform hash of
the id falls under ``frac(r_s)``. No rand(), no partitioning
sensitivity; identical output on every rerun and engine. Expected
realized token mass per source = B * p_s exactly.

Scale shape: one corpus shuffle for per-source totals (source
cardinality is tiny — thousands at 100 TB), the τ-powered share table
broadcast back onto the per-doc frame (map-side), and materialization
as an ``explode(sequence(1, n_copies))`` — output rows ~ B/avg_len,
never more than the plan asked for. Epoch ordering: each copy gets a
deterministic shuffle key ``xxhash64(id, copy, seed + epoch)``, so a
new epoch is a new global order with ZERO data movement at plan time
(the sort happens where the training loader wants it — typically
within range-partitioned shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_MOD = 1_000_000


def _id_hash(col) -> F.Column:
    """md5-derived uniform integer in [0, 1e6) — engine-reproducible
    (same construction as the mixture/split plans; DuckDB twin:
    ('0x'||substr(md5(id::varchar),1,15))::bigint % 1000000)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")
        % _HASH_MOD
    )


def temperature_mixture_plan(
    docs: DataFrame,
    temperature: float,
    budget_tokens: int | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Per-doc copy counts for a τ-tempered mixture over ``source_col``.

    ``weight_col`` is the doc's token count (precompute it once); the
    budget defaults to the corpus total (pure re-balancing). Returns the
    input columns + ``repeat_rate`` (the source's r_s) + ``n_copies``
    (deterministic int >= 0; 0 means the doc is dropped this epoch —
    τ > 1 or over-represented sources can downsample too).
    """
    per_source = docs.groupBy(source_col).agg(
        F.sum(weight_col).cast("double").alias("mass")
    )
    shares = per_source.select(
        source_col,
        "mass",
        F.pow(F.col("mass"), F.lit(float(temperature))).alias("powed"),
    )
    denom = shares.agg(F.sum("powed").alias("denom"))
    total = docs.agg(F.sum(weight_col).cast("double").alias("corpus_total"))
    rated = (
        shares.crossJoin(F.broadcast(denom))
        .crossJoin(F.broadcast(total))
        .select(
            source_col,
            (
                (
                    F.lit(float(budget_tokens))
                    if budget_tokens is not None
                    else F.col("corpus_total")
                )
                * (F.col("powed") / F.col("denom"))
                / F.col("mass")
            ).alias("repeat_rate"),
        )
    )
    return (
        docs.join(F.broadcast(rated), source_col)
        .withColumn("__base", F.floor("repeat_rate").cast("bigint"))
        .withColumn(
            "__frac_keep",
            (
                _id_hash(F.col(id_col)).cast("double")
                < (F.col("repeat_rate") - F.col("__base")) * _HASH_MOD
            ).cast("bigint"),
        )
        .withColumn("n_copies", F.col("__base") + F.col("__frac_keep"))
        .drop("__base", "__frac_keep")
    )


def materialize_epoch(
    plan: DataFrame,
    epoch: int = 0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Expand the plan into one epoch's instance stream: a row per copy
    with a deterministic global ``shuffle_key`` (new permutation per
    epoch, no data movement until the consumer range-partitions by it).
    """
    return (
        plan.filter(F.col("n_copies") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
        )
        .withColumn(
            "shuffle_key",
            F.xxhash64(F.col(id_col), F.col("copy_idx"), F.lit(seed + epoch)),
        )
    )


def write_epoch_shards(
    plan: DataFrame,
    path: str,
    n_shards: int,
    epoch: int = 0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> None:
    """Materialize one epoch as ``n_shards`` globally-shuffled parquet
    shards: instances are range-partitioned by the epoch's deterministic
    ``shuffle_key`` and sorted by it within each shard, so reading shard
    files in name order and rows in stored order IS the epoch's global
    permutation — the layout a sequential training loader consumes, with
    no shuffling left to do at read time. One shuffle total (the range
    partition); re-running the same (epoch, seed) rewrites byte-identical
    order."""
    inst = materialize_epoch(plan, epoch=epoch, seed=seed, id_col=id_col)
    (
        inst.repartitionByRange(n_shards, "shuffle_key")
        .sortWithinPartitions("shuffle_key")
        .write.mode("overwrite")
        .parquet(path)
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    group_cols: list | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep k rows
    (per group, if ``group_cols``) with probability proportional to
    ``weight_col`` — the Efraimidis-Spirakis (2006) one-pass reservoir
    recipe, the standard way to select a quality-weighted corpus subset
    ("10M docs, biased toward high quality scores") distributed.

    Each row draws u ~ Uniform(0,1) from a seeded hash of its id and
    scores key = ln(u) / w (the log form of u^(1/w) — monotone-equal
    and numerically safer); the k LARGEST keys per group are the
    sample. One window per group — a shuffle on the group key only;
    ungrouped callers get a single top-k (use a group column at large k
    to avoid the single-partition global window, then stratify).

    Zero/negative/null weights never selected (key -> -inf). The whole
    construction is hash-deterministic: same seed, same ids, same
    sample, independent of partitioning — pinned against a pure-Python
    reference in tests/test_mixture.py.

    Cross-engine oracle status (measured, tools/weighted_sample_probe.py
    + docs/SCALE.md r9): IEEE ``ln`` disagrees with DuckDB's on ~5-7% of
    keys by up to 2 ulp, so the KEY column must never be exposed in a
    driver-hash-oracled query; selection membership is safe by an 8-11
    order-of-magnitude adjacent-gap margin.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    # u in (0, 1]: (h + 1) / MOD over the md5-derived uniform integer
    u = (_id_hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))) + 1) / (
        float(_HASH_MOD)
    )
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.log(u) / w).otherwise(F.lit(float("-inf")))
    win = (
        Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    ).orderBy(F.col("__es_key").desc(), F.col(id_col))
    return (
        df.withColumn("__es_key", key)
        .withColumn("__es_rank", F.row_number().over(win))
        .filter((F.col("__es_rank") <= k) & (F.col("__es_key") != float("-inf")))
        .drop("__es_key", "__es_rank")
    )
