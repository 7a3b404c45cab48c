"""Distributed n-gram language-model quality scoring (Stupid Backoff).

The one curation stage from the public pretraining-pipeline recipes
(CCNet / Gopher / RedPajama) that a rule stack can't express: score each
document under a reference language model, so off-distribution text
(boilerplate, lorem-ipsum, non-prose) ranks low. Stupid Backoff (Brants
et al. 2007, "Large Language Models in Machine Translation") was
designed for EXACTLY this distributed setting: no discounting, no
normalization — the score of a token given its context is its relative
frequency, backing off to the shorter context with a fixed factor
alpha = 0.4 when the n-gram is unseen:

    S(w | u v) = c(u v w) / c(u v)        if c(u v w) > 0
               = 0.4 * S(w | v)           otherwise
    S(w | v)   = c(v w) / c(v)            if c(v w) > 0
               = 0.4 * S(w)               otherwise
    S(w)       = c(w) / N                 (0 for OOV)

The paper deliberately returns scores, not probabilities ("Stupid
Backoff ... uses relative frequencies; it is not a probability
distribution") — which is what makes the whole computation count tables
+ joins, with no held-out smoothing fit.

Exactness contract (the repo's oracle rule): counts are exact ints; each
token's score is emitted as an INTEGER MICRO-SCORE via one integer
division per backoff depth —

    depth 0:  (1_000_000 * c_full)    div  c_context
    depth 1:  (  400_000 * c_shorter) div  c_shorter_ctx     (0.4 * 1e6)
    depth 2:  (  160_000 * c_uni)     div  N                 (0.4^2 * 1e6)

`div` (Spark) and `//` (DuckDB) floor identically on nonnegative ints,
so a DuckDB twin reproduces every per-token score bit-for-bit; the
per-document aggregate is an integer sum plus ONE IEEE division for the
mean. (Quantization happens per token at readout — 0.4 is exact as
4/10 inside the scaled numerator, never a float.)

Scale shape: count tables are one groupBy each over the REFERENCE slice
(Zipf-small output: vocab and seen-bigram/trigram sets grow ~n^0.7, not
n); scoring is a per-doc lag window (one shuffle on doc id) plus hash
joins against the count tables on gram keys. At realistic vocab sizes
the unigram table broadcasts; bigram/trigram joins shuffle on the gram
hash — head-word skew ("the", "of") is real but bounded by the count
tables having ONE row per gram, so the build side never explodes, and
AQE's skew split covers the probe side. The 1e6 scale keeps
1_000_000 * c inside int64 for reference slices up to ~9e12 tokens;
past that, shard the reference (per-domain LMs — what the 100 TB
pipelines do anyway) rather than widening the arithmetic.

No reference-repo counterpart (beyond-reference family); cited public
recipe: Brants et al. 2007 (ACL), the CCNet quality-scoring stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: per-token score scale: micro-units (1e6 = relative frequency 1.0)
SCALE = 1_000_000
#: the paper's fixed backoff factor, as exact scaled integers
ALPHA_1 = 400_000  # 0.4   * SCALE
ALPHA_2 = 160_000  # 0.4^2 * SCALE


def tokenize_positions(df: DataFrame, id_col: str, tokens_col) -> DataFrame:
    """``(id, pos, w)`` token stream (1-based positions) from an
    array-of-tokens column expression; empty tokens dropped."""
    return (
        df.select(F.col(id_col), F.posexplode(tokens_col).alias("pos0", "w"))
        .filter(F.col("w") != "")
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "w")
    )


def ngram_count_tables(
    ref_toks: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(unigram, bigram, trigram) count tables from a positioned token
    stream — one lag window + one groupBy per order; n-grams never cross
    document boundaries (lag partitions by the doc id)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    ctx = ref_toks.select(
        F.lag("w", 2).over(w).alias("w1"),
        F.lag("w", 1).over(w).alias("w2"),
        F.col("w").alias("w3"),
    )
    uni = ctx.groupBy(F.col("w3").alias("w")).agg(F.count(F.lit(1)).alias("c"))
    bi = (
        ctx.filter(F.col("w2").isNotNull())
        .groupBy(F.col("w2").alias("wa"), F.col("w3").alias("wb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tri = (
        ctx.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return uni, bi, tri


def stupid_backoff_doc_scores(
    toks: DataFrame,
    ref_toks: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Stupid Backoff scores of a positioned token stream
    against count tables built from ``ref_toks``.

    Returns ``(id_col, n_tokens, lm_score_sum, lm_score_avg)``:
    ``lm_score_sum`` is the exact integer sum of per-token micro-scores,
    ``lm_score_avg`` one IEEE division of the two exact integers. Docs
    whose token stream is empty do not appear (nothing to score).

    Position handling: the first token scores as a unigram at FULL scale
    and the second under its bigram context (backing off once to the
    unigram) — limited context at the document head is not a backoff
    event, so no alpha penalty applies to it.
    """
    uni, bi, tri = ngram_count_tables(ref_toks, id_col=id_col)
    n_ref = ref_toks.count()
    if n_ref == 0:
        # every `div n_ref` readout would be NULL: documents would silently
        # emit NULL lm_score_sum instead of failing loudly
        raise ValueError(
            "stupid_backoff_doc_scores: empty reference token stream "
            "(n_ref == 0) — the count tables cannot score anything"
        )

    w = Window.partitionBy(id_col).orderBy("pos")
    scored = toks.select(
        id_col,
        F.lag("w", 2).over(w).alias("w1"),
        F.lag("w", 1).over(w).alias("w2"),
        F.col("w").alias("w3"),
    )
    # five count lookups: trigram, its context bigram, the backoff bigram,
    # its context unigram, and the token unigram
    scored = (
        scored.join(
            tri.select("w1", "w2", "w3", F.col("c").alias("c_tri")),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            bi.select(
                F.col("wa").alias("w1"),
                F.col("wb").alias("w2"),
                F.col("c").alias("c_ctx12"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(
                F.col("wa").alias("w2"),
                F.col("wb").alias("w3"),
                F.col("c").alias("c_bi23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c_uni2")),
            ["w2"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("c").alias("c_uni3")),
            ["w3"],
            "left",
        )
    )

    uni_full = F.expr(f"({SCALE} * coalesce(c_uni3, 0)) div {n_ref}")
    bi_full = F.expr(f"({SCALE} * c_bi23) div c_uni2")
    uni_backed1 = F.expr(f"({ALPHA_1} * coalesce(c_uni3, 0)) div {n_ref}")
    tri_full = F.expr(f"({SCALE} * c_tri) div c_ctx12")
    bi_backed1 = F.expr(f"({ALPHA_1} * c_bi23) div c_uni2")
    uni_backed2 = F.expr(f"({ALPHA_2} * coalesce(c_uni3, 0)) div {n_ref}")

    micro = (
        F.when(F.col("w2").isNull(), uni_full)  # document head: unigram
        .when(
            F.col("w1").isNull(),  # second token: bigram chain
            F.when(F.col("c_bi23").isNotNull(), bi_full).otherwise(uni_backed1),
        )
        .otherwise(  # full trigram chain
            F.when(F.col("c_tri").isNotNull(), tri_full)
            .when(F.col("c_bi23").isNotNull(), bi_backed1)
            .otherwise(uni_backed2)
        )
    )

    return (
        scored.select(id_col, micro.alias("micro"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("micro").alias("lm_score_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "lm_score_sum",
            (
                F.col("lm_score_sum").cast("double") / F.col("n_tokens")
            ).alias("lm_score_avg"),
        )
    )
