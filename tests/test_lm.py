"""Stupid Backoff LM scoring (operators/lm.py): every backoff depth
pinned against hand-computed integer micro-scores, document-boundary
isolation of the count tables, and the registered query's oracle parity
(the latter via tests/test_queries_oracle.py like every query)."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.lm import (
    ngram_count_tables,
    stupid_backoff_doc_scores,
    tokenize_positions,
)


def _toks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return tokenize_positions(df, "doc_id", F.split(F.trim("text"), r"\s+"))


def test_backoff_depths_hand_computed(spark):
    """Reference 'a b c a b d' (N=6; uni a:2 b:2 c:1 d:1; bi ab:2 bc:1
    ca:1 bd:1; tri abc bca cab abd all 1). Scoring 'a b c x d' exercises
    every branch: head unigram, full bigram, full trigram, OOV at double
    backoff, and single... double backoff to a seen unigram."""
    ref = _toks(spark, [(0, "a b c a b d")])
    scored = _toks(spark, [(1, "a b c x d")])
    row = stupid_backoff_doc_scores(scored, ref).collect()[0]
    # pos1 'a' head:            (1_000_000 * 2) div 6 = 333_333
    # pos2 'b' | a   (bigram):  (1_000_000 * 2) div 2 = 1_000_000
    # pos3 'c' | a b (trigram): (1_000_000 * 1) div 2 = 500_000
    # pos4 'x' OOV:             (  160_000 * 0) div 6 = 0
    # pos5 'd' | c x (uni x2):  (  160_000 * 1) div 6 = 26_666
    assert row["n_tokens"] == 5
    assert row["lm_score_sum"] == 333_333 + 1_000_000 + 500_000 + 0 + 26_666
    assert row["lm_score_avg"] == row["lm_score_sum"] / 5


def test_counts_never_cross_document_boundaries(spark):
    """'x y' | 'y z' as two ref docs must NOT contain bigram 'y y' or any
    trigram; one doc 'x y z' contains trigram xyz."""
    two = _toks(spark, [(0, "x y"), (1, "y z")])
    uni, bi, tri = ngram_count_tables(two)
    bis = {(r["wa"], r["wb"]) for r in bi.collect()}
    assert bis == {("x", "y"), ("y", "z")}
    assert tri.count() == 0

    one = _toks(spark, [(0, "x y z")])
    _, _, tri1 = ngram_count_tables(one)
    assert [
        (r["w1"], r["w2"], r["w3"]) for r in tri1.collect()
    ] == [("x", "y", "z")]


def test_in_distribution_text_outscores_shuffled_text(spark):
    """The point of the operator: text drawn from the reference
    distribution must outrank token salad over the same vocabulary."""
    ref_text = "the cat sat on the mat and the dog sat on the rug"
    ref = _toks(spark, [(0, ref_text)])
    scored = _toks(
        spark,
        [(1, "the cat sat on the rug"), (2, "rug the on cat mat sat")],
    )
    got = {
        r["doc_id"]: r["lm_score_avg"]
        for r in stupid_backoff_doc_scores(scored, ref).collect()
    }
    assert got[1] > got[2] > 0


def test_randomized_parity_with_pure_python_reference(spark):
    """Exact-parity pin (the BPE-style guard): on random corpora over a
    small vocabulary, every doc's integer lm_score_sum equals an
    independent pure-Python Stupid Backoff implementation, bit for bit."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for d in range(60)
    }
    ref_ids = [d for d in docs if d % 3 == 0]

    # pure-Python reference: count tables + the documented micro algebra
    uni, bi, tri = {}, {}, {}
    n_ref = 0
    for d in ref_ids:
        ws = docs[d].split()
        n_ref += len(ws)
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i >= 1:
                bi[(ws[i - 1], w)] = bi.get((ws[i - 1], w), 0) + 1
            if i >= 2:
                tri[(ws[i - 2], ws[i - 1], w)] = tri.get(
                    (ws[i - 2], ws[i - 1], w), 0
                ) + 1

    def score(ws):
        total = 0
        for i, w in enumerate(ws):
            if i == 0:
                total += (1_000_000 * uni.get(w, 0)) // n_ref
            elif i == 1:
                if (ws[0], w) in bi:
                    total += (1_000_000 * bi[(ws[0], w)]) // uni[ws[0]]
                else:
                    total += (400_000 * uni.get(w, 0)) // n_ref
            else:
                t = (ws[i - 2], ws[i - 1], w)
                if t in tri:
                    total += (1_000_000 * tri[t]) // bi[(ws[i - 2], ws[i - 1])]
                elif (ws[i - 1], w) in bi:
                    total += (400_000 * bi[(ws[i - 1], w)]) // uni[ws[i - 1]]
                else:
                    total += (160_000 * uni.get(w, 0)) // n_ref
        return total

    expected = {d: score(docs[d].split()) for d in docs}

    toks = _toks(spark, [(d, t) for d, t in docs.items()])
    ref = toks.filter(F.col("doc_id") % 3 == 0)
    got = {
        r["doc_id"]: r["lm_score_sum"]
        for r in stupid_backoff_doc_scores(toks, ref).collect()
    }
    assert got == expected


def test_empty_reference_corpus_raises(spark):
    """r8 advisory regression: an empty reference token stream (n_ref=0)
    must fail loudly instead of silently emitting NULL scores."""
    import pytest

    ref = _toks(spark, [(0, "a b")]).filter(F.lit(False))
    scored = _toks(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="empty reference"):
        stupid_backoff_doc_scores(scored, ref)
