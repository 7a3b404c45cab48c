"""BPE vocabulary induction: the distributed learner must be
BIT-IDENTICAL to an independent single-node implementation of the
public Sennrich et al. (2016) algorithm — same merge sequence, same
final vocab — because pair counts are exact integers and the tie-break
(count desc, then pair lexicographic) is total. The encoder must
round-trip: concatenated subwords reconstruct the original words."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.bpe import (
    END,
    encode_documents,
    encode_word,
    learn_bpe,
    word_counts,
)


def ref_learn(wc: dict, n_merges: int, min_pair_freq: int = 2):
    """Independent pure-Python Sennrich learner (dict-of-tuples state,
    leftmost-nonoverlapping merge scan)."""
    words = {tuple(list(w) + [END]): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((a, b))
        new: dict = {}
        for syms, n in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        words = new
    return merges, words


def _docs(spark, sf_dir, n):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n)
        .select("doc_id", "text")
    )


def test_learn_bpe_matches_reference_exactly(spark, sf_dir):
    docs = _docs(spark, sf_dir, 120)
    wc_df = word_counts(docs)
    wc = {r["word"]: r["n"] for r in wc_df.collect()}

    merges, vocab_df = learn_bpe(wc_df, n_merges=40)
    ref_merges, ref_words = ref_learn(wc, n_merges=40)
    assert merges == ref_merges
    assert len(merges) == 40  # corpus is big enough that none stop early

    ref_vocab: dict = {}
    for syms, n in ref_words.items():
        for s in syms:
            ref_vocab[s] = ref_vocab.get(s, 0) + n
    got_vocab = {r["token"]: r["n"] for r in vocab_df.collect()}
    assert got_vocab == ref_vocab


@pytest.mark.slow
def test_learn_bpe_early_stop_agrees(spark, sf_dir):
    """A min_pair_freq high enough to trigger early stop must stop both
    implementations at the same merge."""
    docs = _docs(spark, sf_dir, 30)
    wc_df = word_counts(docs)
    wc = {r["word"]: r["n"] for r in wc_df.collect()}
    merges, _ = learn_bpe(wc_df, n_merges=400, min_pair_freq=50)
    ref_merges, _ = ref_learn(wc, n_merges=400, min_pair_freq=50)
    assert merges == ref_merges
    assert 0 < len(merges) < 400


def test_encode_documents_round_trip_and_parity(spark, sf_dir):
    docs = _docs(spark, sf_dir, 60)
    merges, _ = learn_bpe(word_counts(docs), n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}

    enc = encode_documents(docs, merges).orderBy("doc_id")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for row in enc.collect():
        words = texts[row["doc_id"]].split()
        # round trip: concatenated subwords == words + sentinel each
        assert "".join(row["tokens"]) == "".join(w + END for w in words)
        # parity with the reference greedy-rank encoder, order preserved
        ref_tokens = [t for w in words for t in encode_word(w, ranks)]
        assert row["tokens"] == ref_tokens
        assert row["n_tokens"] == len(ref_tokens)


def test_encode_documents_keeps_empty_docs(spark):
    """Empty / whitespace-only documents must appear in the output with an
    empty tokens array, not vanish (r7 advisory): callers join results
    back to the corpus by id."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.bpe import encode_documents

    df = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, "   "), (4, "low")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in encode_documents(df, [("l", "o"), ("lo", "w")]).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == ([], 0) and got[3] == ([], 0)
    # non-empty docs unchanged (end-of-word marker per the learner's contract)
    assert got[4][0] == ["low", "▁"] and got[4][1] == 2
    assert got[1][1] == len(got[1][0]) > 0
