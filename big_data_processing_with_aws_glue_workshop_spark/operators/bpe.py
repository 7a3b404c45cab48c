"""Byte-pair-encoding vocabulary induction and subword encoding at
corpus scale — the tokenizer-training step of an LLM data pipeline.

Public recipe (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from characters,
repeatedly merge the most frequent adjacent symbol pair. The key
scale observation — the one every production BPE trainer uses — is that
learning never needs the raw corpus: it operates on the aggregated
WORD-FREQUENCY table, which Zipf keeps small (tens of millions of
distinct words for a 100 TB corpus) relative to the text. So the Spark
shape is:

1. ONE corpus-sized shuffle builds ``(word, count)`` — the only pass
   over the 100 TB.
2. Every merge iteration runs on the compact word table: adjacent-pair
   counts (posexplode + groupBy pair, partial-agg'd map-side), a
   1-row driver argmax (deterministic tie-break: count desc, then pair
   lexicographic — independent of partitioning), and a JVM-side fold
   (``F.aggregate``) that rewrites each word's symbol array with the
   leftmost-nonoverlapping merge semantics of the reference algorithm.
   No Python touches a row. Lineage is cut with localCheckpoint every
   ``checkpoint_every`` rounds, same discipline as operators/graph.py's
   PageRank loop.
3. ENCODING new text with a learned vocab is O(distinct words), not
   O(corpus): tokenize, aggregate distinct words, encode each once in
   an Arrow-batched ``mapInPandas`` (the per-word merge loop is
   inherently sequential — the documented justification for leaving the
   JVM), then broadcast-join the word -> subwords map back onto the
   token stream.

Exactness: merges and vocab are BIT-IDENTICAL to the single-node
reference implementation for any corpus (pinned by tests/test_bpe.py
against an independent pure-Python Sennrich implementation), because
pair counts are exact integers and the tie-break is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END = "▁"  # end-of-word sentinel appended as a final symbol

_WORD_RE = r"[^\s]+"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: whitespace-token word frequencies."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_expr(a: str, b: str):
    """Leftmost-nonoverlapping merge of adjacent pair (a, b) in the
    ``symbols`` array, as a single JVM fold: append each symbol, but if
    the accumulator ends in ``a`` and the incoming symbol is ``b``,
    replace that tail element with the concatenation. Matches the
    reference algorithm's left-to-right scan exactly (in "aaa" with
    merge (a,a): first two fuse, the third stays)."""
    merged = a + b
    return F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    counts: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 10,
) -> tuple[list, DataFrame]:
    """Learn ``n_merges`` BPE merges from a ``(word, n)`` frequency table.

    Returns ``(merges, vocab)``: the ordered merge list ``[(a, b), ...]``
    and a ``(token, n)`` DataFrame of final symbol frequencies (token
    occurrences weighted by word count). Stops early when no adjacent
    pair reaches ``min_pair_freq``.
    """
    words = counts.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
        F.col("n"),
    ).localCheckpoint()

    merges: list = []
    for i in range(n_merges):
        pairs = (
            words.select(
                F.posexplode(F.slice("symbols", 1, F.size("symbols") - 1)).alias(
                    "i", "a"
                ),
                F.col("symbols"),
                F.col("n"),
            )
            .select(
                F.col("a"),
                F.element_at("symbols", F.col("i") + 2).alias("b"),
                F.col("n"),
            )
            .groupBy("a", "b")
            .agg(F.sum("n").alias("freq"))
        )
        top = pairs.orderBy(F.desc("freq"), F.asc("a"), F.asc("b")).first()
        if top is None or top["freq"] < min_pair_freq:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b))
        words = words.select(
            _merge_expr(a, b).alias("symbols"), F.col("n")
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()

    vocab = (
        words.select(F.explode("symbols").alias("token"), F.col("n"))
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
    return merges, vocab


def encode_word(word: str, ranks: dict) -> list:
    """Reference per-word encoder: greedily apply the LOWEST-RANK merge
    present until none applies (the standard BPE inference order —
    merge priority is learn order, not left-to-right position)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        _, i = best
        a, b = syms[i], syms[i + 1]
        out = []
        j = 0
        while j < len(syms):
            if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def encode_documents(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Subword-encode ``text_col`` with a learned merge list; returns
    ``(id_col, tokens array<string>, n_tokens)``. Every input id appears
    in the output: empty / whitespace-only documents (which the word
    filter would otherwise drop entirely) carry an empty tokens array and
    n_tokens 0, so callers joining the result back to the corpus never
    silently lose rows (r7 advisory).

    Scale shape: the merge loop runs ONCE PER DISTINCT WORD (Arrow
    batches via mapInPandas — the sequential rank-greedy loop is the
    justified Python island), and the word -> subwords map joins back
    onto the token stream. Word order inside each document is preserved
    by posexplode position; the distinct-word table is Zipf-small, so
    the join is broadcast-able at realistic vocab sizes.
    """
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")

    distinct_words = toks.select("word").distinct()

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subwords": [encode_word(w, ranks) for w in pdf["word"]],
                }
            )

    word_map = distinct_words.mapInPandas(
        enc, "word string, subwords array<string>"
    )

    encoded = (
        toks.join(F.broadcast(word_map), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "subwords"))
                ).getField("subwords")
            ).alias("tokens")
        )
    )
    return (
        df.select(id_col)
        .join(encoded, id_col, "left")
        .withColumn(
            "tokens",
            F.coalesce(F.col("tokens"), F.array().cast("array<string>")),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
