"""Scaling probe for BPE vocabulary induction (operators/bpe.py).

The scale claim: after the ONE corpus pass that builds word counts,
every merge iteration touches only the word-frequency table — so the
per-merge cost must track |distinct words|, not corpus bytes. This
probe times (a) the corpus pass and (b) a fixed number of merges over
word tables of growing size: the real sf0.01 and sf0.1 tables, then
synthetic x4 / x16 expansions of sf0.1 (each word cloned with distinct
suffixes, counts preserved — same Zipf shape, bigger table).

Also times the O(distinct words) encoder over sf0.1 documents.

Usage: python tools/bpe_probe.py [n_merges]   (default 25)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.bpe import (
    encode_documents,
    learn_bpe,
    word_counts,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_session(app_name="bpe-probe")

    print("| word table | n words | corpus pass (s) | merges (s) | s/merge |")
    print("|---|---|---|---|---|")
    base_wc = None
    for label, sf in (("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        t0 = time.time()
        wc = word_counts(docs).persist()
        n_words = wc.count()
        t_pass = time.time() - t0
        t0 = time.time()
        merges, _ = learn_bpe(wc, n_merges=n_merges)
        t_m = time.time() - t0
        print(
            f"| {label} | {n_words:,} | {t_pass:.2f} | {t_m:.2f} "
            f"| {t_m / len(merges):.3f} |",
            flush=True,
        )
        base_wc = wc if label == "sf0.1" else (wc.unpersist() or base_wc)

    # the documents tables use a tiny closed vocabulary (31 words), so the
    # word-table scaling rows come from synthetic Zipf tables: word i is a
    # deterministic 6-12 char base-26 expansion of xxhash64(i), count
    # ~ 1e7/(i+10) — realistic shape, controllable size
    for n_words_target in (10_000, 100_000, 1_000_000):
        synth = spark.range(n_words_target).select(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(
                        F.lit(0), (F.pmod(F.xxhash64("id"), F.lit(7)) + 5).cast("int")
                    ),
                    lambda i: F.chr(
                        F.pmod(F.xxhash64(F.col("id"), i), F.lit(26)) + 97
                    ),
                ),
            ).alias("word"),
            (F.lit(10_000_000) / (F.col("id") + 10)).cast("bigint").alias("n"),
        ).groupBy("word").agg(F.sum("n").alias("n")).persist()
        n_words = synth.count()
        t0 = time.time()
        merges, _ = learn_bpe(synth, n_merges=n_merges)
        t_m = time.time() - t0
        print(
            f"| zipf {n_words_target:,} | {n_words:,} | — | {t_m:.2f} "
            f"| {t_m / len(merges):.3f} |",
            flush=True,
        )
        synth.unpersist()

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    merges, _ = learn_bpe(base_wc, n_merges=n_merges)
    t0 = time.time()
    n = encode_documents(docs, merges).agg(F.sum("n_tokens")).first()[0]
    t_enc = time.time() - t0
    n_docs = docs.count()
    print(
        f"\nencode sf0.1: {n_docs:,} docs -> {n:,} subword tokens in "
        f"{t_enc:.2f} s ({n_docs / t_enc:,.0f} docs/s)"
    )
    base_wc.unpersist()


if __name__ == "__main__":
    main()
