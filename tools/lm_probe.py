"""Measure Stupid-Backoff LM scaling: count-table size vs corpus size
(the claim in operators/lm.py that the tables are Zipf-small) and the
score-pass wall time, across the testdata scale factors.

Usage: python tools/lm_probe.py [sf_dir ...]   (default: sf0.001 0.01 0.1)
Prints one JSON line per scale; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.lm import (
    ngram_count_tables,
    stupid_backoff_doc_scores,
    tokenize_positions,
)
from big_data_processing_with_aws_glue_workshop_spark.queries.textops import _tokens
from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def probe(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = tokenize_positions(docs, "doc_id", _tokens(F.col("text"))).persist()
    ref = toks.filter(F.col("doc_id") % 10 == 0)
    n_tokens = toks.count()
    n_ref = ref.count()

    uni, bi, tri = ngram_count_tables(ref)
    sizes = {"uni": uni.count(), "bi": bi.count(), "tri": tri.count()}

    t0 = time.time()
    n_docs = stupid_backoff_doc_scores(toks, ref).count()
    wall = time.time() - t0
    toks.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "corpus_tokens": n_tokens,
        "ref_tokens": n_ref,
        **{f"{k}_rows": v for k, v in sizes.items()},
        "table_rows_total": sum(sizes.values()),
        "table_to_ref_ratio": round(sum(sizes.values()) / n_ref, 3),
        "score_pass_sec": round(wall, 2),
    }


def heaps_stream(spark, n_tokens: int, alpha: float = 3 / 7, doc_len: int = 200,
                 seed: int = 7):
    """Open-vocabulary synthetic token stream with Heaps-law growth.

    Token ranks are drawn from a discrete power law via the inverse-CDF
    trick rank = floor(u^(-1/alpha)): the observed vocabulary then grows
    ~ n^(1/(1+alpha)) (ranks with mass >= 1/n are the ones seen), so
    alpha = 3/7 gives the standard Heaps exponent ~0.7 — unlike the
    testdata generator's closed 31-word vocabulary, which saturates
    immediately. The head is automatically "the"-like: rank 1 carries
    1 - 2^-alpha ~ 26% of all tokens, exercising the bi/tri join's skew
    path. Uniform is xxhash64-derived from the row index at 2^40
    granularity (deterministic, partitioning-independent; the mixture
    code's 1e6-granular md5 uniform would cap the distinct-rank space
    at 1e6 and artificially bend the vocabulary curve at large n — this
    probe needs no cross-engine oracle, so the finer non-portable hash
    is the right tool)."""
    ids = spark.range(n_tokens)
    u = (
        F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(1 << 40)).cast("double")
        + 0.5
    ) / float(1 << 40)
    rank = F.floor(F.pow(u, F.lit(-1.0 / alpha))).cast("bigint")
    return ids.select(
        (F.col("id") / doc_len).cast("bigint").alias("doc_id"),
        (F.col("id") % doc_len + 1).alias("pos"),
        F.concat(F.lit("w"), rank).alias("w"),
    )


def probe_heaps(spark, n_tokens: int) -> dict:
    """Count-table growth + score-pass cost on the open-vocab stream:
    the reference slice is doc_id % 10 == 0 (10% of tokens, like the
    sf-dir probe), the scored side is the full stream."""
    toks = heaps_stream(spark, n_tokens).persist()
    toks.count()
    ref = toks.filter(F.col("doc_id") % 10 == 0)
    n_ref = ref.count()

    uni, bi, tri = ngram_count_tables(ref)
    sizes = {"uni": uni.count(), "bi": bi.count(), "tri": tri.count()}
    head = uni.agg(F.max("c").alias("m")).first()["m"]

    t0 = time.time()
    n_docs = stupid_backoff_doc_scores(toks, ref).count()
    wall = time.time() - t0
    toks.unpersist()
    return {
        "mode": "heaps",
        "corpus_tokens": n_tokens,
        "ref_tokens": n_ref,
        "n_docs": n_docs,
        **{f"{k}_rows": v for k, v in sizes.items()},
        "head_token_share": round(head / n_ref, 3),
        "score_pass_sec": round(wall, 2),
    }


def main() -> None:
    args = sys.argv[1:]
    spark = get_session(app_name="lm-probe")
    if args and args[0] == "--heaps":
        sizes = [int(float(a)) for a in args[1:]] or [300_000, 3_000_000, 30_000_000]
        for n in sizes:
            print(json.dumps(probe_heaps(spark, n)))
        return
    dirs = args or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    for d in dirs:
        print(json.dumps(probe(spark, d)))


if __name__ == "__main__":
    main()
