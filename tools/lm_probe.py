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


def main() -> None:
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_session(app_name="lm-probe")
    for d in dirs:
        print(json.dumps(probe(spark, d)))


if __name__ == "__main__":
    main()
