#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage: python tools/explain_dump.py <tag> <suffix> [name ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: a
curated hot list). The optimization rounds commit these as the
before/after plan evidence the judge checks claims against.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

DEFAULT = [
    "training_pipeline_summary",
    "semantic_dedup_decisions",
    "doc_dup_components",
    "embedding_near_dup_clustered",
    "shared_substring_pairs",
    "cross_corpus_contamination",
    "minhash_near_duplicates",
    "contained_doc_pairs",
    "doc_lm_backoff_scores",
    "copurchase_pagerank",
    "cross_source_overlap",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="explain-dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
