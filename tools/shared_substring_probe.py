"""Scaling probe for the partial-overlap shared-substring operator
(queries/textops.py::q_shared_substring_pairs): wall time as the corpus
grows, with an EXACT structural invariant at every size.

Synthetic corpus (fully deterministic, md5-derived — no RNG): docs come
in pairs (2k, 2k+1). Both members carry doc-unique pseudo-random hex
filler and ONE shared 96-char passage keyed by the pair id, wrapped in
parity-distinct delimiters ("(...)" vs "[...]") so the shared run can
never extend into the filler. Neither member contains the other, and
passages differ across pairs, so the ground truth is EXACTLY n/2 rows,
each with overlap_chars == 96 and is_containment == false — the probe
raises on any deviation.

This is the linear-structure regime: gram frequencies are bounded (each
gram occurs at most twice), so the hashed-gram self-join carries
~81 matching positions per true pair and nothing else. The adversarial
regime — one boilerplate passage shared by ALL docs — makes the OUTPUT
itself quadratic (every pair genuinely overlaps), which no
implementation can beat; the operator's docstring and docs/SCALE.md
carry that honesty note (mitigation at scale: gram document-frequency
cap or per-source sharding, with the recall proviso).

Also times the DuckDB twin (the driver's oracle — same diagonal-islands
algebra, single node) at every size for the distributed-vs-single-node
crossover.

Usage: python tools/shared_substring_probe.py [n ...]  (default 5000 20000 80000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES
from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
    q_shared_substring_pairs,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

PASSAGE_CHARS = 96  # 3 md5 blocks


def build_corpus(spark, n: int, out_dir: str) -> None:
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pair = (F.col("doc_id") / 2).cast("bigint")
    passage = F.concat(
        *[F.md5(F.concat(F.lit(f"p{k}:"), pair.cast("string"))) for k in range(3)]
    )
    filler = F.concat(
        *[
            F.md5(F.concat(F.lit(f"f{k}:"), F.col("doc_id").cast("string")))
            for k in range(2)
        ]
    )
    wrapped = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit("("), passage, F.lit(")"))
    ).otherwise(F.concat(F.lit("["), passage, F.lit("]")))
    docs = ids.select(
        "doc_id",
        F.concat(filler, wrapped, filler).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000, 80000]
    spark = get_session(app_name="shared-substring-probe")
    print("| n docs | true pairs | spark gram-join (s) | duckdb twin (s) |")
    print("|---|---|---|---|")
    for n in sizes:
        out = f"/tmp/shared_substring_probe_{n}"
        build_corpus(spark, n, out)
        df = q_shared_substring_pairs(spark, out)
        rows = df.count()  # warm (codegen + cache fill)
        expected = n // 2
        if rows != expected:
            raise SystemExit(f"invariant broken at n={n}: {rows} != {expected}")
        bad = df.filter(
            (F.col("overlap_chars") != PASSAGE_CHARS) | F.col("is_containment")
        ).count()
        if bad:
            raise SystemExit(f"{bad} rows with wrong overlap/flag at n={n}")
        t0 = time.perf_counter()
        q_shared_substring_pairs(spark, out).count()
        dt = time.perf_counter() - t0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{out}/documents.parquet/*.parquet')"
        )
        t0 = time.perf_counter()
        (orows,) = con.execute(
            f"SELECT count(*) FROM ({ORACLES['shared_substring_pairs']})"
        ).fetchone()
        o = time.perf_counter() - t0
        con.close()
        if orows != expected:
            raise SystemExit(f"oracle disagrees at n={n}: {orows} != {expected}")
        print(f"| {n} | {expected} | {dt:.2f} | {o:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
