"""Scaling probe for the anchor-blocked substring-containment operator
(queries/textops.py::q_contained_doc_pairs): wall time as the corpus
grows, with an EXACT structural invariant at every size.

Synthetic corpus (fully deterministic, md5-derived — no RNG): docs
0..m-1 are "bases" whose text is unique pseudo-random hex; docs m..n-1
are "containers" whose text embeds exactly one base verbatim between
unique filler. By construction the directed containment pairs are
EXACTLY the (container -> its base) pairs: bases never contain each
other (distinct random hex), containers are never contained (unique
prefixes), and each container embeds one base — so the operator must
return exactly n-m rows at every size (the probe raises if not).

This is the clean linear-structure regime (rarest-gram anchors are
near-unique). The adversarial high-duplication regime — every doc's
rarest gram shared by many docs — is the SAME degradation mode already
measured for LSH banding (docs/SCALE.md "LSH under high duplication");
containment candidates grow with anchor document frequency exactly as
LSH bucket pairs grow with bucket size.

Also prints the DuckDB quadratic position() oracle wall at the sizes
where it is feasible, to show the n^2-vs-anchor crossover.

Usage: python tools/containment_probe.py [n ...]   (default 5000 20000 80000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.queries.textops import q_contained_doc_pairs
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

ORACLE_MAX_N = 80_000  # ~17 s at 80k; quadratic beyond this is the point


def build_corpus(spark, n: int, out_dir: str) -> None:
    m = n // 2
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    # ~288 chars of doc-unique pseudo-random hex: 9 chained md5 blocks
    blocks = [F.md5(F.concat(F.lit(f"b{k}:"), F.col("doc_id").cast("string"))) for k in range(9)]
    base_text = F.concat(*blocks)
    filler = F.md5(F.concat(F.lit("fill:"), F.col("doc_id").cast("string")))
    # containers embed the text of base (doc_id % m) between unique filler
    cont_blocks = [
        F.md5(F.concat(F.lit(f"b{k}:"), (F.col("doc_id") % m).cast("string")))
        for k in range(9)
    ]
    cont_text = F.concat(filler, F.lit(" "), F.concat(*cont_blocks), F.lit(" "), filler)
    docs = ids.select(
        "doc_id",
        F.when(F.col("doc_id") < m, base_text).otherwise(cont_text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000, 80000]
    spark = get_session(app_name="containment-probe")
    print("| n docs | true pairs | anchor-blocked (s) | duckdb n^2 oracle (s) |")
    print("|---|---|---|---|")
    for n in sizes:
        out = f"/tmp/containment_probe_{n}"
        build_corpus(spark, n, out)
        df = q_contained_doc_pairs(spark, out)
        df.count()  # warm (codegen + cache fill)
        t0 = time.perf_counter()
        rows = q_contained_doc_pairs(spark, out).count()
        dt = time.perf_counter() - t0
        expected = n - n // 2
        if rows != expected:
            raise SystemExit(f"invariant broken at n={n}: {rows} != {expected}")
        o = "—"
        if n <= ORACLE_MAX_N:
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW d AS SELECT doc_id, text FROM "
                f"read_parquet('{out}/documents.parquet/*.parquet')"
            )
            t0 = time.perf_counter()
            (orows,) = con.execute(
                "SELECT count(*) FROM d a JOIN d b ON a.doc_id <> b.doc_id "
                "AND position(a.text IN b.text) > 0"
            ).fetchone()
            o = f"{time.perf_counter() - t0:.2f}"
            con.close()
            if orows != expected:
                raise SystemExit(f"oracle disagrees at n={n}: {orows} != {expected}")
        print(f"| {n} | {expected} | {dt:.2f} | {o} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
