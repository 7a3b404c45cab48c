"""Two-engine parity probe for the Efraimidis-Spirakis weighted sampler
(operators/mixture.py::weighted_sample_without_replacement): can its
selection be driver-hash-oracled against DuckDB, or must it stay
pytest-pinned?

The hazard (r8 verdict, stretch task): the uniform is md5-derived
(SQL-portable, bit-exact), but the selection key runs through
``ln(u) / w`` — IEEE ``ln`` is correctly-rounded in neither engine's
contract, so two engines may disagree in the last ulp, and a near-tied
adjacent pair in the descending key order could then RANK-FLIP across
the top-k boundary, failing the driver's stringified multiset compare
even though both samples are "correct".

Measured here at sf0.01 (documents, weight = length(text)):
1. per-row bitwise key equality across Spark and DuckDB,
2. the minimum adjacent key gap (among distinct keys, in ulps of the
   larger key) — the margin that protects rank order from a 1-ulp
   disagreement.

Two distinct verdicts (a driver query could expose the key column, or
only the selected rows):
- ``go_key_exposing``: requires every cross-engine key bit-identical —
  any mismatch fails the driver's stringified hash outright.
- ``go_membership``: requires the minimum distinct-key gap to exceed
  the measured cross-engine disagreement by a wide safety factor
  (>= 1e6 ulps here) — then a last-ulp ``ln`` disagreement cannot
  reorder any adjacent pair, so the SELECTED SET (the sampler's actual
  output — it drops ``__es_key``) is engine-identical.

Usage: python tools/weighted_sample_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.mixture import (
    _HASH_MOD,
    _id_hash,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

SEED = 42


def ulp(x: float) -> float:
    return math.ulp(abs(x))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="weighted-sample-probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # the sampler's key construction, built from the SAME helpers the
    # shipped operator uses (weighted_sample_without_replacement) so the
    # measured verdict cannot detach from the real code; weight =
    # character length of the text (positive, varies per row)
    u = (
        _id_hash(F.concat(F.col("doc_id").cast("string"), F.lit(f"#{SEED}"))) + 1
    ) / float(_HASH_MOD)
    key = F.log(u) / F.length("text").cast("double")
    sp = {
        r["doc_id"]: r["key"]
        for r in docs.select("doc_id", key.alias("key")).collect()
    }

    import duckdb

    con = duckdb.connect()
    du = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#{SEED}'), 1, 15))::BIGINT
                       % 1000000 + 1) / 1000000.0)
                   / CAST(length(text) AS DOUBLE) AS key
            FROM read_parquet('{os.path.join(sf_dir, "documents.parquet")}')
            """
        ).fetchall()
    )

    assert set(sp) == set(du)
    mismatches = [
        i for i in sp
        if sp[i].hex() != du[i].hex()  # bit-pattern compare, not ==
    ]
    max_ulp_diff = 0.0
    for i in mismatches:
        max_ulp_diff = max(max_ulp_diff, abs(sp[i] - du[i]) / ulp(sp[i]))

    # adjacent-gap margin in the engine's own ranking (desc key, id
    # tiebreak), ignoring exact ties (tiebreak handles those portably)
    ranked = sorted(sp.items(), key=lambda kv: (-kv[1], kv[0]))
    min_gap_ulps = float("inf")
    for (_, a), (_, b) in zip(ranked, ranked[1:]):
        if a != b:
            min_gap_ulps = min(min_gap_ulps, (a - b) / ulp(a))

    out = {
        "sf_dir": sf_dir,
        "rows": len(sp),
        "bitwise_mismatches": len(mismatches),
        "max_cross_engine_ulp_diff": max_ulp_diff,
        "min_distinct_gap_ulps": round(min_gap_ulps, 1),
        "go_key_exposing": len(mismatches) == 0,
        "go_membership": min_gap_ulps > max(1e6, 1e3 * max(max_ulp_diff, 1.0)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
