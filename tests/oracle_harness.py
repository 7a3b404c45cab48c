"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Compares row count, sorted column names, and order-insensitive values.
Floats are compared EXACTLY by default — the query contract (decimal-exact
sums, single IEEE division, no double rounding) is designed to be
bit-reproducible across engines; any drift is a bug to fix in the query,
not the comparison.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from big_data_processing_with_aws_glue_workshop_spark.queries._tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (int, float)) or not (
                    isinstance(v, float) and math.isnan(v)
                ) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Raise AssertionError with a diff summary on any mismatch."""
    sp = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    try:
        du = con.execute(oracle_sql).df()
    finally:
        con.close()

    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duckdb={len(du)}"

    sp_c, du_c = _canon(sp), _canon(du)
    for c in sp_c.columns:
        a, b = sp_c[c], du_c[c]
        # Dtype-KIND strictness: the driver's value hash stringifies each
        # cell, so int64 1856 vs float64 1856.0 is a driver FAIL even when
        # the values are numerically identical (the r5 media_byte_histogram
        # lesson: DuckDB HUGEINT -> pandas float64 while Spark returns
        # int64). An integer column on one side must therefore never be
        # compared against a float column on the other — that is an oracle
        # typing bug (missing CAST(... AS BIGINT)), not a tolerable drift.
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_flt = pd.api.types.is_float_dtype(a)
        b_flt = pd.api.types.is_float_dtype(b)
        if (a_int and b_flt) or (a_flt and b_int):
            raise AssertionError(
                f"dtype-kind mismatch in column {c!r}: spark={a.dtype} "
                f"duckdb={b.dtype} — integer-vs-float drift stringifies "
                "differently under the driver hash; CAST the oracle "
                "aggregate (AS BIGINT / AS DOUBLE) to match the engine"
            )
        if a_flt or b_flt:
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
        else:
            eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            raise AssertionError(
                f"value mismatch in column {c!r} at canonical row {bad}: "
                f"spark={sp_c[c][bad]!r} duckdb={du_c[c][bad]!r} "
                f"({int((~eq).sum())} differing rows)"
            )
