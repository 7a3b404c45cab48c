"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the local replica of the driver's CORRECTNESS gate."""

import pytest

from big_data_processing_with_aws_glue_workshop_spark.queries import (
    ORACLES,
    QUERIES,
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)

from .oracle_harness import compare

# Retired queries left the driver registry but keep their pytest oracle
# gate — retirement frees a rotation slot, it does not waive correctness.
_GATED = {**QUERIES, **RETIRED_QUERIES}
_GATED_ORACLES = {**ORACLES, **RETIRED_ORACLES}


@pytest.mark.parametrize("name", sorted(_GATED))
def test_query_matches_oracle(name, spark, sf_dir):
    df = _GATED[name](spark, sf_dir)
    if name not in _GATED_ORACLES:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    compare(df, _GATED_ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_harness_rejects_int_vs_float_dtype_drift(spark, sf_dir):
    """The r5 media_byte_histogram escape: DuckDB HUGEINT -> pandas float64
    vs Spark int64 passed the old float-coercing compare() but failed the
    driver's stringified value hash. The harness must now reject exactly
    that shape — an uncast SUM over BIGINT (HUGEINT result) against an
    integer engine column — before the driver ever sees it."""
    import pyspark.sql.functions as F

    df = spark.range(3).agg(F.sum("id").alias("s"))  # int64 side
    uncast = "SELECT SUM(doc_id) AS s FROM (SELECT 1 AS doc_id UNION ALL SELECT 2)"
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        compare(df, uncast, sf_dir)
    # and the repo-convention CAST fixes it (values intentionally equal: 3)
    compare(df, "SELECT CAST(SUM(doc_id) AS BIGINT) AS s FROM "
                "(SELECT 1 AS doc_id UNION ALL SELECT 2)", sf_dir)


def test_rows_only_queries_are_the_documented_allowlist():
    """Every registered query must carry a DuckDB oracle unless it is one
    of the four documented by-design exceptions (approximate ANN paths
    with pytest-pinned recall, the HLL sketch profile, the engine-RNG
    sample). A new query landing without an oracle fails here instead of
    silently downgrading to the driver's weaker rows-only check."""
    from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES, QUERIES

    allowed = {
        "ann_lsh_topk",
        "ivf_ann_topk",
        "approx_distinct_profile",
        "bernoulli_sample",
    }
    assert set(QUERIES) - set(ORACLES) == allowed
