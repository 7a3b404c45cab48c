"""Parquet table access for the driver's testdata star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projections into this source.

    TIMESTAMP(NANOS) columns (events.ts) arrive as int64 nanos under
    ``spark.sql.legacy.parquet.nanosAsLong`` and are converted to
    microsecond timestamps here — integer floor-division by 1000, the same
    truncation DuckDB applies when it reads nanos into its micros TIMESTAMP.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV, not float '/': nanos ~1.7e18 exceed double's 53-bit
        # exact-integer range, so float division would corrupt low microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
