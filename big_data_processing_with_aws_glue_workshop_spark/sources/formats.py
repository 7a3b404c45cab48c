"""Additional lake formats beyond parquet/CSV.

ORC and JSON(lines) ship with Spark and are first-class here. Avro and the
table formats (Delta / Iceberg / Hudi) need jars that are not in this
environment — they are stubbed behind capability checks that raise a clear
error naming the missing package, and the MERGE semantics they would
provide are available jar-free via ``operators.merge`` (SCD1/SCD2 over
plain parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan. Call ``require_format(spark, 'avro')`` first — spark-avro
    is 'built-in but external' and needs the --packages deployment."""
    require_format(spark, "avro")
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    require_format(df.sparkSession, "avro")
    df.write.mode(mode).format("avro").save(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan; pass a schema in production — inference double-reads.

    PERMISSIVE like the bronze CSV scan: malformed lines become NULL rows
    instead of failing the job; pass ``corrupt_record_col`` (and include it
    in the schema) to capture the raw bad line for DQ quarantine. JSONL
    splits by line, so it parallelizes over byte ranges at any file size —
    unlike multiLine CSV/JSON."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_record_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


_TABLE_FORMAT_HINTS = {
    "delta": "delta-spark (io.delta:delta-spark_2.13)",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime",
    "hudi": "org.apache.hudi:hudi-spark-bundle",
    "avro": "org.apache.spark:spark-avro",
}


def require_format(spark: SparkSession, fmt: str) -> None:
    """Raise a clear error when a jar-backed format is requested in an
    environment without its package. Probes Spark's DataSource registry —
    the authoritative check (class presence alone is not enough: avro's
    classes ship in the assembly yet the source is 'external' and
    undeployable without --packages)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            fmt, spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        )
        loaded = True
    except Exception:
        loaded = False
    if not loaded:
        hint = _TABLE_FORMAT_HINTS.get(fmt, f"the {fmt} connector package")
        raise ModuleNotFoundError(
            f"table format {fmt!r} needs {hint} on the "
            "classpath (not bundled in this environment). For MERGE/upsert "
            "semantics without jars, use "
            "big_data_processing_with_aws_glue_workshop_spark.operators.merge (SCD1/SCD2 over parquet)."
        )
