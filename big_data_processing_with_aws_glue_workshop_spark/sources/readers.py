"""Source readers.

Replaces the reference's GlueContext/DynamicFrame I/O adapters with native
DataFrameReader calls (the reference only used DynamicFrame as a thin wrapper
around reads/writes — see reference src/gold/job-gold-rues.py:66-75).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Exact robust-CSV option set of the reference bronze ingest
# (reference src/bronze/job-bronze-rues.py:55-67): header, NO inference (all
# string), UTF-8, quoted/escaped with '"', multiline records, whitespace
# trimming, PERMISSIVE recovery, bounded column count.
ROBUST_CSV_OPTIONS: dict[str, str] = {
    "header": "true",
    "inferSchema": "false",
    "encoding": "UTF-8",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
    "mode": "PERMISSIVE",
    "maxColumns": "50",
}


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_record_col: str | None = None,
    **overrides: str,
) -> DataFrame:
    """Bronze-grade CSV scan (operator S1). All-string unless a schema is
    given; PERMISSIVE so malformed rows surface as NULLs, never as job
    failures. multiLine=true disables input splitting — at 100 TB prefer
    pre-split files or multiLine=false via an override.

    ``corrupt_record_col``: capture unparseable raw lines into this column
    (requires an explicit schema that includes the column) so DQ can count
    and quarantine them instead of silently nulling."""
    opts = {**ROBUST_CSV_OPTIONS, **overrides}
    if corrupt_record_col:
        opts["columnNameOfCorruptRecord"] = corrupt_record_col
    reader = spark.read.format("csv").options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """Catalog-dim CSV scan with schema inference (operator S2; reference
    src/silver/job-silver-rues.py:92-96). Inference double-reads the file —
    acceptable only for small dims."""
    return (
        spark.read.format("csv")
        .option("header", "true")
        .option("inferSchema", "true")
        .option("encoding", "UTF-8")
        .load(path)
    )


def read_parquet_lake(
    spark: SparkSession, path: str, drop_partition_cols: Iterable[str] = ()
) -> DataFrame:
    """Partitioned-parquet lake scan (operator S3); partition directories are
    pruned by Catalyst when queries filter on them. The medallion layers drop
    the physical partition column after read (reference
    src/silver/job-silver-rues.py:76-79)."""
    df = spark.read.parquet(path)
    for c in drop_partition_cols:
        if c in df.columns:
            df = df.drop(c)
    return df


def read_parquet_tolerant(
    spark: SparkSession,
    path: str,
    merge_schema: bool = False,
    ignore_corrupt: bool = False,
    ignore_missing: bool = True,
    modified_after: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Lake scan hardened for the failure modes a 100 TB corpus actually
    has (none of which the reference meets on its single curated CSV):

    - ``merge_schema``: schema evolution across files — a column added by
      a newer writer appears (nullable NULL) for older files instead of
      whichever single file footer Spark sampled deciding the schema.
      Costs a footer read per file at planning; leave off for
      schema-stable lakes.
    - ``ignore_corrupt``: skip unreadable/truncated files (a failed
      writer's torn output) instead of failing the whole scan N hours in.
      Per-read option, so one quarantine-aware job can opt in while the
      default strict contract stays job-failing.
    - ``ignore_missing``: tolerate files deleted between driver listing
      and task execution (compaction/retention running concurrently —
      e.g. ``operators/compaction.py`` swaps, whose windows are benign
      for idempotent readers).
    - ``modified_after`` (``YYYY-MM-DDTHH:MM:SS``): driver-side listing
      filter on modification time — a poor-man's incremental read when no
      bookmark state exists (``sources/bookmarks.py`` is the real one).
    - ``recursive``: pick up nested non-hive directory trees.
    """
    reader = (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .option("ignoreCorruptFiles", str(ignore_corrupt).lower())
        .option("ignoreMissingFiles", str(ignore_missing).lower())
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    return reader.parquet(path)


def rows_to_df(
    spark: SparkSession,
    rows: list[Mapping],
    schema: T.StructType | str,
) -> DataFrame:
    """In-memory rows -> DataFrame with an EXPLICIT schema (operator S8).
    The reference let createDataFrame infer from dicts; an explicit schema
    keeps empty error logs schema-stable."""
    return spark.createDataFrame([tuple(r[f] for f in _field_names(schema)) for r in rows], schema)


def _field_names(schema: T.StructType | str) -> list[str]:
    if isinstance(schema, str):
        return [part.strip().split(" ")[0] for part in schema.split(",")]
    return schema.fieldNames()

