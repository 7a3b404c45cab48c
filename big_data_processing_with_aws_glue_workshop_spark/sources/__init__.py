from .readers import (
    read_csv_inferred,
    read_csv_robust,
    read_parquet_lake,
    read_parquet_tolerant,
    rows_to_df,
)
from .writers import write_csv_single, write_parquet, write_parquet_partitioned

__all__ = [
    "read_csv_robust",
    "read_csv_inferred",
    "read_parquet_lake",
    "read_parquet_tolerant",
    "rows_to_df",
    "write_parquet_partitioned",
    "write_parquet",
    "write_csv_single",
]
