"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference medallion-lakehouse workshop
(Doc-UP-AlejandroJaimes/big-data-processing-with-aws-glue-workshop).

Built Spark-first: DataFrame / SQL plans optimized by Catalyst, explicit
partitioning for scale, zero row-at-a-time Python in the hot path.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``sources``    : readers (robust CSV, parquet lake, in-memory) and writers
- ``functions``  : scalar column expressions (dates, text normalization, keys)
- ``operators``  : reusable frame operators (dedup, joins, DQ, windows, top-k)
- ``plans``      : the medallion pipeline (bronze/silver/gold) + analytics
- ``queries``    : driver-facing benchmark/correctness queries + DuckDB oracles
- ``extensions`` : training-data ops (fuzzy dedup, ANN, text stats, multimodal)
- ``streaming``  : event-time windowing (batch and Structured Streaming)
"""

__version__ = "0.1.0"
