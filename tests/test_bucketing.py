"""Bucketed managed tables: co-located joins must not shuffle."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.sources.catalog import (
    read_table,
    save_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    save_bucketed_table(orders, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"])
    save_bucketed_table(
        customer, "b_customer", ["c_custkey"], 8, sort_cols=["c_custkey"]
    )
    # the test tables are tiny: disable auto-broadcast so the join planner
    # actually exercises the bucketed sort-merge path being asserted
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_no_shuffle(spark, bucketed):
    joined = read_table(spark, "b_orders").join(
        read_table(spark, "b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan
    assert joined.count() > 0


def test_bucketed_agg_no_shuffle(spark, bucketed):
    agg = (
        read_table(spark, "b_orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
