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


def test_typicality_final_join_no_shuffle(spark, sf_dir):
    """The zero-Exchange claim in q_doc_embedding_typicality's docstring,
    made concrete: with documents bucketed on doc_id and the per-vector
    typicality scores bucketed on vec_id (same bucket count), the
    pipeline's final 1:1 curation join plans with NO Exchange."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.vectors import (
        typicality_join,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _tokens,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"))
    )
    per_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        "label",
        (F.col("label").cast("double") / 10).alias("typicality"),
    )
    save_bucketed_table(docs, "b_typ_docs", ["doc_id"], 8, sort_cols=["doc_id"])
    save_bucketed_table(per_vec, "b_typ_vec", ["vec_id"], 8, sort_cols=["vec_id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = typicality_join(
            read_table(spark, "b_typ_docs"), read_table(spark, "b_typ_vec")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, f"typicality join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_typ_docs")
        spark.sql("DROP TABLE IF EXISTS b_typ_vec")


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
