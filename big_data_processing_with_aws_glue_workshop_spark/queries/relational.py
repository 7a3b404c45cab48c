"""Relational query surface: the reference's operator families (SURVEY.md §2)
re-expressed over the driver's TPC-H-ish star schema.

Each query cites the reference operators it covers. Numeric determinism
contract (so the DuckDB oracle hash-matches bit-for-bit):

- Sums over floating columns go through ``decimal(18,2)`` (exact, order-
  independent) and are cast back to double at the end.
- Averages/ratios are a SINGLE IEEE-754 double division of exact inputs —
  never ``avg()`` over doubles (whose accumulation order differs per engine)
  and never ``round()`` on doubles (whose tie-breaking differs per engine).
- Top-k queries carry a unique-key tiebreak so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._tables import load


def _dec(c: str) -> F.Column:
    """Exact fixed-point view of a 2-decimal monetary/quantity column."""
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Aggregation family (reference A1-A9: src/silver/job-silver-rues.py:355-391,
# test/query_gold_validations.sql:5-50)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate in one pass (A2 single-pass pattern, A6 avg).

    Spark plan: parquet scan with pushed filter -> partial hash agg ->
    shuffle on (l_returnflag, l_linestatus) -> final hash agg. Map-side
    partial aggregation keeps the shuffle tiny at 100 TB.
    """
    l = load(spark, sf_dir, "lineitem")
    agg = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).alias("_sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sum_qty").cast("double").alias("sum_qty"),
        F.col("_sum_base").cast("double").alias("sum_base_price"),
        F.col("_sum_disc").cast("double").alias("sum_disc_price"),
        (F.col("_sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("_sum_base").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


def q_active_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold validation Q1 analog: inner join + UPPER filter + grouped
    COUNT(DISTINCT) (J4/P7/A5/O1; test/query_gold_validations.sql:5-13)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .filter(F.upper(F.col("o_orderstatus")) == "O")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("active_customers").desc(), F.col("c_mktsegment"))
    )


def q_avg_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold validation Q2 analog: join + AVG + HAVING + top-5
    (J4/A6/A9/O2; test/query_gold_validations.sql:20-31)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).alias("_sum_bal"),
        )
        .filter(F.col("n_customers") > 5)
        .select(
            "n_name",
            "n_customers",
            (F.col("_sum_bal").cast("double") / F.col("n_customers")).alias(
                "avg_acctbal"
            ),
        )
        .orderBy(F.col("avg_acctbal").desc(), F.col("n_name"))
        .limit(5)
    )


def q_fulfillment_rate_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold validation Q3 analog: conditional COUNT(DISTINCT) + ratio of
    aggregates (A7/A8; test/query_gold_validations.sql:38-44)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("total_customers"),
            F.countDistinct(
                F.when(F.upper(F.col("o_orderstatus")) == "F", F.col("o_custkey"))
            ).alias("fulfilled_customers"),
        )
        .select(
            "n_name",
            "total_customers",
            "fulfilled_customers",
            (
                (F.col("fulfilled_customers") * F.lit(100.0))
                / F.col("total_customers")
            ).alias("fulfillment_pct"),
        )
    )


def q_validation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass consolidated DQ validation (A2/D2): one aggregate node
    computing every rule's violation count in one scan — the reference's
    explicitly 'OPTIMIZADO' pattern (src/silver/job-silver-rues.py:355-391)."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_quantity"),
        F.count(F.when(F.col("l_quantity") < 0, 1)).alias("negative_quantity"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_discount"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned_rows"),
        F.count(
            F.when(
                F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"), 1
            )
        ).alias("late_shipments"),
        F.count(F.when(F.col("l_tax").isNull() | (F.col("l_tax") < 0), 1)).alias(
            "bad_tax"
        ),
    )


def q_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT dedup projection (A10; src/gold/job-gold-rues.py:92-119)."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Window / dedup family (W1/W2: src/silver/job-silver-rues.py:208-211)
# ---------------------------------------------------------------------------


def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest window dedup (RN-002 analog, W1/W2): row_number over
    (partition key, desc order, unique tiebreak) then keep rank 1."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
    )


def q_top5_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tiebreak (O2) -> TakeOrderedAndProject."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Join family (J1-J5)
# ---------------------------------------------------------------------------


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti referential-integrity check (J3/D3;
    src/gold/job-gold-rues.py:215-224)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_acctbal")
    )


def q_customer_geography_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop broadcast dim-enrichment chain (J1/J2 analog): customer ->
    nation -> region, both dims broadcast (9/505-row catalog joins in the
    reference: src/silver/job-silver-rues.py:224-292)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


def q_revenue_by_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-fact x small-dim join chain with decimal-exact revenue
    (J4 at scale): lineitem |X| supplier (broadcast) |X| nation (broadcast)."""
    l = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(supplier), l.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar-function family (F1-F21) and filters (P1-P13)
# ---------------------------------------------------------------------------


def q_multiformat_date_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RN-001 analog (F8/F9/F16): strings in two date formats, standardized
    with coalesce(to_date fmt A, to_date fmt B); NULL when neither matches
    (src/silver/job-silver-rues.py:157-171). ANSI off => null-on-parse-fail."""
    orders = load(spark, sf_dir, "orders")
    raw = orders.withColumn(
        "raw_date",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "yyyyMMdd"),
        ).otherwise(F.date_format("o_orderdate", "yyyy/MM/dd HH:mm:ss")),
    )
    parsed = raw.withColumn(
        "parsed_date",
        F.coalesce(
            F.to_date(F.col("raw_date"), "yyyyMMdd"),
            F.to_date(F.col("raw_date"), "yyyy/MM/dd HH:mm:ss"),
        ),
    )
    return (
        parsed.groupBy(F.year("parsed_date").cast("int").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_year")
    )


def q_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE bucketing (F15 segmento_antiguedad analog;
    test/query_gold_validations.sql:148-153)."""
    customer = load(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "NEGATIVE")
        .when(F.col("c_acctbal") < 1000, "LOW")
        .when(F.col("c_acctbal") < 5000, "MID")
        .otherwise("HIGH")
    )
    return (
        customer.withColumn("balance_bucket", bucket)
        .groupBy("balance_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


def q_supplier_unique_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_ws surrogate-key builder (F4/RN-006 id_unico;
    src/silver/job-silver-rues.py:336-339)."""
    supplier = load(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.concat_ws(
            "_",
            F.col("s_nationkey").cast("string"),
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
        ).alias("id_unico"),
    )


def q_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_renovacion computed columns (F11/F12/F14): datediff against an
    INJECTED reference date (determinism: the reference's current_date is
    parameterized away, SURVEY §7.4) + 0/1 flag (src/gold/job-gold-rues.py:134-148)."""
    orders = load(spark, sf_dir, "orders")
    ref = F.lit("1998-12-01").cast("date")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(ref, F.col("o_orderdate").cast("date")).cast("int").alias(
            "days_open"
        ),
        F.when(F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"), 1)
        .otherwise(0)
        .cast("int")
        .alias("flag_old"),
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling stand-in for ORDER BY RAND() LIMIT / Bernoulli
    sample (O3/O4): modulo-hash on the key so both engines agree.

    RETIRED in the r10 rotation (driver row green r9), superseded 1:1 by
    sampled_quantile_profile (same md5-uniform hash class, bounded
    MERGEABLE sample state, value-hash gate at two SFs); stays
    pytest-hash-gated via RETIRED_QUERIES."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_sampled_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of l_extendedprice read off a slot-minima coordinated
    sample of lineitem (operators/sketch.py: the bounded MERGEABLE
    uniform sample that rides incremental refresh) — the sketch
    family's quantile readout, hash-oracle-able end to end because the
    slot and rank hashes are the repo's md5-uniform construction
    (DuckDB: ('0x'||substr(md5(..),1,15))::BIGINT) and the readout is
    a DETERMINISTIC positional selection (lower empirical quantile,
    index floor(q*(n-1))) of an actual data value.

    Scale shape: the ONLY full-corpus pass is the map-side hash +
    slot-groupBy min (shuffles <= slots struct rows); ranking and the
    quantile join touch <= slots rows. DKW bounds the rank error at
    ~2.1% (n=4096, 99% conf) independent of the value distribution.

    Registered in the r10 rotation (tail, due r11), paired 1:1 with the
    deterministic_sample retirement it supersedes — see
    queries/__init__.py's rotation notes. Pytest-oracle-gated at two SFs
    since r9 (tests/test_sketch.py).
    """
    from ..operators.sketch import minima_sample, sample_rows
    from ._tables import parallelize_scan

    # the per-row double-md5 hashing is the dominant map work; an
    # under-split scan (one row group at test SFs) would run it on one
    # core. Safe here: the slot-min monoid is partitioning-independent
    # and every readout selection carries a total-order tiebreak.
    li = parallelize_scan(load(spark, sf_dir, "lineitem"), "l_orderkey")
    keyed = li.select(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("rk"),
        "l_extendedprice",
    )
    rows = sample_rows(minima_sample(keyed, "rk", ["l_extendedprice"]))
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("l_extendedprice").asc(), F.col("key").asc()
    )
    ranked = rows.select(
        "l_extendedprice",
        F.row_number().over(w).alias("vrn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n_sample"),
    )
    qs = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(q) for q in (0.1, 0.25, 0.5, 0.75, 0.9)])
        ).alias("q")
    )
    return (
        ranked.join(
            F.broadcast(qs),
            F.floor(F.col("q") * (F.col("n_sample") - 1)).cast("long") + 1
            == F.col("vrn"),
        )
        .select(
            "q",
            F.col("n_sample").cast("long").alias("n_sample"),
            F.col("l_extendedprice").cast("double").alias("price_q"),
        )
        .orderBy("q")
    )


# DuckDB twin of q_sampled_quantile_profile (registered r10; also
# hash-gated at two SFs by tests/test_sketch.py; the md5-uniform forms
# mirror operators/mixture.py::_id_hash's documented DuckDB equivalence)
SAMPLED_QUANTILE_PROFILE_ORACLE = """
WITH keyed AS (
  SELECT (l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR) AS rk,
         l_extendedprice
  FROM lineitem
), hashed AS (
  SELECT ('0x' || substr(md5(rk || '@42'), 1, 15))::BIGINT % 4096 AS slot,
         ('0x' || substr(md5(rk || '#42'), 1, 15))::BIGINT AS rank,
         rk, l_extendedprice
  FROM keyed
), minima AS (
  SELECT slot, rank, rk, l_extendedprice,
         row_number() OVER (
           PARTITION BY slot ORDER BY rank, rk, l_extendedprice
         ) AS mrn
  FROM hashed
), ranked AS (
  SELECT l_extendedprice,
         row_number() OVER (ORDER BY l_extendedprice, rk) AS vrn,
         count(*) OVER () AS n
  FROM minima WHERE mrn = 1
)
SELECT q, CAST(n AS BIGINT) AS n_sample,
       CAST(l_extendedprice AS DOUBLE) AS price_q
FROM ranked, (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS qv(q)
WHERE vrn = CAST(floor(q * (n - 1)) AS BIGINT) + 1
ORDER BY q
"""


def q_priority_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + timestamp range predicates (P6/P8/P10;
    test/query_gold_validations.sql:95,150-151)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000.0, 100000.0)
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


def q_name_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + containment + upper/trim normalization predicates
    (P7/P11/P12/F1-F3; src/silver/job-silver-rues.py:160-166,190-193)."""
    customer = load(spark, sf_dir, "customer")
    return customer.filter(
        (F.upper(F.trim(F.col("c_mktsegment"))) == "BUILDING")
        & F.col("c_name").rlike("[0-9]{2}$")
        & F.col("c_name").contains("#")
    ).select(
        "c_custkey",
        "c_name",
        F.length("c_name").cast("int").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# Grouping-set / pivot / set-operation family (§2.4/§2.7: absent from the
# reference but free in Spark — included so the engine's surface is complete)
# ---------------------------------------------------------------------------


def q_status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per (status, priority), per status, grand total."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


def q_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns per l_returnflag row."""
    l = load(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )
    # absent (flag, status) combinations pivot to NULL; normalize to 0 to
    # match conditional-aggregation semantics
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_fulfilled"),
    )


def q_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: (urgent-order custkeys UNION high-order custkeys)
    INTERSECT building-segment custkeys EXCEPT negative-balance custkeys."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("custkey")
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    negative = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return urgent.union(high).intersect(building).exceptAll(negative)


def q_unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-status aggregates back to long (metric, value)
    form — the inverse of the pivot family."""
    orders = load(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that placed at least one urgent
    order — the positive counterpart of the anti-join integrity check."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) next to the exact count — the scalable
    stand-in for grouped COUNT(DISTINCT) at 100 TB (SURVEY §2.4 note).
    Rows-only check: HLL sketches are implementation-specific."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )


def q_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (O4; reference src/bronze/job-bronze-rues.py:84).
    Rows-only check: the sampling RNG is engine-specific, but the seed makes
    it reproducible run-to-run within Spark."""
    orders = load(spark, sf_dir, "orders")
    return orders.sample(withReplacement=False, fraction=0.01, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-fact x big-fact join chain (TPC-H Q3 shape): customer |X| orders
    |X| lineitem with selective filters on BOTH fact sides, grouped revenue,
    deterministic top-10. This is the one join shape the dim-enrichment
    queries don't exercise: at production scale neither side fits the
    broadcast threshold, so the plan is a shuffle (sort-merge or AQE-chosen
    shuffled-hash) join on o_custkey then o_orderkey — pinned by
    tests/test_plans.py::test_fact_fact_join_shuffle_shape with broadcasting
    disabled (at test SF the post-filter inputs are small enough that
    Catalyst correctly broadcasts instead). The date/segment filters are
    pushed to the parquet scans (PushedFilters), shrinking the shuffled
    sides by ~an order of magnitude before any exchange; AQE coalesces the
    post-filter partitions."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(l, orders.o_orderkey == l.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


def q_above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (customers above their nation's average
    balance), decorrelated into a single window pass: one shuffle on
    c_nationkey computes the per-nation exact sum/count alongside every row,
    instead of a second scan + self-join. The average is one IEEE division
    of exact decimal/int inputs (oracle-determinism contract)."""
    customer = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    nation_avg = (
        F.sum(_dec("c_acctbal")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        customer.withColumn("nation_avg", nation_avg)
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "nation_avg",
        )
    )


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share per brand (TPC-H Q14 shape): lineitem |X| part
    with a startswith predicate feeding a conditional sum / total sum ratio.
    The part side broadcasts (bounded catalog vs the unbounded fact), the
    date filter is pushed to the lineitem scan, and the conditional and
    unconditional sums come out of ONE aggregate pass — no second scan for
    the denominator. Exact decimal sums; the share is one IEEE division."""
    l = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    is_promo = F.col("p_type").startswith("ECONOMY")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), l.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(is_promo, revenue).otherwise(F.lit(0).cast("decimal(18,2)")))
            .alias("_promo"),
            F.sum(revenue).alias("_total"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "p_brand",
            F.col("_promo").cast("double").alias("promo_revenue"),
            F.col("_total").cast("double").alias("total_revenue"),
            (
                F.col("_promo").cast("double") * F.lit(100.0)
                / F.col("_total").cast("double")
            ).alias("promo_pct"),
            "n_items",
        )
    )


def q_ml_feature_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite flagship: the reference's ML-dataset pattern (analytics Q4,
    test/query_gold_validations.sql:75-165) on the TPC-H analog — filtered
    inner join -> keep-latest window dedup -> CASE label + segment bucketing
    + derived feature -> deterministic subsample. Touches joins, windows,
    IN-list/NULL filters, CASE, casts, arithmetic in one plan."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").isNotNull()
            & F.col("c_mktsegment").isNotNull()
        )
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = base.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    ref_year = 1998
    featured = latest.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.year("o_orderdate").cast("int").alias("last_order_year"),
        F.when(F.year("o_orderdate") >= ref_year - 1, 1).otherwise(0)
        .cast("int")
        .alias("active_label"),
        F.when(F.col("o_totalprice") < 50000, "SMALL")
        .when(F.col("o_totalprice").between(50000, 150000), "MEDIUM")
        .otherwise("LARGE")
        .alias("order_size_segment"),
        (F.lit(ref_year) - F.year("o_orderdate")).cast("int").alias("years_inactive"),
    )
    return featured.filter(F.col("c_custkey") % 3 == 0)


def q_lineitem_cube_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE (beyond-ref §2.7 widening; ROLLUP's partial lattice is
    covered by status_priority_rollup): ALL FOUR grouping sets over
    (l_returnflag, l_linestatus) — detail, both one-column marginals, and
    the grand total in ONE pass, each row tagged with the SQL-standard
    GROUPING bitmask so consumers can tell a real NULL from a subtotal.

    Plan shape: Spark expands the cube into a single Expand + hash
    aggregate — one scan, one shuffle, rows multiplied only by the number
    of grouping sets (4 here), not re-scanned per set. Sums stay exact
    (decimal) until the final double cast."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("grouping_set"),
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sp"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "grouping_set",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            "n_rows",
        )
    )


def q_customer_balance_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment per nation (window-family widening): ntile(4)
    over account balance inside each nation — the SQL-standard fixed-bucket
    split (first n%4 buckets take the extra rows) — then one aggregation
    per (nation, quartile). The ordering carries the unique custkey
    tiebreak so bucket boundaries are total and engine-independent; min/max
    are exact decimal reads cast to double."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal", _dec("c_acctbal").alias("_bal"))
        .withColumn("quartile", F.ntile(4).over(w).cast("int"))
        .groupBy("n_name", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max("_bal").cast("double").alias("max_acctbal"),
            F.min("_bal").cast("double").alias("min_acctbal"),
        )
    )


# Columns profiled by q_table_stats_profile — every orders column, mixed
# types (bigint / varchar / double / timestamp) to exercise the uniform
# string-cast melt.
_STATS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def q_table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (row count, NULL count, exact
    NDV, null fraction) over ``orders`` — the cost-based-optimizer input
    every engine's ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``
    collects (the catalog-integrated path in Spark; this is the
    engine-internal equivalent with exact NDV, feeding join reordering and
    broadcast decisions).

    Spark-first shape: ONE scan melts all profiled columns via ``stack``
    into (column_name, value-as-string) rows — the string cast is a
    DISTINCTNESS carrier only (injective per column type on both engines:
    shortest-round-trip doubles, ISO timestamps), never emitted — then a
    two-phase aggregate: hash agg on (column, value) with map-side
    partials, then the |columns|-keyed rollup. Cost is one shuffle of
    (rows x n_cols) near-unique keys; at 100 TB swap the exact phase for
    ``approx_count_distinct`` (fixed HLL state, one pass, no melt — see
    q_approx_distinct_profile) and keep this exact plan for the
    verification tier."""
    o = load(spark, sf_dir, "orders")
    stack_expr = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _STATS_COLS
    )
    melted = o.select(
        F.expr(f"stack({len(_STATS_COLS)}, {stack_expr}) AS (column_name, v)")
    )
    per_value = melted.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_value.groupBy("column_name")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), F.col("n")).otherwise(F.lit(0))).alias(
                "n_nulls"
            ),
            F.count("v").alias("n_distinct"),
        )
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            (F.col("n_nulls").cast("double") / F.col("n_rows")).alias("null_fraction"),
        )
    )


def q_order_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC reconciliation audit (operators/diff.py::snapshot_diff): diff two
    versions of the orders table and report, per change shape, how many keys
    were added / removed / changed (and in which columns) / unchanged.

    The two snapshots are derived deterministically from the one immutable
    testdata table: the "old" version is missing every 11th-residue key
    (inserted later), the "new" version is missing every 13th-residue key
    (deleted since), and the new version re-prices every 7th-residue order
    (+10.00, an exact IEEE double add — no rounding, so both engines see
    the identical bit pattern) and re-flags every 19th-residue order's
    priority. Overlapping residues exercise multi-column change rows.

    Spark plan: two filtered scans of the same parquet → ONE full-outer
    sort-merge join on o_orderkey → narrow change-classification projection
    → hash agg on the tiny (change_type, changed_cols) key space. The join
    is the irreducible cost of an exact diff; bucketed snapshots
    (sources/catalog.py) make it exchange-free at 100 TB.
    """
    from ..operators.diff import snapshot_diff

    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 3).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    new = o.filter(F.col("o_orderkey") % 13 != 5).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 2, F.col("o_totalprice") + F.lit(10.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 19 == 4, F.lit("RE-REVIEW"))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
    )
    d = snapshot_diff(old, new, keys=["o_orderkey"])
    return d.groupBy("change_type", "changed_cols").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


def q_part_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage (entity resolution) over part names: blocked
    pairwise Levenshtein matching, the classic dedup-across-sources shape
    (Fellegi-Sunter blocking + edit-distance scoring).

    Blocking is COMPOSITE — (product noun, brand) — so the per-block
    candidate set is bounded: the quadratic pair generation runs inside
    blocks of tens of rows, never across the table. Spark plan: one narrow
    projection derives the block key (split_part), then a self equi-join
    ON the block key (shuffle hash join; a_key < b_key dedups the pair
    space) with the Levenshtein predicate as a JVM-side residual — no
    Python, no crossJoin. At 100 TB the block key is the unit of skew: a
    pathological block is capped the same way cross_source_overlap caps
    shingle ubiquity (drop or sub-split blocks above a size bound; here the
    composite key already bounds them).

    Output is the per-block linkage profile (candidate volume, matches
    within edit distance 3, exact-name collisions, and a partkey checksum
    that pins WHICH pairs matched), not the raw pair stream.
    """
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.noun") == F.col("b.noun"),
            F.col("a.p_brand") == F.col("b.p_brand"),
            F.col("a.p_partkey") < F.col("b.p_partkey"),
        ],
    ).select(
        F.col("a.noun").alias("noun"),
        F.col("a.p_brand").alias("p_brand"),
        F.col("a.p_partkey").alias("a_key"),
        F.col("b.p_partkey").alias("b_key"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev"),
    )
    return pairs.groupBy("noun", "p_brand").agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.count(F.when(F.col("lev") <= 3, 1)).alias("n_matches"),
        F.count(F.when(F.col("lev") == 0, 1)).alias("n_exact_dups"),
        F.sum(
            F.when(F.col("lev") <= 3, F.col("a_key") + F.col("b_key"))
        ).alias("match_key_checksum"),
    )


def q_sole_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    finished multi-supplier order. The textbook form is a correlated
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier on the order) — two correlated subqueries over the same fact.
    Lateness here is l_shipdate > o_orderdate + 60 days (the synthetic
    lineitem carries no receipt/commit dates).

    Spark-first decorrelation: ONE pass over lineitem⋈orders builds the
    per-(order, supplier) late flag; a per-order aggregate over THAT
    (distinct-supplier count, late-supplier count) replaces both correlated
    subqueries; the blame filter is a same-key join back. Plan (verified
    in tests/test_plans.py): the fact is scanned ONCE and crosses ONE
    fact-sized shuffle — the explicit orderkey repartition, whose
    HashPartitioning(ok) satisfies the (ok, sk) aggregate's clustering so
    the groupBy adds no exchange. per_os is cached because it feeds BOTH
    sides of the blame join (Spark shares no common subplans; uncached,
    the fact is scanned and shuffled twice — measured in the plan).
    The blame join's own exchanges are per-(order,supplier)-AGGREGATE
    sized, orders of magnitude below the fact (a cached AQE subplan's
    partitioning is opaque to the outer planner, so Spark re-establishes
    it — on the small side of the hierarchy, where it's cheap). One final
    suppkey shuffle rolls up per supplier; names attach by broadcast.
    """
    from ..util import tracked_cache

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supplier = load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    # ONE explicit orderkey shuffle, then every downstream step rides it:
    # HashPartitioning(ok) satisfies the (ok, sk) aggregate's clustering,
    # the (ok) aggregate's, AND the blame join's — zero further exchanges
    # until the final per-supplier rollup. per_os is cached because it
    # feeds BOTH sides of the blame join (Spark plans no common-subplan
    # sharing — uncached, the fact would be scanned and shuffled twice).
    per_os = tracked_cache(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("was_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.count(F.when(F.col("was_late"), 1)).alias("n_late_suppliers"),
    )
    blamed = (
        per_os.filter(F.col("was_late"))
        .join(
            per_o.filter(
                (F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1)
            ),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("numwait"),
            F.sum("l_orderkey").alias("order_key_checksum"),
        )
    )
    return (
        blamed.join(F.broadcast(supplier), blamed.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").alias("supp_key"),
            "s_name",
            "numwait",
            "order_key_checksum",
        )
        .orderBy(F.desc("numwait"), "supp_key")
        .limit(10)
    )


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    re-joined to orders + customer (the classic aggregated-IN-subquery →
    semi-join-on-aggregate rewrite).

    Spark plan: lineitem aggregates to (orderkey, sum_qty) with map-side
    partials — the shuffle carries one row per order, not per line — then
    the HAVING filter cuts it to the big-order sliver BEFORE any join, so
    the joins against orders and customer see thousands of rows, not
    billions; AQE turns both into broadcasts at that size. Quantity sums
    go through decimal (order-independent exactness).
    """
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("cust_key"),
            "c_name",
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "order_key")
        .limit(20)
    )


def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (3 damped rounds, d=0.85) over the part
    co-purchase graph: parts are vertices, an edge links two parts that
    appear on the same order. The second iterative-graph family alongside
    connected components (doc_dup_components) — rank propagation instead
    of label propagation.

    Exactness contract: ranks are INTEGER micro-mass (total mass 10^12
    split by integer division), every per-edge contribution is
    ``rank div outdeg`` and every damping update is
    ``(15*base + 85*incoming) div 100`` — all BIGINT ops, so the result is
    order-independent and bit-identical to the oracle's chained-CTE
    iterations (the same quantized-integer trick as the typicality
    centroid algebra; doubles would make the incoming-sum order visible).
    max |value| is 85 * 10^12, far under int64.

    Spark plan: edge building is array-native — collect_set per order,
    explode the bounded basket twice (per-order fanout k² with k = lines
    per order, single digits), no self-join of the fact table. The pair
    stream then aggregates ONCE by src into an adjacency list
    (collect_set dedups, size() is the out-degree) — one shuffle where
    distinct-pairs → degree-groupBy → edge⋈degree-join would take three.
    The cached adjacency is the per-iteration input: explode is map-side,
    the ranks join is vertex-keyed, groupBy dst runs map-side partials.
    Fixed 3 iterations keeps lineage shallow (no checkpoint needed; the
    CC operator's localCheckpoint pattern applies past ~10). Co-purchase
    edges are symmetric, so every vertex has outdeg ≥ 1 — no
    dangling-mass redistribution term. At 100 TB the adjacency row of a
    ubiquitous part is the skew unit — cap neighbor lists with
    operators/graph.py::cap_vertex_degree, the same move
    cross_source_overlap makes on shingle ubiquity (a part co-bought
    with everything carries no ranking signal).
    """
    from ..operators.graph import copurchase_adjacency, pagerank_integer
    from ..util import tracked_cache

    l = load(spark, sf_dir, "lineitem")
    adj = tracked_cache(copurchase_adjacency(l))
    ranks = pagerank_integer(adj, n_iter=3)
    return (
        ranks.select(
            F.col("node").alias("part_key"),
            F.col("pr").cast("bigint").alias("rank_micromass"),
        )
        .orderBy(F.desc("rank_micromass"), "part_key")
        .limit(20)
    )


def q_copurchase_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle/wedge census of the part co-purchase graph —
    the third iterative-graph family member (CC labels components,
    PageRank ranks vertices, the census measures local density: the
    clustering coefficient is the standard community-structure and
    spam/anomaly signal over link graphs).

    Scale story lives in operators/graph.py::triangle_census: the
    degree-ordered orientation bounds per-vertex candidate fanout at
    O(sqrt(m)) regardless of degree skew, giving the O(m^1.5) exact
    count. The oracle twin counts the same triangles by the a<b<c
    three-way self-join (each triangle once) and the same Σ C(deg,2)
    wedge denominator — all BIGINT algebra, one final IEEE division.
    """
    from ..operators.graph import copurchase_adjacency, triangle_census
    from ..util import tracked_cache

    l = load(spark, sf_dir, "lineitem")
    adj = tracked_cache(copurchase_adjacency(l))
    return triangle_census(adj)


def q_copurchase_seed_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a deterministic seed set — the
    seed-expansion primitive driver-scored end-to-end: seeds are the five
    most-ordered parts (distinct-order count, partkey tiebreak), and
    three damped rounds rank every part by co-purchase proximity to
    them (operators/graph.py::personalized_pagerank — related-item
    retrieval / quality-prior propagation from a vetted set).

    Exactness: the same integer micro-mass algebra as copurchase_pagerank
    (reset mass on seeds), bit-identical to the oracle's chained-CTE
    rounds — each CTE is the sparse frontier (FULL OUTER join of the
    incoming-mass aggregate with the seed reset, pr > 0). Scale story in
    the operator docstring: state is frontier-sized, not graph-sized.
    """
    from ..operators.graph import copurchase_adjacency, personalized_pagerank
    from ..util import tracked_cache

    l = load(spark, sf_dir, "lineitem")
    adj = tracked_cache(copurchase_adjacency(l))
    seeds = (
        l.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "l_partkey")
        .limit(5)
        .select(F.col("l_partkey").alias("node"))
    )
    ranks = personalized_pagerank(adj, seeds, n_iter=3)
    return (
        ranks.select(
            F.col("node").alias("part_key"),
            F.col("pr").cast("bigint").alias("affinity_micromass"),
        )
        .orderBy(F.desc("affinity_micromass"), "part_key")
        .limit(20)
    )


def q_supplier_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape decorrelated scalar subquery (min-per-group
    semi-join): for every part, the suppliers that shipped it at its
    MINIMUM observed extended price, rolled up to the supplier's nation —
    "which nations host the price-setting suppliers". The correlated form
    (``WHERE l_extendedprice = (SELECT MIN(...) WHERE l_partkey = p)``)
    decorrelates into an aggregate + equality join-back, the shape the
    reference's engine (and Q2 itself) relies on; no current registry
    query exercises it.

    Scale shape: one partial-aggregated groupBy on l_partkey, a
    same-key join-back (co-partitioned — Catalyst reuses the exchange on
    l_partkey), then a broadcast dim join to supplier/nation. Exact:
    MIN over doubles involves no arithmetic, the equality join-back
    compares unmodified values, outputs are counts."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    mins = (
        l.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "mp_partkey")
    )
    winners = (
        l.join(
            mins,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        winners.join(F.broadcast(s), winners["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_min_price_pairs"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "supplier_part_share": q_supplier_part_share,
    "ml_feature_dataset": q_ml_feature_dataset,
    "active_customers_by_segment": q_active_customers_by_segment,
    "avg_balance_by_nation": q_avg_balance_by_nation,
    "fulfillment_rate_by_nation": q_fulfillment_rate_by_nation,
    "validation_profile": q_validation_profile,
    "distinct_projection": q_distinct_projection,
    "latest_order_per_customer": q_latest_order_per_customer,
    "top5_orders": q_top5_orders,
    "customers_without_orders": q_customers_without_orders,
    "customer_geography_rollup": q_customer_geography_rollup,
    "revenue_by_supplier_nation": q_revenue_by_supplier_nation,
    "multiformat_date_parsing": q_multiformat_date_parsing,
    "balance_buckets": q_balance_buckets,
    "supplier_unique_key": q_supplier_unique_key,
    "order_aging": q_order_aging,
    "deterministic_sample": q_deterministic_sample,
    "sampled_quantile_profile": q_sampled_quantile_profile,
    "priority_filter": q_priority_filter,
    "name_pattern_filter": q_name_pattern_filter,
    "status_priority_rollup": q_status_priority_rollup,
    "returnflag_pivot": q_returnflag_pivot,
    "unpivot_status_metrics": q_unpivot_status_metrics,
    "customers_with_orders": q_customers_with_orders,
    "segment_set_ops": q_segment_set_ops,
    "approx_distinct_profile": q_approx_distinct_profile,
    "bernoulli_sample": q_bernoulli_sample,
    "shipping_priority_topk": q_shipping_priority_topk,
    "above_nation_avg_customers": q_above_nation_avg_customers,
    "promo_revenue_share": q_promo_revenue_share,
    "lineitem_cube_aggregates": q_lineitem_cube_aggregates,
    "customer_balance_ntiles": q_customer_balance_ntiles,
    "table_stats_profile": q_table_stats_profile,
    "order_snapshot_diff": q_order_snapshot_diff,
    "part_name_linkage": q_part_name_linkage,
    "sole_late_supplier_blame": q_sole_late_supplier_blame,
    "large_volume_customers": q_large_volume_customers,
    "copurchase_pagerank": q_copurchase_pagerank,
    "copurchase_triangle_census": q_copurchase_triangle_census,
    "copurchase_seed_affinity": q_copurchase_seed_affinity,
}


# The oracle computes each column's stats directly on the typed values
# (no string melt needed single-node); counts match because the engine's
# string cast is injective per column. COUNT(...) is BIGINT on both
# engines — no HUGEINT sum in sight (the dtype trap of r5's
# media_byte_histogram).
_STATS_ORACLE = "\nUNION ALL\n".join(
    f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(COUNT(1) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(COUNT(1) - COUNT({c}) AS DOUBLE) / COUNT(1) AS null_fraction
        FROM orders
    """
    for c in _STATS_COLS
)


ORACLES = {
    # full-outer-join CDC twin: IS DISTINCT FROM mirrors the engine's
    # null-safe compare; changed-col names in the same fixed order
    "order_snapshot_diff": """
        WITH old AS (
          SELECT o_orderkey, o_totalprice AS price, o_orderpriority AS priority
          FROM orders WHERE o_orderkey % 11 <> 3
        ),
        new AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice + 10.0
                      ELSE o_totalprice END AS price,
                 CASE WHEN o_orderkey % 19 = 4 THEN 'RE-REVIEW'
                      ELSE o_orderpriority END AS priority
          FROM orders WHERE o_orderkey % 13 <> 5
        ),
        d AS (
          SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                 o.o_orderkey IS NOT NULL AS in_old,
                 n.o_orderkey IS NOT NULL AS in_new,
                 concat_ws(',',
                   CASE WHEN o.price IS DISTINCT FROM n.price THEN 'price' END,
                   CASE WHEN o.priority IS DISTINCT FROM n.priority
                        THEN 'priority' END) AS cl
          FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        ),
        typed AS (
          SELECT k,
                 CASE WHEN NOT in_old THEN 'added'
                      WHEN NOT in_new THEN 'removed'
                      WHEN cl <> '' THEN 'changed'
                      ELSE 'unchanged' END AS change_type,
                 CASE WHEN in_old AND in_new AND cl <> '' THEN cl END
                   AS changed_cols
          FROM d
        )
        SELECT change_type, changed_cols,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS key_checksum
        FROM typed
        GROUP BY 1, 2
    """,
    # blocked-linkage twin: same composite block self-join; DuckDB's
    # levenshtein agrees with Spark's (plain edit distance, ASCII input)
    "part_name_linkage": """
        WITH p AS (
          SELECT p_partkey, p_name, p_brand,
                 split_part(p_name, ' ', 2) AS noun
          FROM part
        ),
        pairs AS (
          SELECT a.noun, a.p_brand,
                 a.p_partkey AS a_key, b.p_partkey AS b_key,
                 levenshtein(a.p_name, b.p_name) AS lev
          FROM p a JOIN p b
            ON a.noun = b.noun AND a.p_brand = b.p_brand
           AND a.p_partkey < b.p_partkey
        )
        SELECT noun, p_brand,
               CAST(COUNT(1) AS BIGINT) AS n_candidate_pairs,
               CAST(COUNT(CASE WHEN lev <= 3 THEN 1 END) AS BIGINT)
                 AS n_matches,
               CAST(COUNT(CASE WHEN lev = 0 THEN 1 END) AS BIGINT)
                 AS n_exact_dups,
               CAST(SUM(CASE WHEN lev <= 3 THEN a_key + b_key END) AS BIGINT)
                 AS match_key_checksum
        FROM pairs
        GROUP BY 1, 2
    """,
    "ml_feature_dataset": """
        WITH base AS (
          SELECT c_custkey, c_mktsegment, c_acctbal, o_orderdate, o_orderkey,
                 o_totalprice
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE o_orderstatus IN ('O', 'F')
            AND o_totalprice IS NOT NULL
            AND c_mktsegment IS NOT NULL
        ),
        latest AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM base
        )
        SELECT c_custkey,
               c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS acctbal,
               CAST(year(o_orderdate) AS INTEGER) AS last_order_year,
               CAST(CASE WHEN year(o_orderdate) >= 1997 THEN 1 ELSE 0 END AS INTEGER)
                 AS active_label,
               CASE WHEN o_totalprice < 50000 THEN 'SMALL'
                    WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 'MEDIUM'
                    ELSE 'LARGE' END AS order_size_segment,
               CAST(1998 - year(o_orderdate) AS INTEGER) AS years_inactive
        FROM latest
        WHERE rn = 1 AND c_custkey % 3 = 0
    """,
    "pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_price,
          COUNT(1) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "active_customers_by_segment": """
        SELECT
          c_mktsegment,
          COUNT(DISTINCT o_custkey) AS active_customers,
          COUNT(1) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE UPPER(o_orderstatus) = 'O'
        GROUP BY c_mktsegment
        ORDER BY active_customers DESC, c_mktsegment
    """,
    "avg_balance_by_nation": """
        SELECT
          n_name,
          COUNT(1) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING COUNT(1) > 5
        ORDER BY avg_acctbal DESC, n_name
        LIMIT 5
    """,
    "fulfillment_rate_by_nation": """
        SELECT
          n_name,
          COUNT(DISTINCT o_custkey) AS total_customers,
          COUNT(DISTINCT CASE WHEN UPPER(o_orderstatus) = 'F' THEN o_custkey END)
            AS fulfilled_customers,
          (COUNT(DISTINCT CASE WHEN UPPER(o_orderstatus) = 'F' THEN o_custkey END) * 100.0)
            / COUNT(DISTINCT o_custkey) AS fulfillment_pct
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "validation_profile": """
        SELECT
          COUNT(1) AS total_rows,
          COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_quantity,
          COUNT(CASE WHEN l_quantity < 0 THEN 1 END) AS negative_quantity,
          COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_discount,
          COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS returned_rows,
          COUNT(CASE WHEN l_shipdate > TIMESTAMP '1998-06-01' THEN 1 END) AS late_shipments,
          COUNT(CASE WHEN l_tax IS NULL OR l_tax < 0 THEN 1 END) AS bad_tax
        FROM lineitem
    """,
    "distinct_projection": """
        SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM (
          SELECT *,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
                 ) AS row_num
          FROM orders
        ) t
        WHERE row_num = 1
    """,
    "top5_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 5
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "customer_geography_rollup": """
        SELECT
          r_name,
          n_name,
          COUNT(1) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "revenue_by_supplier_nation": """
        SELECT
          n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS revenue,
          COUNT(1) AS n_lineitems
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "multiformat_date_parsing": """
        WITH raw AS (
          SELECT CASE WHEN o_orderkey % 2 = 0
                      THEN strftime(o_orderdate, '%Y%m%d')
                      ELSE strftime(o_orderdate, '%Y/%m/%d %H:%M:%S')
                 END AS raw_date
          FROM orders
        ), parsed AS (
          SELECT COALESCE(
                   CAST(try_strptime(raw_date, '%Y%m%d') AS DATE),
                   CAST(try_strptime(raw_date, '%Y/%m/%d %H:%M:%S') AS DATE)
                 ) AS parsed_date
          FROM raw
        )
        SELECT CAST(year(parsed_date) AS INTEGER) AS order_year, COUNT(1) AS n_orders
        FROM parsed
        GROUP BY 1
        ORDER BY order_year
    """,
    "balance_buckets": """
        SELECT
          CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
               WHEN c_acctbal < 1000 THEN 'LOW'
               WHEN c_acctbal < 5000 THEN 'MID'
               ELSE 'HIGH' END AS balance_bucket,
          COUNT(1) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        GROUP BY 1
    """,
    "supplier_unique_key": """
        SELECT
          s_suppkey,
          CONCAT_WS('_', CAST(s_nationkey AS VARCHAR), CAST(s_suppkey AS VARCHAR), s_name)
            AS id_unico
        FROM supplier
    """,
    "order_aging": """
        SELECT
          o_orderkey,
          CAST(o_orderdate AS DATE) AS order_date,
          CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER)
            AS days_open,
          CAST(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END AS INTEGER)
            AS flag_old
        FROM orders
    """,
    "deterministic_sample": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderkey % 97 = 0
    """,
    "sampled_quantile_profile": SAMPLED_QUANTILE_PROFILE_ORACLE,
    "priority_filter": """
        SELECT
          o_orderpriority,
          COUNT(1) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000.0 AND 100000.0
          AND o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_orderpriority
    """,
    "name_pattern_filter": """
        SELECT
          c_custkey,
          c_name,
          CAST(LENGTH(c_name) AS INTEGER) AS name_len
        FROM customer
        WHERE UPPER(TRIM(c_mktsegment)) = 'BUILDING'
          AND regexp_matches(c_name, '[0-9]{2}$')
          AND contains(c_name, '#')
    """,
    "status_priority_rollup": """
        SELECT
          o_orderstatus,
          o_orderpriority,
          COUNT(1) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "unpivot_status_metrics": """
        WITH wide AS (
          SELECT o_orderstatus,
                 CAST(COUNT(1) AS DOUBLE) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
                 CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
          FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
        UNION ALL
        SELECT o_orderstatus, 'total_price', total_price FROM wide
        UNION ALL
        SELECT o_orderstatus, 'n_customers', n_customers FROM wide
    """,
    "customers_with_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "returnflag_pivot": """
        SELECT
          l_returnflag,
          COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
          COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_fulfilled
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "shipping_priority_topk": """
        SELECT
          o_orderkey AS order_key,
          CAST(o_orderdate AS DATE) AS order_date,
          o_orderpriority,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS revenue,
          COUNT(1) AS n_items
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, order_key
        LIMIT 10
    """,
    "promo_revenue_share": """
        SELECT
          p_brand,
          CAST(SUM(CASE WHEN p_type LIKE 'ECONOMY%'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS total_revenue,
          CAST(SUM(CASE WHEN p_type LIKE 'ECONOMY%'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS promo_pct,
          COUNT(1) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY p_brand
    """,
    "above_nation_avg_customers": """
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS DOUBLE) AS acctbal,
               nation_avg
        FROM (
          SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                        OVER (PARTITION BY c_nationkey) AS DOUBLE)
                   / COUNT(1) OVER (PARTITION BY c_nationkey) AS nation_avg
          FROM customer
        ) t
        WHERE c_acctbal > nation_avg
    """,
    "segment_set_ops": """
        SELECT custkey FROM (
          SELECT custkey FROM (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH'
          )
          INTERSECT
          SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        EXCEPT ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
    # GROUPING() bitmask is SQL-standard in both engines: bit per column,
    # leftmost column = most significant (detail 0, status marginal 1,
    # flag marginal 2, grand total 3)
    "lineitem_cube_aggregates": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS grouping_set,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base_price,
               COUNT(1) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "customer_balance_ntiles": """
        WITH tiled AS (
          SELECT n_name,
                 CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
                 NTILE(4) OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS quartile
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name,
               CAST(quartile AS INTEGER) AS quartile,
               COUNT(1) AS n_customers,
               CAST(MAX(bal) AS DOUBLE) AS max_acctbal,
               CAST(MIN(bal) AS DOUBLE) AS min_acctbal
        FROM tiled
        GROUP BY n_name, quartile
    """,
    "table_stats_profile": _STATS_ORACLE,
    # Q21-shape twin: the correlated EXISTS / NOT EXISTS pair is expressed
    # directly as the decorrelated per-order aggregate (same semantics the
    # engine uses — both forms are equivalent; DuckDB's own optimizer
    # decorrelates the textbook form the same way). Spark's
    # date_add(o_orderdate, 60) truncates the timestamp to a DATE first,
    # so the twin casts before adding. sum(BIGINT) is HUGEINT in DuckDB —
    # cast back (the r5 media_byte_histogram dtype lesson).
    "sole_late_supplier_blame": """
        WITH per_os AS (
          SELECT l_orderkey, l_suppkey,
                 max(l_shipdate > CAST(o_orderdate AS DATE)
                                  + INTERVAL 60 DAY) AS was_late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY l_orderkey, l_suppkey
        ), per_o AS (
          SELECT l_orderkey,
                 count(*) AS n_suppliers,
                 count(*) FILTER (WHERE was_late) AS n_late_suppliers
          FROM per_os GROUP BY l_orderkey
        )
        SELECT s.s_suppkey AS supp_key,
               s.s_name,
               CAST(count(*) AS BIGINT) AS numwait,
               CAST(sum(p.l_orderkey) AS BIGINT) AS order_key_checksum
        FROM per_os p
        JOIN per_o o ON p.l_orderkey = o.l_orderkey
        JOIN supplier s ON p.l_suppkey = s.s_suppkey
        WHERE p.was_late AND o.n_suppliers > 1 AND o.n_late_suppliers = 1
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, supp_key
        LIMIT 10
    """,
    # Q18-shape twin: HAVING over the decimal-exact quantity sum, then the
    # re-join to orders/customer. DECIMAL sums are exact on both engines;
    # the final DOUBLE casts are single conversions of exact values.
    "large_volume_customers": """
        WITH big AS (
          SELECT l_orderkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
          FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
        )
        SELECT c_custkey AS cust_key,
               c_name,
               o_orderkey AS order_key,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(o_totalprice AS DOUBLE) AS total_price,
               CAST(sum_qty_dec AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_price DESC, order_key
        LIMIT 20
    """,
    # PageRank twin: three chained-CTE damped iterations in the SAME
    # integer micro-mass algebra as the engine (// is integer division on
    # BIGINT/HUGEINT operands in DuckDB, matching Spark's `div`), so every
    # intermediate is exact and order-independent — no floating sums to
    # drift. The final CAST collapses DuckDB's HUGEINT back to BIGINT.
    "copurchase_pagerank": """
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM baskets a
          JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        deg AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src
        ),
        params AS (
          SELECT CAST(1000000000000 AS BIGINT)
                 // CAST(count(*) AS BIGINT) AS base
          FROM deg
        ),
        r0 AS (
          SELECT src AS node, (SELECT base FROM params) AS pr FROM deg
        ),
        r1 AS (
          SELECT e.dst AS node,
                 (15 * (SELECT base FROM params)
                  + 85 * sum(r.pr // d.outdeg)) // 100 AS pr
          FROM edges e
          JOIN r0 r ON e.src = r.node
          JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        r2 AS (
          SELECT e.dst AS node,
                 (15 * (SELECT base FROM params)
                  + 85 * sum(r.pr // d.outdeg)) // 100 AS pr
          FROM edges e
          JOIN r1 r ON e.src = r.node
          JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        r3 AS (
          SELECT e.dst AS node,
                 (15 * (SELECT base FROM params)
                  + 85 * sum(r.pr // d.outdeg)) // 100 AS pr
          FROM edges e
          JOIN r2 r ON e.src = r.node
          JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        )
        SELECT node AS part_key, CAST(pr AS BIGINT) AS rank_micromass
        FROM r3
        ORDER BY rank_micromass DESC, part_key
        LIMIT 20
    """,
    # Personalized-PageRank twin: same chained-CTE integer rounds, but the
    # reset term lands only on the deterministic seed set and each round's
    # frontier is the FULL OUTER join of incoming mass with the seed
    # reset, filtered to pr > 0 (the engine's sparse-frontier contract).
    "copurchase_seed_affinity": """
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM baskets a
          JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        deg AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src
        ),
        seeds AS (
          SELECT l_partkey AS node
          FROM lineitem
          GROUP BY l_partkey
          ORDER BY count(DISTINCT l_orderkey) DESC, l_partkey
          LIMIT 5
        ),
        params AS (
          SELECT CAST(1000000000000 AS BIGINT) // 5 AS seed_base
        ),
        r0 AS (
          SELECT node, (SELECT seed_base FROM params) AS pr FROM seeds
        ),
        r1 AS (
          SELECT node, pr FROM (
            SELECT COALESCE(i.node, s.node) AS node,
                   ((CASE WHEN s.node IS NOT NULL
                          THEN 15 * (SELECT seed_base FROM params)
                          ELSE 0 END)
                    + 85 * COALESCE(i.incoming, 0)) // 100 AS pr
            FROM (
              SELECT e.dst AS node, sum(r.pr // d.outdeg) AS incoming
              FROM edges e
              JOIN r0 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
              GROUP BY e.dst
            ) i
            FULL OUTER JOIN seeds s ON i.node = s.node
          ) WHERE pr > 0
        ),
        r2 AS (
          SELECT node, pr FROM (
            SELECT COALESCE(i.node, s.node) AS node,
                   ((CASE WHEN s.node IS NOT NULL
                          THEN 15 * (SELECT seed_base FROM params)
                          ELSE 0 END)
                    + 85 * COALESCE(i.incoming, 0)) // 100 AS pr
            FROM (
              SELECT e.dst AS node, sum(r.pr // d.outdeg) AS incoming
              FROM edges e
              JOIN r1 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
              GROUP BY e.dst
            ) i
            FULL OUTER JOIN seeds s ON i.node = s.node
          ) WHERE pr > 0
        ),
        r3 AS (
          SELECT node, pr FROM (
            SELECT COALESCE(i.node, s.node) AS node,
                   ((CASE WHEN s.node IS NOT NULL
                          THEN 15 * (SELECT seed_base FROM params)
                          ELSE 0 END)
                    + 85 * COALESCE(i.incoming, 0)) // 100 AS pr
            FROM (
              SELECT e.dst AS node, sum(r.pr // d.outdeg) AS incoming
              FROM edges e
              JOIN r2 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
              GROUP BY e.dst
            ) i
            FULL OUTER JOIN seeds s ON i.node = s.node
          ) WHERE pr > 0
        )
        SELECT node AS part_key, CAST(pr AS BIGINT) AS affinity_micromass
        FROM r3
        ORDER BY affinity_micromass DESC, part_key
        LIMIT 20
    """,
    # Triangle-census twin: a<b<c three-way self-join counts each
    # triangle exactly once; wedges are the raw sum of C(deg,2) over
    # undirected degrees. Integer algebra throughout (DuckDB // = Spark
    # div); the sums come back HUGEINT and are cast to BIGINT; the
    # clustering coefficient is ONE double division of exact inputs.
    "copurchase_triangle_census": """
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        und AS (
          SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM baskets a
          JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS d
          FROM (
            SELECT a AS node FROM und
            UNION ALL
            SELECT b AS node FROM und
          )
          GROUP BY node
        ),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                 CAST(sum(d) // 2 AS BIGINT) AS n_edges,
                 CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
          FROM deg
        ),
        tri AS (
          SELECT CAST(count(*) AS BIGINT) AS n_triangles
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CAST(3 * n_triangles AS DOUBLE) / n_wedges AS global_clustering
        FROM stats, tri
    """,
}

# Q2-shape twin: the correlated min-subquery decorrelated identically —
# aggregate then equality join-back on the untouched double (no
# arithmetic, so double equality is exact on both engines).
ORACLES["supplier_part_share"] = """
    WITH mins AS (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    ),
    winners AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l
      JOIN mins m
        ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_min_price_pairs,
           CAST(COUNT(DISTINCT w.l_partkey) AS BIGINT) AS n_parts
    FROM winners w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
"""
