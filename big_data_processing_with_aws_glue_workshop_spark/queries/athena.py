"""Driver rows for the LITERAL Athena SQL surface (gold validations Q1-Q3).

The reference exercises its gold layer through raw SQL strings
(reference test/query_gold_validations.sql:5-50), not DataFrame code.
``plans/analytics.py`` carries those strings verbatim (modulo the engine
canon's determinism amendments, documented there) and runs them through
``spark.sql`` — the parser surface a user porting the workshop hits first.

The driver's testdata has no RUES tables, so each query first materializes
the two gold views from the TPC-H-ish star schema with a fixed mapping:

    gold_dim_empresa   <- customer x nation:
        matricula            = c_custkey
        tipo_sociedad        = c_mktsegment
        actividad_economica  = n_name
        camara_comercio      = 'CAMARA_' || (c_nationkey % 7)
        antiguedad_empresa   = c_custkey % 40          (integer years)
    gold_fact_renovacion <- orders:
        matricula            = o_custkey
        estado_matricula     = O->'Activa', F->'Renovada', else 'Cancelada'
                               (mixed case so UPPER() in the SQL is load-bearing)

The DuckDB oracles inline the same mapping as CTEs over the raw tables, so
the driver check covers fixture + literal SQL end to end.

Determinism: antiguedad_empresa is integer-valued, so AVG is an exact
integer sum (double-exact below 2^53) over one IEEE division — identical in
both engines; ratios are single divisions of exact counts. See the canon
note in plans/analytics.py for why ROUND(double) is not used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.analytics import (
    q1_active_by_society_type,
    q2_avg_age_by_activity,
    q3_renewal_rate_by_chamber,
    register_gold_views,
)
from ._tables import load


def _register_rues_gold_fixture(spark: SparkSession, sf_dir: str) -> None:
    """Materialize gold_dim_empresa / gold_fact_renovacion from testdata."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("c_custkey").alias("matricula"),
        F.col("c_mktsegment").alias("tipo_sociedad"),
        F.col("n_name").alias("actividad_economica"),
        F.concat(
            F.lit("CAMARA_"), (F.col("c_nationkey") % 7).cast("string")
        ).alias("camara_comercio"),
        (F.col("c_custkey") % 40).cast("int").alias("antiguedad_empresa"),
    )
    fact = orders.select(
        F.col("o_custkey").alias("matricula"),
        F.when(F.col("o_orderstatus") == "O", "Activa")
        .when(F.col("o_orderstatus") == "F", "Renovada")
        .otherwise("Cancelada")
        .alias("estado_matricula"),
    )
    register_gold_views(spark, dim, fact)


# shared oracle prelude: the gold fixture as DuckDB CTEs over the raw tables
_ORACLE_GOLD_CTES = """
        WITH gold_dim_empresa AS (
          SELECT c_custkey AS matricula,
                 c_mktsegment AS tipo_sociedad,
                 n_name AS actividad_economica,
                 'CAMARA_' || CAST(c_nationkey % 7 AS VARCHAR) AS camara_comercio,
                 CAST(c_custkey % 40 AS INTEGER) AS antiguedad_empresa
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        gold_fact_renovacion AS (
          SELECT o_custkey AS matricula,
                 CASE o_orderstatus WHEN 'O' THEN 'Activa'
                                    WHEN 'F' THEN 'Renovada'
                                    ELSE 'Cancelada' END AS estado_matricula
          FROM orders
        )
"""


def q_athena_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q1 verbatim through spark.sql: active companies per society
    type (reference test/query_gold_validations.sql:5-13)."""
    _register_rues_gold_fixture(spark, sf_dir)
    return q1_active_by_society_type(spark)


def q_athena_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q2 through spark.sql: average company age per economic
    activity, HAVING + top-5 (reference test/query_gold_validations.sql:20-31)."""
    _register_rues_gold_fixture(spark, sf_dir)
    return q2_avg_age_by_activity(spark)


def q_athena_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q3 through spark.sql: renewal rate per chamber of commerce,
    conditional distinct counts + ratio + top-5 (reference
    test/query_gold_validations.sql:36-50)."""
    _register_rues_gold_fixture(spark, sf_dir)
    return q3_renewal_rate_by_chamber(spark)


QUERIES = {
    "athena_q1_active_by_society": q_athena_q1,
    "athena_q2_avg_age_by_activity": q_athena_q2,
    "athena_q3_renewal_rate_by_chamber": q_athena_q3,
}

ORACLES = {
    "athena_q1_active_by_society": _ORACLE_GOLD_CTES
    + """
        SELECT d.tipo_sociedad,
               COUNT(DISTINCT d.matricula) AS total_empresas_activas
        FROM gold_dim_empresa d
        JOIN gold_fact_renovacion f ON d.matricula = f.matricula
        WHERE UPPER(f.estado_matricula) = 'ACTIVA'
        GROUP BY d.tipo_sociedad
        ORDER BY total_empresas_activas DESC
    """,
    "athena_q2_avg_age_by_activity": _ORACLE_GOLD_CTES
    + """
        SELECT d.actividad_economica,
               AVG(d.antiguedad_empresa) AS antiguedad_promedio,
               COUNT(DISTINCT d.matricula) AS total_empresas
        FROM gold_dim_empresa d
        JOIN gold_fact_renovacion f ON d.matricula = f.matricula
        WHERE UPPER(f.estado_matricula) = 'ACTIVA'
        GROUP BY d.actividad_economica
        HAVING COUNT(DISTINCT d.matricula) > 5
        ORDER BY antiguedad_promedio DESC, d.actividad_economica
        LIMIT 5
    """,
    "athena_q3_renewal_rate_by_chamber": _ORACLE_GOLD_CTES
    + """
        SELECT d.camara_comercio,
               COUNT(DISTINCT CASE WHEN UPPER(f.estado_matricula) = 'ACTIVA'
                                   THEN d.matricula END) AS empresas_activas,
               COUNT(DISTINCT d.matricula) AS total_empresas,
               CAST(COUNT(DISTINCT CASE WHEN UPPER(f.estado_matricula) = 'ACTIVA'
                                        THEN d.matricula END) AS DOUBLE) * 100.0
                 / COUNT(DISTINCT d.matricula) AS tasa_renovacion_pct
        FROM gold_dim_empresa d
        JOIN gold_fact_renovacion f ON d.matricula = f.matricula
        GROUP BY d.camara_comercio
        ORDER BY tasa_renovacion_pct DESC, d.camara_comercio
        LIMIT 5
    """,
}
