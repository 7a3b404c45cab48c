"""The reference's Athena analytics layer as Spark SQL (EP4, SURVEY §3).

The four gold-validation queries (reference test/query_gold_validations.sql)
run over temp views ``gold_dim_empresa`` / ``gold_fact_renovacion``.
Differences from the Athena originals, per engine canon:

- ``YEAR(CURRENT_DATE)`` is parameterized (``current_year``) for determinism.
- ``ORDER BY RAND()`` is seeded (``F.rand(seed)``) so the ML subsample is
  reproducible (SURVEY §7.4).
- ``ROUND(<double>, 2)`` is dropped (Q2/Q3): rounding doubles is engine-
  ambiguous near decimal halves (Spark HALF_UP on the shortest decimal
  repr vs C-library round on the binary value), so the canon emits the
  unrounded value — an exact integer sum/count through one IEEE division,
  bit-identical across engines (see queries/relational.py's contract).
- Top-k ``ORDER BY ... LIMIT`` carries a deterministic group-key tiebreak
  (Q2/Q3) so the LIMIT cliff cannot select engine-dependent rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_gold_views(
    spark: SparkSession, dim_empresa: DataFrame, fact_renovacion: DataFrame
) -> None:
    dim_empresa.createOrReplaceTempView("gold_dim_empresa")
    fact_renovacion.createOrReplaceTempView("gold_fact_renovacion")


def q1_active_by_society_type(spark: SparkSession) -> DataFrame:
    """Active companies per society type (reference
    test/query_gold_validations.sql:5-13)."""
    return spark.sql(
        """
        SELECT d.tipo_sociedad,
               COUNT(DISTINCT d.matricula) AS total_empresas_activas
        FROM gold_dim_empresa d
        JOIN gold_fact_renovacion f ON d.matricula = f.matricula
        WHERE UPPER(f.estado_matricula) = 'ACTIVA'
        GROUP BY d.tipo_sociedad
        ORDER BY total_empresas_activas DESC
        """
    )


def q2_avg_age_by_activity(spark: SparkSession) -> DataFrame:
    """Average company age per economic activity, top 5 (reference
    test/query_gold_validations.sql:20-31)."""
    return spark.sql(
        """
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
        """
    )


def q3_renewal_rate_by_chamber(spark: SparkSession) -> DataFrame:
    """Renewal rate per chamber of commerce, top 5 (reference
    test/query_gold_validations.sql:36-50)."""
    return spark.sql(
        """
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
        """
    )


def q4_ml_renewal_dataset(
    spark: SparkSession,
    current_year: int,
    sample_limit: int = 500_000,
    seed: int = 42,
) -> DataFrame:
    """ML feature dataset for renewal prediction (reference
    test/query_gold_validations.sql:75-165): filtered inner join ->
    keep-latest per matricula -> label/segment/feature derivation ->
    seeded random subsample."""
    base = spark.sql(
        f"""
        WITH base_join AS (
            SELECT d.matricula, d.codigo_camara, d.camara_comercio,
                   d.tipo_sociedad, d.organizacion_juridica, d.categoria_matricula,
                   d.actividad_economica, d.tipo_persona, f.estado_matricula,
                   d.antiguedad_empresa,
                   CAST(f.ultimo_ano_renovado AS bigint) AS ultimo_ano_renovado,
                   f.fecha_vigencia, f.fecha_renovacion, f.fecha_actualizacion
            FROM gold_dim_empresa d
            INNER JOIN gold_fact_renovacion f ON d.matricula = f.matricula
            WHERE f.estado_matricula IN ('ACTIVA', 'RENOVADA', 'CANCELADA')
              AND d.antiguedad_empresa IS NOT NULL
              AND f.ultimo_ano_renovado IS NOT NULL
              AND d.tipo_sociedad IS NOT NULL
              AND d.actividad_economica IS NOT NULL
        ),
        deduplicados AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY matricula
                                         ORDER BY fecha_actualizacion DESC) AS rn
            FROM base_join
        ),
        datos_limpios AS (
            SELECT matricula, codigo_camara, camara_comercio, tipo_sociedad,
                   organizacion_juridica, categoria_matricula, actividad_economica,
                   tipo_persona, estado_matricula,
                   CAST(antiguedad_empresa AS double) AS antiguedad_empresa,
                   ultimo_ano_renovado,
                   YEAR(fecha_vigencia) AS ano_vigencia,
                   YEAR(fecha_renovacion) AS ano_ultima_renovacion,
                   {current_year} AS ano_actual
            FROM deduplicados
            WHERE rn = 1
        ),
        dataset_ml AS (
            SELECT codigo_camara, camara_comercio, tipo_sociedad, organizacion_juridica,
                   categoria_matricula, actividad_economica, tipo_persona,
                   antiguedad_empresa, ultimo_ano_renovado,
                   CASE WHEN ultimo_ano_renovado = CAST({current_year} AS bigint) THEN 1
                        WHEN ultimo_ano_renovado = CAST({current_year} - 1 AS bigint) THEN 1
                        ELSE 0 END AS renovo,
                   CASE WHEN antiguedad_empresa < 2 THEN 'Nueva'
                        WHEN antiguedad_empresa BETWEEN 2 AND 5 THEN 'Joven'
                        WHEN antiguedad_empresa BETWEEN 6 AND 10 THEN 'Establecida'
                        ELSE 'Madura' END AS segmento_antiguedad,
                   CAST({current_year} AS bigint) - ultimo_ano_renovado AS anos_sin_renovar
            FROM datos_limpios
        )
        SELECT * FROM dataset_ml WHERE renovo IS NOT NULL
        """
    )
    return base.orderBy(F.rand(seed)).limit(sample_limit)
