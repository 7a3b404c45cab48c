"""End-to-end medallion run on the RUES-shaped fixture, tracing the golden
record matricula 21590 through bronze -> silver -> gold exactly as the
reference's track-records validation does
(reference test/query_track_records_validation.sql)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.dq import consolidated_validation
from big_data_processing_with_aws_glue_workshop_spark.operators.joins import anti_join_orphans
from big_data_processing_with_aws_glue_workshop_spark.plans import analytics
from big_data_processing_with_aws_glue_workshop_spark.plans.rues import (
    RuesConfig,
    apply_rules,
    build_dim_empresa,
    build_fact_renovacion,
    bronze_year_partition,
    silver_rules,
    silver_validation_rules,
    silver_year_partition,
)
from big_data_processing_with_aws_glue_workshop_spark.sources import (
    read_csv_robust,
    read_parquet_lake,
    write_parquet_partitioned,
)

from .rues_fixture import write_fixture

CONFIG = RuesConfig(reference_year=2025, today="2025-06-30", dedup_tiebreak=("codigo_estado_matricula",))


@pytest.fixture(scope="module")
def medallion(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("rues")
    paths = write_fixture(base / "raw")

    # --- bronze: robust CSV -> partitioned parquet (EP1)
    raw = read_csv_robust(spark, paths["raw_csv"])
    from big_data_processing_with_aws_glue_workshop_spark.functions.text import snake_case_columns

    bronze = bronze_year_partition(snake_case_columns(raw))
    bronze_path = str(base / "bronze")
    write_parquet_partitioned(bronze, bronze_path, "year_partition", num_files=2)

    # --- silver: rules pipeline (EP2)
    df = read_parquet_lake(spark, bronze_path, drop_partition_cols=["year_partition"])
    cat_ident = read_csv_robust(spark, paths["cat_identificaciones"])
    cat_ciiu = read_csv_robust(spark, paths["cat_ciiu"])
    silver = apply_rules(df, silver_rules(cat_ident, cat_ciiu, CONFIG))
    silver.cache()

    counts, error_df = consolidated_validation(silver, silver_validation_rules())

    silver_path = str(base / "silver")
    write_parquet_partitioned(
        silver_year_partition(silver), silver_path, "year_partition", num_files=2
    )

    # --- gold: star schema (EP3)
    silver_back = read_parquet_lake(spark, silver_path, drop_partition_cols=["year_partition"])
    dim = build_dim_empresa(silver_back)
    fact = build_fact_renovacion(silver_back, CONFIG)
    analytics.register_gold_views(spark, dim, fact)

    yield {
        "bronze": spark.read.parquet(bronze_path),
        "silver": silver,
        "counts": counts,
        "errors": error_df,
        "dim": dim,
        "fact": fact,
    }
    silver.unpersist()


def test_bronze_raw_preserved(medallion):
    bronze = medallion["bronze"]
    # all-string ingest, snake_case headers, partition column present
    assert "fecha_matricula" in bronze.columns
    assert "year_partition" in bronze.columns
    # the robust reader trims lead/trail whitespace at ingest (S1 options),
    # so the raw ' Activa ' arrives as 'Activa'; case is untouched until RN-003
    row = bronze.filter(
        (F.col("matricula") == "21590") & (F.col("estado_matricula") == "Activa")
    ).collect()
    assert len(row) == 1, "raw golden record must survive bronze untouched"
    assert row[0]["fecha_matricula"] == "20061108"
    assert row[0]["year_partition"] == 2025


def test_golden_record_silver(medallion):
    """Silver golden trace (reference test/query_track_records_validation.sql:47-48):
    ISO dates, codigo_identificacion 11, tipo_persona 2, antiguedad 19,
    id_unico '19_21590_OPTICA CRISTAL MAGANGUE LTDA.'."""
    silver = medallion["silver"]
    rows = silver.filter(F.col("matricula") == "21590").collect()
    assert len(rows) == 1, "RN-002 must keep exactly one row for (21590, nit)"
    r = rows[0].asDict()
    assert str(r["fecha_matricula"]) == "2006-11-08"
    assert str(r["fecha_renovacion"]) == "2025-05-06"
    assert str(r["fecha_actualizacion"]) == "2025-05-13"
    assert r["estado_matricula"] == "ACTIVA"  # RN-003 upper/trim; RN-002 kept latest
    assert r["codigo_identificacion"] == 11  # RN-008 via catalog (engine canon NIT->11)
    assert r["tipo_persona"] == 2  # RN-009 juridical
    assert r["antiguedad_empresa"] == 19  # RN-004 with reference_year 2025
    assert r["id_unico"] == "19_21590_OPTICA CRISTAL MAGANGUE LTDA."  # RN-006


def test_pathologies(medallion):
    silver = medallion["silver"]
    by_mat = {r["matricula"]: r.asDict() for r in silver.collect()}

    # leading-zero CIIU joined as string (RN-005)
    assert by_mat["100"]["actividad_economica"].startswith("Cultivo de cereales")
    # pre-1992 date parsed (LEGACY rebase write path exercised via parquet round-trip)
    assert str(by_mat["100"]["fecha_matricula"]) == "1991-02-27"
    assert by_mat["100"]["tipo_persona"] == 1  # natural person

    # unknown clase / CIIU -> NULLs, record NOT dropped (RN-007 contract)
    assert by_mat["200"]["codigo_identificacion"] is None
    assert by_mat["200"]["actividad_economica"] is None
    assert by_mat["200"]["estado_matricula"] == "CANCELADA"

    # garbage date -> NULL; future matricula -> negative antiguedad
    assert by_mat["300"]["fecha_renovacion"] is None
    assert by_mat["300"]["antiguedad_empresa"] < 0

    # NULL-matricula row preserved
    assert None in by_mat


def test_validation_counts(medallion):
    counts = medallion["counts"]
    assert counts["fecha_renovacion_null"] == 1  # 'not-a-date'
    assert counts["codigo_identificacion_null"] == 2  # SIN IDENTIFICACION + NULL clase
    assert counts["actividad_economica_null"] == 1  # CIIU 9999
    assert counts["antiguedad_negativa"] == 1  # future date
    assert counts["matricula_null"] == 1
    assert counts["codigo_camara_null"] == 1
    assert counts["clase_identificacion_null"] == 1
    assert counts["llave_unica_invalida"] == 1

    errors = {(r["columna"], r["mensaje_error"]) for r in medallion["errors"].collect()}
    assert ("matricula", "Campo obligatorio NULL") in errors
    assert ("cod_ciiu_act_econ_pri", "Codigo CIIU no encontrado") in errors


def test_gold_star_schema(medallion):
    dim, fact = medallion["dim"], medallion["fact"]
    assert len(dim.columns) == 26
    assert dim.count() == fact.count() == medallion["silver"].count()

    # referential integrity (J3/D3): the only 'orphan' is the NULL matricula
    # row — equi-joins never match NULL keys, same as the reference's
    # left_anti check would report
    orphans = anti_join_orphans(fact, dim, "matricula").collect()
    assert [r["matricula"] for r in orphans] == [None]

    # golden record joined trace (gold layer values)
    r = (
        dim.join(fact, "matricula")
        .filter(F.col("matricula") == "21590")
        .collect()[0]
        .asDict()
    )
    assert r["codigo_identificacion"] == 11
    assert str(r["fecha_vigencia"]) == "2026-03-31"
    assert r["flag_vencido"] == 0
    assert r["dias_vigencia"] == 274  # 2025-06-30 -> 2026-03-31, injected today


def test_analytics_queries(medallion, spark):
    q1 = analytics.q1_active_by_society_type(spark).collect()
    assert q1, "active companies by society type must return rows"
    assert q1[0]["total_empresas_activas"] >= q1[-1]["total_empresas_activas"]

    q2 = analytics.q2_avg_age_by_activity(spark).collect()
    assert len(q2) <= 5
    for row in q2:
        assert row["total_empresas"] > 5

    q3 = analytics.q3_renewal_rate_by_chamber(spark).collect()
    assert len(q3) <= 5
    for row in q3:
        assert 0.0 <= float(row["tasa_renovacion_pct"]) <= 100.0

    ml = analytics.q4_ml_renewal_dataset(spark, current_year=2025, seed=42)
    rows = ml.collect()
    assert rows
    cols = set(ml.columns)
    assert {"renovo", "segmento_antiguedad", "anos_sin_renovar"} <= cols
    assert all(r["renovo"] in (0, 1) for r in rows)
    assert all(
        r["segmento_antiguedad"] in ("Nueva", "Joven", "Establecida", "Madura")
        for r in rows
    )
    # seeded subsample is reproducible
    again = analytics.q4_ml_renewal_dataset(spark, current_year=2025, seed=42).collect()
    assert rows == again


def test_track_records_sql(medallion, spark):
    """The reference's track-records validation queries (EP4;
    test/query_track_records_validation.sql) as Spark SQL over the three
    layers. Engine canon: column `codigo_identificacion`, NIT -> 11
    (the reference file's silver comment shows 02/codigo_clase_identificacion
    — documented inconsistencies, SURVEY §5 ⚠)."""
    medallion["bronze"].createOrReplaceTempView("bronze_rues")
    medallion["silver"].createOrReplaceTempView("silver_rues")

    bronze_row = spark.sql(
        """
        SELECT matricula, fecha_matricula, fecha_renovacion, fecha_actualizacion,
               estado_matricula, clase_identificacion, numero_identificacion,
               razon_social
        FROM bronze_rues
        WHERE matricula = '21590' AND estado_matricula = 'Activa'
        ORDER BY fecha_actualizacion DESC LIMIT 1
        """
    ).collect()[0]
    assert bronze_row["fecha_matricula"] == "20061108"
    assert bronze_row["fecha_actualizacion"] == "2025/05/13 14:51:55.923000000"

    silver_row = spark.sql(
        """
        SELECT matricula, fecha_matricula, fecha_renovacion, fecha_actualizacion,
               antiguedad_empresa, clase_identificacion, codigo_identificacion,
               numero_identificacion, tipo_persona, razon_social, id_unico
        FROM silver_rues
        WHERE matricula = '21590' AND estado_matricula = 'ACTIVA'
        ORDER BY fecha_actualizacion DESC LIMIT 1
        """
    ).collect()[0]
    assert str(silver_row["fecha_matricula"]) == "2006-11-08"
    assert silver_row["antiguedad_empresa"] == 19
    assert silver_row["codigo_identificacion"] == 11
    assert silver_row["tipo_persona"] == 2
    assert silver_row["id_unico"] == "19_21590_OPTICA CRISTAL MAGANGUE LTDA."

    gold_rows = spark.sql(
        """
        SELECT d.matricula, f.fecha_matricula, f.fecha_renovacion,
               f.fecha_actualizacion, d.antiguedad_empresa,
               d.clase_identificacion,
               d.codigo_identificacion AS codigo_clase_identificacion,
               d.numero_identificacion, d.tipo_persona, d.razon_social,
               CONCAT(d.codigo_camara, '_', d.matricula, '_', d.razon_social)
                 AS id_unico
        FROM gold_dim_empresa d
        LEFT JOIN gold_fact_renovacion f ON d.matricula = f.matricula
        WHERE d.matricula = '21590' AND f.estado_matricula = 'ACTIVA'
          AND d.numero_identificacion = '900118485'
        ORDER BY f.fecha_actualizacion DESC
        """
    ).collect()
    assert len(gold_rows) == 1
    g = gold_rows[0]
    assert g["codigo_clase_identificacion"] == 11
    assert g["id_unico"] == "19_21590_OPTICA CRISTAL MAGANGUE LTDA."
