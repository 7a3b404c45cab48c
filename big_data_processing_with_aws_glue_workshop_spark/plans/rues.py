"""The RUES medallion pipeline: bronze -> silver (RN-001..RN-010) -> gold
star schema, re-expressed as composable engine operators.

Semantics parity with the reference jobs (file:line cited per rule), with
three deliberate engine-canon divergences, all documented in SURVEY §5/§7.4:

1. Determinism injection: the reference derives 'today' from
   ``datetime.now()`` / ``current_date()`` at run time
   (src/silver/job-silver-rues.py:309, src/gold/job-gold-rues.py:134);
   here both come from :class:`RuesConfig` so results are reproducible.
2. Partition derivation: the reference re-parses the already-DATE
   ``fecha_actualizacion`` with the raw timestamp format when writing silver
   (src/silver/job-silver-rues.py:473-476) — which yields NULL for every row
   (the column no longer matches the pattern after RN-001). The engine
   derives ``year_partition = year(fecha_actualizacion)`` directly.
3. Dedup tie-break: optional unique tiebreak column for reproducible
   keep-latest when ``fecha_actualizacion`` ties within a day.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import FORMAT_TS9, multi_format_date
from ..functions.text import normalize_upper_trim, snake_case_columns, surrogate_key
from ..operators.dedup import keep_latest
from ..operators.dq import ValidationRule
from ..operators.joins import enrich_with_dim

# RN-001 target columns (reference src/silver/job-silver-rues.py:148-149)
DATE_COLUMNS = (
    "fecha_matricula",
    "fecha_renovacion",
    "fecha_actualizacion",
    "fecha_vigencia",
    "fecha_cancelacion",
)

Rule = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class RuesConfig:
    """Injected determinism: the pipeline's only sources of 'now'."""

    reference_year: int = 2025  # RN-004 antiguedad base year
    today: str = "2025-06-30"  # gold dias_vigencia / flag_vencido reference
    dedup_tiebreak: Sequence[str] = ()  # optional unique cols for RN-002 ties


# ---------------------------------------------------------------------------
# Silver rules. Application order matters and is the reference's:
# RN-010 -> 001 -> 003 -> 002 -> 008 -> 009 -> 005 -> 004 -> 006
# (src/silver/job-silver-rues.py:520-529): dates standardized before the
# dedup that orders by them; joins before the derived columns that use them.
# ---------------------------------------------------------------------------


def rn010_snake_case(df: DataFrame) -> DataFrame:
    """RN-010 column-name canonicalization (ref :126-138)."""
    return snake_case_columns(df)


def rn001_standardize_dates(df: DataFrame) -> DataFrame:
    """RN-001 multi-format date standardization to DateType (ref :144-179).
    One projection for all five columns — the reference's per-column
    withColumn/drop/rename loop builds a 15-node plan; this builds one."""
    exprs = []
    for c in df.columns:
        if c in DATE_COLUMNS:
            exprs.append(multi_format_date(F.col(c)).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(exprs)


def rn003_normalize_states(df: DataFrame) -> DataFrame:
    """RN-003 estado_matricula -> UPPER(TRIM()) (ref :185-198)."""
    if "estado_matricula" not in df.columns:
        return df
    return df.withColumn(
        "estado_matricula", normalize_upper_trim(F.col("estado_matricula"))
    )


def rn002_dedup(config: RuesConfig) -> Rule:
    """RN-002 keep-latest per (matricula, nit) by fecha_actualizacion
    (ref :204-214)."""

    def _rule(df: DataFrame) -> DataFrame:
        return keep_latest(
            df,
            ["matricula", "nit"],
            "fecha_actualizacion",
            tiebreak_cols=config.dedup_tiebreak,
        )

    return _rule


def rn008_map_identification(cat_identificacion: DataFrame) -> Rule:
    """RN-008 clase_identificacion -> codigo_identificacion via the 9-row
    catalog, both sides UPPER(TRIM)-normalized; broadcast left join
    (ref :220-248)."""

    def _rule(df: DataFrame) -> DataFrame:
        if "clase_identificacion" not in df.columns:
            return df
        normalized = df.withColumn(
            "clase_identificacion", normalize_upper_trim(F.col("clase_identificacion"))
        )
        # codigo is IntegerType in the reference (inferred catalog read); the
        # engine reads catalogs as strings for leading-zero safety and casts
        # the numeric code explicitly here.
        dim = cat_identificacion.select(
            normalize_upper_trim(F.col("clase_identificacion")).alias(
                "clase_identificacion"
            ),
            F.col("codigo").cast("int").alias("codigo"),
        )
        return enrich_with_dim(
            normalized,
            dim,
            on="clase_identificacion",
            select_map={"clase_identificacion": "clase_identificacion", "codigo": "codigo_identificacion"},
        )

    return _rule


def rn009_person_type(df: DataFrame) -> DataFrame:
    """RN-009 tipo_persona: 2 (juridical) when clase is NIT, else 1
    (ref :254-264). Column-presence guard added for consistency with the
    sibling rules (the reference's version would crash on a frame without
    clase_identificacion)."""
    if "clase_identificacion" not in df.columns:
        return df
    return df.withColumn(
        "tipo_persona",
        F.when(F.upper(F.col("clase_identificacion")) == "NIT", 2).otherwise(1),
    )


def rn005_enrich_ciiu(cat_ciiu: DataFrame) -> Rule:
    """RN-005 CIIU activity enrichment (ref :270-298). Codes are joined as
    TRIMMED STRINGS so leading-zero codes like '0111' survive the inferred
    int schema of the catalog read."""

    def _rule(df: DataFrame) -> DataFrame:
        if "cod_ciiu_act_econ_pri" not in df.columns:
            return df
        left = df.withColumn(
            "cod_ciiu_act_econ_pri",
            F.trim(F.col("cod_ciiu_act_econ_pri").cast("string")),
        )
        dim = cat_ciiu.select(
            F.trim(F.col("codigo").cast("string")).alias("cod_ciiu_join"),
            F.col("actividad").alias("actividad_economica"),
        )
        return enrich_with_dim(
            left,
            dim,
            on=left.cod_ciiu_act_econ_pri == F.col("cod_ciiu_join"),
            select_map={"cod_ciiu_join": "cod_ciiu_join", "actividad_economica": "actividad_economica"},
            drop_join_col="cod_ciiu_join",
        )

    return _rule


def rn004_derived_age(config: RuesConfig) -> Rule:
    """RN-004 antiguedad_empresa = reference_year - year(fecha_matricula)
    (ref :304-320; nondeterministic datetime.now().year replaced by config)."""

    def _rule(df: DataFrame) -> DataFrame:
        if "fecha_matricula" not in df.columns:
            return df
        return df.withColumn(
            "antiguedad_empresa",
            F.lit(config.reference_year) - F.year(F.col("fecha_matricula")),
        )

    return _rule


def rn006_unique_key(df: DataFrame) -> DataFrame:
    """RN-006 id_unico = codigo_camara_matricula_razon_social (ref :326-349)."""
    required = ("codigo_camara", "matricula", "razon_social")
    if not all(c in df.columns for c in required):
        return df
    return df.withColumn("id_unico", surrogate_key(*required))


def silver_rules(
    cat_identificacion: DataFrame, cat_ciiu: DataFrame, config: RuesConfig
) -> list[Rule]:
    """The ordered rule pipeline (D1)."""
    return [
        rn010_snake_case,
        rn001_standardize_dates,
        rn003_normalize_states,
        rn002_dedup(config),
        rn008_map_identification(cat_identificacion),
        rn009_person_type,
        rn005_enrich_ciiu(cat_ciiu),
        rn004_derived_age(config),
        rn006_unique_key,
    ]


def apply_rules(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Fold the rule pipeline over the frame — pure logical-plan building,
    zero execution until an action runs (EP2 lifecycle, SURVEY §3)."""
    for rule in rules:
        df = rule(df)
    return df


def silver_validation_rules() -> list[ValidationRule]:
    """The consolidated one-pass validation set (ref :355-391 + RN-007
    messages). Violations are reported, never dropped."""
    c = F.col
    rules = [
        ValidationRule(
            f"{name}_null", name, "Formato de fecha invalido", c(name).isNull()
        )
        for name in DATE_COLUMNS
    ]
    rules += [
        ValidationRule(
            "codigo_identificacion_null",
            "clase_identificacion",
            "Clase no encontrada en catalogo",
            c("codigo_identificacion").isNull(),
        ),
        ValidationRule(
            "actividad_economica_null",
            "cod_ciiu_act_econ_pri",
            "Codigo CIIU no encontrado",
            c("actividad_economica").isNull(),
        ),
        ValidationRule(
            "antiguedad_negativa",
            "fecha_matricula",
            "Antiguedad calculada es negativa",
            c("antiguedad_empresa") < 0,
        ),
        ValidationRule(
            "llave_unica_invalida",
            "id_unico",
            "Falta componente de llave unica",
            c("codigo_camara").isNull()
            | c("matricula").isNull()
            | c("razon_social").isNull(),
        ),
        ValidationRule(
            "matricula_null", "matricula", "Campo obligatorio NULL", c("matricula").isNull()
        ),
        ValidationRule(
            "codigo_camara_null",
            "codigo_camara",
            "Campo obligatorio NULL",
            c("codigo_camara").isNull(),
        ),
        ValidationRule(
            "clase_identificacion_null",
            "clase_identificacion",
            "Campo obligatorio NULL",
            c("clase_identificacion").isNull(),
        ),
    ]
    return rules


# ---------------------------------------------------------------------------
# Partition derivation
# ---------------------------------------------------------------------------


def bronze_year_partition(df: DataFrame) -> DataFrame:
    """Bronze: year from the RAW ts9 string (ref src/bronze/job-bronze-rues.py:130-133)."""
    return df.withColumn(
        "year_partition",
        F.year(F.to_timestamp(F.col("fecha_actualizacion"), FORMAT_TS9)),
    )


def silver_year_partition(df: DataFrame) -> DataFrame:
    """Silver: year straight from the standardized DATE column (engine-canon
    fix of the reference's NULL-partition bug, see module docstring #2)."""
    return df.withColumn("year_partition", F.year(F.col("fecha_actualizacion")))


# ---------------------------------------------------------------------------
# Gold star schema (reference src/gold/job-gold-rues.py:88-153)
# ---------------------------------------------------------------------------

DIM_EMPRESA_COLUMNS = (
    "matricula",
    "numero_identificacion",
    "nit",
    "digito_verificacion",
    "clase_identificacion",
    "codigo_identificacion",
    "razon_social",
    "primer_nombre",
    "segundo_nombre",
    "primer_apellido",
    "segundo_apellido",
    "sigla",
    "tipo_sociedad",
    "codigo_tipo_sociedad",
    "organizacion_juridica",
    "codigo_organizacion_juridica",
    "categoria_matricula",
    "codigo_categoria_matricula",
    "cod_ciiu_act_econ_pri",
    "cod_ciiu_act_econ_sec",
    "actividad_economica",
    "camara_comercio",
    "codigo_camara",
    "tipo_persona",
    "antiguedad_empresa",
    "fecha_actualizacion",
)


def build_dim_empresa(silver: DataFrame) -> DataFrame:
    """dim_empresa: 26-column projection + DISTINCT (ref :88-124)."""
    return silver.select(*DIM_EMPRESA_COLUMNS).distinct()


def build_fact_renovacion(silver: DataFrame, config: RuesConfig) -> DataFrame:
    """fact_renovacion: passthrough event columns + dias_vigencia/flag_vencido
    against the INJECTED reference date (ref :130-153 uses current_date)."""
    today = F.lit(config.today).cast("date")
    return silver.select(
        "matricula",
        "fecha_matricula",
        "fecha_renovacion",
        "fecha_vigencia",
        "fecha_cancelacion",
        "fecha_actualizacion",
        "estado_matricula",
        "codigo_estado_matricula",
        "ultimo_ano_renovado",
        F.datediff(F.col("fecha_vigencia"), today).alias("dias_vigencia"),
        F.when(F.col("fecha_vigencia") < today, 1).otherwise(0).alias("flag_vencido"),
    )
