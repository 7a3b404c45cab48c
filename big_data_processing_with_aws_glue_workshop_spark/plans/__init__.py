from .rues import (
    DATE_COLUMNS,
    RuesConfig,
    apply_rules,
    bronze_year_partition,
    build_dim_empresa,
    build_fact_renovacion,
    silver_rules,
    silver_validation_rules,
    silver_year_partition,
)
from . import analytics

__all__ = [
    "RuesConfig",
    "DATE_COLUMNS",
    "silver_rules",
    "apply_rules",
    "silver_validation_rules",
    "bronze_year_partition",
    "silver_year_partition",
    "build_dim_empresa",
    "build_fact_renovacion",
    "analytics",
]
