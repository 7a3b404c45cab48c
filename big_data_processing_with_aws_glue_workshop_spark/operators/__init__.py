from .dedup import exact_dedup_count, keep_latest
from .joins import anti_join_orphans, enrich_with_dim
from .dq import (
    ValidationRule,
    consolidated_validation,
    error_log_schema,
    null_profile,
    sampled_profile,
)

__all__ = [
    "keep_latest",
    "exact_dedup_count",
    "enrich_with_dim",
    "anti_join_orphans",
    "ValidationRule",
    "consolidated_validation",
    "null_profile",
    "sampled_profile",
    "error_log_schema",
]
