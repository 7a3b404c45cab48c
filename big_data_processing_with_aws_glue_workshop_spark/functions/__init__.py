from .dates import multi_format_date, ts9_to_date
from .text import normalize_upper_trim, snake_case_columns, surrogate_key, to_snake_case

__all__ = [
    "multi_format_date",
    "ts9_to_date",
    "to_snake_case",
    "snake_case_columns",
    "normalize_upper_trim",
    "surrogate_key",
]
