"""Text/identifier expressions (RN-003/006/010 families)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_snake_case(name: str) -> str:
    """Canonical snake_case for a column name (RN-010; reference
    src/silver/job-silver-rues.py:119-124): split camelCase boundaries,
    collapse whitespace/dash/dot runs to '_', lowercase."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"[\s\-\.]+", "_", s)
    return s.lower()


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case in ONE projection (the reference
    loops withColumnRenamed, which stacks a plan node per column; a single
    select keeps the logical plan flat for wide tables)."""
    return df.select(
        [F.col(f"`{c}`").alias(to_snake_case(c)) for c in df.columns]
    )


def normalize_upper_trim(col: Column) -> Column:
    """UPPER(TRIM(x)) categorical normalizer (RN-003/RN-008;
    reference src/silver/job-silver-rues.py:190-193,225-233)."""
    return F.upper(F.trim(col))


# Explicit accent-fold table (CCNet-style normalization, Latin subset).
# translate() with an explicit table is engine-portable — unlike Unicode
# NFKD/strip-accents, whose mapping tables can differ across engines —
# and the DuckDB oracle twin uses the identical pair of strings.
ACCENT_FROM = "áéíóúüñàèìòùâêîôûäëïöç"
ACCENT_TO = "aeiouunaeiouaeiouaeioc"


def normalize_for_dedup(col: Column) -> Column:
    """Canonical text form for normalization-robust exact dedup:
    lowercase -> accent-fold (explicit table) -> drop everything outside
    [a-z0-9 + whitespace] -> collapse whitespace runs to one space ->
    trim. Every step is an explicit-table or explicit-class operation so
    Spark (Java regex) and DuckDB (RE2) produce byte-identical output;
    the md5 over this form is the dedup key that survives punctuation,
    casing, accent, and whitespace edits."""
    s = F.translate(F.lower(col), ACCENT_FROM, ACCENT_TO)
    s = F.regexp_replace(s, r"[^a-z0-9 \t\n\f\r]+", "")
    s = F.regexp_replace(s, r"[ \t\n\f\r]+", " ")
    return F.trim(s)


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) DISTINCT word n-grams — THE shared tokenizer for the
    exact n-gram join and the MinHash path (one definition so the 'LSH result
    equals exact join' contract cannot diverge).

    The token array is materialized in its own projection FIRST: inlining
    split() into the transform lambda re-evaluates it per element_at
    reference (codegen does not CSE across lambda invocations; measured
    ~20x slower). Documents with fewer than ``n`` tokens yield no shingles
    (guarded — an unguarded descending sequence() would index element 0 and
    throw INVALID_INDEX_OF_ZERO).

    The input is redistributed via parallelize_scan on ``id_col`` when the
    source arrived under-split (single row group): shingle explode + concat
    is the expensive narrow stage of every dedup pipeline, and hash
    distribution on the doc id is exactly what the downstream signature /
    fingerprint groupBys need, so the exchange moves earlier rather than
    being added."""
    from ..queries._tables import parallelize_scan

    df = parallelize_scan(df, id_col)
    tokenized = df.select(
        F.col(id_col).alias("doc_id"),
        # explicit whitespace class: Java \s includes \x0B, RE2's does not —
        # the DuckDB oracle twin must tokenize identically
        F.split(F.trim(F.lower(F.col(text_col))), r"[ \t\n\f\r]+").alias("toks"),
    )
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tokenized.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def surrogate_key(*cols: Column | str, sep: str = "_") -> Column:
    """concat_ws surrogate key (RN-006 id_unico; reference
    src/silver/job-silver-rues.py:334-340). concat_ws skips NULLs — a NULL
    component shortens the key instead of nulling it, matching the reference."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])
