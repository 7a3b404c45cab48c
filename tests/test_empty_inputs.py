"""Empty-input sweep: every registered + retired query must behave
sanely on a ZERO-ROW corpus with the production schemas.

Why this matters at 100 TB: partition pruning, bookmark-driven
incremental reads, and drift-gated refreshes routinely hand operators
an empty slice of the lake. An operator that crashes on empty input
(.first()[...] on None, .collect()[0], divide-by-zero in a driver-side
calibration) fails the whole job at 3am on the one day a filter
matched nothing. Contract pinned here:

- queries either return (possibly zero) rows, or
- refuse LOUDLY with an actionable ValueError — allowed only for the
  documented iterative/model-based ops where an empty corpus makes the
  operator meaningless (an ANN index over nothing, PageRank without
  vertices, an LM with no reference tokens). The allowlist is exact in
  both directions: a new query that crashes on empty input fails this
  test, and a guarded query that silently starts returning rows on
  empty input (guard removed) also fails.

The r10 sweep that motivated this: 104/108 queries returned cleanly,
the four below refused loudly, zero unexpected crashes.
"""

from __future__ import annotations

import pytest

from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES, RETIRED_QUERIES
from big_data_processing_with_aws_glue_workshop_spark.queries._tables import TABLES

# The documented loud-refusal set: iterative / model-based operators for
# which a zero-row corpus is a caller error, not a degenerate input.
# Every entry must raise ValueError with a message naming the emptiness.
_EMPTY_REFUSES = {
    "ivf_ann_topk",          # k-means IVF index needs a non-empty corpus
    "copurchase_pagerank",   # PageRank needs >= 1 vertex
    "copurchase_seed_affinity",  # personalized PageRank needs seeds
    "doc_lm_backoff_scores",     # LM count tables need reference tokens
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row parquet twins of the driver testdata, same schemas."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("emptydata")
    for t in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    surface = {**QUERIES, **RETIRED_QUERIES}
    unexpected_crash = []
    missing_refusal = []
    for name, fn in surface.items():
        try:
            fn(spark, empty_sf_dir).collect()
            if name in _EMPTY_REFUSES:
                missing_refusal.append(name)
        except ValueError:
            if name not in _EMPTY_REFUSES:
                unexpected_crash.append(name)
        except Exception as ex:  # noqa: BLE001 — diagnose, then fail
            unexpected_crash.append(f"{name} ({type(ex).__name__}: {ex})")
    assert not unexpected_crash, (
        "queries crashed on a zero-row corpus (either handle empty input "
        "or add a loud ValueError guard + allowlist entry): "
        f"{unexpected_crash}"
    )
    assert not missing_refusal, (
        "allowlisted empty-refusing queries returned rows instead of "
        f"raising — guard removed without updating the allowlist: "
        f"{missing_refusal}"
    )
