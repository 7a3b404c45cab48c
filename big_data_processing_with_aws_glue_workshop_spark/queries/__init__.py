"""Driver-facing query registry.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent ANSI SQL for the DuckDB oracle
(the driver pre-registers the parquet tables as views).

Every query here is the Spark-first re-expression of an operator family from
SURVEY.md §2 (file:line citations in each docstring).

ORDERING CONTRACT: the correctness driver scores the first 50 registry
entries in iteration order. The registry is therefore laid out explicitly:

- ``_SCORED`` (exactly 50 names): the window the driver scores this round,
  oracle-backed wherever SQL can express the semantics. Exactly two scored
  entries are rows-only BY DESIGN this round: ``approx_distinct_profile``
  (HLL sketch — engine-specific estimates, error bound pytest-pinned) and
  ``bernoulli_sample`` (engine RNG; its oracle-backed twin
  ``deterministic_sample`` is scored alongside it). The ANN pair
  (``ann_lsh_topk``/``ivf_ann_topk``, recall pytest-pinned) sits in the
  tail this round.
- ``_TAIL`` (unscored, still registered): every tail query is gated by
  tests/test_queries_oracle.py on every pytest run — oracle-backed ones
  hash-checked, the rest rows-only.
- ``_RETIRED`` (holds ``doc_fingerprint``, ``tumbling_windows``,
  ``sliding_windows``, ``ngram_jaccard_pairs`` and
  ``embedding_near_dup_pairs`` today): the retirement mechanism for when
  the two-round arithmetic below stops fitting — a retired query keeps
  its implementation and pytest oracle coverage but leaves the driver
  registry.

ROTATION POLICY (two-round cadence) and its arithmetic: a query whose
driver row was fully green in round N-1 may rotate to the tail in round
N; every query returns to the window within two rounds of its last
driver row. With a 50-slot window this is satisfiable **iff the
registered surface stays ≤ 100** (two disjoint windows cover at most 100
queries in two rounds). The LIVE surface after the round-8 rotation is
100: the r7 surface was 100 (50 scored + 50 tail — the r7 docstring's
"99" sentence undercounted by omitting the 1:1 ``shared_substring_pairs``
swap it itself described; the invariants below always held at 100), − 2
r8 retirements + 2 r8 tail additions. The ceiling remains effectively
REACHED: every addition must be matched 1:1 by a retirement. Standing
decision (resolving the r5 verdict's "What's wrong #3"): the two-round
promise stays; the round that would push the surface past 100 must
either add fewer queries or move superseded ones to ``_RETIRED``
(executed r6, r7 and r8). Preference when choosing which
green-last-round rows to keep scored: sole representatives of an
operator family (cube, ntile, as-of join, JSON extraction, connected
components) and the composed flagships (training_pipeline_summary, the
clustered embedding scale path) stay in.

Round-8 rotation (applied this round — the exact plan the r7
feasibility check prescribed, with zero slack: 50 due-back promotions,
zero keeps, zero new scored-from-day-one queries):
- promoted, returning r7 demotions (44, last driver row r6): every
  name from the r7 demotion list.
- promoted, first driver rows (6): the five final-r6 tail queries
  (``sole_late_supplier_blame``, ``large_volume_customers``,
  ``copurchase_pagerank``, ``copurchase_triangle_census``,
  ``copurchase_seed_affinity``) and the r7 tail addition
  ``shared_substring_pairs`` — all oracle-gated by the pytest gate
  since they landed, and pre-verified against the driver's stringified
  multiset compare via ``tools/driver_hash_check.py`` before this
  rotation was committed.
- demoted (48, all driver-green in CORRECTNESS_r07, due back r9): the
  50-member r7 window minus the two retirements below.
- retired this round (2): the superseded quadratic oracle twins the r7
  docstring and the r7 VERDICT both named — ``ngram_jaccard_pairs``
  (covered by ``minhash_near_duplicates`` + ``contained_doc_pairs``)
  and ``embedding_near_dup_pairs`` (covered by
  ``embedding_near_dup_clustered``), both green r7. Both keep their
  pytest oracle gates; the scored/benched path no longer carries any
  all-pairs plan, and the bench sheds ~18 s of intentional quadratic
  verification work.
- new tail additions (2, filling the retirement-freed slots,
  oracle-gated from day one, due r9): ``doc_lm_backoff_scores``
  (distributed Stupid-Backoff trigram LM quality scoring — the
  model-based curation stage the r7 verdict named as the last public
  recipe gap) and ``supplier_part_share`` (decorrelated scalar
  subquery on a per-group minimum — TPC-H Q2-shape min-per-group
  semi-join, a relational family with no current representative).
- round-9 feasibility check: due-back promotions in r9 are the 48 r8
  demotions + the two new r8 tail additions = 50 exactly — r9 keeps
  nothing and adds nothing scored-from-day-one; if r9 needs slack, its
  retirement candidates should again be superseded oracle twins (e.g.
  ``interval_join_batch`` is the batch twin of the streaming interval
  join and ``deterministic_sample`` anchors ``bernoulli_sample`` —
  retire only with the anchored query's gate story restated). After
  r9, the 50 r9 demotions are due back r10 and the two-round cycle is
  back to a pure 50/50 flip-flop unless the surface changes.
"""

import functools

from ._tables import ensure_session_confs
from ..util import maybe_release_tracked_caches
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
    # returning r7 demotions (44, last driver row r6 — the two-round
    # promise lands them here)
    "customers_without_orders",
    "lineitem_cube_aggregates",
    "customer_balance_ntiles",
    "session_windows",
    "tfidf_top_terms",
    "doc_winnow_fingerprint",
    "embedding_near_dup_clustered",
    "media_byte_histogram",
    "passage_dedup_profile",
    "pii_redaction_profile",
    "doc_embedding_typicality",
    "dataset_split_assignment",
    "user_conversion_funnel",
    "interval_join_batch",
    "event_type_transition_matrix",
    "token_length_histogram",
    "bigram_association_scores",
    "embedding_quantization_profile",
    "pricing_summary",
    "ml_feature_dataset",
    "validation_profile",
    "customer_geography_rollup",
    "revenue_by_supplier_nation",
    "multiformat_date_parsing",
    "supplier_unique_key",
    "order_aging",
    "name_pattern_filter",
    "segment_set_ops",
    "shipping_priority_topk",
    "athena_q1_active_by_society",
    "athena_q2_avg_age_by_activity",
    "athena_q3_renewal_rate_by_chamber",
    "contained_doc_pairs",
    "language_id",
    "doc_dedup_profile",
    "simhash_fingerprints",
    "minhash_near_duplicates",
    "benchmark_contamination",
    "source_mixture_plan",
    "doc_repetition_scores",
    "cosine_topk",
    "label_similarity_profile",
    "ann_lsh_topk",
    "ivf_ann_topk",
    # first driver rows (6): the r7 tail addition + the five final-r6
    # graph/Q21 queries, all oracle-gated by the pytest gate since they
    # landed and pre-verified with tools/driver_hash_check.py
    "shared_substring_pairs",
    "sole_late_supplier_blame",
    "large_volume_customers",
    "copurchase_pagerank",
    "copurchase_triangle_census",
    "copurchase_seed_affinity",
)

_TAIL = (
    # r8 demotions — all green driver rows in CORRECTNESS_r07, rotated out
    # per the two-round policy (due back r9 — see the r9 feasibility check
    # in the docstring; the r7 window's other two members,
    # ngram_jaccard_pairs and embedding_near_dup_pairs, were retired this
    # round instead of demoted). The pytest oracle gate still hash-checks
    # every oracle-backed one on every run, and bench.py times the full
    # registered surface.
    "asof_last_click_before_error",
    "range_join_interval_counts",
    "json_props_extract",
    "doc_dup_components",
    "training_pipeline_summary",
    "corpus_vocab_stats",
    "source_lang_profile",
    "doc_chunk_plan",
    "boilerplate_ngram_profile",
    "prefix_template_clusters",
    "quality_filter_decisions",
    "sequence_packing_plan",
    "media_probe_profile",
    "media_pixel_stats",
    "media_audio_stats",
    "media_frame_stats",
    "top5_orders",
    "balance_buckets",
    "deterministic_sample",
    "hourly_rollup_from_minutes",
    "value_zscore_outliers",
    "event_value_percentiles",
    "user_event_deltas",
    "active_customers_by_segment",
    "avg_balance_by_nation",
    "fulfillment_rate_by_nation",
    "priority_filter",
    "latest_order_per_customer",
    "distinct_projection",
    "doc_token_stats",
    "doc_quality_scores",
    "above_nation_avg_customers",
    "approx_distinct_profile",
    "bernoulli_sample",
    "customers_with_orders",
    "promo_revenue_share",
    "returnflag_pivot",
    "status_priority_rollup",
    "unpivot_status_metrics",
    "trailing_window_rates",
    "table_stats_profile",
    "cross_source_overlap",
    "embedding_dimension_profile",
    "normalized_dedup_profile",
    "balanced_sample_plan",
    "user_cohort_retention",
    "order_snapshot_diff",
    "part_name_linkage",
    # new in r8 (due r9; surface slots freed by the two retirements
    # above, oracle-gated from day one): the Stupid-Backoff LM quality
    # scorer and the Q2-shape min-per-group semi-join
    "doc_lm_backoff_scores",
    "supplier_part_share",
)

# Retirement mechanism (see docstring): retired names leave the driver
# registry but MUST keep their implementation + pytest oracle coverage
# (exported as RETIRED_QUERIES/RETIRED_ORACLES for the pytest gate).
# r8 retirements: the two superseded quadratic oracle twins the r7
# docstring and verdict both named.
_RETIRED = (
    "doc_fingerprint",
    "tumbling_windows",
    "sliding_windows",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
)

# Module-level invariants the correctness driver depends on. Explicit raises,
# not assert: python -O strips asserts, which would silently disable the
# ordering guarantee.
if len(_SCORED) != 50:
    raise RuntimeError(f"scored window must be exactly 50, got {len(_SCORED)}")
if set(_SCORED) & set(_TAIL):
    raise RuntimeError(f"scored/tail overlap: {set(_SCORED) & set(_TAIL)}")
if len(_SCORED + _TAIL) > 100:
    raise RuntimeError(
        "registered surface exceeds 100: the two-round rotation promise is "
        "no longer satisfiable with a 50-slot window — retire superseded "
        "queries (move to _RETIRED) or amend the policy docstring first"
    )
if set(_SCORED + _TAIL) != set(_ALL_QUERIES) - set(_RETIRED):
    raise RuntimeError(
        "registry ordering drifted from the query modules: "
        f"missing={set(_ALL_QUERIES) - set(_SCORED + _TAIL) - set(_RETIRED)} "
        f"stale={set(_SCORED + _TAIL) - set(_ALL_QUERIES)}"
    )


def _self_sufficient(fn):
    """Pin required session confs before the query builds its plan.

    The driver supplies a vanilla session (ANSI on, no nanosAsLong); every
    registered callable must work there without our session factory. Also
    releases cache entries registered by the PREVIOUS query's plan, so a
    long-lived session running the whole registry (the driver harness, the
    pytest gate) holds at most one query's cached intermediates at a time.
    Measurement harnesses that rerun ONE query back-to-back (bench.py's
    warm+timed pair) suspend the release with util.keep_tracked_caches so
    the timed run keeps the warm run's plan-keyed persists.
    """

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        maybe_release_tracked_caches()
        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


_ALL_ORACLES = {
    **_REL_ORACLES,
    **_AT_ORACLES,
    **_EV_ORACLES,
    **_TX_ORACLES,
    **_VC_ORACLES,
    **_MD_ORACLES,
}

QUERIES = {name: _self_sufficient(_ALL_QUERIES[name]) for name in _SCORED + _TAIL}
ORACLES = {
    name: sql for name, sql in _ALL_ORACLES.items() if name not in _RETIRED
}

# Retired queries stay pytest-gated (tests/test_queries_oracle.py) even
# though the driver no longer scores them: retirement frees a rotation
# slot, it does not waive correctness.
RETIRED_QUERIES = {
    name: _self_sufficient(_ALL_QUERIES[name]) for name in _RETIRED
}
RETIRED_ORACLES = {
    name: _ALL_ORACLES[name] for name in _RETIRED if name in _ALL_ORACLES
}
