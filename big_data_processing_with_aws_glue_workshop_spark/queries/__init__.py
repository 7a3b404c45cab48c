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
  entries are rows-only BY DESIGN this round: ``ann_lsh_topk`` and
  ``ivf_ann_topk`` (approximate ANN — recall pytest-pinned in
  tests/test_extensions.py, not SQL-expressible).
- ``_TAIL`` (unscored, still registered): every tail query is gated by
  tests/test_queries_oracle.py on every pytest run — oracle-backed ones
  hash-checked, the rest rows-only.
- ``_RETIRED`` (holds ``doc_fingerprint`` and ``tumbling_windows``
  today): the retirement mechanism for when the two-round arithmetic
  below stops fitting — a retired query keeps its implementation and
  pytest oracle coverage but leaves the driver registry.

ROTATION POLICY (two-round cadence) and its arithmetic: a query whose
driver row was fully green in round N-1 may rotate to the tail in round
N; every query returns to the window within two rounds of its last
driver row. With a 50-slot window this is satisfiable **iff the
registered surface stays ≤ 100** (two disjoint windows cover at most 100
queries in two rounds). The LIVE surface is 100 after round 6
(82 + 5 new scored + 6 early tail + 3 late tail + 5 final tail − 1
retired; the early/late tail additions are oracle-gated from day one and
due for promotion in r7, the five final-r6 additions in r8 — r7 is
already exactly full). The ceiling is now REACHED exactly: round 7
adds nothing scored-from-day-one, and every r7+ addition must be
matched 1:1 by a retirement (candidates named below). Standing
decision (resolving the r5 verdict's "What's wrong #3"): the two-round
promise stays; the round that would push the surface past 100 must
either add fewer queries or move superseded ones to ``_RETIRED`` —
executed for the first time this round: ``doc_fingerprint`` (superseded
by ``doc_winnow_fingerprint``, whose winnowing generalizes the min-hash
shingle fingerprint) is retired; next candidates are
``tumbling_windows``/``sliding_windows``
(the session/hourly-rollup pair covers the family). Preference when
choosing which green-last-round rows to keep scored: sole
representatives of an operator family (cube, ntile, as-of join, range
join, JSON extraction, connected components) and the composed flagships
(training_pipeline_summary, the clustered embedding scale path) stay in.

Round-6 rotation (applied this round):
- kept scored (13): the sole family representatives + flagships
  (``customers_without_orders``, ``lineitem_cube_aggregates``,
  ``customer_balance_ntiles``, ``session_windows``, ``json_props_extract``,
  ``asof_last_click_before_error``, ``range_join_interval_counts``,
  ``doc_dup_components``, ``tfidf_top_terms``, ``doc_winnow_fingerprint``,
  ``training_pipeline_summary``, ``embedding_near_dup_clustered``) and
  ``media_byte_histogram`` — its r5 row is the round's one hash FAIL
  (oracle HUGEINT->float64 type bug, fixed this round), so it stays in
  to produce the green driver row the fix claims.
- promoted, never driver-scored r5 additions (5):
  ``passage_dedup_profile``, ``pii_redaction_profile``,
  ``doc_embedding_typicality``, ``dataset_split_assignment``,
  ``user_conversion_funnel``.
- promoted, returning r5 demotions (27, last driver row r4 — the
  two-round promise lands them here): the relational core
  (``pricing_summary``, ``ml_feature_dataset``, ``validation_profile``,
  ``customer_geography_rollup``, ``revenue_by_supplier_nation``,
  ``multiformat_date_parsing``, ``supplier_unique_key``, ``order_aging``,
  ``name_pattern_filter``, ``segment_set_ops``, ``shipping_priority_topk``),
  the literal Athena ports (``athena_q1_active_by_society``,
  ``athena_q2_avg_age_by_activity``, ``athena_q3_renewal_rate_by_chamber``),
  ``tumbling_windows``, ``sliding_windows``, the text family
  (``language_id``, ``doc_dedup_profile``, ``simhash_fingerprints``,
  ``minhash_near_duplicates``, ``benchmark_contamination``,
  ``source_mixture_plan``, ``doc_repetition_scores``) and the vector
  family (``cosine_topk``, ``label_similarity_profile``, ``ann_lsh_topk``,
  ``ivf_ann_topk``).
- new in round 6, scored from day one (5): ``interval_join_batch``
  (the stream-stream watermarked interval join's batch twin — same
  plan-building code path), ``event_type_transition_matrix``,
  ``token_length_histogram``, ``bigram_association_scores``,
  ``embedding_quantization_profile``.
- demoted (37, all driver-green in CORRECTNESS_r05, due back by round 8):
  ``corpus_vocab_stats``, ``source_lang_profile``, ``doc_chunk_plan``,
  ``boilerplate_ngram_profile``, ``prefix_template_clusters``,
  ``quality_filter_decisions``, ``sequence_packing_plan``,
  ``media_probe_profile``, ``media_pixel_stats``, ``media_audio_stats``,
  ``media_frame_stats``, ``top5_orders``, ``balance_buckets``,
  ``deterministic_sample``, ``hourly_rollup_from_minutes``,
  ``value_zscore_outliers``, ``event_value_percentiles``,
  ``user_event_deltas``, ``doc_fingerprint``, ``ngram_jaccard_pairs``,
  ``active_customers_by_segment``, ``avg_balance_by_nation``,
  ``fulfillment_rate_by_nation``, ``priority_filter``,
  ``latest_order_per_customer``, ``distinct_projection``,
  ``doc_token_stats``, ``doc_quality_scores``,
  ``above_nation_avg_customers``, ``approx_distinct_profile``,
  ``bernoulli_sample``, ``customers_with_orders``,
  ``embedding_near_dup_pairs``, ``promo_revenue_share``,
  ``returnflag_pivot``, ``status_priority_rollup``,
  ``unpivot_status_metrics``.
- retired this round (2): ``doc_fingerprint`` — superseded by
  ``doc_winnow_fingerprint``; and ``tumbling_windows`` — the docstring's
  next-named candidate (``sliding_windows``/``session_windows``/
  ``hourly_rollup_from_minutes`` keep the event-window family scored),
  retired in a late-r6 1:1 swap that frees its scored slot for
  ``contained_doc_pairs`` (exact substring-containment dedup,
  rarest-shingle anchor blocking — scored from day one; demotable in
  r7, due back r9, so the r7 feasibility check below is unchanged).
  Retired queries keep their implementation and pytest oracle gate
  (``RETIRED_QUERIES``/``RETIRED_ORACLES`` below feed
  tests/test_queries_oracle.py) but no longer claim a driver slot.
- late-r6 additions to the tail (3, promote in r7, oracle-gated from
  day one): ``user_cohort_retention`` (cohort retention triangle),
  ``order_snapshot_diff`` (full-outer CDC reconciliation via
  operators/diff.py), ``part_name_linkage`` (blocked Levenshtein
  entity resolution).
- round-7 feasibility check: due-back promotions in r7 are the 36
  live r6 demotions (37 minus the retired ``doc_fingerprint``) + the
  six early-r6 tail queries (``trailing_window_rates``,
  ``table_stats_profile``, ``cross_source_overlap``,
  ``embedding_dimension_profile``, ``normalized_dedup_profile``,
  ``balanced_sample_plan``) + the three late-r6 tail queries above:
  36 + 6 + 3 = 45 promotions, leaving 5 slots for keeps — so r7 keeps
  only ~5 sole family representatives, adds NO new scored-from-day-one
  queries, and any new r7 operators enter the tail (due r8, where the
  due-back load is only the ~50-45=... the 50 r7 demotions minus
  whatever r8 retires — run this same arithmetic again in r7's
  registry update before adding anything).
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
    # kept from the r5 window: sole family representatives + flagships,
    # plus the fixed-oracle media_byte_histogram re-scoring
    "customers_without_orders",
    "lineitem_cube_aggregates",
    "customer_balance_ntiles",
    "session_windows",
    "json_props_extract",
    "asof_last_click_before_error",
    "range_join_interval_counts",
    "doc_dup_components",
    "tfidf_top_terms",
    "doc_winnow_fingerprint",
    "training_pipeline_summary",
    "embedding_near_dup_clustered",
    "media_byte_histogram",
    # promoted: the five r5 additions, first driver rows
    "passage_dedup_profile",
    "pii_redaction_profile",
    "doc_embedding_typicality",
    "dataset_split_assignment",
    "user_conversion_funnel",
    # new in round 6, scored from day one
    "interval_join_batch",
    "event_type_transition_matrix",
    "token_length_histogram",
    "bigram_association_scores",
    "embedding_quantization_profile",
    # promoted: returning r5 demotions (last driver row r4)
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
    # late-r6 swap: ``tumbling_windows`` retired in place (the docstring's
    # named candidate — sliding/session/hourly-rollup keep the family
    # scored), freeing this slot for the new exact substring-containment
    # dedup, scored from day one
    "contained_doc_pairs",
    "sliding_windows",
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
)

_TAIL = (
    # r6 demotions — all green driver rows in CORRECTNESS_r05, rotated out
    # per the two-round policy above (due back by round 8; round 7 should
    # take them all — see the feasibility check in the docstring). The
    # pytest oracle gate still hash-checks every oracle-backed one on
    # every run, and bench.py still times every scale flagship here.
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
    "ngram_jaccard_pairs",
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
    "embedding_near_dup_pairs",
    "promo_revenue_share",
    "returnflag_pivot",
    "status_priority_rollup",
    "unpivot_status_metrics",
    # new in r6 AFTER the window was fixed (promote in r7): RANGE-interval
    # window frames — oracle-gated by the pytest gate from day one
    "trailing_window_rates",
    # new in r6, second batch (promote in r7, same contract): CBO-style
    # column statistics, source x source shingle-overlap matrix, and the
    # per-dimension embedding moment profile — all oracle-gated from day
    # one by the pytest gate
    "table_stats_profile",
    "cross_source_overlap",
    "embedding_dimension_profile",
    "normalized_dedup_profile",
    "balanced_sample_plan",
    # late-r6 additions (promote in r7): retention triangle, CDC diff,
    # blocked-Levenshtein linkage — oracle-gated from day one
    "user_cohort_retention",
    "order_snapshot_diff",
    "part_name_linkage",
    # final-r6 additions (due r8, NOT r7 — the r7 window is already exactly
    # full at 45 due-backs + 5 keeps, see the feasibility check above):
    # Q21-shape decorrelated EXISTS/NOT-EXISTS, Q18-shape
    # semi-join-on-aggregate, integer-exact iterative PageRank, the
    # degree-ordered-orientation triangle census, and sparse
    # personalized PageRank (seed-set expansion) — oracle-gated from
    # day one
    "sole_late_supplier_blame",
    "large_volume_customers",
    "copurchase_pagerank",
    "copurchase_triangle_census",
    "copurchase_seed_affinity",
)

# Retirement mechanism (see docstring): retired names leave the driver
# registry but MUST keep their implementation + pytest oracle coverage
# (exported as RETIRED_QUERIES/RETIRED_ORACLES for the pytest gate).
_RETIRED = ("doc_fingerprint", "tumbling_windows")

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
