"""Driver-facing query registry.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent ANSI SQL for the DuckDB oracle
(the driver pre-registers the parquet tables as views).

Every query here is the Spark-first re-expression of an operator family from
SURVEY.md §2 (file:line citations in each docstring).

ORDERING CONTRACT: the correctness driver scores the first 50 registry
entries in iteration order. The registry is therefore laid out explicitly:

- ``_SCORED`` (exactly 50 names): the window the driver scores this round,
  oracle-backed wherever SQL can express the semantics. The scored
  rows-only-BY-DESIGN set is no longer hand-written here — it is DERIVED
  as ``set(_SCORED) - set(_ALL_ORACLES)`` and raise-checked below against
  the documented allowlist ``_SCORED_NO_ORACLE`` (the r8 verdict's "What's
  wrong #1": two consecutive rounds had this paragraph drift from the
  tuples, so the tuples are now the source of truth). This round the
  derived set is the ANN pair (``ann_lsh_topk``/``ivf_ann_topk``) —
  approximate by construction (banded LSH buckets / bounded-nprobe IVF
  candidate sets are not SQL-expressible; recall floors pytest-pinned
  in tests/test_queries_oracle.py) — back in the window with the rest
  of the r11 demotions; the HLL/Bernoulli pair
  (``approx_distinct_profile``/``bernoulli_sample``) rotated to the
  tail with the rest of the r11 window.
- ``_TAIL`` (unscored, still registered): every tail query is gated by
  tests/test_queries_oracle.py on every pytest run — oracle-backed ones
  hash-checked, the rest rows-only.
- ``_RETIRED`` (holds ``doc_fingerprint``, ``tumbling_windows``,
  ``sliding_windows``, ``ngram_jaccard_pairs``,
  ``embedding_near_dup_pairs``, ``interval_join_batch``,
  ``deterministic_sample``, ``top5_orders``,
  ``label_similarity_profile`` and ``passage_dedup_profile`` today):
  the retirement
  mechanism for when the two-round arithmetic below stops fitting — a
  retired query keeps its implementation and pytest oracle coverage but
  leaves the driver registry.

ROTATION POLICY (two-round cadence) and its arithmetic: a query whose
driver row was fully green in round N-1 may rotate to the tail in round
N; every query returns to the window within two rounds of its last
driver row. With a 50-slot window this is satisfiable **iff the
registered surface stays ≤ 100** (two disjoint windows cover at most 100
queries in two rounds). The LIVE surface after the round-10 rotation is
100: the r9 surface was 100, − 2 r10 retirements + 2 r10 tail
additions.
The ceiling remains effectively REACHED: every addition must be matched
1:1 by a retirement. Standing
decision (resolving the r5 verdict's "What's wrong #3"): the two-round
promise stays; the round that would push the surface past 100 must
either add fewer queries or move superseded ones to ``_RETIRED``
(executed r6, r7 and r8). Preference when choosing which
green-last-round rows to keep scored: sole representatives of an
operator family (cube, ntile, as-of join, JSON extraction, connected
components) and the composed flagships (training_pipeline_summary, the
clustered embedding scale path) stay in.

Round-12 rotation (applied this round — the r11 feasibility check's
arithmetic, amended by the r11 verdict's order #4, which prescribed
making the passage rewrite driver-visible under a 1:1 retirement):
- promoted, returning r11 demotions (48 of the 49 — the 49th,
  ``passage_dedup_profile``, is retired below): every other name from
  the r11 demotion list, incl. the ANN pair (rows-only by design) and
  the HLL/Bernoulli pair's oracle-backed replacements-in-window from
  r11 rotating back out.
- promoted, first driver row (1): ``cross_corpus_contamination`` (the
  r11 tail addition, oracle-gated and pytest-hash-green at three SFs
  since it landed; pre-verified with ``tools/driver_hash_check.py``
  at sf0.01 before this rotation was committed).
- kept scored (1, filling the slot the retirement vacated):
  ``training_pipeline_summary`` — the composed six-stage flagship, the
  docstring preference's named example for keeps; its r11 driver row
  was hash-green, and keeping it scored preserves a 50-slot window
  without adding a scored-from-day-one query.
- demoted (49 stay in the tail, all driver-green or
  rows-only-by-design in CORRECTNESS_r11, due back r13): the r11
  window minus the keep above, including the first-row pair
  ``sampled_quantile_profile``/``semantic_dedup_decisions``.
- retired this round (1, matched 1:1 by the tail addition below):
  ``passage_dedup_profile`` — demoted out of the r11 window with its
  driver row taken r10 and its pytest hash oracle retained
  (RETIRED_QUERIES below). Gate story per the retirement rule: the
  rewrite STRICTLY supersedes the profile (precedent:
  ``ngram_jaccard_pairs`` superseded by ``minhash_near_duplicates``
  in r8) — ``passage_dedup_rewrite`` performs the removal the profile
  only measured, over the same 8-word md5-digest cut, and its
  per-document (n_passages, n_passages_dropped) columns carry the
  profile's repetition signal; the per-source rollup stays covered by
  the retired query's pytest gate on every run.
- new tail addition (1, filling the retirement-freed slot, due r13):
  ``passage_dedup_rewrite`` (oracle-gated from day one) — the
  passage-level duplicate REMOVAL rewrite made driver-visible
  (``queries/textops.py::dedup_passages``: global first occurrence
  per lowercased digest survives, case-preserving whitespace-
  normalized rebuild; full DuckDB twin incl. the fully-boilerplate
  empty-rewrite corner).
- round-13 feasibility check: due-back promotions in r13 are the 49
  r12 demotions + ``passage_dedup_rewrite`` (first driver row)
  = 50 exactly — r13 keeps nothing and adds nothing
  scored-from-day-one (``training_pipeline_summary``, scored r12, is
  due back by r14 and simply demotes in r13). Any r13 addition must
  name a 1:1 retirement and restate the retiree's gate story here.

(r11 rotation, for the record: 48 r10 due-backs + first rows for
``sampled_quantile_profile``/``semantic_dedup_decisions``;
``label_similarity_profile`` retired 1:1 against the
``cross_corpus_contamination`` tail addition — gate story in the r11
git history of this docstring and VERDICT.md r11.)
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
    # returning r11 demotions (48 — the 49th, passage_dedup_profile,
    # retired this round; last driver row r10, the two-round promise
    # lands the rest here)
    "customers_without_orders",
    "lineitem_cube_aggregates",
    "customer_balance_ntiles",
    "session_windows",
    "tfidf_top_terms",
    "doc_winnow_fingerprint",
    "embedding_near_dup_clustered",
    "media_byte_histogram",
    "pii_redaction_profile",
    "doc_embedding_typicality",
    "dataset_split_assignment",
    "user_conversion_funnel",
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
    "ann_lsh_topk",
    "ivf_ann_topk",
    "shared_substring_pairs",
    "sole_late_supplier_blame",
    "large_volume_customers",
    "copurchase_pagerank",
    "copurchase_triangle_census",
    "copurchase_seed_affinity",
    "bloom_decontaminated_docs",
    # first driver row (1): the r11 tail addition, oracle-gated by the
    # pytest gate since it landed and pre-verified with
    # tools/driver_hash_check.py at sf0.01
    "cross_corpus_contamination",
    # kept scored (1, filling the retirement-vacated slot): the
    # composed flagship — see the rotation notes in the docstring
    "training_pipeline_summary",
)

_TAIL = (
    # r12 demotions — all driver-green (or rows-only-by-design: the
    # HLL/Bernoulli pair) in CORRECTNESS_r11, rotated out per the
    # two-round policy (due back r13 — see the r13 feasibility check in
    # the docstring). The pytest oracle gate still hash-checks every
    # oracle-backed one on every run, and bench.py times the full
    # registered surface.
    "asof_last_click_before_error",
    "range_join_interval_counts",
    "json_props_extract",
    "doc_dup_components",
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
    "balance_buckets",
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
    "doc_lm_backoff_scores",
    "supplier_part_share",
    "sampled_quantile_profile",
    "semantic_dedup_decisions",
    # new in r12 (due r13; surface slot freed by the
    # passage_dedup_profile retirement): the passage-level duplicate
    # REMOVAL rewrite made driver-visible — global first occurrence per
    # lowercased digest survives, case-preserving rebuild; DuckDB twin
    # = the full rewrite SQL (hash oracle from day one)
    "passage_dedup_rewrite",
)

# Retirement mechanism (see docstring): retired names leave the driver
# registry but MUST keep their implementation + pytest oracle coverage
# (exported as RETIRED_QUERIES/RETIRED_ORACLES for the pytest gate).
# r10 retirements: deterministic_sample, superseded by
# sampled_quantile_profile, and top5_orders, whose top-k family keeps
# shipping_priority_topk scored; r11: label_similarity_profile; r12:
# passage_dedup_profile, superseded by passage_dedup_rewrite (gate
# stories in the docstring's rotation notes).
_RETIRED = (
    "doc_fingerprint",
    "tumbling_windows",
    "sliding_windows",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "interval_join_batch",
    "deterministic_sample",
    "top5_orders",
    "label_similarity_profile",
    "passage_dedup_profile",
)

# The scored rows-only-BY-DESIGN allowlist, raise-checked against the
# DERIVED set below so the docstring's exceptions text can never drift
# from the tuples again (r8 verdict "What's wrong #1"). Change this
# tuple and the docstring TOGETHER when a rotation moves a no-oracle
# query across the window boundary.
_SCORED_NO_ORACLE = ("ann_lsh_topk", "ivf_ann_topk")

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

# Derived-not-declared: the actual scored no-oracle set must equal the
# documented allowlist exactly (both directions — a no-oracle query
# sneaking into the window, or an allowlisted one leaving it, is a
# rotation error until the allowlist + docstring are updated with it).
_derived_no_oracle = set(_SCORED) - set(_ALL_ORACLES)
if _derived_no_oracle != set(_SCORED_NO_ORACLE):
    raise RuntimeError(
        "scored rows-only set drifted from the documented allowlist: "
        f"derived={sorted(_derived_no_oracle)} "
        f"documented={sorted(_SCORED_NO_ORACLE)} — update _SCORED_NO_ORACLE "
        "and the docstring's exceptions paragraph together with the rotation"
    )

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
