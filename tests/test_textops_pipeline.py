"""Semantic tests for the r3 training-pipeline text operators — the
guarantees the oracle hash-check can't express directly:
- winnowing's detection contract (any shared token run of K+W-1 tokens
  yields at least one shared fingerprint),
- contamination detection of a planted eval overlap,
- TF-IDF ordering sanity (rarer terms outrank ubiquitous ones).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
    _CONTAM_N,
    _EVAL_MOD,
    _WINNOW_K,
    _WINNOW_W,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _winnow_fps(spark, rows):
    """Run the winnowing pipeline on an in-memory docs frame by reusing the
    registered query's internals via a temp parquet-free path: rebuild the
    same expressions directly (the query itself is pinned by the oracle
    gate; this exercises the CONTRACT on crafted inputs)."""
    from pyspark.sql import Window

    K, W, B, M = _WINNOW_K, _WINNOW_W, 131, 2147483647
    d = _docs(spark, rows)
    th = d.select(
        "doc_id",
        F.transform(
            F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % M,
        ).alias("hs"),
    )
    hs = F.col("hs")
    grams = F.when(
        F.size(hs) >= K,
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - (K - 1)),
            lambda i: (
                F.element_at(hs, i.cast("int")) * (B**3)
                + F.element_at(hs, (i + 1).cast("int")) * (B**2)
                + F.element_at(hs, (i + 2).cast("int")) * B
                + F.element_at(hs, (i + 3).cast("int"))
            )
            % M,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    exploded = th.select("doc_id", grams.alias("kg")).select(
        "doc_id", F.posexplode("kg").alias("pos", "kh")
    )
    wspec = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
    wcnt = Window.partitionBy("doc_id")
    fps = (
        exploded.select(
            "doc_id",
            "pos",
            F.min("kh").over(wspec).alias("fp"),
            F.count(F.lit(1)).over(wcnt).alias("nk"),
        )
        .filter(F.col("pos") <= F.col("nk") - W)
        .select("doc_id", "fp")
        .distinct()
    )
    out = {}
    for r in fps.collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_winnowing_detects_shared_runs(spark):
    # docs 1 and 2 share a run of exactly K+W-1 = 8 tokens (the winnowing
    # detection threshold); doc 3 shares nothing
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "completely different words with no common run at all here"),
    ]
    fps = _winnow_fps(spark, rows)
    assert fps[1] & fps[2], "shared K+W-1 token run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnowing_short_doc_has_no_fingerprints(spark):
    need = _WINNOW_K + _WINNOW_W - 1
    rows = [(1, " ".join(f"t{i}" for i in range(need - 1)))]
    fps = _winnow_fps(spark, rows)
    assert 1 not in fps  # fewer than K+W-1 tokens -> zero complete windows


def test_contamination_flags_planted_overlap(spark, tmp_path):
    # build a tiny documents table: doc 17 (eval: 17 % 17 == 0) shares a
    # 5-gram with training doc 1; training doc 2 is clean
    gram = "lorem ipsum dolor sit amet"
    rows = [
        (_EVAL_MOD, f"eval doc containing {gram} exactly once"),
        (1, f"training doc where {gram} also appears verbatim"),
        (2, "clean training doc sharing nothing with the eval slice"),
    ]
    df = _docs(spark, rows).withColumn("lang", F.lit("en"))
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)
    # the query reads {sf_dir}/documents.parquet
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        q_benchmark_contamination,
    )

    out = {
        r["doc_id"]: r
        for r in q_benchmark_contamination(spark, str(tmp_path)).collect()
    }
    assert 1 in out and out[1]["top_eval_id"] == _EVAL_MOD
    assert out[1]["top_shared"] >= 1 and out[1]["n_eval_matches"] == 1
    assert 2 not in out
    assert _CONTAM_N == 5  # the planted gram length must match the operator


def test_tfidf_prefers_rare_terms(spark, tmp_path):
    rows = [
        (1, "common common rareword filler"),
        (2, "common filler text here"),
        (3, "common another filler document"),
    ]
    df = _docs(spark, rows).withColumn("lang", F.lit("en"))
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        q_tfidf_top_terms,
    )

    out = q_tfidf_top_terms(spark, str(tmp_path))
    top_doc1 = out.filter((F.col("doc_id") == 1) & (F.col("rank") == 1)).first()
    # df(rareword)=1 so idf=3.0; tf(common)=2 but idf=1.0 -> rareword wins
    assert top_doc1["token"] == "rareword"
    assert top_doc1["df"] == 1 and top_doc1["tf"] == 1


def test_source_overlap_cap_drops_ubiquitous_shingles(spark):
    """The ubiquity cap must drop boilerplate shingles (present in more
    sources than the cap) BEFORE the pair join, both from the pair counts
    and from the containment denominators, while genuine two-source
    overlap survives."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        source_overlap_matrix,
    )

    boiler = "common header tokens here"  # 2 shingles, in ALL sources
    rows = [
        (1, boiler + " alpha beta gamma delta", "s1"),
        (2, boiler + " alpha beta gamma delta", "s2"),  # real overlap w/ s1
        (3, boiler + " completely different words now", "s3"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    capped = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(d, 2).collect()
    }
    # boilerplate (3 sources > cap 2) gone: s3 pairs with nobody; the
    # bridge shingles spanning boiler->payload differ per payload
    assert set(capped) == {("s1", "s2")}
    uncapped = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(d, 10).collect()
    }
    # uncapped keeps the 2 boilerplate shingles -> every pair appears
    assert set(uncapped) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert uncapped[("s1", "s3")] == 2
    assert uncapped[("s1", "s2")] == capped[("s1", "s2")] + 2


def test_normalize_for_dedup_collapses_formatting_variants(spark):
    """Formatting variants (case, accents, punctuation, whitespace) must
    canonicalize to the SAME form; genuinely different text must not."""
    from big_data_processing_with_aws_glue_workshop_spark.functions.text import (
        normalize_for_dedup,
    )

    rows = [
        (1, "Hello,   World!"),
        (2, "héllo wörld"),          # accents + case + punct + ws
        (3, "HELLO WORLD\t"),
        (4, "hello worlds"),          # different content
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", normalize_for_dedup(F.col("text")).alias("n")
        ).collect()
    }
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "hello worlds"


def test_contained_doc_pairs_planted_containment(spark, tmp_path):
    """Crafted corpus for the exact substring-containment operator: a doc
    embedded verbatim mid-text, equal texts under distinct ids (both
    directed pairs), a doc shorter than the anchor shingle length (the
    broadcast fallback branch), and near-miss text that must NOT match."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _CONTAIN_K,
        q_contained_doc_pairs,
    )

    inner = "the quick brown fox jumps over the lazy dog near the river bank"
    assert len(inner) >= _CONTAIN_K
    short = "tiny snippet"  # < _CONTAIN_K chars: must take the fallback
    assert len(short) < _CONTAIN_K
    rows = [
        (1, inner),
        (2, f"prefix text before -- {inner} -- and a suffix after it"),
        (3, f"another container holding {short} inside a longer body"),
        (4, short),
        # near miss: one char differs inside the would-be containment
        (5, f"prefix text before -- {inner[:-1]}x -- and a suffix"),
        (6, "completely unrelated content with nothing shared at all"),
        (7, inner),  # equal text, distinct id: both directions must appear
    ]
    df = _docs(spark, rows).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["contained_doc_id"], r["container_doc_id"])
        for r in q_contained_doc_pairs(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in got          # proper mid-text containment
    assert (4, 3) in got          # short-doc fallback containment
    assert (1, 7) in got and (7, 1) in got  # equal texts, both directions
    assert (7, 2) in got          # equal twin is contained wherever 1 is
    assert (1, 5) not in got      # near miss must not match
    assert not any(a == 6 or b == 6 for a, b in got)


def test_shared_substring_pairs_planted_overlaps(spark, tmp_path):
    """Crafted corpus for the partial-overlap ExactSubstr operator: two
    docs sharing a long passage with NEITHER containing the other (the
    case contained_doc_pairs cannot see), a full-containment pair (flag
    must be set), a pair whose shared run sits just UNDER the MIN
    threshold (must not appear), and the exact longest-run length checked
    against hand-counted characters."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _SHARED_MIN,
        q_shared_substring_pairs,
    )

    passage = "the shared syndicated paragraph that rides along verbatim"
    assert len(passage) >= _SHARED_MIN
    sub_min = "x" * (_SHARED_MIN - 1)  # 24 chars: one under the guarantee
    rows = [
        # partial overlap: distinct prefixes/suffixes, shared passage
        (1, f"alpha document opening words {passage} and alpha's own ending"),
        (2, f"totally different beginning {passage} closed differently here"),
        # full containment: 3 inside 4
        (3, f"container core {passage} goes here"),
        (4, f"outer wrap -- container core {passage} goes here -- tail"),
        # shared run one char short of the guarantee: excluded by contract
        # (delimiters differ on both sides so the run is exactly 24 chars)
        (5, f"left padding abcdefgh({sub_min})right padding stuff"),
        (6, f"other padding qrstuvw[{sub_min}]another tail entirely"),
        (7, "no overlap with anything else in this tiny corpus at all"),
    ]
    df = _docs(spark, rows).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): (r["overlap_chars"], r["is_containment"])
        for r in q_shared_substring_pairs(spark, str(tmp_path)).collect()
    }
    texts = dict(rows)
    # (1,2): shared run is " {passage} " plus any accidental extension —
    # compute the exact expected longest common substring by brute force
    def lcs(a, b):
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                best = max(best, k)
        return best

    assert got[(1, 2)] == (lcs(texts[1], texts[2]), False)
    assert got[(3, 4)] == (len(texts[3]), True)  # full containment
    assert (5, 6) not in got                     # under the guarantee
    assert not any(5 in p or 6 in p or 7 in p for p in got)
    # every reported pair carries the exact LCS, both directions covered
    for (a, b), (ov, _) in got.items():
        assert ov == lcs(texts[a], texts[b]) >= _SHARED_MIN
        assert a < b


def test_contained_doc_pairs_short_doc_cap_fails_loud(spark, tmp_path, monkeypatch):
    """A corpus dominated by sub-K boilerplate would turn the broadcast
    fallback into an all-pairs contains() verify — the guard must raise
    instead of silently going quadratic."""
    import big_data_processing_with_aws_glue_workshop_spark.queries.textops as textops

    rows = [(i, f"s{i % 7}") for i in range(30)]  # all < _CONTAIN_K chars
    df = _docs(spark, rows).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(textops, "_CONTAIN_SHORT_DOC_CAP", 10)
    with pytest.raises(RuntimeError, match="broadcast-fallback cap"):
        textops.q_contained_doc_pairs(spark, str(tmp_path))


def test_dedup_passages_matches_oracle(spark, sf_dir):
    """The passage-removal REWRITE (not just the profile) is held to a
    full DuckDB twin on the real documents table: identical rewritten
    text, passage counts and drop counts for every document. The SQL is
    the registered driver oracle (single source of truth since the
    rewrite went driver-visible in r12 as passage_dedup_rewrite)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        ORACLES,
        dedup_passages,
    )
    from tests.oracle_harness import compare

    out = dedup_passages(load(spark, sf_dir, "documents"))
    compare(out, ORACLES["passage_dedup_rewrite"], sf_dir)


def test_dedup_passages_planted_fixture(spark):
    """First occurrence survives, the later duplicate passage is excised
    (the surrounding document survives), tails and short docs pass
    through normalized, fully-boilerplate docs come back empty."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dedup_passages,
    )

    p1 = "a b c d e f g h"          # passage 1 (8 words)
    p2 = "i j k l m n o p"          # passage 2
    fresh = "q r s t u v w x"       # unique to doc 2
    mixed = "Alpha BRAVO charlie Delta Echo Foxtrot GOLF hotel"  # mixed case
    docs = spark.createDataFrame(
        [
            (1, "s", f"{p1} {p2}"),                # both passages original
            (2, "s", f"{p2} {fresh} tail words"),  # block0 dups doc1's p2
            (3, "s", "short doc"),                 # < 8 words: untouched
            (4, "s", f"  {p1.upper()}  "),         # pure boilerplate (case/ws-normalized dup)
            (5, "s", f"{mixed} Tail CASE"),        # unique; case must survive
        ],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in dedup_passages(docs).collect()}
    assert got[1]["text_deduped"] == f"{p1} {p2}"
    assert (got[1]["n_passages"], got[1]["n_passages_dropped"]) == (2, 0)
    assert got[2]["text_deduped"] == f"{fresh} tail words"
    assert (got[2]["n_passages"], got[2]["n_passages_dropped"]) == (2, 1)
    assert got[3]["text_deduped"] == "short doc"
    assert (got[3]["n_passages"], got[3]["n_passages_dropped"]) == (0, 0)
    # matching is case-insensitive (doc 4 is still a dup of p1) ...
    assert got[4]["text_deduped"] == ""
    assert (got[4]["n_passages"], got[4]["n_passages_dropped"]) == (1, 1)
    # ... but the REWRITE is case-preserving (r11 ADVICE high: the r11
    # cut lowercased every rewritten document via _tokens)
    assert got[5]["text_deduped"] == f"{mixed} Tail CASE"
    assert (got[5]["n_passages"], got[5]["n_passages_dropped"]) == (1, 0)


_EPOCH_MIX_ORACLE = """
    WITH w(source, weight) AS (
      VALUES ('src0', 5.0), ('src1', 1.0), ('src2', 0.25)
    ),
    per AS (
      SELECT source,
             CAST(len(string_split_regex(trim(lower(text)),
                                         '[ \\t\\n\\f\\r]+')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 AS BIGINT) AS h
      FROM documents
    ),
    totals AS (
      SELECT source, COUNT(1) AS n_docs, SUM(n_tokens) AS total_tokens
      FROM per GROUP BY 1
    ),
    rated AS (
      SELECT t.source, n_docs, total_tokens,
             coalesce(w.weight, 0.0) AS weight,
             CAST(500000 AS DOUBLE) * coalesce(w.weight, 0.0) / 6.25 AS target_tokens
      FROM totals t LEFT JOIN w ON t.source = w.source
    ),
    epochs AS (
      SELECT *, CAST(FLOOR(target_tokens / total_tokens) AS BIGINT) AS epochs
      FROM rated
    ),
    rr AS (
      SELECT *,
             (target_tokens - CAST(epochs AS DOUBLE) * total_tokens)
               / total_tokens AS residual_rate
      FROM epochs
    ),
    sel AS (
      SELECT p.source, COUNT(1) AS n_residual_docs, SUM(n_tokens) AS residual_tokens
      FROM per p JOIN rr ON p.source = rr.source
      WHERE CAST(h AS DOUBLE) < rr.residual_rate * 1000000.0
      GROUP BY 1
    )
    SELECT rr.source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           weight, target_tokens,
           CAST(epochs AS INT) AS epochs,
           residual_rate,
           CAST(coalesce(n_residual_docs, 0) AS BIGINT) AS n_residual_docs,
           CAST(coalesce(residual_tokens, 0) AS BIGINT) AS residual_tokens,
           CAST(epochs * total_tokens + coalesce(residual_tokens, 0) AS BIGINT)
             AS planned_tokens
    FROM rr LEFT JOIN sel ON rr.source = sel.source
"""


def test_epoch_mixture_plan_matches_oracle(spark, sf_dir):
    """The upsampling mixture planner is held to a DuckDB twin on the
    real documents table: src0 weighted heavily enough to run multiple
    epochs, src1 around one epoch, src2 sub-sampled, the other 17
    sources excluded (weight 0) — every column bit-identical including
    the IEEE target/rate divisions and the salted residual sample."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        epoch_mixture_plan,
    )
    from tests.oracle_harness import compare

    out = epoch_mixture_plan(
        load(spark, sf_dir, "documents"),
        {"src0": 5.0, "src1": 1.0, "src2": 0.25},
        total_tokens=500_000,
    )
    compare(out, _EPOCH_MIX_ORACLE, sf_dir)


def test_epoch_mixture_plan_semantics(spark):
    """Plan semantics on a hand-built corpus: a heavy small source runs
    whole epochs + residual, a zero-weight source is excluded, planned
    mass lands within one document of the target, and guards refuse
    nonsense budgets/weights."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        epoch_mixture_plan,
    )

    rows = []
    for i in range(10):  # tiny premium source: 10 docs x 10 tokens
        rows.append((i, "prem", " ".join(f"p{i}_{j}" for j in range(10))))
    for i in range(100, 300):  # big web source: 200 docs x 10 tokens
        rows.append((i, "web", " ".join(f"w{i}_{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    plan = {
        r["source"]: r
        for r in epoch_mixture_plan(
            docs, {"prem": 1.0, "web": 1.0}, total_tokens=700
        ).collect()
    }
    prem, web = plan["prem"], plan["web"]
    assert prem["total_tokens"] == 100 and web["total_tokens"] == 2000
    # prem target 350 over 100 available -> 3 full epochs + 0.5 residual
    assert prem["epochs"] == 3 and abs(prem["residual_rate"] - 0.5) < 1e-9
    assert prem["planned_tokens"] == 300 + prem["residual_tokens"]
    # web target 350 over 2000 -> pure subsample
    assert web["epochs"] == 0 and abs(web["residual_rate"] - 0.175) < 1e-9
    assert web["planned_tokens"] == web["residual_tokens"]

    excl = {
        r["source"]: r
        for r in epoch_mixture_plan(docs, {"prem": 1.0}, total_tokens=100).collect()
    }
    assert excl["web"]["weight"] == 0.0 and excl["web"]["planned_tokens"] == 0
    assert excl["web"]["epochs"] == 0 and excl["web"]["n_residual_docs"] == 0

    with pytest.raises(ValueError, match="total_tokens"):
        epoch_mixture_plan(docs, {"prem": 1.0}, total_tokens=0)
    with pytest.raises(ValueError, match="weights"):
        epoch_mixture_plan(docs, {}, total_tokens=100)
    # r12 ADVICE: a weight key naming an absent source (typo) must raise,
    # not silently shrink every present source's target via the normalizer
    with pytest.raises(ValueError, match="absent"):
        epoch_mixture_plan(
            docs, {"prem": 1.0, "perm": 1.0}, total_tokens=100
        )

    # r12 ADVICE: doc counts are bigint (a 100TB source can exceed 2^31
    # documents; an int cast would overflow the report)
    schema = dict(epoch_mixture_plan(docs, {"prem": 1.0}, total_tokens=100).dtypes)
    assert schema["n_docs"] == "bigint" and schema["n_residual_docs"] == "bigint"


def test_epoch_mixture_plan_zero_mass_source_guard(spark):
    """The total_tokens > 0 guard is local (r12 verdict What's-wrong #3):
    a degenerate source whose only doc has NULL text (size(split(NULL))
    = -1, so its token mass is negative) plans 0 epochs / 0 residual /
    0 planned mass instead of dividing by a non-positive mass."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        epoch_mixture_plan,
    )

    docs = spark.createDataFrame(
        [(1, "good", "a b c d"), (2, "degenerate", None)],
        "doc_id long, source string, text string",
    )
    plan = {
        r["source"]: r
        for r in epoch_mixture_plan(
            docs, {"good": 1.0, "degenerate": 1.0}, total_tokens=8
        ).collect()
    }
    bad = plan["degenerate"]
    assert bad["epochs"] == 0 and bad["residual_rate"] == 0.0
    assert bad["n_residual_docs"] == 0 and bad["planned_tokens"] == 0
    # the healthy source still plans normally: target 4 over mass 4 -> 1 epoch
    assert plan["good"]["epochs"] == 1 and plan["good"]["planned_tokens"] == 4


def test_materialize_epoch_mixture_mass_equals_plan(spark):
    """Materialization invariants: per-source token mass equals the
    plan's planned_tokens exactly; each doc appears epochs (+1 iff
    residual-selected) times with epoch ids 0..k; zero-weight sources
    vanish."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _tokens,
        epoch_mixture_plan,
        materialize_epoch_mixture,
    )

    rows = []
    for i in range(10):
        rows.append((i, "prem", " ".join(f"p{i}_{j}" for j in range(10))))
    for i in range(100, 300):
        rows.append((i, "web", " ".join(f"w{i}_{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = epoch_mixture_plan(docs, {"prem": 1.0, "web": 1.0}, total_tokens=700)
    out = materialize_epoch_mixture(docs, plan)

    got = {
        r["source"]: r["mass"]
        for r in out.select(
            "source", F.size(_tokens(F.col("text"))).alias("n")
        ).groupBy("source").agg(F.sum("n").alias("mass")).collect()
    }
    want = {r["source"]: r["planned_tokens"] for r in plan.collect()}
    assert got == {s: t for s, t in want.items() if t > 0}

    # per-doc multiplicity: epochs copies + 1 iff residual-selected,
    # epoch ids are exactly 0..k-1
    prem = [r for r in out.filter(F.col("source") == "prem").collect()]
    by_doc = {}
    for r in prem:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for doc_id, epochs in by_doc.items():
        assert sorted(epochs) == list(range(len(epochs))), doc_id
        assert len(epochs) in (3, 4)  # 3 whole epochs, +1 if residual
    assert sum(len(v) == 4 for v in by_doc.values()) * 10 == (
        want["prem"] - 300
    )  # residual docs carry the remaining mass

    # zero-weight source vanishes entirely
    plan2 = epoch_mixture_plan(docs, {"prem": 1.0}, total_tokens=100)
    out2 = materialize_epoch_mixture(docs, plan2)
    assert out2.filter(F.col("source") == "web").count() == 0


def test_component_aware_split_no_leakage(spark):
    """Near-dup components never straddle splits: every LSH-confirmed
    near-dup pair shares a component AND a split; singletons hash on
    their own id with the exact per-doc salted arithmetic (mirrored in
    Python), so a dup-free corpus splits identically to the per-doc
    op; reruns are byte-identical."""
    import hashlib
    import random

    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        minhash_near_duplicates,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        component_aware_split,
    )

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    vid = 0
    for _ in range(25):  # near-dup pairs: copy with one word changed
        vid += 1
        base = [rng.choice(vocab) for _ in range(40)]
        rows.append((vid, " ".join(base)))
        vid += 1
        twin = list(base)
        twin[rng.randrange(40)] = rng.choice(vocab)
        rows.append((vid, " ".join(twin)))
    for _ in range(30):  # singletons
        vid += 1
        rows.append((vid, " ".join(rng.choice(vocab) for _ in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in component_aware_split(docs).collect()}
    assert set(out) == {i for i, _ in rows}  # one row per doc

    pairs = [
        (r["d1"], r["d2"])
        for r in minhash_near_duplicates(
            docs, n_hashes=64, bands=16, shingle_n=3, threshold=0.8, seed=42
        ).collect()
    ]
    assert pairs, "fixture must produce near-dup pairs"
    for a, b in pairs:
        assert out[a]["component"] == out[b]["component"], (a, b)
        assert out[a]["split"] == out[b]["split"], (a, b)

    # singleton arithmetic mirrors the per-doc split exactly
    paired = {x for p in pairs for x in p}
    checked = 0
    for doc_id, r in out.items():
        if r["component"] == doc_id and doc_id not in paired:
            h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16) % 1_000_000
            expect = "train" if h < 900_000 else ("val" if h < 950_000 else "test")
            assert r["split"] == expect, doc_id
            checked += 1
    assert checked >= 30

    rerun = {r["doc_id"]: r for r in component_aware_split(docs).collect()}
    assert {k: (v["component"], v["split"]) for k, v in out.items()} == {
        k: (v["component"], v["split"]) for k, v in rerun.items()
    }


def test_component_aware_split_non_default_columns(spark):
    """r12 ADVICE (medium): id_col/text_col must reach
    minhash_near_duplicates — with custom column names the clustering
    must run on THOSE columns, even when decoy doc_id/text columns are
    also present (the silent-wrong-column mode). The two rows whose
    ``body`` texts are near-identical share a component and a split;
    the decoy doc_id/text columns are identical across ALL rows, so
    clustering on them would merge everything into one component."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        component_aware_split,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    twin = base.replace("tok7", "tokX")
    other = " ".join(f"zz{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            # (real id, real text, decoy doc_id, decoy text)
            (101, base, 1, "decoy same"),
            (102, twin, 1, "decoy same"),
            (103, other, 1, "decoy same"),
        ],
        "rec_id long, body string, doc_id long, text string",
    )
    out = {
        r["rec_id"]: r
        for r in component_aware_split(
            docs, id_col="rec_id", text_col="body"
        ).collect()
    }
    assert set(out) == {101, 102, 103}
    assert out[101]["component"] == out[102]["component"]
    assert out[101]["split"] == out[102]["split"]
    assert out[103]["component"] != out[101]["component"]


_DECONTAM_PASSAGES_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(trim(coalesce(text, '')),
                                '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, source, w, len(w) AS n, len(w) // 8 AS nblk FROM toks
    ),
    inst AS (
      SELECT doc_id, b.i AS b,
             md5(lower(array_to_string(w[b.i * 8 + 1 : b.i * 8 + 8], ' '))) AS h
      FROM base, UNNEST(range(0, nblk)) AS b(i)
      WHERE nblk >= 1
    ),
    bw AS (SELECT w, len(w) AS n FROM toks WHERE doc_id % 20 = 7),
    bh AS (
      SELECT DISTINCT md5(lower(array_to_string(w[s.i : s.i + 7], ' '))) AS h
      FROM bw, UNNEST(range(1, n - 8 + 2)) AS s(i)
      WHERE n >= 8
    ),
    kept AS (SELECT doc_id, b FROM inst ANTI JOIN bh USING (h)),
    kpd AS (
      SELECT doc_id, list(b ORDER BY b) AS kb, COUNT(1) AS nkept
      FROM kept GROUP BY doc_id
    )
    SELECT base.doc_id, source,
           coalesce(array_to_string(
             list_concat(
               flatten(list_transform(coalesce(kb, CAST([] AS BIGINT[])),
                                      b -> w[b * 8 + 1 : b * 8 + 8])),
               CASE WHEN n > nblk * 8 THEN w[nblk * 8 + 1 : n]
                    ELSE CAST([] AS VARCHAR[]) END
             ), ' '), '') AS text_deduped,
           CAST(nblk AS INT) AS n_passages,
           CAST(nblk - coalesce(nkept, 0) AS INT) AS n_passages_dropped
    FROM base LEFT JOIN kpd USING (doc_id)
"""


def test_decontaminate_passages_matches_oracle(spark, sf_dir):
    """Passage-level benchmark decontamination held to a full DuckDB
    twin on the real tables: corpus = documents, benchmark = the
    deterministic doc_id % 20 == 7 slice (the cross_corpus fixture
    convention); sliding windows on the benchmark side, block cut on
    the doc side, identical rewrites for every document."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        decontaminate_passages,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 7).select("text")
    # caller columns ride through (a library-op feature); the oracle
    # compares the contract columns
    out = decontaminate_passages(docs, bench).select(
        "doc_id", "source", "text_deduped", "n_passages", "n_passages_dropped"
    )
    compare(out, _DECONTAM_PASSAGES_ORACLE, sf_dir)


def test_decontaminate_passages_planted_alignments(spark):
    """Sliding benchmark windows catch a leak at ANY benchmark offset
    (case-insensitively); doc-side granularity stays the block cut —
    a leak shifted WITHIN the doc block is the documented miss."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        decontaminate_passages,
    )

    bench_text = "a b c d e f g h i j"  # windows: a..h, b..i, c..j
    docs = spark.createDataFrame(
        [
            (1, "s", "a b c d e f g h tail1 tail2"),   # block == window 1
            (2, "s", "b c d e f g h i " + " ".join(f"z{k}" for k in range(8))),
            (3, "s", "x a b c d e f g h"),              # shifted IN DOC: kept
            (4, "s", "A B C D E F G H end"),            # case-variant leak
        ],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    got = {r["doc_id"]: r for r in decontaminate_passages(docs, bench).collect()}
    assert got[1]["text_deduped"] == "tail1 tail2"
    assert (got[1]["n_passages"], got[1]["n_passages_dropped"]) == (1, 1)
    assert got[2]["text_deduped"] == " ".join(f"z{k}" for k in range(8))
    assert (got[2]["n_passages"], got[2]["n_passages_dropped"]) == (2, 1)
    assert got[3]["text_deduped"] == "x a b c d e f g h"
    assert (got[3]["n_passages"], got[3]["n_passages_dropped"]) == (1, 0)
    assert got[4]["text_deduped"] == "end"
    assert (got[4]["n_passages"], got[4]["n_passages_dropped"]) == (1, 1)


def test_decontaminate_passages_empty_and_short_benchmark(spark):
    """Empty benchmark (or one with only sub-``words`` texts, which
    contribute no windows) excises nothing: every document comes back
    whitespace-normalized with zero drops — the r10 empty-input-sweep
    contract applied to the new op's small side."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        decontaminate_passages,
    )

    docs = spark.createDataFrame(
        [(1, "s", "a b c d e f g h  tail")],
        "doc_id long, source string, text string",
    )
    for bench_rows in ([], [("too short",)], [(None,)]):
        bench = spark.createDataFrame(bench_rows, "text string")
        got = decontaminate_passages(docs, bench).collect()
        assert len(got) == 1
        assert got[0]["text_deduped"] == "a b c d e f g h tail"
        assert (got[0]["n_passages"], got[0]["n_passages_dropped"]) == (1, 0)


def test_decontaminate_passages_plan_shape(spark, sf_dir):
    """Scale contract for the decontam rewrite: no Window winner
    election, no Python/Arrow nodes, no cartesian shapes; the
    benchmark anti-join lands as a broadcast (probe-0 bound on the
    small-by-construction eval side)."""
    import contextlib
    import io

    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        decontaminate_passages,
    )

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 7).select("text")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate_passages(docs, bench).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dedup_passages_adversarial_corpus_matches_reference(spark):
    """Hypothesis-style adversarial corpus in ONE Spark pass (the
    test_functions_properties pattern): random docs with planted
    boilerplate — including CASE-VARIANT copies that must match via the
    digest but rebuild with their own case — plus hand-picked edges
    (None/empty/whitespace-only text, tab/newline separators, unicode,
    token counts straddling the 8-word cut at 7/8/9/15/16/17), compared
    row-for-row against a pure-Python reference of the exact contract.

    Reference mirrors the ENGINE semantics precisely: trim strips
    SPACES only (Spark trim == DuckDB trim; Python .strip() would also
    eat tabs), split on whitespace runs, digest of the lowercased
    space-joined words, winner = min (doc_id, block), rebuild =
    case-preserving kept blocks + tail, single-space joined."""
    import hashlib
    import random
    import re

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dedup_passages,
    )

    rng = random.Random(97)
    vocab = ["Foo", "bar", "BAZ", "qux", "héllo", "世界", "x1", "Y2", "z_3", "W-4"]

    def words(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    boiler = [words(8) for _ in range(5)]
    rows = []
    vid = 0
    for _ in range(60):
        vid += 1
        parts = []
        for _ in range(rng.randrange(0, 4)):
            p = rng.choice(boiler)
            if rng.random() < 0.3:
                p = p.upper() if rng.random() < 0.5 else p.lower()  # case-variant dup
            parts.append(p)
        tail = words(rng.randrange(0, 8))
        rows.append((vid, " ".join(parts + ([tail] if tail else [])) or "solo"))
    # hand-picked edges
    for text in [
        None, "", "   ", "\t\n", "a\tb\nc d e f g h i",
        " leading and trailing  ", "七 个 词 不 够 八 个",  # 7 CJK tokens
        words(7), words(8), words(9), words(15), words(16), words(17),
    ]:
        vid += 1
        rows.append((vid, text))

    def reference(rows, k=8):
        seen = {}
        insts = []
        toks = {}
        for doc_id, text in rows:
            w = re.split(r"[ \t\n\f\r]+", (text or "").strip(" "))  # spaces only
            toks[doc_id] = w
            for b in range(len(w) // k):
                h = hashlib.md5(
                    " ".join(w[b * k:(b + 1) * k]).lower().encode()
                ).hexdigest()
                insts.append((h, doc_id, b))
        for h, doc_id, b in insts:
            if h not in seen or (doc_id, b) < seen[h]:
                seen[h] = (doc_id, b)
        out = {}
        for doc_id, _text in rows:
            w = toks[doc_id]
            nblk = len(w) // k
            kept = []
            for b in range(nblk):
                h = hashlib.md5(
                    " ".join(w[b * k:(b + 1) * k]).lower().encode()
                ).hexdigest()
                if seen[h] == (doc_id, b):
                    kept.append(b)
            rebuilt = []
            for b in kept:
                rebuilt += w[b * k:(b + 1) * k]
            rebuilt += w[nblk * k:]
            out[doc_id] = (" ".join(rebuilt), nblk, nblk - len(kept))
        return out

    expected = reference(rows)
    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in rows], "doc_id long, source string, text string"
    )
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_passages"], r["n_passages_dropped"])
        for r in dedup_passages(docs).collect()
    }
    assert got == expected
    # the fixture genuinely exercised case-variant matching
    assert any(v[2] > 0 for v in got.values())


def test_dedup_passages_duplicate_id_no_double_emit(spark):
    """r11 ADVICE low: an id appearing twice in one input used to emit
    each kept passage twice per copy (both identical (id, block, digest)
    rows survive the winner filter and collect_list held the block
    twice). The kept-block list is now distinct per (id, block): each
    copy rebuilds the passage exactly once."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dedup_passages,
    )

    p1 = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, "s", f"{p1} end"), (1, "s", f"{p1} end")],
        "doc_id long, source string, text string",
    )
    rows = dedup_passages(docs).collect()
    assert len(rows) == 2  # one output row per input row
    for r in rows:
        assert r["text_deduped"] == f"{p1} end"
        assert (r["n_passages"], r["n_passages_dropped"]) == (1, 0)


# ---------------------------------------------------------------------------
# token_budget_selection (r13): quality-ranked knapsack under a token budget


_TOKEN_BUDGET_ORACLE = """
    WITH per AS (
      SELECT doc_id,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS score,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             md5('tbs:' || CAST(doc_id AS VARCHAR)) AS tiebreak
      FROM (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS toks
        FROM documents
      )
    ),
    c AS (
      SELECT doc_id, score, n_tokens,
             ROW_NUMBER() OVER (ORDER BY score DESC, tiebreak ASC) AS sel_rank,
             SUM(n_tokens) OVER (ORDER BY score DESC, tiebreak ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM per
    )
    SELECT doc_id, score, n_tokens,
           CAST(sel_rank AS BIGINT) AS sel_rank,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {budget}
"""


def _scored_docs(spark, sf_dir):
    """documents scored by lexical diversity (distinct-token ratio) — an
    order genuinely uncorrelated with doc_id, so the budget boundary cuts
    mid-corpus and mid-bucket."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+")
    return d.select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "score"
        ),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


def test_token_budget_selection_matches_oracle(spark, sf_dir):
    """The distributed two-phase prefix sum is held to the NAIVE global
    window the SQL twin runs: identical selected set, ranks and inclusive
    cumulative sums at half the corpus token mass (the boundary falls
    inside a PARTIAL bucket, so the in-bucket cut is exercised)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )
    from tests.oracle_harness import compare

    scored = _scored_docs(spark, sf_dir)
    total = scored.agg(F.sum("n_tokens")).first()[0]
    budget = int(total) // 2
    out = token_budget_selection(scored, budget, "score")
    compare(out, _TOKEN_BUDGET_ORACLE.format(budget=budget), sf_dir)


def test_token_budget_selection_bucket_invariance(spark, sf_dir):
    """Bucketing only PARTITIONS the prefix-sum work: n_buckets=1 (fully
    serial), 7 (every bucket straddles ties) and 256 must produce the
    byte-identical selection, and a repartitioned input must too."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )

    scored = _scored_docs(spark, sf_dir)
    total = int(scored.agg(F.sum("n_tokens")).first()[0])
    budget = total // 3
    base = sorted(
        tuple(r) for r in token_budget_selection(scored, budget, "score").collect()
    )
    for nb in (1, 7):
        got = sorted(
            tuple(r)
            for r in token_budget_selection(
                scored, budget, "score", n_buckets=nb
            ).collect()
        )
        assert got == base, f"n_buckets={nb} diverged"
    got = sorted(
        tuple(r)
        for r in token_budget_selection(
            scored.repartition(13), budget, "score"
        ).collect()
    )
    assert got == base


def test_token_budget_selection_semantics(spark):
    """Contract on a hand-built corpus: inclusive-prefix selection rule,
    budget monotonicity (smaller budget selects a PREFIX of the larger
    selection), edge budgets, and NULL-score exclusion."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )

    rows = [(i, float((i * 7) % 10), 10 + (i % 4)) for i in range(40)]
    rows.append((99, None, 5))  # NULL score: unrankable, never selected
    docs = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    # NULL / NEGATIVE token mass: unrankable too (r13 review finding — a
    # negative mass would break the classifier's monotone prefix and a
    # NULL would poison the sums); appended AFTER `total` rows are built
    # so every assertion below doubles as proof they were excluded
    bad_mass = spark.createDataFrame(
        [(97, 10.0, None), (98, 10.0, -1)],
        "doc_id long, score double, n_tokens long",
    )
    docs = docs.unionByName(bad_mass)
    total = sum(r[2] for r in rows if r[1] is not None)

    assert token_budget_selection(docs, 0, "score").count() == 0
    full = token_budget_selection(docs, total, "score").collect()
    assert len(full) == 40  # every scored doc, never the NULL-score one
    assert max(r["cum_tokens"] for r in full) == total
    assert sorted(r["sel_rank"] for r in full) == list(range(1, 41))
    # inclusive rule: cum_tokens of every selected row <= budget, and the
    # selection is exactly the rank prefix
    half = token_budget_selection(docs, total // 2, "score").collect()
    assert all(r["cum_tokens"] <= total // 2 for r in half)
    full_by_rank = {r["sel_rank"]: r["doc_id"] for r in full}
    assert {r["sel_rank"]: r["doc_id"] for r in half} == {
        k: v for k, v in full_by_rank.items() if k <= len(half)
    }
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_selection(docs, -1, "score")
    with pytest.raises(ValueError, match="n_buckets"):
        token_budget_selection(docs, 10, "score", n_buckets=0)
    # empty corpus
    empty = docs.limit(0)
    assert token_budget_selection(empty, 100, "score").count() == 0
    # all-equal scores collapse to one bucket and still select by tiebreak
    eq = spark.createDataFrame(
        [(i, 1.0, 10) for i in range(10)], "doc_id long, score double, n_tokens long"
    )
    sel = token_budget_selection(eq, 35, "score").collect()
    assert len(sel) == 3 and max(r["cum_tokens"] for r in sel) == 30


# ---------------------------------------------------------------------------
# stratified_budget_selection (r14): per-source constrained budget cuts


_STRATIFIED_BUDGET_ORACLE = """
    WITH per AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS score,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             md5('tbs:' || CAST(doc_id AS VARCHAR)) AS tiebreak
      FROM (
        SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS toks
        FROM documents
      )
    ),
    c AS (
      SELECT doc_id, source, score, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, tiebreak ASC) AS sel_rank,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY score DESC, tiebreak ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM per
    ),
    b(source, budget) AS (VALUES {values})
    SELECT doc_id, source, score, n_tokens,
           CAST(sel_rank AS BIGINT) AS sel_rank,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c JOIN b USING (source) WHERE cum_tokens <= budget
"""


def _scored_docs_with_source(spark, sf_dir):
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+")
    return d.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "score"
        ),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


def test_stratified_budget_selection_matches_oracle(spark, sf_dir):
    """The level-batched per-source prefix sum is held to the NAIVE
    per-source global window the SQL twin runs: identical selected sets,
    per-source ranks and inclusive masses, each source cut at ITS OWN
    budget (40% of its mass, so every source has a mid-bucket boundary)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )
    from tests.oracle_harness import compare

    scored = _scored_docs_with_source(spark, sf_dir)
    budgets = {
        r["source"]: int(r["t"]) * 2 // 5
        for r in scored.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    out = stratified_budget_selection(scored, budgets, "score")
    values = ", ".join(f"('{s}', {b})" for s, b in sorted(budgets.items()))
    compare(out, _STRATIFIED_BUDGET_ORACLE.format(values=values), sf_dir)


def test_stratified_budget_selection_invariances(spark, sf_dir):
    """Bucketing/refinement only PARTITION the per-source work: n_buckets
    1/7/256, a repartitioned input, and the fully-refined path
    (recurse_min=0) all produce the byte-identical selection."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    scored = _scored_docs_with_source(spark, sf_dir)
    budgets = {
        r["source"]: int(r["t"]) // 3
        for r in scored.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    base = sorted(
        tuple(r)
        for r in stratified_budget_selection(scored, budgets, "score").collect()
    )
    assert base
    for nb in (1, 7):
        got = sorted(
            tuple(r)
            for r in stratified_budget_selection(
                scored, budgets, "score", n_buckets=nb
            ).collect()
        )
        assert got == base, f"n_buckets={nb} diverged"
    got = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            scored.repartition(13), budgets, "score"
        ).collect()
    )
    assert got == base
    got = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            scored, budgets, "score", recurse_min=0
        ).collect()
    )
    assert got == base


def test_stratified_budget_selection_semantics(spark):
    """Contract on a hand-built two-source corpus: per-source
    independence (one source's budget never moves another's cut),
    explicit-coverage raise for unnamed sources, zero-budget sources
    select nothing, NULL/negative rows are unrankable, empty corpus."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", float((i * 7) % 10), 10) for i in range(40)]
    rows += [(97, "a", None, 5), (98, "b", 5.0, None), (99, "a", 5.0, -2)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens long"
    )
    # each source: 20 valid docs x 10 tokens = 200
    full = stratified_budget_selection(docs, {"a": 200, "b": 200}, "score").collect()
    assert len(full) == 40
    for src in ("a", "b"):
        ranks = sorted(r["sel_rank"] for r in full if r["source"] == src)
        assert ranks == list(range(1, 21))
        assert max(r["cum_tokens"] for r in full if r["source"] == src) == 200
    # independence: shrinking b's budget leaves a's selection untouched
    half_b = stratified_budget_selection(docs, {"a": 200, "b": 90}, "score").collect()
    assert sorted(
        tuple(r) for r in half_b if r["source"] == "a"
    ) == sorted(tuple(r) for r in full if r["source"] == "a")
    b_sel = [r for r in half_b if r["source"] == "b"]
    assert len(b_sel) == 9 and all(r["cum_tokens"] <= 90 for r in b_sel)
    # and b's selection is the rank prefix of its full-budget selection
    full_b = {r["sel_rank"]: r["doc_id"] for r in full if r["source"] == "b"}
    assert {r["sel_rank"]: r["doc_id"] for r in b_sel} == {
        k: v for k, v in full_b.items() if k <= 9
    }
    # zero budget: source present, nothing selected
    za = stratified_budget_selection(docs, {"a": 0, "b": 200}, "score").collect()
    assert all(r["source"] == "b" for r in za) and len(za) == 20
    # coverage raise: every corpus source must be named
    with pytest.raises(ValueError, match="missing from budgets"):
        stratified_budget_selection(docs, {"a": 100}, "score")
    with pytest.raises(ValueError, match="must be >= 0"):
        stratified_budget_selection(docs, {"a": -1, "b": 1}, "score")
    # empty corpus: empty result, schema intact
    empty = stratified_budget_selection(docs.limit(0), {}, "score")
    assert empty.count() == 0
    assert empty.columns == [
        "doc_id", "source", "score", "n_tokens", "sel_rank", "cum_tokens"
    ]
    # r14 review findings, pinned:
    # (a) NULL sources surface as the nameable '(null)' group — both the
    # coverage raise and an explicit budget for it work (no None key
    # that can never be named, no TypeError sorting mixed missing sets)
    withnull = docs.unionByName(
        spark.createDataFrame(
            [(500, None, 9.0, 10), (501, None, 8.0, 10)],
            "doc_id long, source string, score double, n_tokens long",
        )
    )
    with pytest.raises(ValueError, match=r"\(null\)"):
        stratified_budget_selection(withnull, {"a": 100, "b": 100}, "score")
    got_null = stratified_budget_selection(
        withnull, {"a": 100, "b": 100, "(null)": 10}, "score"
    ).collect()
    nulls = [r for r in got_null if r["source"] == "(null)"]
    assert len(nulls) == 1 and nulls[0]["doc_id"] == 500  # best one fits
    # (b) a source whose rows are ALL unrankable still hits the coverage
    # raise — it must not silently select nothing
    ghost = docs.unionByName(
        spark.createDataFrame(
            [(600, "ghost", None, 10), (601, "ghost", 1.0, None)],
            "doc_id long, source string, score double, n_tokens long",
        )
    )
    with pytest.raises(ValueError, match="ghost"):
        stratified_budget_selection(ghost, {"a": 100, "b": 100}, "score")
    # ...and once named, it contributes nothing but breaks nothing
    got_ghost = stratified_budget_selection(
        ghost, {"a": 100, "b": 100, "ghost": 50}, "score"
    ).collect()
    assert not [r for r in got_ghost if r["source"] == "ghost"]
    assert len([r for r in got_ghost if r["source"] == "a"]) == 10


def test_stratified_budget_selection_null_sentinel_collision(spark):
    """r14 verdict nit, closed: a corpus carrying BOTH real NULL sources
    AND a source literally named '(null)' would merge two populations
    under one budget silently — refused on the level-0 aggregate the op
    already runs. Either population ALONE keeps the legitimate
    '(null)'-budget path working."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    schema = "doc_id long, source string, score double, n_tokens long"
    nulls = spark.createDataFrame([(1, None, 9.0, 10), (2, None, 8.0, 10)], schema)
    literal = spark.createDataFrame(
        [(3, "(null)", 7.0, 10), (4, "(null)", 6.0, 10)], schema
    )
    other = spark.createDataFrame([(5, "web", 5.0, 10)], schema)

    # both populations present: refused, regardless of the budget dict
    with pytest.raises(ValueError, match="collision on the NULL sentinel"):
        stratified_budget_selection(
            nulls.unionByName(literal).unionByName(other),
            {"(null)": 100, "web": 100},
            "score",
        )
    # NULL-only: '(null)' budget names the coalesced group
    got = stratified_budget_selection(
        nulls.unionByName(other), {"(null)": 100, "web": 100}, "score"
    ).collect()
    assert sorted(r["doc_id"] for r in got if r["source"] == "(null)") == [1, 2]
    # literal-only: '(null)' budget names the real source
    got = stratified_budget_selection(
        literal.unionByName(other), {"(null)": 100, "web": 100}, "score"
    ).collect()
    assert sorted(r["doc_id"] for r in got if r["source"] == "(null)") == [3, 4]


def test_stratified_budget_selection_source_batching(spark):
    """r14 verdict stretch #8: source_batch=K processes the budget dict
    in sorted K-source chunks (driver state <= K * n_buckets per level)
    and must be BYTE-IDENTICAL to the single-pass output at every batch
    size — per-source cuts are independent, so batching can only
    repartition the work. Also pinned: the global coverage and
    NULL-sentinel collision checks fire in batched mode (a source
    missing from budgets must not silently vanish outside every chunk's
    IN-filter), and NULL sources land in whichever chunk holds
    '(null)'."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    # 7 sources (incl. a NULL population), ragged sizes, tied scores so
    # the tiebreak path is exercised; budgets cut mid-source everywhere
    rows = []
    did = 0
    for k in range(6):
        for i in range(10 + 3 * k):
            rows.append((did, f"s{k}", float((did * 7) % 5), 10))
            did += 1
    rows += [(900, None, 4.0, 10), (901, None, 3.0, 10), (902, None, 2.0, 10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens long"
    )
    budgets = {f"s{k}": 40 + 10 * k for k in range(6)}
    budgets["(null)"] = 20

    base = sorted(
        tuple(r)
        for r in stratified_budget_selection(docs, budgets, "score").collect()
    )
    assert base  # non-trivial fixture
    for k in (2, 3):
        diag: dict = {}
        got = sorted(
            tuple(r)
            for r in stratified_budget_selection(
                docs, budgets, "score", source_batch=k, _diag=diag
            ).collect()
        )
        assert got == base, f"source_batch={k} diverged"
        assert diag["regions"] > 0
    # batch size >= |sources|: the single-pass path, same answer
    got = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            docs, budgets, "score", source_batch=100
        ).collect()
    )
    assert got == base
    # coverage raise still fires in batched mode (the pre-check, not the
    # chunks, must catch it)
    with pytest.raises(ValueError, match="missing from budgets"):
        stratified_budget_selection(
            docs, {k: v for k, v in budgets.items() if k != "s3"},
            "score", source_batch=2,
        )
    # sentinel collision raise still fires in batched mode
    clash = docs.unionByName(
        spark.createDataFrame(
            [(950, "(null)", 1.0, 10)],
            "doc_id long, source string, score double, n_tokens long",
        )
    )
    with pytest.raises(ValueError, match="collision on the NULL sentinel"):
        stratified_budget_selection(clash, budgets, "score", source_batch=2)
    with pytest.raises(ValueError, match="source_batch"):
        stratified_budget_selection(docs, budgets, "score", source_batch=0)


_CURRICULUM_ORACLE = """
    WITH per AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS score,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             md5('tbs:' || CAST(doc_id AS VARCHAR)) AS tiebreak
      FROM (
        SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS toks
        FROM documents
      )
    ),
    c1 AS (
      SELECT doc_id, source, score, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, tiebreak ASC) AS sel_rank,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY score DESC, tiebreak ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM per
    ),
    b1(source, budget) AS (VALUES {v1}),
    p1 AS (
      SELECT doc_id, source, score, n_tokens, sel_rank, cum_tokens
      FROM c1 JOIN b1 USING (source) WHERE cum_tokens <= budget
    ),
    rem AS (
      SELECT * FROM per WHERE doc_id NOT IN (SELECT doc_id FROM p1)
    ),
    c2 AS (
      SELECT doc_id, source, score, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, tiebreak ASC) AS sel_rank,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY score DESC, tiebreak ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM rem
    ),
    b2(source, budget) AS (VALUES {v2}),
    p2 AS (
      SELECT doc_id, source, score, n_tokens, sel_rank, cum_tokens
      FROM c2 JOIN b2 USING (source) WHERE cum_tokens <= budget
    )
    SELECT doc_id, source, score, n_tokens,
           CAST(sel_rank AS BIGINT) AS sel_rank,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           'anneal' AS phase FROM p1
    UNION ALL
    SELECT doc_id, source, score, n_tokens,
           CAST(sel_rank AS BIGINT) AS sel_rank,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           'bulk' AS phase FROM p2
"""


def test_curriculum_phase_selection_matches_oracle(spark, sf_dir):
    """Two-phase curriculum on the REAL documents table held to a
    DuckDB twin that replays the contract naively: phase 1 = the
    per-source window cut, phase 2 = the same cut over the rows phase 1
    left behind — identical selected sets, per-(phase, source) ranks
    and inclusive masses (budgets at 15% / 30% of each source's mass so
    both phases cut mid-ranking)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        curriculum_phase_selection,
    )
    from tests.oracle_harness import compare

    scored = _scored_docs_with_source(spark, sf_dir)
    totals = {
        r["source"]: int(r["t"])
        for r in scored.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    b1 = {s: (t * 3) // 20 for s, t in totals.items()}
    b2 = {s: (t * 3) // 10 for s, t in totals.items()}
    out = curriculum_phase_selection(
        scored, [("anneal", b1), ("bulk", b2)], "score"
    )
    v1 = ", ".join(f"('{s}', {b})" for s, b in sorted(b1.items()))
    v2 = ", ".join(f"('{s}', {b})" for s, b in sorted(b2.items()))
    compare(out, _CURRICULUM_ORACLE.format(v1=v1, v2=v2), sf_dir)


def test_curriculum_phase_selection(spark):
    """r15: phase-ordered EXCLUSIVE quality selection — the temporal
    half of the selection family (anneal-to-quality curricula). Pinned:
    (1) the whole assignment equals a Python fold that runs the
    reference budget fold phase-by-phase on the docs earlier phases
    left behind; (2) exclusivity (no doc in two phases); (3) list order
    IS priority — the first phase takes the top-quality tranche, the
    second the next; (4) a single phase degenerates exactly to
    stratified_budget_selection; (5) refusals: empty phases, duplicate
    names, non-dict budgets, a phase dict missing a live source; and
    (6) source_batch composes unchanged."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        curriculum_phase_selection,
        stratified_budget_selection,
    )

    rows = [
        (i, "web" if i % 2 == 0 else "code", float(100 - i), 10)
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens long"
    )
    phases = [
        ("anneal", {"web": 30, "code": 20}),   # skims the best
        ("bulk", {"web": 100, "code": 50}),    # next tranche
    ]
    got = sorted(
        tuple(r)
        for r in curriculum_phase_selection(docs, phases, "score").collect()
    )

    # Python fold: per phase, per source, score-desc prefix cut over the
    # docs earlier phases left behind
    taken: set = set()
    expected = []
    for name, budgets in phases:
        for src in ("web", "code"):
            pool = sorted(
                (r for r in rows if r[1] == src and r[0] not in taken),
                key=lambda r: -r[2],
            )
            cum = 0
            rank = 0
            for r in pool:
                if cum + r[3] > budgets[src]:
                    break
                cum += r[3]
                rank += 1
                taken.add(r[0])
                expected.append((r[0], src, r[2], r[3], rank, cum, name))
    assert got == sorted(expected)

    # exclusivity + priority explicitly
    by_phase: dict = {}
    for t in got:
        by_phase.setdefault(t[6], set()).add(t[0])
    assert not (by_phase["anneal"] & by_phase["bulk"])
    # anneal got strictly better docs per source than bulk
    for src_docs, bulk_docs in (
        ({t[0] for t in got if t[6] == "anneal" and t[1] == "web"},
         {t[0] for t in got if t[6] == "bulk" and t[1] == "web"}),
    ):
        assert max(src_docs) < min(bulk_docs)  # lower id = higher score here

    # single phase == the stratified operator exactly
    single = sorted(
        tuple(r)[:6]
        for r in curriculum_phase_selection(
            docs, [("only", {"web": 30, "code": 20})], "score"
        ).collect()
    )
    direct = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            docs, {"web": 30, "code": 20}, "score"
        ).collect()
    )
    assert single == direct

    # source_batch composes unchanged
    batched = sorted(
        tuple(r)
        for r in curriculum_phase_selection(
            docs, phases, "score", source_batch=1
        ).collect()
    )
    assert batched == got

    # refusals
    with pytest.raises(ValueError, match="non-empty"):
        curriculum_phase_selection(docs, [], "score")
    with pytest.raises(ValueError, match="duplicate phase names"):
        curriculum_phase_selection(
            docs, [("p", {"web": 1, "code": 1}), ("p", {"web": 1, "code": 1})],
            "score",
        )
    with pytest.raises(ValueError, match="must be a dict"):
        curriculum_phase_selection(docs, [("p", [1, 2])], "score")
    with pytest.raises(ValueError, match="missing from budgets"):
        curriculum_phase_selection(
            docs, [("anneal", {"web": 30, "code": 20}), ("bulk", {"web": 10})],
            "score",
        )


def test_curriculum_composes_with_dsir_scores(spark):
    """r15: DSIR rides the curriculum through the score column — one
    importance-scoring pass, phase-ordered cuts. Pinned: (1) a single
    DSIR-scored phase equals dsir_select_budget_stratified bit-for-bit
    (two different compositions of the same primitives must agree);
    (2) two phases stay exclusive with the anneal phase taking the
    strictly-higher importance keys per source; (3) every
    (phase, source) mass fits its budget."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _dsir_budget_scored,
        curriculum_phase_selection,
        dsir_select_budget_stratified,
    )

    rows = []
    for i in range(60):
        src = "web" if i % 2 == 0 else "code"
        stem = "apple" if i % 3 == 0 else "zebra"
        rows.append((i, src, " ".join(f"{stem}{(i + j) % 20}" for j in range(12))))
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = spark.createDataFrame(
        [(900 + k, " ".join(f"apple{j % 20}" for j in range(12))) for k in range(6)],
        "tid long, text string",
    )

    scored = _dsir_budget_scored(
        corpus, target, seed=3, sample=True, id_col="doc_id",
        text_col="text", n_tokens_col=None, n_buckets=512, alpha=1.0,
        log_ratio=None, corpus_model=None, extra_cols=("source",),
    ).select(
        "doc_id", "source",
        F.col("key_micro").cast("double").alias("score"),
        "n_tokens",
    )
    budgets = {"web": 120, "code": 120}

    # (1) single phase == the stratified DSIR selector, bit-for-bit
    via_curriculum = sorted(
        (r["doc_id"], r["source"], int(r["score"]), r["n_tokens"],
         r["sel_rank"], r["cum_tokens"])
        for r in curriculum_phase_selection(
            scored, [("only", budgets)], "score"
        ).collect()
    )
    direct = sorted(
        (r["doc_id"], r["source"], int(r["key_micro"]), r["n_tokens"],
         r["sel_rank"], r["cum_tokens"])
        for r in dsir_select_budget_stratified(
            corpus, target, budgets, seed=3, n_buckets=512
        ).collect()
    )
    assert via_curriculum == direct and via_curriculum

    # (2)+(3) two phases: exclusive, anneal takes the higher keys
    phases = [("anneal", {"web": 60, "code": 60}),
              ("bulk", {"web": 120, "code": 120})]
    got = curriculum_phase_selection(scored, phases, "score").collect()
    by_phase: dict = {}
    for r in got:
        by_phase.setdefault(r["phase"], []).append(r)
    ids_a = {r["doc_id"] for r in by_phase["anneal"]}
    ids_b = {r["doc_id"] for r in by_phase["bulk"]}
    assert not (ids_a & ids_b)
    for src in ("web", "code"):
        a = [r["score"] for r in by_phase["anneal"] if r["source"] == src]
        b = [r["score"] for r in by_phase["bulk"] if r["source"] == src]
        assert a and b and min(a) >= max(b)
        mass_a = max(r["cum_tokens"] for r in by_phase["anneal"] if r["source"] == src)
        mass_b = max(r["cum_tokens"] for r in by_phase["bulk"] if r["source"] == src)
        assert mass_a <= 60 and mass_b <= 120


def test_dedup_threshold_sweep_matches_python_mirror(spark):
    """r15: the threshold-tuning audit's per-threshold readouts (pairs,
    touched docs, components, exact docs-removed) must equal a Python
    union-find over the SAME (already gated elsewhere) exact-Jaccard
    pair stream at the floor threshold — pins the sweep layer (filters +
    CC + arithmetic) precisely. Constructed corpus with two similarity
    tiers so the thresholds actually separate: near-identical pairs
    (~0.95) and moderate-overlap pairs (~0.5-0.7). Also pinned:
    monotonicity (raising the threshold never adds pairs or removals)
    and the input-validation raises."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        minhash_near_duplicates,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dedup_threshold_sweep,
    )

    import random

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(500)]
    rows = []
    for k in range(8):
        body = [rng.choice(vocab) for _ in range(40)]
        # tier 1: one trailing word differs -> Jaccard ~0.95
        rows.append((10 * k, "s", " ".join(body) + " alpha"))
        rows.append((10 * k + 1, "s", " ".join(body) + " beta"))
        # tier 2: last quarter replaced -> 3-shingle Jaccard ~0.58
        # (28 shared of 48 distinct shingles)
        half = body[:30] + [rng.choice(vocab) for _ in range(10)]
        rows.append((10 * k + 2, "s", " ".join(half)))
        # unique doc
        rows.append((10 * k + 3, "s", " ".join(rng.choice(vocab) for _ in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    thresholds = [0.4, 0.8, 0.99]
    kw = dict(n_hashes=64, bands=32, shingle_n=3, seed=42)
    got = {
        r["threshold"]: (
            r["n_pairs"], r["n_docs_in_pairs"], r["n_components"],
            r["docs_removed"],
        )
        for r in dedup_threshold_sweep(docs, thresholds, **kw).collect()
    }

    # Python mirror over the same floor pair stream
    pair_rows = minhash_near_duplicates(
        docs, threshold=0.4, **kw
    ).collect()
    for t in thresholds:
        edges = [(r["d1"], r["d2"]) for r in pair_rows if r["jaccard"] >= t]
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        nodes = {d for e in edges for d in e}
        comps = {find(d) for d in nodes}
        assert got[t] == (len(edges), len(nodes), len(comps),
                          len(nodes) - len(comps)), t
    # the tiers separate: the loose cut sees both tiers, the tight cut
    # only the near-identical one
    assert got[0.4][0] > got[0.8][0] > 0
    assert got[0.99][0] == 0
    # monotonicity across the board
    for a, b in zip(thresholds, thresholds[1:]):
        assert got[a][0] >= got[b][0] and got[a][3] >= got[b][3]

    with pytest.raises(ValueError, match="non-empty"):
        dedup_threshold_sweep(docs, [])
    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        dedup_threshold_sweep(docs, [0.0, 0.5])

    # r15-ADVICE low: the sweep's pair pin must be RELEASED by the time
    # the function returns — its result is built from collected driver
    # rows, so deferring the release to the tracked-cache registry would
    # let repeated library calls accumulate executor cache until some
    # later release_tracked_caches(). Pin at the registry level (raw
    # persisted-RDD counts carry CC localCheckpoint residue and are
    # GC-timing brittle): the sweep must register EXACTLY the tracked
    # entries its internal minhash pass registers — its own pairs pin is
    # plain persist + finally-unpersist, never tracked. Plus: every
    # tracked entry the sweep leaves is still live (cached), i.e. the
    # sweep didn't unpersist frames it doesn't own.
    from big_data_processing_with_aws_glue_workshop_spark.util import (
        _LIVE_CACHES,
        release_tracked_caches,
    )

    release_tracked_caches()
    minhash_near_duplicates(docs, threshold=0.4, **kw).count()
    internal = len(_LIVE_CACHES)
    release_tracked_caches()
    dedup_threshold_sweep(docs, thresholds, **kw).collect()
    assert len(_LIVE_CACHES) == internal  # no tracked pairs pin added
    assert all(df.storageLevel.useMemory for df in _LIVE_CACHES)
    release_tracked_caches()


@pytest.mark.slow
def test_simhash_threshold_sweep_matches_python_mirror(spark):
    """r16: the hamming-threshold tuning audit (third member of the
    tuning-audit family) — per-k readouts must equal a Python
    union-find over the SAME exact-hamming pair stream at the ceiling
    k (hamming_near_pairs is gated elsewhere; recall is exact at every
    swept k by the pigeonhole block guarantee, so the mirror IS the
    ground truth). Two-tier corpus: near-identical docs (one trailing
    word differs -> tiny hamming) and moderately-edited docs; plus
    monotonicity (raising k never loses pairs or removals), the
    zero-pair row, validation raises, and the cache-hygiene pin (the
    r15-ADVICE precedent)."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        simhash_near_duplicates,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        simhash_threshold_sweep,
    )
    from big_data_processing_with_aws_glue_workshop_spark.util import (
        _LIVE_CACHES,
        release_tracked_caches,
    )

    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(500)]
    rows = []
    for k in range(8):
        body = [rng.choice(vocab) for _ in range(40)]
        rows.append((10 * k, "s", " ".join(body) + " alpha"))
        rows.append((10 * k + 1, "s", " ".join(body) + " beta"))
        rows.append(
            (10 * k + 2, "s",
             " ".join(body[:30] + [rng.choice(vocab) for _ in range(10)]))
        )
        rows.append((10 * k + 3, "s", " ".join(rng.choice(vocab) for _ in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    ks = [1, 3, 6]
    got = {
        r["max_hamming"]: (
            r["n_pairs"], r["n_docs_in_pairs"], r["n_components"],
            r["docs_removed"],
        )
        for r in simhash_threshold_sweep(docs, ks).collect()
    }

    # Python union-find mirror over the same ceiling pair stream
    pair_rows = simhash_near_duplicates(
        docs, max_hamming=ks[-1], n_blocks=ks[-1] + 1
    ).collect()
    for k in ks:
        edges = [
            (r["d1"], r["d2"]) for r in pair_rows if r["hamming"] <= k
        ]
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        nodes = {d for e in edges for d in e}
        comps = {find(d) for d in nodes}
        assert got[k] == (
            len(edges), len(nodes), len(comps), len(nodes) - len(comps)
        ), k

    # the tiers separate: the near-identical tier fires well before the
    # moderately-edited one; monotonicity across the board
    assert got[6][0] >= got[3][0] >= got[1][0]
    assert got[6][3] >= got[3][3] >= got[1][3]
    assert got[6][0] > 0  # the fixture exercises the ceiling

    with pytest.raises(ValueError, match="non-empty"):
        simhash_threshold_sweep(docs, [])
    with pytest.raises(ValueError, match=r"\[0, 32\)"):
        simhash_threshold_sweep(docs, [-1, 3])
    with pytest.raises(ValueError, match=r"\[0, 32\)"):
        simhash_threshold_sweep(docs, [3, 32])

    # cache hygiene at the registry level: the sweep's own pairs pin is
    # plain persist + finally-unpersist, never tracked
    release_tracked_caches()
    simhash_near_duplicates(docs, max_hamming=6, n_blocks=7).count()
    internal = len(_LIVE_CACHES)
    release_tracked_caches()
    simhash_threshold_sweep(docs, ks).collect()
    assert len(_LIVE_CACHES) == internal
    release_tracked_caches()


def test_stratified_budget_selection_worklist_bound(spark):
    """Discrete grades in BOTH sources: every oversized bucket (FULL or
    PARTIAL, any source) refines via the level-batched worklist — the
    _diag seam pins the largest emitted window partition under
    recurse_min while the output stays byte-identical to the unrefined
    path, and the whole refinement costs one aggregate per LEVEL, not
    per source."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    rows = [
        (i, "a" if i % 2 == 0 else "b", float(i % 3), 10) for i in range(3000)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens long"
    )
    # per source: grades 0/1/2 x 500 docs x 10 tokens; budget cuts inside
    # grade 1, so grade 2 is a giant FULL bucket and grade 1 a giant
    # PARTIAL one, in each source
    budgets = {"a": 7_500, "b": 7_500}
    base = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            docs, budgets, "score", recurse_min=10**9
        ).collect()
    )
    assert len(base) == 1_500  # 500 grade-2 + 250 grade-1 per source
    diag = {}
    got = sorted(
        tuple(r)
        for r in stratified_budget_selection(
            docs, budgets, "score", recurse_min=100, _diag=diag
        ).collect()
    )
    assert got == base
    assert 0 < diag["max_window_rows"] <= 100
    # level 0: 2 source regions; level 1: 4 oversized grade buckets
    # (FULL grade-2 + PARTIAL grade-1, per source) — 2 levels total,
    # each ONE aggregate regardless of source count
    assert diag["levels"] == 2
    assert diag["regions"] == 6


def _ref_budget_fold(rows, budgets):
    """Pure-Python reference for the budget selectors: per source,
    (score DESC, md5 tiebreak ASC) order, INCLUSIVE prefix mass <=
    budget; NULL scores and NULL/negative masses unrankable. Returns
    (id, source, score, n_tokens, sel_rank, cum_tokens) tuples."""
    import hashlib

    out = []
    by_src = {}
    for r in rows:
        if r[2] is None or r[3] is None or r[3] < 0:
            continue
        by_src.setdefault(r[1], []).append(r)
    for src, rs in by_src.items():
        rs.sort(
            key=lambda r: (
                -r[2],
                hashlib.md5(f"tbs:{r[0]}".encode()).hexdigest(),
            )
        )
        cum, rank = 0, 0
        for r in rs:
            rank += 1
            cum += r[3]
            if cum <= budgets[src]:
                out.append((r[0], src, r[2], r[3], rank, cum))
            # NOTE: rank/cum keep advancing — the selectors' sel_rank is
            # the rank among RANKABLE docs in selection order, and the
            # selection is exactly the <=-budget prefix of that order,
            # so unselected docs never reappear later
    return out


@pytest.mark.slow
def test_budget_selectors_randomized_reference(spark):
    """Randomized adversarial shapes (heavy score ties, zero-token docs,
    zero budgets, unrankable rows, random bucket widths and recursion
    thresholds) held to a pure-Python fold of the documented semantics —
    for BOTH the global and the stratified selector. This class of test
    caught a real boundary bug while being written: at tok_off == budget
    the classifier's strict `<` EXCLUDED a bucket whose front zero-token
    doc the inclusive rule admits (cum == budget) — the naive-window
    oracle kept it, the distributed plan dropped it. Seeded, so every
    run replays the same 12 scenarios."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
        token_budget_selection,
    )

    rng = random.Random(14)
    for case in range(12):
        n = rng.randrange(20, 120)
        n_src = rng.choice([1, 2, 3])
        grades = rng.choice([2, 3, 5, 40])
        rows = []
        for i in range(n):
            score = float(rng.randrange(grades))
            mass = rng.choice([0, 0, rng.randrange(0, 25), rng.randrange(0, 25)])
            rows.append((i, f"s{rng.randrange(n_src)}", score, mass))
        # a few unrankable rows: NULL score / NULL mass / negative mass
        rows.append((900, "s0", None, 5))
        rows.append((901, "s0", 1.0, None))
        rows.append((902, "s0", 1.0, -3))
        srcs = {r[1] for r in rows}
        total = {s: sum(r[3] for r in rows if r[1] == s and r[3] and r[3] > 0) for s in srcs}
        budgets = {s: rng.randrange(0, total[s] + 2) for s in srcs}
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, score double, n_tokens long"
        )
        nb = rng.choice([1, 4, 256])
        rmin = rng.choice([0, 3, 10**9])
        expected = sorted(_ref_budget_fold(rows, budgets))
        got = sorted(
            tuple(r)
            for r in stratified_budget_selection(
                docs, budgets, "score", n_buckets=nb, recurse_min=rmin
            ).collect()
        )
        assert got == expected, f"stratified diverged in case {case} (nb={nb}, rmin={rmin})"
        # the source_batch wrapper rides the same gate (r15): a boundary
        # fix applied to the single-pass path but not the chunked
        # pre-check (or vice versa) fails every scenario with >1 source
        if len(srcs) > 1:
            batched = sorted(
                tuple(r)
                for r in stratified_budget_selection(
                    docs, budgets, "score", n_buckets=nb,
                    recurse_min=rmin, source_batch=1,
                ).collect()
            )
            assert batched == expected, (
                f"source_batch=1 diverged in case {case} (nb={nb}, rmin={rmin})"
            )
        # the GLOBAL selector must agree on each single-source slice
        src = rng.choice(sorted(srcs))
        g = sorted(
            (r["doc_id"], src, r["score"], r["n_tokens"], r["sel_rank"], r["cum_tokens"])
            for r in token_budget_selection(
                docs.filter(F.col("source") == src),
                budgets[src],
                "score",
                n_buckets=nb,
                recurse_min=rmin,
            ).collect()
        )
        assert g == sorted(t for t in expected if t[1] == src), (
            f"global selector diverged in case {case} on source {src}"
        )


# ---------------------------------------------------------------------------
# split_leakage_audit (r13): post-hoc near-dup leakage check on a split


def _dup_heavy_corpus(spark):
    """30 docs: ids 3k/3k+1 are near-identical (one trailing word differs
    over a 40-word body -> Jaccard ~0.95), ids 3k+2 unique."""
    import random

    rng = random.Random(5)
    vocab = [f"w{j}" for j in range(400)]
    rows = []
    for k in range(10):
        body = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((3 * k, "s", body + " alpha"))
        rows.append((3 * k + 1, "s", body + " beta"))
        rows.append((3 * k + 2, "s", " ".join(rng.choice(vocab) for _ in range(40))))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_split_leakage_audit_counts_match_python_mirror(spark):
    """The audit's (split pair -> count) table must equal a Python fold of
    the SAME (already hash-gated) minhash pair stream against the
    assignment — pins the join+normalize+aggregate layer exactly."""
    from collections import Counter

    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        minhash_near_duplicates,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        split_leakage_audit,
    )

    docs = _dup_heavy_corpus(spark)
    names = ["train", "val", "test"]
    assignment = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(n) for n in names]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("split"),
    )
    split_of = {r["doc_id"]: r["split"] for r in assignment.collect()}
    pairs = minhash_near_duplicates(docs, n_hashes=64, bands=16).collect()
    assert pairs, "fixture must produce near-dup pairs"
    expected = Counter(
        tuple(sorted((split_of[r["d1"]], split_of[r["d2"]])) ) for r in pairs
    )
    got = split_leakage_audit(docs, assignment).collect()
    assert {
        (r["split_a"], r["split_b"]): r["n_pairs"] for r in got
    } == {k: v for k, v in expected.items()}
    for r in got:
        assert r["leaked"] == int(r["split_a"] != r["split_b"])
    # the %3 assignment splits every planted twin pair (3k vs 3k+1), so
    # leakage must be observed
    assert any(r["leaked"] == 1 for r in got)

    # assignment COVERAGE gap (r13 review finding): ids missing from the
    # assignment must surface as '(unassigned)' leaked pairs, never drop
    # silently — mirror the same fold with .get()
    holey = assignment.filter(F.col("doc_id") % 3 != 1)  # drop the betas
    split_holey = {r["doc_id"]: r["split"] for r in holey.collect()}
    expected_holey = Counter(
        tuple(
            sorted(
                (
                    split_holey.get(r["d1"], "(unassigned)"),
                    split_holey.get(r["d2"], "(unassigned)"),
                )
            )
        )
        for r in pairs
    )
    got_holey = split_leakage_audit(docs, holey).collect()
    assert {
        (r["split_a"], r["split_b"]): r["n_pairs"] for r in got_holey
    } == {k: v for k, v in expected_holey.items()}
    assert sum(r["n_pairs"] for r in got_holey) == len(pairs)  # nothing dropped
    unassigned = [r for r in got_holey if "(unassigned)" in (r["split_a"], r["split_b"])]
    assert unassigned and all(r["leaked"] == 1 for r in unassigned)


def test_split_leakage_audit_precondition_guards(spark):
    """r13 review findings: a duplicate-id assignment would silently
    MULTIPLY pair counts through the audit joins, and a NULL split or a
    real split literally named '(unassigned)' would be indistinguishable
    from a coverage gap — both must raise before any pair math runs."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        split_leakage_audit,
    )

    docs = _dup_heavy_corpus(spark)
    good = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "train").otherwise("val").alias("split"),
    )
    # duplicate ids multiply counts -> refuse
    with pytest.raises(ValueError, match="duplicate"):
        split_leakage_audit(docs, good.unionAll(good.limit(2)))
    # NULL split conflates with the coverage sentinel -> refuse
    nullish = good.withColumn(
        "split", F.when(F.col("doc_id") == 0, None).otherwise(F.col("split"))
    )
    with pytest.raises(ValueError, match="NULL or the literal"):
        split_leakage_audit(docs, nullish)
    # a real split named like the sentinel -> refuse
    sentinel = good.withColumn(
        "split",
        F.when(F.col("doc_id") == 0, "(unassigned)").otherwise(F.col("split")),
    )
    with pytest.raises(ValueError, match="reserves that sentinel"):
        split_leakage_audit(docs, sentinel)
    # the clean assignment still audits fine
    assert split_leakage_audit(docs, good).count() > 0


def test_ngram_bucket_histogram_null_source_sentinel(spark):
    """r13 ADVICE: NULL-source rows must surface as the explicit
    '(null)' group, not a bare NULL key flowing through the divergence
    report; their gram mass is preserved, never dropped."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        ngram_bucket_histogram,
    )

    docs = spark.createDataFrame(
        [
            (1, "web", "alpha beta gamma"),
            (2, None, "alpha beta gamma"),
            (3, None, "delta epsilon"),
        ],
        "doc_id long, source string, text string",
    )
    hist = ngram_bucket_histogram(docs, n_buckets=64).collect()
    srcs = {r["source"] for r in hist}
    assert srcs == {"web", "(null)"}
    mass = {}
    for r in hist:
        mass[r["source"]] = mass.get(r["source"], 0) + r["c"]
    # doc1: 3 unigrams + 2 bigrams = 5 grams; docs 2+3: 5 + 3 = 8
    assert mass["web"] == 5 and mass["(null)"] == 8


def test_split_leakage_audit_component_split_is_leak_free(spark):
    """The verification side of component_aware_split's guarantee: the
    audit run WITH THE SAME MinHash parameters over the component-aware
    assignment reports zero cross-split pairs, while the per-doc hash
    split on the same corpus is not structurally protected."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        component_aware_split,
        split_leakage_audit,
    )

    docs = _dup_heavy_corpus(spark)
    assignment = component_aware_split(docs)
    got = split_leakage_audit(docs, assignment).collect()
    assert got, "audit must see the planted near-dup pairs"
    assert all(r["leaked"] == 0 for r in got)
    assert all(r["split_a"] == r["split_b"] for r in got)


@pytest.mark.slow
def test_token_budget_selection_tied_score_refinement(spark):
    """Discrete classifier grades (0/1/2) put the budget boundary inside
    one giant tied group — the skew case the recursive refinement
    handles: with recurse_min=0 the straddling region re-buckets on the
    md5 tiebreak prefix (monotone within a tie) instead of taking a
    single-task window. The refined path must be byte-identical to the
    unrefined one (recurse_min huge) at several bucket widths."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )

    docs = spark.createDataFrame(
        [(i, float(i % 3), 10) for i in range(600)],
        "doc_id long, score double, n_tokens long",
    )
    # grade-2 group holds 200 docs / 2000 tokens; budget cuts inside it
    budget = 1_370
    base = sorted(
        tuple(r)
        for r in token_budget_selection(
            docs, budget, "score", recurse_min=10**9
        ).collect()
    )
    assert len(base) == 137
    # all selected docs are grade 2 (the top grade fills 2000 > 1370)
    assert all(r[1] == 2.0 for r in base)
    for nb in (4, 256):
        got = sorted(
            tuple(r)
            for r in token_budget_selection(
                docs, budget, "score", n_buckets=nb, recurse_min=0
            ).collect()
        )
        assert got == base, f"refined path diverged at n_buckets={nb}"
    # constant scores: every level is a tie -> pure tiebreak descent
    eqdocs = spark.createDataFrame(
        [(i, 1.0, 7) for i in range(300)], "doc_id long, score double, n_tokens long"
    )
    a = sorted(
        tuple(r)
        for r in token_budget_selection(eqdocs, 700, "score", recurse_min=0).collect()
    )
    b = sorted(
        tuple(r)
        for r in token_budget_selection(
            eqdocs, 700, "score", recurse_min=10**9
        ).collect()
    )
    assert a == b and len(a) == 100


@pytest.mark.slow
def test_token_budget_selection_full_bucket_worklist(spark):
    """r14 (closing the r13 known limit): WHOLLY-SELECTED grades refine
    too. A 0-4 discrete classifier grade collapses each selected grade
    into one giant FULL bucket; the worklist must push those back
    through the tiebreak-prefix refinement so no rank/cumsum window
    partition exceeds recurse_min — pinned via the _diag seam — while
    the output stays byte-identical to the unrefined single-task path
    at several bucket widths."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )

    docs = spark.createDataFrame(
        [(i, float(i % 5), 10) for i in range(5000)],
        "doc_id long, score double, n_tokens long",
    )
    # grades 4 and 3 (1000 docs / 10k tokens each) are WHOLLY selected,
    # the budget cuts inside grade 2: two giant FULL grades + a PARTIAL
    budget = 25_000
    base = sorted(
        tuple(r)
        for r in token_budget_selection(
            docs, budget, "score", recurse_min=10**9
        ).collect()
    )
    assert len(base) == 2_500
    diag = {}
    got = sorted(
        tuple(r)
        for r in token_budget_selection(
            docs, budget, "score", recurse_min=200, _diag=diag
        ).collect()
    )
    assert got == base
    # the skew claim itself: largest emitted window partition bounded by
    # recurse_min even though each live grade holds 1000 tied rows
    assert 0 < diag["max_window_rows"] <= 200
    # root + the three oversized grade buckets = four worklist passes
    assert diag["items"] == 4
    # bucket-width invariance extended to the discrete fixture
    for nb in (4, 64):
        got = sorted(
            tuple(r)
            for r in token_budget_selection(
                docs, budget, "score", n_buckets=nb, recurse_min=200
            ).collect()
        )
        assert got == base, f"discrete fixture diverged at n_buckets={nb}"


def test_token_budget_selection_discrete_matches_oracle(spark, sf_dir):
    """DuckDB-twin exactness on a DISCRETE score over the real documents
    table with the worklist forced on (recurse_min=0): the refined
    multi-frame plan must still equal the naive global window."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )
    from tests.oracle_harness import compare

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\f\r]+")
    scored = d.select(
        "doc_id",
        (F.size(toks) % 5).cast("double").alias("score"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    total = int(scored.agg(F.sum("n_tokens")).first()[0])
    budget = total // 2
    out = token_budget_selection(scored, budget, "score", recurse_min=0)
    oracle = """
        WITH per AS (
          SELECT doc_id,
                 CAST(len(toks) % 5 AS DOUBLE) AS score,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 md5('tbs:' || CAST(doc_id AS VARCHAR)) AS tiebreak
          FROM (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS toks
            FROM documents
          )
        ),
        c AS (
          SELECT doc_id, score, n_tokens,
                 ROW_NUMBER() OVER (ORDER BY score DESC, tiebreak ASC) AS sel_rank,
                 SUM(n_tokens) OVER (ORDER BY score DESC, tiebreak ASC
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM per
        )
        SELECT doc_id, score, n_tokens,
               CAST(sel_rank AS BIGINT) AS sel_rank,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens <= {budget}
    """
    compare(out, oracle.format(budget=budget), sf_dir)


# ---------------------------------------------------------------------------
# DSIR importance resampling (r13): distribution-matching selection
# (Xie et al. 2023) — hashed unigram+bigram bucket models, micro-nat
# bigint log ratios, Gumbel-top-k resampling.

_DSIR_GRAMS_ORACLE = """
tw AS (
  SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL AND doc_id % 17 = 0
),
tg AS (
  SELECT g FROM (
    SELECT unnest(w) AS g FROM tw
    UNION ALL
    SELECT w[i] || ' ' || w[i+1] AS g FROM tw, UNNEST(range(1, len(w))) AS t(i)
  )
),
tb AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
       FROM tg GROUP BY 1),
cw AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL
),
cg AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest(w) AS g FROM cw
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i+1] AS g
    FROM cw, UNNEST(range(1, len(w))) AS t(i)
  )
),
cb AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
       FROM cg GROUP BY 1),
lam AS (
  SELECT r.range AS b,
         CAST(FLOOR(1000000.0 * (
             ln((COALESCE(tb.n, 0) + 1.0) / ((SELECT SUM(n) FROM tb) + 1.0 * {B}))
           - ln((COALESCE(cb.n, 0) + 1.0) / ((SELECT SUM(n) FROM cb) + 1.0 * {B}))
         )) AS BIGINT) AS lam
  FROM range(0, {B}) r
  LEFT JOIN tb ON tb.b = r.range
  LEFT JOIN cb ON cb.b = r.range
),
docb AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b FROM cg),
wts AS (
  SELECT doc_id,
         CAST(COUNT(1) AS BIGINT) AS n_grams,
         CAST(SUM(lam) AS BIGINT) AS logw_micro
  FROM docb JOIN lam USING (b)
  GROUP BY doc_id
)
"""


def _dsir_target(docs):
    """Target slice for the oracle twins: every 17th doc (the established
    _EVAL_MOD-style derived-benchmark idiom, reproducible in SQL)."""
    return docs.filter((F.col("doc_id") % 17) == 0)


def test_dsir_weights_match_oracle(spark, sf_dir):
    """The shuffle-free scoring pass (folded literal table + array-native
    bigint sum) is held to a from-scratch DuckDB twin: same md5 bucket
    hash, same Laplace-smoothed floor-micro-nat table, same per-doc sums.
    All-integer output -> bit-exact across engines."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    out = dsir_importance_weights(docs, _dsir_target(docs), n_buckets=1024)
    compare(
        out,
        "WITH " + _DSIR_GRAMS_ORACLE.format(B=1024) + "SELECT * FROM wts",
        sf_dir,
    )


def test_dsir_select_matches_oracle(spark, sf_dir):
    """Gumbel-top-k resampling twin: seeded md5 uniform -> floored
    micro-nat Gumbel -> top-k by perturbed key with id tiebreak. The one
    transcendental (ln) is floored to micro on both engines; the boundary
    flip probability is ~1e-13/doc (documented in the op docstring)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_select,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    oracle = (
        "WITH "
        + _DSIR_GRAMS_ORACLE.format(B=1024)
        + """
, keyed AS (
  SELECT doc_id, n_grams, logw_micro,
         logw_micro + CAST(FLOOR(
           (-ln(-ln((('0x' || substr(md5('dsir:7:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1.0)
                    / 4503599627370498.0))) * 1000000.0
         ) AS BIGINT) AS key_micro
  FROM wts
)
SELECT * FROM keyed ORDER BY key_micro DESC, doc_id ASC LIMIT 200
"""
    )
    out = dsir_select(docs, _dsir_target(docs), 200, seed=7, n_buckets=1024)
    compare(out, oracle, sf_dir)
    # sample=False: the key IS the weight — pure deterministic top-k
    det = (
        "WITH "
        + _DSIR_GRAMS_ORACLE.format(B=1024)
        + """
SELECT doc_id, n_grams, logw_micro, logw_micro AS key_micro
FROM wts ORDER BY key_micro DESC, doc_id ASC LIMIT 200
"""
    )
    out_det = dsir_select(
        docs, _dsir_target(docs), 200, n_buckets=1024, sample=False
    )
    compare(out_det, det, sf_dir)


_DSIR_MULTI_GRAMS_ORACLE = """
t1w AS (
  SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL AND doc_id % 17 = 0
),
t1g AS (
  SELECT g FROM (
    SELECT unnest(w) AS g FROM t1w
    UNION ALL
    SELECT w[i] || ' ' || w[i+1] AS g FROM t1w, UNNEST(range(1, len(w))) AS t(i)
  )
),
t1b AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
        FROM t1g GROUP BY 1),
t2w AS (
  SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL AND doc_id % 13 = 0
),
t2g AS (
  SELECT g FROM (
    SELECT unnest(w) AS g FROM t2w
    UNION ALL
    SELECT w[i] || ' ' || w[i+1] AS g FROM t2w, UNNEST(range(1, len(w))) AS t(i)
  )
),
t2b AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
        FROM t2g GROUP BY 1),
cw AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL
),
cg AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest(w) AS g FROM cw
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i+1] AS g
    FROM cw, UNNEST(range(1, len(w))) AS t(i)
  )
),
cb AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
       FROM cg GROUP BY 1),
lam1 AS (
  SELECT r.range AS b,
         CAST(FLOOR(1000000.0 * (
             ln((COALESCE(t1b.n, 0) + 1.0) / ((SELECT SUM(n) FROM t1b) + 1.0 * {B}))
           - ln((COALESCE(cb.n, 0) + 1.0) / ((SELECT SUM(n) FROM cb) + 1.0 * {B}))
         )) AS BIGINT) AS lam
  FROM range(0, {B}) r
  LEFT JOIN t1b ON t1b.b = r.range
  LEFT JOIN cb ON cb.b = r.range
),
lam2 AS (
  SELECT r.range AS b,
         CAST(FLOOR(1000000.0 * (
             ln((COALESCE(t2b.n, 0) + 1.0) / ((SELECT SUM(n) FROM t2b) + 1.0 * {B}))
           - ln((COALESCE(cb.n, 0) + 1.0) / ((SELECT SUM(n) FROM cb) + 1.0 * {B}))
         )) AS BIGINT) AS lam
  FROM range(0, {B}) r
  LEFT JOIN t2b ON t2b.b = r.range
  LEFT JOIN cb ON cb.b = r.range
),
lamx AS (
  SELECT l1.b AS b, 700000 * l1.lam + 300000 * l2.lam AS s
  FROM lam1 l1 JOIN lam2 l2 ON l1.b = l2.b
),
lam AS (
  SELECT b,
         CAST((s - ((s % 1000000) + 1000000) % 1000000) // 1000000 AS BIGINT) AS lam
  FROM lamx
),
docb AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b FROM cg),
wts AS (
  SELECT doc_id,
         CAST(COUNT(1) AS BIGINT) AS n_grams,
         CAST(SUM(lam) AS BIGINT) AS logw_micro
  FROM docb JOIN lam USING (b)
  GROUP BY doc_id
)
"""


def test_dsir_multi_target_matches_oracle(spark, sf_dir):
    """r14 (r13 verdict stretch #8): the weighted multi-target table held
    to a FROM-SCRATCH DuckDB twin — both target fits, the shared corpus
    fit, the micro-weight combination (exact bigint floor-div via the
    mathematical mod: Python // floors, DuckDB's integer ops truncate,
    so the twin spells out the floor) and the downstream scoring pass,
    bit-exact end to end."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_multi_target_log_ratio_table,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    lam = dsir_multi_target_log_ratio_table(
        docs,
        {"a": docs.filter(F.col("doc_id") % 17 == 0),
         "b": docs.filter(F.col("doc_id") % 13 == 0)},
        {"a": 7, "b": 3},
        n_buckets=1024,
    )
    out = dsir_importance_weights(docs, n_buckets=1024, log_ratio=lam)
    compare(
        out,
        "WITH " + _DSIR_MULTI_GRAMS_ORACLE.format(B=1024) + "SELECT * FROM wts",
        sf_dir,
    )


def _dsir_three_population(spark):
    """900-doc corpus over three disjoint vocabularies (apple / zebra /
    mango, 300 docs each) plus fresh 60-doc targets for the first two —
    the two-target mixture fixture. Deterministic (seeded rng)."""
    import random

    rng = random.Random(11)
    vocabs = {
        "apple": [f"apple{j}" for j in range(150)],
        "zebra": [f"zebra{j}" for j in range(150)],
        "mango": [f"mango{j}" for j in range(150)],
    }
    rows = []
    for p, stem in enumerate(("apple", "zebra", "mango")):
        v = vocabs[stem]
        rows += [
            (300 * p + i, " ".join(rng.choice(v) for _ in range(30)))
            for i in range(300)
        ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    targets = {
        stem: spark.createDataFrame(
            [
                (5000 + i, " ".join(rng.choice(vocabs[stem]) for _ in range(30)))
                for i in range(60)
            ],
            "doc_id long, text string",
        )
        for stem in ("apple", "zebra")
    }
    return corpus, targets


def test_dsir_multi_target_enrichment(spark):
    """Two-target contract: BOTH target vocabularies are pulled, in
    weight order, and the off-target population never is. Equal weights
    select both populations symmetrically; skewing 9:1 exhausts the
    up-weighted population first while the second target still fills the
    remainder ahead of the off-target one. Deterministic mode (no
    Gumbel) so the counts are exact; plus the degenerate single-target
    case collapses to dsir_log_ratio_table bit-for-bit and the
    validation raises fire."""
    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_log_ratio_table,
        dsir_multi_target_log_ratio_table,
        dsir_select,
    )

    corpus, targets = _dsir_three_population(spark)
    # equal weights: both vocabularies pulled, none from mango
    lam_eq = dsir_multi_target_log_ratio_table(
        corpus, targets, {"apple": 1, "zebra": 1}, n_buckets=512
    )
    sel = dsir_select(
        corpus, k=400, n_buckets=512, sample=False, log_ratio=lam_eq
    ).collect()
    pops = [sum(1 for r in sel if 300 * p <= r["doc_id"] < 300 * (p + 1)) for p in range(3)]
    assert pops[2] == 0, "off-target population selected"
    assert pops[0] >= 120 and pops[1] >= 120, f"not both targets pulled: {pops}"
    # 9:1 toward apple: apple exhausts first, zebra fills the rest
    lam_skew = dsir_multi_target_log_ratio_table(
        corpus, targets, {"apple": 9, "zebra": 1}, n_buckets=512
    )
    sel9 = dsir_select(
        corpus, k=400, n_buckets=512, sample=False, log_ratio=lam_skew
    ).collect()
    pops9 = [sum(1 for r in sel9 if 300 * p <= r["doc_id"] < 300 * (p + 1)) for p in range(3)]
    # the up-weighted target exhausts first; the 0.1-weight target still
    # dominates the remaining slots over the off-target population
    # (measured [300, 83, 17] at 512 buckets and [300, 85, 15] at 4096:
    # the residue is genuine score overlap — a down-weighted target's
    # tail docs can fall below top off-target docs via smoothing noise —
    # not hash collisions)
    assert pops9[0] == 300, pops9
    assert pops9[1] >= 75 and pops9[1] > 4 * pops9[2], pops9
    # degenerate single target == the single-target fit, any weight scale
    single = dsir_multi_target_log_ratio_table(
        corpus, {"apple": targets["apple"]}, {"apple": 2.5}, n_buckets=512
    )
    assert single == dsir_log_ratio_table(
        corpus, targets["apple"], n_buckets=512
    )
    # validation
    with _pytest.raises(ValueError, match="key mismatch"):
        dsir_multi_target_log_ratio_table(
            corpus, targets, {"apple": 1}, n_buckets=512
        )
    with _pytest.raises(ValueError, match="must be > 0"):
        dsir_multi_target_log_ratio_table(
            corpus, targets, {"apple": 1, "zebra": 0}, n_buckets=512
        )
    with _pytest.raises(ValueError, match="at least one"):
        dsir_multi_target_log_ratio_table(corpus, {}, {}, n_buckets=512)


def _dsir_two_population(spark):
    """600-doc corpus: ids <300 from an 'apple*' vocabulary, ids >=300
    from a disjoint 'zebra*' vocabulary; 60-doc target drawn fresh from
    the apple vocabulary. Deterministic (seeded rng)."""
    import random

    rng = random.Random(7)
    va = [f"apple{j}" for j in range(150)]
    vb = [f"zebra{j}" for j in range(150)]
    rows = [(i, " ".join(rng.choice(va) for _ in range(30))) for i in range(300)]
    rows += [
        (i, " ".join(rng.choice(vb) for _ in range(30))) for i in range(300, 600)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [
            (1000 + i, " ".join(rng.choice(va) for _ in range(30)))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    return corpus, target


def test_dsir_enrichment_and_determinism(spark):
    """The selection CONTRACT: a target drawn from population A must pull
    the selection almost entirely from A (both sampled and deterministic
    modes); same seed reruns and input repartitioning are byte-identical;
    a precomputed log_ratio table reproduces the internal fit exactly."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_log_ratio_table,
        dsir_select,
    )

    corpus, target = _dsir_two_population(spark)
    sel = dsir_select(corpus, target, 100, seed=3, n_buckets=512).collect()
    assert len(sel) == 100
    share_a = sum(1 for r in sel if r["doc_id"] < 300) / 100
    assert share_a >= 0.95, f"sampled selection not target-enriched: {share_a}"
    det = dsir_select(corpus, target, 100, n_buckets=512, sample=False).collect()
    assert sum(1 for r in det if r["doc_id"] < 300) == 100
    # determinism + partition invariance
    rerun = dsir_select(corpus, target, 100, seed=3, n_buckets=512).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, sel))
    repart = dsir_select(
        corpus.repartition(13), target, 100, seed=3, n_buckets=512
    ).collect()
    assert sorted(map(tuple, repart)) == sorted(map(tuple, sel))
    # precomputed table path == internal fit (the persist-and-reuse lever)
    lam = dsir_log_ratio_table(corpus, target, n_buckets=512)
    assert len(lam) == 512 and all(isinstance(v, int) for v in lam)
    w_fit = dsir_importance_weights(corpus, target, n_buckets=512).collect()
    w_pre = dsir_importance_weights(
        corpus, n_buckets=512, log_ratio=lam
    ).collect()
    assert sorted(map(tuple, w_pre)) == sorted(map(tuple, w_fit))


def test_dsir_edges(spark):
    """Raises and corners: empty target/corpus, bad alpha/k/n_buckets,
    log_ratio length mismatch, NULL-text exclusion, n_buckets=1
    degenerate (every gram in one bucket -> logw = n_grams * lam[0])."""
    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_log_ratio_table,
        dsir_select,
    )

    corpus, target = _dsir_two_population(spark)
    empty = corpus.limit(0)
    with _pytest.raises(ValueError, match="target has no text"):
        dsir_log_ratio_table(corpus, empty)
    with _pytest.raises(ValueError, match="corpus has no text"):
        dsir_log_ratio_table(empty, target)
    with _pytest.raises(ValueError, match="alpha"):
        dsir_log_ratio_table(corpus, target, alpha=0.0)
    with _pytest.raises(ValueError, match="n_buckets"):
        dsir_log_ratio_table(corpus, target, n_buckets=0)
    with _pytest.raises(ValueError, match="k must be"):
        dsir_select(corpus, target, -1)
    with _pytest.raises(ValueError, match="log_ratio length"):
        dsir_importance_weights(corpus, n_buckets=512, log_ratio=[0, 1])
    # NULL text is unrankable: excluded from weights, never selected
    withnull = corpus.union(
        spark.createDataFrame([(9999, None)], "doc_id long, text string")
    )
    w = dsir_importance_weights(withnull, target, n_buckets=512)
    assert w.filter(F.col("doc_id") == 9999).count() == 0
    # n_buckets=1: one bucket, logw = n_grams * lam[0] exactly
    lam1 = dsir_log_ratio_table(corpus, target, n_buckets=1)
    w1 = dsir_importance_weights(corpus, n_buckets=1, log_ratio=lam1).collect()
    assert all(r["logw_micro"] == r["n_grams"] * lam1[0] for r in w1)
    # k=0 selects nothing; k > corpus selects everything scored
    assert dsir_select(corpus, target, 0, n_buckets=512).count() == 0
    assert dsir_select(corpus, target, 10_000, n_buckets=512).count() == 600


def test_dsir_plan_shape(spark, sf_dir):
    """Scale pins: the scoring frame is scan -> narrow projections with NO
    Exchange (the model rides as one folded literal; the per-doc sum is
    array-native), and the selection plans TakeOrderedAndProject — the
    distributed top-k operator — never a global sort."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_select,
    )

    docs = load(spark, sf_dir, "documents")
    target = _dsir_target(docs)
    w = dsir_importance_weights(docs, target, n_buckets=1024)
    plan_w = w._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_w, f"scoring pass shuffles:\n{plan_w}"
    sel = dsir_select(docs, target, 50, n_buckets=1024)
    plan_s = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_s
    assert "Exchange SinglePartition" not in plan_s


# ---------------------------------------------------------------------------
# source_divergence_audit (r13): per-source JSD drift vs a target corpus

_SDA_ORACLE = """
WITH tw AS (
  SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL AND doc_id % 17 = 0
),
tg AS (
  SELECT g FROM (
    SELECT unnest(w) AS g FROM tw
    UNION ALL
    SELECT w[i] || ' ' || w[i+1] AS g FROM tw, UNNEST(range(1, len(w))) AS t(i)
  )
),
tb AS (SELECT ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b, COUNT(1) AS n
       FROM tg GROUP BY 1),
cw AS (
  SELECT source, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
  FROM documents WHERE text IS NOT NULL
),
cg AS (
  SELECT source, g FROM (
    SELECT source, unnest(w) AS g FROM cw
    UNION ALL
    SELECT source, w[i] || ' ' || w[i+1] AS g
    FROM cw, UNNEST(range(1, len(w))) AS t(i)
  )
),
pc AS (SELECT source, ('0x' || substr(md5(g), 1, 12))::BIGINT % {B} AS b,
              COUNT(1) AS c
       FROM cg GROUP BY 1, 2),
totals AS (SELECT source, SUM(c) AS t_s FROM pc GROUP BY 1),
grid AS (
  SELECT totals.source, totals.t_s, r.range AS b, pc.c
  FROM totals CROSS JOIN range(0, {B}) r
  LEFT JOIN pc ON pc.source = totals.source AND pc.b = r.range
),
terms AS (
  SELECT source, t_s,
         FLOOR(1000000.0 * (0.5 * (
             ((COALESCE(c, 0) + 1.0) / (t_s + 1.0 * {B}))
               * ln(((COALESCE(c, 0) + 1.0) / (t_s + 1.0 * {B}))
                    / ((((COALESCE(c, 0) + 1.0) / (t_s + 1.0 * {B}))
                        + ((COALESCE(tb2.n, 0) + 1.0)
                           / ((SELECT SUM(n) FROM tb) + 1.0 * {B}))) / 2.0))
           + ((COALESCE(tb2.n, 0) + 1.0) / ((SELECT SUM(n) FROM tb) + 1.0 * {B}))
               * ln(((COALESCE(tb2.n, 0) + 1.0)
                     / ((SELECT SUM(n) FROM tb) + 1.0 * {B}))
                    / ((((COALESCE(c, 0) + 1.0) / (t_s + 1.0 * {B}))
                        + ((COALESCE(tb2.n, 0) + 1.0)
                           / ((SELECT SUM(n) FROM tb) + 1.0 * {B}))) / 2.0))
         ))) AS term_micro
  FROM grid LEFT JOIN tb tb2 ON tb2.b = grid.b
)
SELECT source, CAST(t_s AS BIGINT) AS n_grams,
       CAST(SUM(term_micro) AS BIGINT) AS jsd_micro
FROM terms GROUP BY 1, 2
"""


def test_source_divergence_matches_oracle(spark, sf_dir):
    """The bounded-grid JSD (one corpus aggregate, folded target model,
    micro-floored terms summed as exact bigints) against a from-scratch
    DuckDB twin on the real tables."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        source_divergence_audit,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    out = source_divergence_audit(docs, _dsir_target(docs), n_buckets=1024)
    compare(out, _SDA_ORACLE.format(B=1024), sf_dir)


def test_source_divergence_semantics(spark):
    """Drift ordering and bounds: a source sharing the target's
    vocabulary scores far lower than a disjoint-vocabulary source; the
    disjoint pair approaches (but never exceeds) the ln2 ceiling; a
    source that IS the target distribution lands near zero; repartition
    invariance; edge raises."""
    import math

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        source_divergence_audit,
    )

    corpus, target = _dsir_two_population(spark)
    tagged = corpus.select(
        F.when(F.col("doc_id") < 300, "apple_src")
        .otherwise("zebra_src")
        .alias("source"),
        "text",
    )
    got = {
        r["source"]: r["jsd_micro"]
        for r in source_divergence_audit(tagged, target, n_buckets=512).collect()
    }
    ceiling = int(math.log(2) * 1_000_000)
    # disjoint vocab drifts an order of magnitude past the matched source
    # (smoothing mass + hash collisions keep even disjoint supports well
    # under the ln2 ceiling at alpha=1, B=512: measured 146,699 vs 15,050)
    assert got["apple_src"] * 5 < got["zebra_src"]
    assert 0 <= got["zebra_src"] <= ceiling + 512  # ln2 bound (+floor slack)
    # the target's own documents as a source: identical multinomials ->
    # every per-bucket term is 0 exactly
    self_src = target.select(F.lit("self").alias("source"), "text")
    self_jsd = source_divergence_audit(self_src, target, n_buckets=512).collect()
    assert self_jsd[0]["jsd_micro"] == 0
    assert self_jsd[0]["jsd_micro"] < got["apple_src"]
    # partition invariance (exact bigint arithmetic, order-independent)
    rep = {
        r["source"]: r["jsd_micro"]
        for r in source_divergence_audit(
            tagged.repartition(13), target, n_buckets=512
        ).collect()
    }
    assert rep == got
    with _pytest.raises(ValueError, match="target has no text"):
        source_divergence_audit(tagged, target.limit(0))
    with _pytest.raises(ValueError, match="alpha"):
        source_divergence_audit(tagged, target, alpha=0.0)
    with _pytest.raises(ValueError, match="n_buckets"):
        source_divergence_audit(tagged, target, n_buckets=0)


def test_dsir_select_budget_matches_oracle(spark, sf_dir):
    """Budget-mode DSIR twin: the Gumbel-perturbed key ordered by the
    naive global window in DuckDB, cut at half the corpus token mass,
    must equal the composed distributed path (key projection ->
    token_budget_selection prefix sum) exactly — ids, keys, ranks and
    running mass."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_select_budget,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    total = docs.selectExpr(
        "sum(size(split(trim(lower(text)), '[ \\t\\n\\f\\r]+')))"
    ).first()[0]
    budget = int(total) // 2
    out = dsir_select_budget(
        docs, _dsir_target(docs), budget, seed=7, n_buckets=1024
    )
    oracle = (
        "WITH "
        + _DSIR_GRAMS_ORACLE.format(B=1024)
        + """
, keyed AS (
  SELECT wts.doc_id,
         logw_micro + CAST(FLOOR(
           (-ln(-ln((('0x' || substr(md5('dsir:7:' || CAST(wts.doc_id AS VARCHAR)), 1, 13))::BIGINT + 1.0)
                    / 4503599627370498.0))) * 1000000.0
         ) AS BIGINT) AS key_micro,
         nt.n_tokens
  FROM wts
  JOIN (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM cw) nt
    ON nt.doc_id = wts.doc_id
),
cut AS (
  SELECT doc_id, key_micro, n_tokens,
         ROW_NUMBER() OVER (
           ORDER BY key_micro DESC, md5('tbs:' || CAST(doc_id AS VARCHAR)) ASC
         ) AS sel_rank,
         SUM(n_tokens) OVER (
           ORDER BY key_micro DESC, md5('tbs:' || CAST(doc_id AS VARCHAR)) ASC
           ROWS UNBOUNDED PRECEDING
         ) AS cum_tokens
  FROM keyed
)
SELECT doc_id, key_micro, n_tokens,
       CAST(sel_rank AS BIGINT) AS sel_rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cut WHERE cum_tokens <= {budget}
""".format(budget=budget)
    )
    compare(out, oracle, sf_dir)


def test_dsir_select_budget_semantics(spark):
    """Contract: inclusive running mass <= budget, ranks are the exact
    key-order prefix, full budget selects every scored doc, zero budget
    selects none, and the n_tokens_col fast path equals the derived
    count."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_select_budget,
    )

    corpus, target = _dsir_two_population(spark)
    total = 600 * 30  # every doc is exactly 30 whitespace tokens
    full = dsir_select_budget(corpus, target, total, seed=3, n_buckets=512)
    rows = full.collect()
    assert len(rows) == 600
    assert max(r["cum_tokens"] for r in rows) == total
    half = dsir_select_budget(
        corpus, target, total // 2, seed=3, n_buckets=512
    ).collect()
    assert len(half) == 300  # uniform 30-token docs: exactly half
    assert all(r["cum_tokens"] <= total // 2 for r in half)
    # prefix property: the half-budget selection is the rank prefix of full
    full_by_rank = {r["sel_rank"]: r["doc_id"] for r in rows}
    assert {r["sel_rank"]: r["doc_id"] for r in half} == {
        k: v for k, v in full_by_rank.items() if k <= 300
    }
    assert dsir_select_budget(corpus, target, 0, n_buckets=512).count() == 0
    # precomputed token counts: same selection through the fast path
    pre = corpus.withColumn("nt", F.lit(30).cast("bigint"))
    via_col = dsir_select_budget(
        pre, target, total // 2, seed=3, n_buckets=512, n_tokens_col="nt"
    ).collect()
    assert sorted(map(tuple, via_col)) == sorted(map(tuple, half))


def test_dsir_select_budget_stratified_matches_oracle(spark, sf_dir):
    """r14: the mixture-aware corner of the selection matrix — per-source
    budgets along the shared DSIR ranking — held to the naive PER-SOURCE
    global window in DuckDB: same Gumbel keys, per-source ranks and
    running masses, each source cut at its own budget."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_select_budget_stratified,
    )
    from tests.oracle_harness import compare

    docs = load(spark, sf_dir, "documents")
    budgets = {
        r["source"]: int(r["t"]) // 2
        for r in docs.selectExpr(
            "source",
            "size(split(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n",
        )
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    out = dsir_select_budget_stratified(
        docs, _dsir_target(docs), budgets, seed=7, n_buckets=1024
    )
    values = ", ".join(f"('{s}', {b})" for s, b in sorted(budgets.items()))
    oracle = (
        "WITH "
        + _DSIR_GRAMS_ORACLE.format(B=1024)
        + """
, keyed AS (
  SELECT wts.doc_id, d.source,
         logw_micro + CAST(FLOOR(
           (-ln(-ln((('0x' || substr(md5('dsir:7:' || CAST(wts.doc_id AS VARCHAR)), 1, 13))::BIGINT + 1.0)
                    / 4503599627370498.0))) * 1000000.0
         ) AS BIGINT) AS key_micro,
         nt.n_tokens
  FROM wts
  JOIN (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM cw) nt
    ON nt.doc_id = wts.doc_id
  JOIN documents d ON d.doc_id = wts.doc_id
),
b(source, budget) AS (VALUES {values}),
cut AS (
  SELECT doc_id, source, key_micro, n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY key_micro DESC, md5('tbs:' || CAST(doc_id AS VARCHAR)) ASC
         ) AS sel_rank,
         SUM(n_tokens) OVER (
           PARTITION BY source
           ORDER BY key_micro DESC, md5('tbs:' || CAST(doc_id AS VARCHAR)) ASC
           ROWS UNBOUNDED PRECEDING
         ) AS cum_tokens
  FROM keyed
)
SELECT doc_id, source, key_micro, n_tokens,
       CAST(sel_rank AS BIGINT) AS sel_rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cut JOIN b USING (source) WHERE cum_tokens <= budget
""".format(values=values)
    )
    compare(out, oracle, sf_dir)


def test_dsir_select_budget_stratified_semantics(spark):
    """Per-source masses land within their own budgets; a single-source
    corpus degenerates to dsir_select_budget exactly (same keys, ranks,
    masses); the multi-target table composes unchanged via log_ratio=;
    budgets are required."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_multi_target_log_ratio_table,
        dsir_select_budget,
        dsir_select_budget_stratified,
    )

    corpus, target = _dsir_two_population(spark)
    two_src = corpus.withColumn(
        "source", F.when(F.col("doc_id") < 300, "a").otherwise("b")
    )
    budgets = {"a": 3_000, "b": 1_500}
    sel = dsir_select_budget_stratified(
        two_src, target, budgets, seed=3, n_buckets=512
    ).collect()
    mass = {}
    ranks = {}
    for r in sel:
        mass[r["source"]] = max(mass.get(r["source"], 0), r["cum_tokens"])
        ranks.setdefault(r["source"], []).append(r["sel_rank"])
    assert mass["a"] <= 3_000 and mass["b"] <= 1_500
    for src, rk in ranks.items():
        assert sorted(rk) == list(range(1, len(rk) + 1)), src
    # 30-token docs: the budgets fill exactly
    assert mass["a"] == 3_000 and mass["b"] == 1_500

    # single-source degenerate == the global budget selector
    one = corpus.withColumn("source", F.lit("all"))
    strat = dsir_select_budget_stratified(
        one, target, {"all": 3_000}, seed=3, n_buckets=512
    ).collect()
    glob = dsir_select_budget(corpus, target, 3_000, seed=3, n_buckets=512).collect()
    assert sorted(
        (r["doc_id"], r["key_micro"], r["n_tokens"], r["sel_rank"], r["cum_tokens"])
        for r in strat
    ) == sorted(
        (r["doc_id"], r["key_micro"], r["n_tokens"], r["sel_rank"], r["cum_tokens"])
        for r in glob
    )

    # the multi-target model rides in unchanged
    lam = dsir_multi_target_log_ratio_table(
        corpus, {"t": target}, {"t": 1.0}, n_buckets=512
    )
    via_lam = dsir_select_budget_stratified(
        two_src, budgets=budgets, seed=3, n_buckets=512, log_ratio=lam
    ).collect()
    assert sorted(map(tuple, via_lam)) == sorted(map(tuple, sel))

    with pytest.raises(ValueError, match="budgets is required"):
        dsir_select_budget_stratified(two_src, target)


def test_dsir_budget_key_exactness_bound(spark):
    """Pins the docstring's EXACTNESS BOUND (r13 review): dsir_select_budget
    routes the bigint key_micro through token_budget_selection's double
    score, exact only for |key| < 2^53 micro-nats. Constructed overflow:
    the round-trip is lossless just below the bound and collapses
    adjacent keys just above it — in-engine, the same cast path the
    operator runs. Reaching 2^53 takes ~1e9 grams in ONE document, so
    the bound is unreachable for chunked corpora; beyond it the failure
    mode is near-ties falling back to the md5 tiebreak, never a wrong
    mass sum."""
    row = (
        spark.createDataFrame([(2**53 - 1, 2**53 + 1)], "below long, above long")
        .select(
            (F.col("below").cast("double").cast("bigint") == F.col("below")).alias(
                "below_exact"
            ),
            (F.col("above").cast("double").cast("bigint") == F.col("above")).alias(
                "above_exact"
            ),
            # the collapse itself: 2^53 and 2^53+1 compare equal as doubles
            (
                F.col("above").cast("double")
                == (F.col("above") - 1).cast("double")
            ).alias("adjacent_collapse"),
        )
        .first()
    )
    assert row["below_exact"]
    assert not row["above_exact"]
    assert row["adjacent_collapse"]
