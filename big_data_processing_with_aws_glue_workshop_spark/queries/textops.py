"""Text-analysis / deduplication operators over the ``documents`` table —
the training-data-pipeline extension family (north-star ops beyond the
reference's inventory; see extensions/ for the approximate variants).

Everything here is exactly SQL-expressible, so each query has a DuckDB twin:
- token statistics (quality scoring),
- stopword-marker language ID,
- exact-duplicate profile (md5 content hash),
- word-3-gram Jaccard near-duplicate pairs (exact, via shingle join),
- 1-permutation MinHash-style document fingerprint (min md5 over shingles).

Determinism: counts are exact ints; every emitted double is one IEEE
division of exact ints. Marker-word occurrence counts use the
length/replace trick instead of regex, and the regexes that remain use
only explicit character classes (see ``_WS``) — both guard against
Java-regex (Spark) vs RE2 (DuckDB) semantic differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._tables import load, parallelize_scan
from ..util import tracked_cache


# Portable whitespace class: Java regex \s includes \x0B (vertical tab),
# RE2's (DuckDB) does not — spelling the class out keeps Spark and the
# oracle bit-identical on any input.
_WS = r"[ \t\n\f\r]"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), _WS + "+")


def lexical_diversity(col):
    """distinct-token share of a text column (double in (0, 1]) — the
    quality score the budget-selection surfaces rank by. ONE expression
    shared by textpipe's quality/stratified stage-5 modes and the
    stratified-budget-select CLI (r15 review finding: it lived three
    times and a scoring tweak would have forked them)."""
    toks = _tokens(col)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts / average token length / shortness flag —
    the quality-scoring primitives of a pretraining data pipeline."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(_tokens(F.col("text")))
    chars_no_ws = F.length(F.regexp_replace(F.col("text"), _WS, ""))
    # BPE-ish token estimate: letter runs / digit runs / punctuation runs —
    # the regex family BPE pre-tokenizers use, portable across regex engines
    bpe_tokens = F.regexp_count(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]+")
    )
    return d.select(
        "doc_id",
        "lang",
        toks.alias("n_tokens"),
        bpe_tokens.cast("int").alias("n_bpe_tokens"),
        chars_no_ws.alias("n_chars_no_ws"),
        (chars_no_ws.cast("double") / toks).alias("avg_token_len"),
        F.when(F.col("n_chars") < 100, 1).otherwise(0).cast("int").alias("flag_short"),
    )


# language markers: occurrence counting via length/replace (engine-portable)
_LANG_MARKERS = {
    "en": [" the ", " and "],
    "es": [" el ", " que "],
    "fr": [" le ", " et "],
    "de": [" der ", " und "],
}


def _occurrences(padded, word: str):
    return (
        F.length(padded) - F.length(F.replace(padded, F.lit(word), F.lit("")))
    ) / F.lit(len(word))


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count per-language stopword hits, predict the
    argmax (fixed tie order en>es>fr>de>unknown), compare with the labeled
    ``lang`` column."""
    d = load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = {
        lang: sum(_occurrences(padded, w) for w in words).alias(f"score_{lang}")
        for lang, words in _LANG_MARKERS.items()
    }
    scored = d.select("doc_id", "lang", *scores.values())
    s = {lang: F.col(f"score_{lang}") for lang in _LANG_MARKERS}
    no_signal = sum(s.values()) == 0
    predicted = (
        F.when(no_signal, "unknown")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    return scored.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        F.when(predicted == F.col("lang"), 1).otherwise(0).cast("int").alias("lang_match"),
    )


def q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring — the filter stage of a pretraining
    pipeline: punctuation ratio, stopword ratio, and a rule-based quality
    bucket per document. One narrow projection over the scan (no shuffle;
    embarrassingly parallel at 100 TB). Ratios are single IEEE divisions of
    exact integer counts; occurrence counts use the length/replace trick so
    Java-regex vs RE2 differences can't bite."""
    d = load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 \t\n\f\r]", "")
    )
    stop_hits = sum(
        _occurrences(padded, w) for w in (" the ", " and ", " of ", " to ")
    ).cast("int")
    toks = F.size(_tokens(F.col("text")))
    out = d.select(
        "doc_id",
        "lang",
        n_chars.cast("int").alias("n_chars_total"),
        n_punct.cast("int").alias("n_punct"),
        stop_hits.alias("n_stopword_hits"),
        toks.alias("n_tokens"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (stop_hits.cast("double") / toks).alias("stopword_ratio"),
    ).filter(F.col("n_chars_total") > 0)
    bucket = (
        F.when(F.col("n_chars_total") < 100, "SHORT")
        .when(F.col("punct_ratio") > 0.1, "NOISY")
        .when(F.col("stopword_ratio") >= 0.05, "FLUENT")
        .otherwise("OK")
    )
    return out.withColumn("quality_bucket", bucket)


def q_doc_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate profile: hash-groupBy on content md5 (the scalable
    exact-dedup primitive — dedup on a 16-byte digest, not the full text)."""
    d = load(spark, sf_dir, "documents")
    groups = d.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.count(F.when(F.col("n") > 1, 1)).alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias(
            "n_redundant_docs"
        ),
    )


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Shared word-n-gram tokenizer (functions/text.py::word_shingles) —
    one definition for the exact join AND the MinHash path."""
    from ..functions.text import word_shingles

    return word_shingles(df, "doc_id", "text", n)


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-gram Jaccard near-duplicate pairs (threshold 0.8) via the
    inverted-index join: explode distinct shingles, self-join on shingle,
    count intersections, Jaccard = |A∩B| / (|A|+|B|-|A∩B|).

    Scale path: the shingle join shuffles on the shingle key; hot shingles
    (stopword runs) are bounded because shingles are per-doc DISTINCT. The
    approximate MinHash-LSH variant (extensions/dedup_fuzzy.py) replaces the
    full join with banded buckets when pair cardinality explodes."""
    d = load(spark, sf_dir, "documents")
    sh = tracked_cache(_shingles(d))
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    cb = counts.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    jac = (
        inter.join(ca, "d1")
        .join(cb, "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("n_inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    return jac


# exact substring containment: anchor-shingle length in characters
_CONTAIN_K = 24
# guard on the sub-K-char broadcast fallback: above this many short docs
# the |docs|x|short| contains() verify is the quadratic regime the anchor
# blocking exists to avoid — fail loud instead of silently going n^2
_CONTAIN_SHORT_DOC_CAP = 10_000


def q_contained_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-containment dedup: every (contained, container)
    document pair where one doc's full text appears verbatim inside
    another's — the exact-substring dedup variant from the public
    training-data dedup literature (suffix-array ExactSubstr), here as
    the containment special case that needs no suffix array. Complements
    the whole-text md5 profile (equality only) and the approximate
    MinHash/SimHash paths (near-dup, no containment guarantee).

    Scale path (no all-pairs): if A is a substring of B then EVERY
    K-char shingle of A is also a shingle of B, so blocking each doc on
    ONE deterministic shingle of its own text has perfect recall. We
    block on the doc's RAREST shingle — min by global document
    frequency, digest tie-break — computed as: one explode of distinct
    shingle digests per doc (16-hex md5 prefix -> bigint; the raw text
    never rides a shuffle), one hash agg for document frequency, a
    min-struct agg per doc for the anchor, an equi-join from anchors
    back to the shingle index for candidates, then an exact contains()
    verify on the bounded candidate set (md5-prefix collisions only add
    candidates; the verify is exact). Rare-gram anchors keep candidate
    fanout near-minimal; a high-duplication corpus (where even the
    rarest gram is common) degrades toward the measured LSH
    high-duplication curve (docs/SCALE.md), never toward n^2. Docs
    shorter than K chars (none in this corpus at any SF; degenerate
    boilerplate at scale) take a broadcast fallback against the full
    table so recall stays exact. Equal texts under distinct ids
    contain each other, so both directed pairs appear — matching the
    oracle's position() semantics."""
    K = _CONTAIN_K
    d = tracked_cache(
        parallelize_scan(load(spark, sf_dir, "documents"), "doc_id").select(
            "doc_id", "text", F.length("text").alias("len")
        )
    )
    longd = d.filter(F.col("len") >= K)
    sh = tracked_cache(
        longd.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.col("len") - (K - 1)),
                        lambda i: F.conv(
                            F.substring(
                                F.md5(
                                    F.col("text").substr(i.cast("int"), F.lit(K))
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint"),
                    )
                )
            ).alias("g"),
        )
    )
    # shingles are per-doc DISTINCT, so count(*) per digest IS document
    # frequency; one shuffle on the digest key
    dfreq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("dfreq"))
    anchors = (
        sh.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(F.min(F.struct("dfreq", "g")).alias("a"))
        .select("doc_id", F.col("a.g").alias("g"))
    )
    cands = (
        anchors.select(F.col("doc_id").alias("inner_id"), "g")
        .join(sh.select(F.col("doc_id").alias("outer_id"), "g"), "g")
        .filter(F.col("inner_id") != F.col("outer_id"))
        .select("inner_id", "outer_id")
    )
    short = d.filter(F.col("len") < K)
    # bounded broadcast fallback: exact for the rare sub-K doc, but a
    # corpus with MANY short boilerplate docs would pay an uncapped
    # |docs|x|short| verify — the quadratic regime this query exists to
    # avoid. Fail loud there (same move as cross_source_overlap's shingle
    # ubiquity cap); the fix at scale is a dedicated short-doc equality
    # pass (exact dedup already covers equal shorts) or a raised K.
    n_short = short.count()
    if n_short > _CONTAIN_SHORT_DOC_CAP:
        raise RuntimeError(
            f"{n_short} documents shorter than K={K} chars exceeds the "
            f"broadcast-fallback cap ({_CONTAIN_SHORT_DOC_CAP}): the "
            "short-doc verify would be effectively all-pairs. Dedup "
            "short boilerplate by exact digest first, or raise "
            "_CONTAIN_SHORT_DOC_CAP deliberately."
        )
    short_cands = (
        d.select(F.col("doc_id").alias("outer_id"))
        .crossJoin(F.broadcast(short.select(F.col("doc_id").alias("inner_id"))))
        .filter(F.col("inner_id") != F.col("outer_id"))
        .select("inner_id", "outer_id")
    )
    a = d.select(
        F.col("doc_id").alias("inner_id"),
        F.col("text").alias("inner_text"),
        F.col("len").alias("contained_len"),
    )
    b = d.select(
        F.col("doc_id").alias("outer_id"),
        F.col("text").alias("outer_text"),
        F.col("len").alias("container_len"),
    )
    return (
        cands.unionByName(short_cands)
        .join(a, "inner_id")
        .join(b, "outer_id")
        .filter(F.expr("contains(outer_text, inner_text)"))
        .select(
            F.col("inner_id").alias("contained_doc_id"),
            F.col("outer_id").alias("container_doc_id"),
            F.col("contained_len").cast("bigint").alias("contained_len"),
            F.col("container_len").cast("bigint").alias("container_len"),
        )
    )


# partial-overlap shared-substring dedup: gram length (chars) and the
# minimum reported shared-run length (chars). MIN - K + 1 = the minimum
# consecutive diagonal matches a qualifying run produces (>= 10 here),
# which is also the diagonal-total prune threshold.
_SHARED_K = 16
_SHARED_MIN = 25


def q_shared_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap exact-substring dedup: every unordered doc pair
    sharing a verbatim run of >= 25 chars, with the EXACT length of the
    longest shared run — the full ExactSubstr granularity from the public
    dedup literature (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): unlike ``contained_doc_pairs`` (whole-doc
    containment only) this catches two documents that merely SHARE a long
    passage — quoted boilerplate, syndicated paragraphs, copied headers —
    without either containing the other.

    Scale path (no all-pairs in DOCS, no suffix array): matched gram
    positions between two docs form diagonal runs (diag = pos_a - pos_b),
    and a shared run of R >= K chars is exactly R-K+1 consecutive matches
    on one diagonal — so ONE equi-join of the position-indexed gram-hash
    table with itself (shuffle on the 60-bit gram hash; docs pair only
    where grams actually match) followed by the classic gaps-and-islands
    trick (pos - row_number over (pair, diag) -> groupBy max) yields
    longest_shared_run = max_island + K - 1, the exact longest common
    substring whenever it is >= K. Join fanout is sum over grams of
    occurrences^2 — the cost class every ExactSubstr implementation pays
    (a suffix array pays it walking equal-prefix ranges); at 100 TB the
    mitigation is per-source sharding or a gram document-frequency cap
    with its documented recall proviso. A winnow-anchored candidate
    stage (MOSS guarantee, as in ``doc_winnow_fingerprint``) was built
    and MEASURED here first and rejected: on this template-heavy corpus
    it yields 584,546 candidate doc pairs for 14,782 true overlaps at
    sf0.1, and verifying a candidate pair must join ALL its grams
    (~167M rows) where the direct join carries only the 5.7M actually
    matching positions — blocking by pair only helps when pairs are
    verifiable in O(1), not O(len).

    Oracle: the same diagonal-islands algebra in DuckDB over every doc
    pair with a matching gram hash — both engines join on the identical
    md5-prefix 60-bit hash (``('0x' || substr(md5(g),1,15))::BIGINT`` ==
    Spark's ``conv(substring(md5(g),1,15),16,10)``), so results are
    bit-exact by construction, collisions included (none observed; odds
    ~1e-7 at this corpus's 603k distinct grams).
    """
    K, MIN = _SHARED_K, _SHARED_MIN
    d = tracked_cache(
        parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", "text", F.length("text").alias("len"))
        .filter(F.col("len") >= MIN)  # shorter docs cannot hold a run
    )
    # position-indexed gram hashes (16-hex md5 prefix -> bigint; raw text
    # never rides the shuffle)
    gr = tracked_cache(
        d.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") - (K - 1)),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(F.col("text").substr(i.cast("int"), F.lit(K))),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                )
            ).alias("pos", "g"),
        )
    )
    matches = (
        gr.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
        .join(
            gr.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g"),
            "g",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    # islands: a qualifying pair needs >= MIN-K+1 consecutive matches on
    # one diagonal, so diagonals with fewer TOTAL matches are pruned
    # before row_number materializes groups (same window spec -> both
    # window functions share one shuffle+sort)
    isl = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    diag_n = Window.partitionBy("doc_a", "doc_b", "diag")
    overlaps = (
        matches.select(
            "doc_a",
            "doc_b",
            "diag",
            "pa",
            F.count(F.lit(1)).over(diag_n).alias("diag_total"),
            F.row_number().over(isl).alias("rn"),
        )
        .filter(F.col("diag_total") >= MIN - K + 1)
        .withColumn("grp", F.col("pa") - F.col("rn"))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("doc_a", "doc_b")
        .agg((F.max("run") + F.lit(K - 1)).alias("overlap_chars"))
        .filter(F.col("overlap_chars") >= MIN)
    )
    return (
        overlaps.join(
            d.select(F.col("doc_id").alias("doc_a"), F.col("len").alias("len_a")),
            "doc_a",
        )
        .join(
            d.select(F.col("doc_id").alias("doc_b"), F.col("len").alias("len_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("overlap_chars").cast("bigint").alias("overlap_chars"),
            F.col("len_a").cast("bigint").alias("len_a"),
            F.col("len_b").cast("bigint").alias("len_b"),
            (
                F.col("overlap_chars") == F.least("len_a", "len_b")
            ).alias("is_containment"),
        )
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-permutation MinHash-style fingerprint: min(md5(shingle)) per doc.
    Documents sharing a fingerprint are near-duplicate candidates — the
    k-permutation banded version lives in extensions/dedup_fuzzy.py."""
    d = load(spark, sf_dir, "documents")
    sh = _shingles(d)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle").cast("binary"))).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


def q_minhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate detection (the 100-TB-scale dedup path):
    banded signature buckets generate candidates, exact Jaccard verifies.
    With 64 hashes / 16 bands the probability of missing a >=0.8-Jaccard
    pair is <1e-3 (1-(1-0.8^4)^16), and verification is exact, so the result
    equals the exact n-gram join's — which serves as its oracle — while the
    plan never compares all pairs. Implementation: extensions/dedup_fuzzy.py."""
    from ..extensions.dedup_fuzzy import minhash_near_duplicates

    d = load(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, n_hashes=64, bands=16, shingle_n=3, threshold=0.8, seed=42
    )


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 32-bit fingerprints. Hash-checked against a full DuckDB twin:
    the per-token hash is md5-derived (extensions/dedup_fuzzy.py), so the
    oracle reproduces every fingerprint bit-for-bit — per-bit +-1 majority
    sums over exploded tokens, packed into a bigint."""
    from ..extensions.dedup_fuzzy import simhash

    return simhash(load(spark, sf_dir, "documents"), n_bits=32)


def q_doc_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup canonicalization: near-dup pairs (the minhash_near_duplicates
    edge list) -> connected components by iterative min-label propagation
    (extensions/dedup_fuzzy.py::connected_components) -> one canonical doc
    per component. A genuinely ITERATIVE distributed algorithm, yet still
    oracle-checkable: the DuckDB twin walks the same edge list with a
    recursive CTE and takes MIN(reachable id)."""
    from ..extensions.dedup_fuzzy import connected_components, minhash_near_duplicates

    d = load(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        d, n_hashes=64, bands=16, shingle_n=3, threshold=0.8, seed=42
    )
    labels = connected_components(pairs, "d1", "d2")
    w = Window.partitionBy("component")
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component")
    ).select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).alias("component_size"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


def dedup_threshold_sweep(
    docs: DataFrame,
    thresholds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup THRESHOLD TUNING audit (r15): operators pick a Jaccard
    cut blind today — this reports, for each candidate threshold, how
    many pairs fire, how many documents are touched, and exactly how
    many documents dedup would REMOVE (nodes − components under min-id
    canonicalization), all from ONE corpus-scale LSH pass.

    ``thresholds`` is a list of floats in (0, 1]. The LSH pass runs at
    the FLOOR threshold (min) and the verify join attaches EXACT
    Jaccard to every candidate pair, so per-threshold readouts are pure
    filters + connected components over the pair set — work scales with
    the duplicate mass, never re-touching the corpus. HONEST BOUND,
    stated: LSH candidate recall follows the band S-curve tuned by
    (n_hashes, bands); pairs whose similarity sits far BELOW the
    operating point the defaults target (~0.8 at 64/16) may not be
    candidates at all, so readouts at a floor well under the S-curve
    knee UNDERCOUNT pairs — pick bands for the floor you care about
    (more bands of fewer rows shifts the knee left; the tradeoff table
    is in extensions/dedup_fuzzy.py).

    Output one row per threshold: (threshold, n_pairs,
    n_docs_in_pairs, n_components, docs_removed) — docs_removed is the
    exact count min-id dedup at that threshold would drop.

    Scale shape: one LSH + verify pass (the measured candidate-bounded
    plan of :func:`extensions.dedup_fuzzy.minhash_near_duplicates`),
    pairs cached once; each threshold then runs min-label CC over its
    filtered edge list — iterations scale with component diameter
    (near-dup clusters are shallow), edges bounded by the floor
    threshold's pair count. |thresholds| is a handful, listed by the
    caller."""
    from ..extensions.dedup_fuzzy import connected_components, minhash_near_duplicates

    ts = sorted({float(t) for t in thresholds})
    if not ts:
        raise ValueError("thresholds must be a non-empty list of floats in (0, 1]")
    if ts[0] <= 0 or ts[-1] > 1:
        raise ValueError(f"thresholds must lie in (0, 1], got {ts}")
    # plain persist + finally, NOT tracked_cache: the result frame below
    # is built from collected driver rows, so the pair cache is dead
    # weight the moment the loop finishes — tying its release to the
    # next maybe_release_tracked_caches() would let repeated library
    # calls accumulate executor cache indefinitely (r15 ADVICE)
    pairs = minhash_near_duplicates(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=ts[0],
        seed=seed,
    ).persist()
    spark = docs.sparkSession
    rows = []
    try:
        for t in ts:
            sub = pairs.filter(F.col("jaccard") >= t)
            n_pairs = sub.count()
            if n_pairs == 0:
                rows.append((t, 0, 0, 0, 0))
                continue
            labels = connected_components(sub, "d1", "d2")
            n_nodes = labels.count()
            n_comp = labels.select("label").distinct().count()
            rows.append((t, n_pairs, n_nodes, n_comp, n_nodes - n_comp))
    finally:
        pairs.unpersist()
    return spark.createDataFrame(
        rows,
        "threshold double, n_pairs bigint, n_docs_in_pairs bigint, "
        "n_components bigint, docs_removed bigint",
    )


def simhash_threshold_sweep(
    docs: DataFrame,
    hammings,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 32,
    n_blocks: int | None = None,
) -> DataFrame:
    """SimHash HAMMING-threshold tuning audit (r16): the third member
    of the tuning-audit family (Jaccard: :func:`dedup_threshold_sweep`;
    cosine: ``queries/vectors.py::semantic_threshold_sweep``) —
    operators pick a max-hamming cut blind today; this reports, for
    each candidate k, how many pairs fire, how many documents are
    touched, and exactly how many documents min-id dedup at hamming <=
    k would REMOVE, all from ONE block-join pass.

    ``hammings`` is a list of ints in [0, n_bits). The pair pass runs
    at the CEILING k (max — for hamming the loose end is the larger
    distance) and ``extensions/dedup_fuzzy.py::hamming_near_pairs``
    already emits the exact bit_count distance per pair, so per-k
    readouts are pure filters + connected components over the cached
    pair set — work scales with the near-dup mass, never re-touching
    the corpus.

    HONEST BOUND, stated — and like the cosine sweep's it is EXACT:
    ``n_blocks`` defaults to ceiling+1, satisfying the pigeonhole
    guarantee (two hashes within k bits share at least one of k+1
    blocks exactly), so recall is 1.0 at EVERY swept k. What the
    ceiling controls is COST: more blocks means shorter blocks, and
    the candidate block-join's collision rate grows ~2^-block_bits —
    sweeping to a high ceiling pays candidate fanout, not recall. Pass
    ``n_blocks`` explicitly only to trade that off knowingly (it must
    stay > max(hammings) or the pair pass itself refuses).

    Output one row per k: (max_hamming, n_pairs, n_docs_in_pairs,
    n_components, docs_removed). Pair cache is plain persist +
    finally-released (the r15-ADVICE precedent — the result is built
    from collected driver rows)."""
    from ..extensions.dedup_fuzzy import connected_components, simhash_near_duplicates

    ks = sorted({int(k) for k in hammings})
    if not ks:
        raise ValueError(
            "hammings must be a non-empty list of ints in [0, n_bits)"
        )
    if ks[0] < 0 or ks[-1] >= n_bits:
        raise ValueError(f"hammings must lie in [0, {n_bits}), got {ks}")
    blocks = (ks[-1] + 1) if n_blocks is None else int(n_blocks)
    if blocks <= ks[-1]:
        # explicit ValueError, not the pair pass's assert (r16-ADVICE
        # low: python -O strips asserts, silently dropping the pigeonhole
        # guarantee and undercounting pairs at the swept ks)
        raise ValueError(
            f"n_blocks ({blocks}) must exceed max(hammings) ({ks[-1]}) — "
            "the pigeonhole recall guarantee needs more blocks than "
            "allowed bit flips"
        )
    pairs = simhash_near_duplicates(
        docs,
        id_col=id_col,
        text_col=text_col,
        n_bits=n_bits,
        max_hamming=ks[-1],
        n_blocks=blocks,
    ).persist()
    spark = docs.sparkSession
    rows = []
    try:
        for k in ks:
            sub = pairs.filter(F.col("hamming") <= k)
            n_pairs = sub.count()
            if n_pairs == 0:
                rows.append((k, 0, 0, 0, 0))
                continue
            labels = connected_components(sub, "d1", "d2")
            n_nodes = labels.count()
            n_comp = labels.select("label").distinct().count()
            rows.append((k, n_pairs, n_nodes, n_comp, n_nodes - n_comp))
    finally:
        pairs.unpersist()
    return spark.createDataFrame(
        rows,
        "max_hamming int, n_pairs bigint, n_docs_in_pairs bigint, "
        "n_components bigint, docs_removed bigint",
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term salience: top-3 terms per document by tf x idf.

    idf is the RAW inverse-frequency ratio N/df, not ln(N/df): Spark's
    Math.log and DuckDB's libm ln disagree in the last ulp on ~8% of
    rational inputs (measured), while +,*,/ are IEEE-exact in both — so the
    ratio form is hash-reproducible cross-engine where the log form is not
    (both are monotone decreasing in df). Plan: one shuffle to (doc, term)
    counts, one to term doc-frequencies, a shuffle join back on term (vocab
    is corpus-sized at 100 TB — no broadcast), the one-row corpus count
    broadcast, then a per-doc top-k window. Ties broken by token asc."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "token",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            "tfidf",
        )
    )


# winnowing parameters (Schleimer et al., MOSS): K-token grams, window W
_WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M = 4, 5, 131, 2147483647


def q_doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing: polynomial
    Rabin-Karp hashes over K-token grams, then the minimum hash of each
    sliding window of W consecutive gram hashes is selected as a
    fingerprint (the MOSS scheme — guarantees any shared run of K+W-1
    tokens yields a shared fingerprint). Output per doc: gram count,
    distinct-fingerprint count, min/max fingerprint.

    All arithmetic is integer mod M=2^31-1 with md5-derived token hashes,
    so every value is engine-exact (the DuckDB twin reproduces each
    fingerprint bit-for-bit) and overflow-free under ANSI: the largest
    intermediate is (M-1)*B^3 + ... ~ 4.9e15 << 2^63. Token hashes are
    materialized in their own projection first — codegen does not CSE
    inside higher-order-function lambdas."""
    K, W, B, M = _WINNOW_K, _WINNOW_W, _WINNOW_B, _WINNOW_M
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    th = d.select(
        "doc_id",
        F.transform(
            _tokens(F.col("text")),
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
    kgf = th.select("doc_id", grams.alias("kg"))
    exploded = kgf.select("doc_id", F.posexplode("kg").alias("pos", "kh"))
    wspec = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
    wcnt = Window.partitionBy("doc_id")
    fps = (
        exploded.select(
            "doc_id",
            "pos",
            F.min("kh").over(wspec).alias("fp"),
            F.count(F.lit(1)).over(wcnt).alias("nk"),
        )
        # only complete windows select fingerprints
        .filter(F.col("pos") <= F.col("nk") - W)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )
    return (
        kgf.select("doc_id", F.size("kg").alias("n_kgrams"))
        .join(fps, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_kgrams").cast("int").alias("n_kgrams"),
            F.coalesce(F.col("n_fingerprints"), F.lit(0))
            .cast("int")
            .alias("n_fingerprints"),
            "min_fp",
            "max_fp",
        )
    )


# contamination check: eval set = doc_id % 17 == 0, 5-gram overlap >= 1
_EVAL_MOD, _CONTAM_N = 17, 5


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination for training corpora: find training docs
    sharing >= 1 distinct 5-token gram with any held-out eval doc (the
    GPT-3 / Pile n-gram-collision recipe). The eval set is the
    deterministic doc_id % 17 == 0 slice. Output per contaminated training
    doc: how many eval docs it collides with, the worst offender (most
    shared grams, ties to lowest eval id), and the shared-gram count.

    Plan shape at 100 TB: both sides shingle once (explode + distinct),
    the join key is the gram itself — corpus-sized shuffle, the same shape
    as the exact n-gram Jaccard join — then two narrow aggregations. The
    eval side is typically small enough to broadcast in production; it is
    a filtered slice of the same table here, so Spark's stats pick the
    strategy (AQE converts to broadcast when the build side is small)."""
    from ..functions.text import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=_CONTAM_N)
    eval_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    train_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) != 0)
    overlap = (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_shared").desc(), F.col("eval_id")
    )
    return (
        overlap.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_eval_matches"),
            F.max(F.when(F.col("rn") == 1, F.col("eval_id"))).alias("top_eval_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_shared")))
            .cast("int")
            .alias("top_shared"),
        )
    )


def q_bloom_decontaminated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination: the exact SURVIVOR set —
    training docs (doc_id % 17 != 0) sharing ZERO distinct 5-grams with the
    eval slice — with each survivor's distinct-shingle count.

    The sketch family's driver-scored representative (r8 verdict "Next
    round #3"): the eval shingle set compresses to a 2^20-bit Bloom bitmap
    (128 KB, 16,384 longs) packed into ONE broadcast row, so corpus-side
    membership is k pure-expression lookups per probe row
    (operators/sketch.py::bloom_probe — element_at + bitwise AND, no
    probe shuffle, build aggregation executed once); only bloom-POSITIVE
    grams reach the exact semi-join verify. Because a Bloom filter has zero false
    negatives BY CONSTRUCTION (pinned by tests/test_sketch.py), the pruning
    provably cannot change the answer: the output is identical to the plain
    anti-join a DuckDB oracle expresses, making the sketch path
    hash-oracleable even though the bitmap itself is not SQL-portable —
    flow equivalence pinned by
    tests/test_sketch.py::test_bloom_decontamination_flow_matches_exact_join.
    Same eval slice and tokenizer as q_benchmark_contamination.

    At 100 TB: the corpus-scale probe side is never shuffled for the
    membership test; the shuffle semi-join sees only the contaminated grams
    plus the eps*N false-positive sliver, and the per-doc shingle counts
    reuse the shingle frame's doc_id partitioning."""
    from ..functions.text import word_shingles
    from ..operators.sketch import bloom_build, bloom_probe

    d = load(spark, sf_dir, "documents")
    # three consumers (bloom build, probe side, per-doc counts): persist
    # the one expensive shingle pass instead of recomputing it per subtree
    sh = tracked_cache(word_shingles(d, "doc_id", "text", n=_CONTAM_N))
    eval_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) == 0)
    train_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) != 0)
    bloom = bloom_build(eval_sh, "shingle")
    candidates = bloom_probe(bloom, train_sh, "shingle")
    contaminated = (
        candidates.join(eval_sh.select("shingle"), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    counts = train_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    train_docs = d.filter((F.col("doc_id") % _EVAL_MOD) != 0).select(
        "doc_id", "source"
    )
    return (
        train_docs.join(contaminated, "doc_id", "left_anti")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_shingles", F.lit(0)).cast("int").alias("n_shingles"),
        )
    )


def q_source_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture planning: downsample every source to the SAME
    token budget (the smallest source's total) with deterministic
    hash-based selection — the reproducible alternative to rand()-based
    sampling (identical membership on every engine, every partitioning,
    every rerun; a doc's fate depends only on its id).

    Selection: md5-derived uniform hash of the doc id in [0, 1e6); doc
    kept iff hash < rate * 1e6 where rate = target_tokens / source_tokens.
    Expected selected-token mass per source ~ the target budget. Plan: one
    shuffle to per-source totals (source cardinality is tiny vs corpus —
    thousands at 100 TB), the one-row global min broadcast, the 20-row
    rate table broadcast back onto the per-doc frame, then one more
    per-source aggregation of the survivors. All counts integer-exact; the
    rate and the threshold comparison are single IEEE ops, so the DuckDB
    twin reproduces membership bit-for-bit."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    per_doc = d.select(
        "doc_id",
        "source",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % 1000000
        ).alias("h"),
    )
    totals = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
    target = totals.agg(F.min("total_tokens").cast("double").alias("target"))
    rated = totals.crossJoin(F.broadcast(target)).select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("target") / F.col("total_tokens")).alias("rate"),
    )
    survivors = per_doc.join(F.broadcast(rated.select("source", "rate")), "source").filter(
        F.col("h").cast("double") < F.col("rate") * 1000000.0
    )
    sel = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_tokens").alias("selected_tokens"),
    )
    return rated.join(sel, "source", "left").select(
        "source",
        F.col("n_docs").cast("int").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        "rate",
        F.coalesce(F.col("n_selected"), F.lit(0)).cast("int").alias("n_selected"),
        F.coalesce(F.col("selected_tokens"), F.lit(0))
        .cast("bigint")
        .alias("selected_tokens"),
    )


def epoch_mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Epoch-aware mixture planning — the UPSAMPLING half
    ``q_source_mixture_plan`` deliberately lacks (its target is the min
    source, so every rate is <= 1): given per-source WEIGHTS and a
    global token budget, a source whose weighted target exceeds its
    available mass runs WHOLE EPOCHS plus a deterministic fractional
    residual — how Dolma/RedPajama-style mixtures run small high-quality
    sources for >1 epoch while web crawl stays sub-sampled.

    Per source: target_tokens = total_tokens * weight / sum(weights);
    epochs = floor(target / available); the residual
    (target - epochs * available) is filled by the salted-hash document
    sample (md5('epoch:' || id) % 1e6 < residual_rate * 1e6 — salted so
    membership is independent of both the mixture hash and the split
    hash). Sources absent from ``weights`` get weight 0 (excluded, 0
    epochs, 0 residual). planned_tokens = epochs * available +
    selected residual mass — integer-exact except the single IEEE
    divisions producing target and residual_rate, so a DuckDB twin
    reproduces the plan bit-for-bit.

    Returns one row per source present in the corpus:
    (source, n_docs, total_tokens, weight, target_tokens, epochs,
    residual_rate, n_residual_docs, residual_tokens, planned_tokens).

    ``weights`` keys are VALIDATED against the sources actually present
    in the corpus (one column-pruned distinct pass, |sources| rows
    collected): a key naming an absent source raises, because the
    normalizer sums over all weight keys — a typo'd source name would
    otherwise silently shrink every present source's target and the
    plan's total mass would fall short with no warning (r12 ADVICE).

    Scale shape: one per-source totals aggregate (tiny), the weight
    table broadcast, and one survivor aggregate over the residual
    filter — the same two-aggregate plan as the downsampler, plus the
    validation pass above (source-column-only scan, map-side partial
    agg; a planning job runs once per epoch, so the pass is cheap
    insurance). The expensive materialization (explode epochs + union
    residual) is the caller's write job, not this plan."""
    spark = docs.sparkSession
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    present = {r[0] for r in docs.select(source_col).distinct().collect()}
    unknown = sorted(set(weights) - present)
    if unknown:
        raise ValueError(
            f"weights name sources absent from the corpus: {unknown} "
            f"(present: {sorted(present)}) — an absent key would silently "
            "shrink every present source's target via the normalizer"
        )
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        f"{source_col} string, weight double",
    )
    per_doc = docs.select(
        F.col(source_col),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("epoch:"), F.col(id_col).cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
        ).alias("h"),
    )
    totals = per_doc.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    rated = totals.join(F.broadcast(wdf), source_col, "left").select(
        source_col,
        "n_docs",
        "total_tokens",
        F.coalesce(F.col("weight"), F.lit(0.0)).alias("weight"),
        (
            F.lit(float(total_tokens)) * F.coalesce(F.col("weight"), F.lit(0.0))
            / F.lit(wsum)
        ).alias("target_tokens"),
    ).select(
        # total_tokens > 0 guard: locally explicit (r12 verdict) rather
        # than inherited from split('') -> [''] two functions away; a
        # degenerate zero/negative-mass source (e.g. all-NULL text, where
        # size(split(NULL)) is -1) plans 0 epochs / 0 residual instead of
        # dividing by a non-positive mass (ANSI would raise on 0).
        "*",
        F.when(
            F.col("total_tokens") > 0,
            F.floor(F.col("target_tokens") / F.col("total_tokens")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("epochs"),
    ).select(
        "*",
        F.when(
            F.col("total_tokens") > 0,
            (
                F.col("target_tokens")
                - F.col("epochs").cast("double") * F.col("total_tokens")
            )
            / F.col("total_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("residual_rate"),
    )
    survivors = per_doc.join(
        F.broadcast(rated.select(source_col, "residual_rate")), source_col
    ).filter(F.col("h").cast("double") < F.col("residual_rate") * 1_000_000.0)
    sel = survivors.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_residual_docs"),
        F.sum("n_tokens").alias("residual_tokens"),
    )
    # doc counts stay bigint: at the 100 TB scale these docstrings target
    # a source can exceed 2^31 documents, and an int cast would overflow
    # the report (ANSI mode would raise) — r12 ADVICE. epochs stays int:
    # an epoch count near 2^31 is never a real plan.
    return rated.join(sel, source_col, "left").select(
        source_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        "weight",
        "target_tokens",
        F.col("epochs").cast("int").alias("epochs"),
        "residual_rate",
        F.coalesce(F.col("n_residual_docs"), F.lit(0)).cast("bigint").alias(
            "n_residual_docs"
        ),
        F.coalesce(F.col("residual_tokens"), F.lit(0)).cast("bigint").alias(
            "residual_tokens"
        ),
        (
            F.col("epochs") * F.col("total_tokens")
            + F.coalesce(F.col("residual_tokens"), F.lit(0))
        ).cast("bigint").alias("planned_tokens"),
    )


def materialize_epoch_mixture(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Execute an :func:`epoch_mixture_plan`: every document appears once
    per whole epoch (``epoch`` column 0..epochs-1) plus once more with
    ``epoch = epochs`` iff its salted hash selects it for the residual —
    the exact membership the plan's ``planned_tokens`` counted, so
    ``sum(n_tokens)`` over the output equals the plan column by
    construction (pinned in tests).

    Scale shape: the (tiny) plan broadcasts onto the corpus scan; whole
    epochs are an array-native ``explode(sequence(...))`` — no shuffle,
    output volume is exactly the planned token mass, which any
    materialization must write. Downstream packing should treat
    (id, epoch) as the row identity."""
    rated = plan.select(source_col, "epochs", "residual_rate")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("epoch:"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    joined = docs.join(F.broadcast(rated), source_col).withColumn(
        "__resid", h.cast("double") < F.col("residual_rate") * 1_000_000.0
    )
    reps = F.explode(
        F.sequence(
            F.lit(0),
            F.col("epochs") + F.when(F.col("__resid"), 1).otherwise(0) - 1,
        )
    )
    return (
        joined.filter((F.col("epochs") > 0) | F.col("__resid"))
        .select(*docs.columns, reps.alias("epoch"))
    )


# token_budget_selection: a straddling bucket below this row count takes
# the exact cut as a single-task window (a few-second task at worst);
# above it, the PARTIAL region re-buckets instead. Tests set it to 0 to
# force the refinement path on small fixtures.
_BUDGET_RECURSE_MIN = 2_000_000


def token_budget_selection(
    docs: DataFrame,
    budget_tokens: int,
    score_col: str,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 256,
    recurse_min: int = _BUDGET_RECURSE_MIN,
    _diag: dict | None = None,
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: order the
    corpus by ``score_col`` DESC (deterministic md5 tiebreak on the id)
    and keep the longest prefix whose cumulative token mass stays within
    ``budget_tokens`` — the "best N tokens" knapsack every pretraining
    run starts from once a token budget is fixed (DeepMind's Chinchilla
    framing: the budget is the given; which documents fill it is this
    operator's decision).

    Semantics (exactly the SQL twin): a document is selected iff its
    inclusive running token sum over (score DESC, tiebreak ASC) is
    <= budget; documents with a NULL score or a NULL/negative token
    mass are unrankable and excluded. Output one row per SELECTED
    document:
    (id, score, n_tokens, sel_rank, cum_tokens), sel_rank the 1-based
    global rank in selection order, cum_tokens the inclusive prefix sum.

    Scale shape — the naive expression of this is a GLOBAL
    ``sum() OVER (ORDER BY score DESC)`` window, which Spark executes in
    a SINGLE partition: the whole corpus funnels through one task, the
    100 TB scale-killer. This implementation is the classic two-phase
    distributed prefix sum instead:

    1. bucket each doc by a monotone transform of its score into
       ``n_buckets`` range buckets (one tiny min/max aggregate fixes the
       range; monotone => bucket order agrees with score order);
    2. ONE hash aggregate to per-bucket (token mass, doc count) —
       <= n_buckets rows collected to the driver;
    3. driver-side prefix over the sorted bucket list classifies every
       bucket FULL / PARTIAL / EXCLUDED and computes its token/rank
       offsets (a broadcast-sized table by construction);
    4. EXCLUDED buckets are filtered out BEFORE any shuffle (the
       rejected mass never moves); survivors run the running sum as a
       window partitioned BY BUCKET — parallel across buckets, and only
       the single PARTIAL bucket's rows actually need the in-bucket
       boundary cut.

    Skew resistance: one range pass is enough when scores vary smoothly,
    but real quality scores are often DISCRETE (a 0-4 classifier grade),
    which collapses whole grades into single giant buckets — both the
    straddling PARTIAL bucket and every WHOLLY-SELECTED grade's FULL
    bucket. Refinement is therefore a WORKLIST (closing the r13 review's
    known limit): ANY classified bucket, FULL or PARTIAL, whose row
    count exceeds ``recurse_min`` is pushed back through the same
    refinement with its token/rank offsets — by finer score ranges while
    the region still spans distinct scores, and by the md5 TIEBREAK
    PREFIX once the region is a single tied score (within a tie the
    selection order IS tiebreak order, so the prefix map is monotone
    there and uniform by construction, which guarantees a balanced
    split). FULL regions need no budget test — their children are all
    FULL by inheritance, so refining them is pure offset arithmetic and
    output bytes are unchanged by construction. Each worklist item costs
    ONE tiny aggregate (the root adds a min/max pass; children inherit
    their score bounds from the parent's bucket stats), the depth cap is
    ``max_levels``, and a bucket at or under ``recurse_min`` rows (or a
    single row, which no split can shrink) is emitted directly — with
    smooth scores level 0 emits everything, giving the one-aggregate
    one-window plan; a 5-grade 100 TB corpus costs ~|live grades| extra
    aggregates and no window partition ever exceeds
    max(recurse_min, corpus/4096^max_levels). All cumulative arithmetic
    is exact bigint; bucketing only PARTITIONS the work and cannot move
    a document across the selection boundary.
    """
    from functools import reduce as _reduce

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tiebreak = F.md5(F.concat(F.lit("tbs:"), F.col(id_col).cast("string")))
    # NULL score = unrankable = never selected (the SQL twin filters the
    # same way); keeping NULLs would poison the bucket map. NULL or
    # NEGATIVE token mass is likewise unrankable: a NULL mass poisons
    # every downstream sum, and a negative mass breaks the classifier's
    # monotone-prefix assumption (once tok_off passes the budget a bucket
    # is EXCLUDED), silently diverging from the documented inclusive-
    # prefix semantics (r13 review finding). Real masses are counts;
    # negative ones are upstream bugs (e.g. size(NULL) = -1 under legacy
    # sizeOfNull) and get the same exclusion rule, not garbage output.
    per = docs.select(
        id_col,
        F.col(score_col).cast("double").alias("score"),
        F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        tiebreak.alias("tiebreak"),
    ).filter(
        F.col("score").isNotNull()
        & F.col("n_tokens").isNotNull()
        & (F.col("n_tokens") >= 0)
    )
    spark = docs.sparkSession
    order = [F.col("score").desc(), F.col("tiebreak").asc()]
    out_frames = []
    max_levels = 3

    def _emit(frame, offsets_rows, bexpr):
        """Rank/cumsum a classified region slice: window PER BUCKET,
        EXCLUDED buckets dropped by the inner join before any shuffle,
        the PARTIAL bucket (if present in the rows) budget-filtered."""
        off = spark.createDataFrame(
            offsets_rows, "bucket long, tok_off long, cnt_off long, cls string"
        )
        w = Window.partitionBy("bucket").orderBy(*order)
        return (
            frame.withColumn("bucket", bexpr)
            .join(F.broadcast(off), "bucket")
            .select(
                id_col,
                "score",
                "n_tokens",
                "cls",
                (F.col("cnt_off") + F.row_number().over(w)).alias("sel_rank"),
                (
                    F.col("tok_off")
                    + F.sum("n_tokens").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    )
                ).alias("cum_tokens"),
            )
            .filter(
                (F.col("cls") == "FULL")
                | (F.col("cum_tokens") <= budget_tokens)
            )
            .drop("cls")
        )

    def _refine(lo, hi, tb_pos):
        """(bucket expr, child tiebreak pos, refinable) for a region with
        known score bounds. Bucket ASC == selection order everywhere."""
        span = hi - lo
        if span > 0 and span != float("inf") and span == span:
            # higher score -> lower bucket; monotone float map, the
            # exact cut comes later
            return (
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.lit(hi) - F.col("score")) / F.lit(span) * n_buckets
                    ),
                ).cast("long"),
                tb_pos,
                True,
            )
        if lo == hi and tb_pos + 2 <= 32:
            # single tied score: selection order within the region is
            # tiebreak ASC, so a hex-prefix map is monotone AND uniform
            return (
                F.conv(
                    F.substring(F.col("tiebreak"), tb_pos, 3), 16, 10
                ).cast("long"),
                tb_pos + 3,
                True,
            )
        # unrefinable: ±inf/NaN span, or md5 tiebreak hex exhausted
        return F.lit(0).cast("long"), tb_pos, False

    # WORKLIST of regions to classify (FIFO; closes the r13 known limit:
    # FULL buckets refine too, so no discrete grade ever funnels through
    # one window task). Each item:
    #   (frame, tok_off, cnt_off, tb_pos, level, needs_cut, bounds)
    # needs_cut=False marks a region already known WHOLLY selected (a
    # FULL bucket): its children skip the budget test and inherit FULL.
    # bounds=(lo, hi) and cnt come from the parent's bucket stats; None
    # only for the root, which pays the one extra min/max aggregate.
    # _diag (test/probe seam): when a dict is passed, records
    # max_window_rows (largest emitted window partition — the skew claim
    # under test) and items (worklist passes = extra tiny aggregates).
    if _diag is not None:
        _diag.update(max_window_rows=0, items=0)
    work = [(per, 0, 0, 1, 0, True, None, None)]
    while work:
        region, tok_off, cnt_off, tb_pos, level, needs_cut, bounds, rcnt = work.pop(0)
        if _diag is not None:
            _diag["items"] += 1
        if bounds is None:
            lo, hi = region.agg(F.min("score"), F.max("score")).first()
            if lo is None:  # empty corpus: nothing to classify
                continue
        else:
            lo, hi = bounds
        refinable = level < max_levels
        if refinable:
            bexpr, child_tb, refinable = _refine(lo, hi, tb_pos)
        if not refinable:
            # depth cap or unrefinable span: the remainder takes a single
            # serial window — by construction a 1/n_buckets^k (or
            # 1/4096^k) sliver of the corpus unless the score
            # distribution is pathological. A FULL remainder needs no
            # budget cut, only its offsets.
            cls = "PARTIAL" if needs_cut else "FULL"
            if _diag is not None and rcnt is not None:
                _diag["max_window_rows"] = max(_diag["max_window_rows"], rcnt)
            out_frames.append(
                _emit(region, [(0, tok_off, cnt_off, cls)], F.lit(0).cast("long"))
            )
            continue
        # ONE aggregate per item: per-bucket mass/count plus the score
        # bounds the children inherit (saves their min/max pass).
        bstats = {
            int(r["bucket"]): (int(r["toks"]), int(r["cnt"]), r["lo"], r["hi"])
            for r in region.groupBy(bexpr.alias("bucket"))
            .agg(
                F.sum("n_tokens").alias("toks"),
                F.count(F.lit(1)).alias("cnt"),
                F.min("score").alias("lo"),
                F.max("score").alias("hi"),
            )
            .collect()
        }
        # Driver prefix pass in selection (ascending-bucket) order: a
        # bucket is FULL when even its last doc fits, EXCLUDED only once
        # the offset PASSES the budget (at tok_off == budget a
        # zero-token doc at the bucket front still satisfies the
        # inclusive rule cum <= budget — the r14 randomized-reference
        # test caught the strict `<` dropping it; the window filter
        # keeps the classification exact either way). An oversized
        # survivor (FULL or PARTIAL) goes back on the worklist; the
        # rest emit HERE in one batched per-bucket-window frame — the
        # exact plan a smooth score distribution gets at level 0 (one
        # aggregate, one windowed emit).
        emit_rows = []
        for b in sorted(bstats):
            toks, cnt, b_lo, b_hi = bstats[b]
            if not needs_cut or tok_off + toks <= budget_tokens:
                cls = "FULL"
            elif tok_off <= budget_tokens:
                cls = "PARTIAL"
            else:
                cls = None  # EXCLUDED: never joins, never shuffles
            if cls is not None:
                if cnt > recurse_min and cnt > 1:
                    work.append(
                        (
                            region.filter(bexpr == b),
                            tok_off,
                            cnt_off,
                            child_tb,
                            level + 1,
                            cls == "PARTIAL",
                            (b_lo, b_hi),
                            cnt,
                        )
                    )
                else:
                    if _diag is not None:
                        _diag["max_window_rows"] = max(
                            _diag["max_window_rows"], cnt
                        )
                    emit_rows.append((b, tok_off, cnt_off, cls))
            tok_off += toks
            cnt_off += cnt
        if emit_rows:
            # classification is a contiguous ascending run (FULLs, at
            # most one PARTIAL, then EXCLUDED), so a range predicate
            # pre-filters the survivors; worklisted buckets inside the
            # range are dropped by _emit's broadcast join before any
            # shuffle.
            out_frames.append(
                _emit(
                    region.filter(bexpr <= emit_rows[-1][0]), emit_rows, bexpr
                )
            )
    result = (
        _reduce(DataFrame.unionByName, out_frames)
        if out_frames
        else per.select(
            id_col,
            "score",
            "n_tokens",
            F.lit(0).cast("bigint").alias("sel_rank"),
            F.lit(0).cast("bigint").alias("cum_tokens"),
        ).limit(0)
    )
    return result.select(id_col, "score", "n_tokens", "sel_rank", "cum_tokens")


def _refuse_sentinel_and_coverage(rows, bmap: dict) -> None:
    """Shared by stratified_budget_selection's single-pass level-0
    aggregate and its batched wrapper's global pre-check (r15 review
    finding: the raises lived twice): the NULL-sentinel collision raise
    and the explicit-coverage raise — ONE implementation, so a
    semantics fix cannot fork the two paths. ``rows`` carry
    (__src, any_null, all_null) from either aggregate."""
    for r in rows:
        if r["__src"] == "(null)" and r["any_null"] == 1 and r["all_null"] == 0:
            raise ValueError(
                "source collision on the NULL sentinel: the corpus carries "
                "BOTH NULL sources and a source literally named '(null)' — "
                "one budget cannot name two populations; rename the literal "
                "source or fill the NULLs upstream"
            )
    missing = sorted({r["__src"] for r in rows} - set(bmap))
    if missing:
        raise ValueError(
            f"corpus sources missing from budgets: {missing} — name every "
            "source explicitly (a silent zero-budget would hide typos; "
            "NULL sources surface as '(null)')"
        )


def stratified_budget_selection(
    docs: DataFrame,
    budgets: dict,
    score_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 256,
    recurse_min: int = _BUDGET_RECURSE_MIN,
    source_batch: int | None = None,
    _diag: dict | None = None,
) -> DataFrame:
    """STRATIFIED token-budget selection (r14): the per-source constrained
    form of :func:`token_budget_selection` — every source gets its OWN
    token budget and its own quality-ranked inclusive-prefix cut
    (score DESC, md5 tiebreak ASC, prefix mass <= budgets[source]).
    This is the selection stage of a mixture-aware pipeline: the mixture
    planners (source_mixture_plan / epoch_mixture_plan) decide how many
    tokens each source contributes; this operator decides WHICH
    documents fill each source's allocation, by quality, exactly.

    ``budgets`` maps source value -> token budget (>= 0). Sources
    present in the corpus but missing from ``budgets`` raise (the
    epoch-mixture precedent: silent zero-budgets hide typos); budget
    sources absent from the corpus are fine. Output one row per
    selected document: (id_col, source_col, score, n_tokens, sel_rank,
    cum_tokens) with sel_rank/cum_tokens PER SOURCE.

    Scale shape — the naive plan is a window partitioned by source,
    i.e. ONE task per source holding that source's whole corpus slice
    (a 10-source 100 TB corpus = 10 TB single tasks). This runs the
    same two-phase distributed prefix sum as the global operator, with
    every source's refinement BATCHED per level: one
    (region, bucket) aggregate classifies ALL sources' buckets at once,
    the driver walks each source's ascending-bucket prefix against its
    own budget, EXCLUDED mass is dropped before any shuffle, survivors
    window per (region, bucket), and oversized buckets (FULL or
    PARTIAL — the worklist semantics) re-bucket next level by finer
    score ranges or the md5 tiebreak prefix. Job count scales with
    ``max_levels`` (<= 4 tiny aggregates), NEVER with the source count;
    driver state is bounded by |active regions| * n_buckets rows per
    level (measured: 256 sources / 512 oversized tied groups at 4M docs
    still = 2 aggregates, max window partition 10 rows — SCALE.md r14).
    All cumulative arithmetic is exact bigint; bucketing only
    partitions the work.

    DRIVER-STATE BOUND and its fix, now IMPLEMENTED (r15, the r14
    verdict's stretch #8): the per-level collect is <= |live regions| *
    n_buckets rows — at the default n_buckets=256 that is ~26M driver
    rows only past ~100k SOURCES, far beyond the dozens-to-hundreds a
    mixture plan names. ``source_batch=K`` converts the bound into a
    non-bound: the budget dict is processed in sorted chunks of K
    sources, each chunk running the identical machinery on its corpus
    slice, results unioned — per-source cuts are INDEPENDENT (no
    cross-source state anywhere in the cut), so batching cannot change
    a single output byte (pinned by an equality test at two batch
    sizes). Driver state drops to <= K * n_buckets rows per level. Cost:
    the global coverage/collision pre-check is one extra corpus
    aggregate, and each chunk re-scans the corpus behind a source-IN
    filter — ceil(|sources|/K) bounded passes, the price of bounded
    driver memory. On a ``partitionBy(source)`` layout the chunk filter
    partition-PRUNES — MEASURED, not claimed (r16,
    ``tools/curation_probe.py --stratified-pruning``, 512 sources / 1M
    docs / K=64): each chunk pass reads 0.1245-0.1254 of a full scan
    (ideal 1/8 = 0.125; the coalesce/cast null-sentinel wrapper does
    not defeat pruning — it references only the partition column), and
    outputs are byte-identical across layouts. So the batched mode's
    TOTAL scan bytes ~= one full pass (pre-check) + one full pass
    spread across the chunks, vs K full passes on an unpartitioned
    layout. Two operational caveats from the same probe: (a) file
    sizing is part of the layout contract — ``partitionBy`` without a
    prior ``repartition(source)`` wrote ~16k sliver files and
    small-file opens swamped the pruning win (53.7s vs 23.7s flat);
    sized, the layouts tie at probe scale where compute dominates, and
    the I/O term pruning removes is what grows with corpus size;
    (b) at probe scale the per-chunk job overhead is visible — batched
    is for when driver state, not wall, is the binding constraint.
    Default None = single pass, unchanged plan.

    DELIBERATELY a sibling of :func:`token_budget_selection`, not its
    replacement: the global op keeps a leaner plan (no per-region params
    join) and a different ``_diag`` contract, so the shared classifier
    logic lives twice by decision. The divergence risk is guarded
    MECHANICALLY, not by discipline:
    ``test_budget_selectors_randomized_reference`` compares the two
    selectors on single-source slices of every randomized scenario, so
    a boundary fix applied to one and not the other fails the suite
    (that very test caught the ``<`` -> ``<=`` boundary bug in both).
    """
    from functools import reduce as _reduce

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not isinstance(budgets, dict):
        raise ValueError("budgets must be a dict of source -> token budget")
    # sources ride through the plan as strings; normalize the budget keys
    # the same way so non-string source values keep working
    bmap = {}
    for s, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"budget for source {s!r} must be >= 0, got {b}")
        bmap[str(s)] = int(b)
    if source_batch is not None and source_batch < 1:
        raise ValueError(f"source_batch must be >= 1, got {source_batch}")
    if source_batch is not None and len(bmap) > source_batch:
        # batched mode (docstring DRIVER-STATE BOUND): the global
        # coverage + sentinel-collision checks must run over the WHOLE
        # corpus FIRST — a source missing from budgets would otherwise
        # fall outside every chunk's IN-filter and silently select
        # nothing, the exact typo-hiding the coverage rule refuses
        src_expr = F.coalesce(
            F.col(source_col).cast("string"), F.lit("(null)")
        )
        gstats = (
            docs.groupBy(src_expr.alias("__src"))
            .agg(
                F.max(F.col(source_col).isNull().cast("int")).alias("any_null"),
                F.min(F.col(source_col).isNull().cast("int")).alias("all_null"),
            )
            .collect()
        )
        _refuse_sentinel_and_coverage(gstats, bmap)
        keys = sorted(bmap)
        outs = []
        for i in range(0, len(keys), source_batch):
            chunk = keys[i : i + source_batch]
            cdiag: dict | None = {} if _diag is not None else None
            outs.append(
                stratified_budget_selection(
                    docs.filter(src_expr.isin(chunk)),
                    {s: bmap[s] for s in chunk},
                    score_col,
                    source_col=source_col,
                    id_col=id_col,
                    n_tokens_col=n_tokens_col,
                    n_buckets=n_buckets,
                    recurse_min=recurse_min,
                    _diag=cdiag,
                )
            )
            if _diag is not None and cdiag:
                _diag["max_window_rows"] = max(
                    _diag.get("max_window_rows", 0), cdiag["max_window_rows"]
                )
                _diag["levels"] = max(_diag.get("levels", 0), cdiag["levels"])
                _diag["regions"] = _diag.get("regions", 0) + cdiag["regions"]
        return _reduce(DataFrame.unionByName, outs)
    tiebreak = F.md5(F.concat(F.lit("tbs:"), F.col(id_col).cast("string")))
    # NULL sources coalesce to the explicit '(null)' group (same sentinel
    # and rationale as ngram_bucket_histogram: surfaced and nameable in
    # the budgets dict beats a None key that can never be named and that
    # broke the coverage error's sort — r14 review finding). A corpus
    # carrying BOTH real NULL sources AND a source literally named
    # '(null)' would merge the two under one budget silently — that
    # collision is REFUSED below (r14 verdict nit), detected for free on
    # the level-0 aggregate via the __wasnull flag; either population
    # alone keeps the legitimate '(null)'-budget path.
    per_raw = docs.select(
        F.coalesce(F.col(source_col).cast("string"), F.lit("(null)")).alias(
            "__src"
        ),
        F.col(source_col).isNull().alias("__wasnull"),
        id_col,
        F.col(score_col).cast("double").alias("score"),
        F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        tiebreak.alias("tiebreak"),
    )
    per = per_raw.filter(
        F.col("score").isNotNull()
        & F.col("n_tokens").isNotNull()
        & (F.col("n_tokens") >= 0)
    )
    spark = docs.sparkSession
    order = [F.col("score").desc(), F.col("tiebreak").asc()]
    max_levels = 3
    if _diag is not None:
        _diag.update(max_window_rows=0, levels=0, regions=0)

    def _emit(frame, offsets_rows, bexpr):
        """Batched rank/cumsum over every region slice emitted at this
        level: window per (region, bucket); EXCLUDED buckets never join;
        each PARTIAL bucket filters against ITS source's budget."""
        off = spark.createDataFrame(
            offsets_rows,
            "__rid long, bucket long, tok_off long, cnt_off long, "
            "cls string, budget long",
        )
        w = Window.partitionBy("__rid", "bucket").orderBy(*order)
        return (
            frame.withColumn("bucket", bexpr)
            .join(F.broadcast(off), ["__rid", "bucket"])
            .select(
                id_col,
                F.col("__src").alias(source_col),
                "score",
                "n_tokens",
                "cls",
                "budget",
                (F.col("cnt_off") + F.row_number().over(w)).alias("sel_rank"),
                (
                    F.col("tok_off")
                    + F.sum("n_tokens").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    )
                ).alias("cum_tokens"),
            )
            .filter(
                (F.col("cls") == "FULL")
                | (F.col("cum_tokens") <= F.col("budget"))
            )
            .drop("cls", "budget")
        )

    def _mode(lo, hi, tb_pos, level):
        """(mode, child_tb) — 'range' / 'tie' / 'serial', the per-region
        driver decision mirroring the global operator's _refine."""
        if level >= max_levels:
            return "serial", tb_pos
        span = hi - lo
        if span > 0 and span != float("inf") and span == span:
            return "range", tb_pos
        if lo == hi and tb_pos + 2 <= 32:
            return "tie", tb_pos + 3
        return "serial", tb_pos

    # level-0 bootstrap: one aggregate over the RAW projection gives each
    # source's bounds AND the coverage-check source list. Raw, not the
    # rankable-filtered frame (r14 review finding): a source whose rows
    # are ALL unrankable must still hit the coverage raise — it would
    # otherwise silently select nothing, the exact typo-hiding the check
    # exists to prevent. min/max skip NULL scores, and bounds from the
    # superset (rows later dropped for invalid mass) can only WIDEN the
    # range — the bucket map caps both ends, so wider bounds only
    # repartition work, never move a document across the cut.
    lvl0_rows = (
        per_raw.groupBy("__src")
        .agg(
            F.min("score").alias("lo"),
            F.max("score").alias("hi"),
            F.max(F.col("__wasnull").cast("int")).alias("any_null"),
            F.min(F.col("__wasnull").cast("int")).alias("all_null"),
        )
        .collect()
    )
    lvl0 = {r["__src"]: (r["lo"], r["hi"]) for r in lvl0_rows}
    _refuse_sentinel_and_coverage(lvl0_rows, bmap)
    # region table: rid -> driver state; rows bind to regions via a
    # broadcast-joined params frame (the join also attaches the columns
    # the NEXT bucket expression needs)
    regions = {}
    params_rows = []
    for i, (src, (lo, hi)) in enumerate(sorted(lvl0.items())):
        if lo is None:
            # covered by the budgets check above, but every row of this
            # source is unrankable: nothing to select, no region
            continue
        mode, child_tb = _mode(lo, hi, 1, 0)
        regions[i] = {
            "src": src,
            "budget": bmap[src],
            "tok_off": 0,
            "cnt_off": 0,
            "needs_cut": True,
            "mode": mode,
            "child_tb": child_tb,
            "cnt": None,
        }
        params_rows.append((src, i, mode, float(lo), float(hi), 1))
    frame = per.join(
        F.broadcast(
            spark.createDataFrame(
                params_rows,
                "__src string, __rid long, __mode string, __lo double, "
                "__hi double, __tb int",
            )
        ),
        "__src",
    )
    # max+1, not len(): a skipped all-unrankable source leaves a gap in
    # the enumerate-assigned rids
    next_rid = (max(regions) + 1) if regions else 0
    out_frames = []
    core = ["__src", id_col, "score", "n_tokens", "tiebreak"]

    for level in range(max_levels + 1):
        if not regions:
            break
        if _diag is not None:
            _diag["levels"] += 1
            _diag["regions"] += len(regions)
        span = F.col("__hi") - F.col("__lo")
        bexpr = (
            F.when(F.col("__mode") == "serial", F.lit(0))
            .when(
                F.col("__mode") == "tie",
                F.conv(F.col("tiebreak").substr(F.col("__tb"), F.lit(3)), 16, 10),
            )
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col("__hi") - F.col("score")) / span * n_buckets),
                )
            )
            .cast("long")
        )
        # ONE aggregate classifies every region's buckets at this level
        stats = {}
        for r in (
            frame.groupBy("__rid", bexpr.alias("bucket"))
            .agg(
                F.sum("n_tokens").alias("toks"),
                F.count(F.lit(1)).alias("cnt"),
                F.min("score").alias("lo"),
                F.max("score").alias("hi"),
            )
            .collect()
        ):
            stats.setdefault(int(r["__rid"]), {})[int(r["bucket"])] = (
                int(r["toks"]),
                int(r["cnt"]),
                r["lo"],
                r["hi"],
            )
        emit_rows, cont_rows, nxt_regions = [], [], {}
        for rid, st in sorted(regions.items()):
            bstats = stats.get(rid)
            if bstats is None:  # empty region (e.g. empty source slice)
                continue
            if st["mode"] == "serial":
                cls = "PARTIAL" if st["needs_cut"] else "FULL"
                if _diag is not None and st["cnt"] is not None:
                    _diag["max_window_rows"] = max(
                        _diag["max_window_rows"], st["cnt"]
                    )
                emit_rows.append(
                    (rid, 0, st["tok_off"], st["cnt_off"], cls, st["budget"])
                )
                continue
            tok_off, cnt_off = st["tok_off"], st["cnt_off"]
            for b in sorted(bstats):
                toks, cnt, b_lo, b_hi = bstats[b]
                if not st["needs_cut"] or tok_off + toks <= st["budget"]:
                    cls = "FULL"
                elif tok_off <= st["budget"]:
                    # `<=`, not `<`: at tok_off == budget a zero-token
                    # doc at the bucket front still satisfies the
                    # inclusive rule (see token_budget_selection)
                    cls = "PARTIAL"
                else:
                    cls = None  # EXCLUDED: never joins, never shuffles
                if cls is not None:
                    if cnt > recurse_min and cnt > 1 and level < max_levels:
                        mode, child_tb = _mode(b_lo, b_hi, st["child_tb"], level + 1)
                        nxt_regions[next_rid] = {
                            "src": st["src"],
                            "budget": st["budget"],
                            "tok_off": tok_off,
                            "cnt_off": cnt_off,
                            "needs_cut": cls == "PARTIAL",
                            "mode": mode,
                            "child_tb": child_tb,
                            "cnt": cnt,
                        }
                        cont_rows.append(
                            (
                                rid,
                                b,
                                next_rid,
                                mode,
                                float(b_lo),
                                float(b_hi),
                                st["child_tb"],
                            )
                        )
                        next_rid += 1
                    else:
                        if _diag is not None:
                            _diag["max_window_rows"] = max(
                                _diag["max_window_rows"], cnt
                            )
                        emit_rows.append(
                            (rid, b, tok_off, cnt_off, cls, st["budget"])
                        )
                tok_off += toks
                cnt_off += cnt
        if emit_rows:
            out_frames.append(_emit(frame, emit_rows, bexpr))
        if not cont_rows:
            break
        # rebind surviving rows to their next-level regions: the join
        # filters to continued (region, bucket) pairs AND attaches the
        # new params in one broadcast
        cont = spark.createDataFrame(
            cont_rows,
            "__rid long, bucket long, __nrid long, __nmode string, "
            "__nlo double, __nhi double, __ntb int",
        )
        frame = (
            frame.withColumn("bucket", bexpr)
            .select(*core, "__rid", "bucket")
            .join(F.broadcast(cont), ["__rid", "bucket"])
            .select(
                *core,
                F.col("__nrid").alias("__rid"),
                F.col("__nmode").alias("__mode"),
                F.col("__nlo").alias("__lo"),
                F.col("__nhi").alias("__hi"),
                F.col("__ntb").alias("__tb"),
            )
        )
        regions = nxt_regions
    result = (
        _reduce(DataFrame.unionByName, out_frames)
        if out_frames
        else per.select(
            id_col,
            F.col("__src").alias(source_col),
            "score",
            "n_tokens",
            F.lit(0).cast("bigint").alias("sel_rank"),
            F.lit(0).cast("bigint").alias("cum_tokens"),
        ).limit(0)
    )
    return result.select(
        id_col, source_col, "score", "n_tokens", "sel_rank", "cum_tokens"
    )


def curriculum_phase_selection(
    docs: DataFrame,
    phases,
    score_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 256,
    recurse_min: int = _BUDGET_RECURSE_MIN,
    source_batch: int | None = None,
) -> DataFrame:
    """Multi-PHASE curriculum selection (r15): the temporal half the
    selection family lacked. The mixture planners decide how much of
    each source; the budget selectors decide which documents; training
    curricula additionally decide WHEN — e.g. an annealing schedule that
    reserves the highest-quality tranche for the final phase while the
    bulk phase trains on the next-best mass (miniCPM/Llama-style
    anneal-to-quality, publicly described in their reports). This
    operator assigns each document to AT MOST ONE phase:

    ``phases`` is an ORDERED list of (phase_name, budgets_dict); phase
    k takes its per-source quality cut (:func:`stratified_budget_selection`,
    score DESC, md5 tiebreak, inclusive prefix per source) from the
    documents NOT taken by phases 1..k-1. List order IS priority order:
    the first phase skims the best documents. Map a training schedule
    onto it by priority, not wall-clock — for anneal-to-quality, list
    the (small) anneal phase FIRST so it gets the top tranche, then the
    bulk phase; replay in whatever temporal order the trainer wants.

    Output: one row per selected document —
    (id_col, source_col, score, n_tokens, sel_rank, cum_tokens, phase)
    with sel_rank/cum_tokens PER (phase, source). Exclusivity is
    structural (each phase selects from the prior phases' anti-join),
    so a document can never be double-counted across phases; a source a
    phase must skip is named with budget 0, never omitted (each phase
    inherits the stratified coverage raise — a typo'd dict fails loudly
    instead of silently starving a phase).

    Scale shape: P phases = P passes of the level-batched prefix-sum
    machinery, each over a corpus shrunk by everything earlier phases
    took (the anti-join is a shuffle-free broadcast when the taken set
    is small, else a standard semi-join shuffle); curricula name a
    handful of phases, so the pass count is a small constant, and
    within each pass all the single-pass bounds hold (jobs scale with
    refinement depth, never source count; ``source_batch`` composes
    unchanged). The Python loop is driver-side ORCHESTRATION of a
    bounded phase list, not a per-row loop.

    DSIR composes through the score column exactly as in
    :func:`dsir_select_budget_stratified`: score the corpus ONCE with
    the shuffle-free importance key (``_dsir_budget_scored``,
    key_micro cast to double — exact below the documented 2^53
    micro-nat bound) and run the phases over the scored frame — "the
    anneal phase gets the documents that look MOST like the target,
    the bulk phase the next tranche". One model, one scoring pass,
    phase-ordered cuts; pinned by
    ``test_curriculum_composes_with_dsir_scores`` (single phase
    degenerates to ``dsir_select_budget_stratified`` bit-for-bit)."""
    from functools import reduce as _reduce

    if not phases:
        raise ValueError("phases must be a non-empty ordered list of (name, budgets)")
    names = [str(n) for n, _ in phases]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate phase names: {dupes}")
    for n, b in phases:
        if not isinstance(b, dict):
            raise ValueError(f"phase {n!r}: budgets must be a dict of source -> tokens")

    remaining = docs
    outs = []
    for name, budgets in phases:
        # pinned: phase k's selection is consumed by the output AND by
        # every later phase's anti-join, and the stratified machinery's
        # eager driver aggregates would otherwise re-run phases 1..k-1's
        # whole window plans once per later phase (quadratic in P);
        # tracked caches release with the session's usual hygiene
        sel = tracked_cache(
            stratified_budget_selection(
                remaining,
                budgets,
                score_col,
                source_col=source_col,
                id_col=id_col,
                n_tokens_col=n_tokens_col,
                n_buckets=n_buckets,
                recurse_min=recurse_min,
                source_batch=source_batch,
            )
        )
        outs.append(sel.withColumn("phase", F.lit(str(name))))
        remaining = remaining.join(
            sel.select(id_col), id_col, "left_anti"
        )
    return _reduce(DataFrame.unionByName, outs)


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023, NeurIPS,
# "Data Selection for Language Models via Importance Resampling") — select
# raw-corpus documents whose hashed-n-gram distribution matches a TARGET
# corpus (a high-quality seed set, a domain sample), the
# distribution-MATCHING complement to the quality-RANKING selectors above
# (quality_filter_decisions ranks by absolute signals; token_budget_selection
# cuts a ranked prefix; DSIR reweights toward "looks like the target").

_DSIR_BUCKETS = 4096
_DSIR_MICRO = 1_000_000
_DSIR_HEX = 12  # md5 prefix width for the bucket hash: 48 bits, exact in i64


def _dsir_buckets(text_col, n_buckets: int):
    """array<bigint> of hashed unigram+bigram feature buckets for ONE
    document — the DSIR bag-of-hashed-ngrams featurizer. Occurrences
    count (multinomial mass, not presence), order is irrelevant. Fully
    array-native: no explode, no shuffle, one narrow projection."""
    toks = _tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i.cast("int")),
                F.element_at(toks, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bigrams),
        lambda g: F.conv(F.substring(F.md5(g), 1, _DSIR_HEX), 16, 10).cast("bigint")
        % n_buckets,
    )


def _dsir_bucket_histogram(frame: DataFrame, text_col: str, n_buckets: int):
    """ONE explode + hash aggregate -> {bucket: occurrence count}. At most
    ``n_buckets`` rows reach the driver (bounded by construction — this is
    the whole model state, same class as the sketch family's collects)."""
    return {
        int(r["b"]): int(r["n"])
        for r in frame.filter(F.col(text_col).isNotNull())
        .select(F.explode(_dsir_buckets(F.col(text_col), n_buckets)).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _lit_bigint_array(values):
    """One FOLDABLE literal array<bigint> column. ``F.lit(list)`` expands
    to a CreateArray with len(values) py4j children (seconds of driver
    time at 4096 buckets); split(lit(csv)) is ONE py4j call whose children
    are all foldable, so ConstantFolding collapses it to a single Literal
    before codegen — executors see one shared constant, never a per-row
    array build."""
    return F.split(F.lit(",".join(str(int(v)) for v in values)), ",").cast(
        "array<bigint>"
    )


def dsir_log_ratio_table(
    corpus: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
):
    """Fit the two DSIR bucket models and return the per-bucket importance
    log-ratio table as a Python list of MICRO-NAT bigints (length
    ``n_buckets``): lam[b] = floor(1e6 * (ln p_target(b) - ln p_corpus(b)))
    with Laplace ``alpha`` smoothing on both multinomials.

    Fixed-point micro-nats make every DOWNSTREAM sum exact bigint
    arithmetic (order-independent, partitioning-invariant — the same trick
    as the graph family's integer micro-mass); floor (not round) so the
    Python table and a SQL twin agree independent of half-rounding
    convention. The table is the ENTIRE model: persist it and pass it back
    via ``log_ratio=`` to skip both fits on re-runs. At 100 TB fit the
    corpus side on a SAMPLE (pass ``corpus_model=corpus.sample(f)`` to the
    callers below) — the paper does exactly this; the model only needs
    bucket FREQUENCIES, not the full corpus."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if target is None:
        raise ValueError(
            "target is required to fit the DSIR models (or pass a "
            "precomputed log_ratio table to the caller instead)"
        )
    tb = _dsir_bucket_histogram(target, text_col, n_buckets)
    cb = _dsir_bucket_histogram(corpus, text_col, n_buckets)
    return _log_ratio_from_histograms(tb, cb, n_buckets, alpha)


def _log_ratio_from_histograms(
    tb: dict, cb: dict, n_buckets: int, alpha: float
) -> list:
    """The fit arithmetic from two {bucket: count} histograms — factored
    (r15) so the STREAMING corpus model (the standing NgramHistogramSink
    grid summed over sources) fits through the IDENTICAL code path as
    the batch fit; the math cannot fork between them."""
    import math

    t_total, c_total = sum(tb.values()), sum(cb.values())
    if t_total == 0:
        raise ValueError("target has no text rows: cannot fit the DSIR target model")
    if c_total == 0:
        raise ValueError("corpus has no text rows: cannot fit the DSIR corpus model")
    return [
        math.floor(
            _DSIR_MICRO
            * (
                math.log((tb.get(b, 0) + alpha) / (t_total + alpha * n_buckets))
                - math.log((cb.get(b, 0) + alpha) / (c_total + alpha * n_buckets))
            )
        )
        for b in range(n_buckets)
    ]


def dsir_multi_target_log_ratio_table(
    corpus: DataFrame,
    targets: dict,
    weights: dict,
    *,
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    corpus_model: DataFrame = None,
):
    """Weighted MULTI-target DSIR model (r13 verdict stretch #8): real
    curation balances several targets (code, math, reference prose), and
    the geometric mixture makes that a pure MODEL-side change — the
    combined table is the weighted sum of the per-target log-ratio
    tables:

        lam_mix[b] = floor( sum_t w_t * lam_t[b] )
                   = 1e6 * ( ln prod_t p_t(b)^{w_t}  -  ln p_corpus(b) )

    i.e. importance toward the weights-geometric mixture of the targets
    (a product-of-experts: a bucket scores high when EVERY up-weighted
    target likes it in proportion to its weight). The scoring pass is
    untouched: feed the returned table to any selector via
    ``log_ratio=``.

    Exactness: weights are normalized to MICRO integers summing to
    exactly 1e6 (largest-remainder rounding, deterministic name-ordered
    tiebreak), so the combination is pure bigint arithmetic —
    floordiv(sum_t w_micro_t * lam_t[b], 1e6) — reproducible bit-for-bit
    by a SQL twin, independent of float summation order. The corpus
    model is fitted ONCE and shared across all per-target tables (one
    bounded histogram per frame, same cost class as the single-target
    fit); ``corpus_model=`` samples it at scale exactly as before.

    ``targets``/``weights`` are name-keyed dicts over the same keys;
    weights must be > 0 (a zero-weight target is a caller error — drop
    the key instead)."""
    import math

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if not targets:
        raise ValueError("targets must name at least one target corpus")
    if set(targets) != set(weights):
        raise ValueError(
            f"targets/weights key mismatch: {sorted(set(targets) ^ set(weights))}"
        )
    for name, w in weights.items():
        if not (w > 0):
            raise ValueError(
                f"weight for target {name!r} must be > 0, got {w} "
                "(drop the key to exclude a target)"
            )
    # largest-remainder normalization to micro ints summing to 1e6
    total_w = float(sum(weights.values()))
    names = sorted(targets)
    raw = {n: weights[n] * _DSIR_MICRO / total_w for n in names}
    w_micro = {n: int(math.floor(raw[n])) for n in names}
    short = _DSIR_MICRO - sum(w_micro.values())
    for n in sorted(names, key=lambda n: (-(raw[n] - w_micro[n]), n))[:short]:
        w_micro[n] += 1

    cb = _dsir_bucket_histogram(
        corpus_model if corpus_model is not None else corpus, text_col, n_buckets
    )
    c_total = sum(cb.values())
    if c_total == 0:
        raise ValueError("corpus has no text rows: cannot fit the DSIR corpus model")
    lam = {}
    for name in names:
        tb = _dsir_bucket_histogram(targets[name], text_col, n_buckets)
        t_total = sum(tb.values())
        if t_total == 0:
            raise ValueError(
                f"target {name!r} has no text rows: cannot fit its DSIR model"
            )
        lam[name] = [
            math.floor(
                _DSIR_MICRO
                * (
                    math.log((tb.get(b, 0) + alpha) / (t_total + alpha * n_buckets))
                    - math.log((cb.get(b, 0) + alpha) / (c_total + alpha * n_buckets))
                )
            )
            for b in range(n_buckets)
        ]
    return [
        sum(w_micro[n] * lam[n][b] for n in names) // _DSIR_MICRO
        for b in range(n_buckets)
    ]


def dsir_importance_weights(
    corpus: DataFrame,
    target: DataFrame = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    log_ratio=None,
    corpus_model: DataFrame = None,
) -> DataFrame:
    """Per-document DSIR importance weight over ``corpus``:
    (id_col, n_grams, logw_micro) where logw_micro is the EXACT bigint sum
    of the micro-nat log ratio over the doc's hashed unigram+bigram
    occurrences — i.e. 1e6 * ln(p_target(doc)/p_corpus(doc)) under the two
    bag-of-hashed-ngrams multinomials. NULL-text docs are unrankable and
    excluded (the selector contract, same as token_budget_selection's
    NULL-score rule).

    Scale shape: the returned frame is scan -> ONE narrow projection —
    the log-ratio table rides along as a single folded array literal, the
    per-doc sum is array-native (F.aggregate), so the scoring pass is
    shuffle-FREE and embarrassingly parallel. Model fitting (when
    ``log_ratio`` is not supplied) is two bounded hash aggregates of at
    most ``n_buckets`` rows each; ``corpus_model`` lets the corpus side
    fit on a sample at scale."""
    if log_ratio is None:
        log_ratio = dsir_log_ratio_table(
            corpus_model if corpus_model is not None else corpus,
            target,
            text_col=text_col,
            n_buckets=n_buckets,
            alpha=alpha,
        )
    if len(log_ratio) != n_buckets:
        raise ValueError(
            f"log_ratio length {len(log_ratio)} != n_buckets {n_buckets}"
        )
    arr = _lit_bigint_array(log_ratio)
    return (
        corpus.filter(F.col(text_col).isNotNull())
        .select(id_col, _dsir_buckets(F.col(text_col), n_buckets).alias("bk"))
        .select(
            id_col,
            F.size("bk").cast("bigint").alias("n_grams"),
            F.aggregate(
                "bk",
                F.lit(0).cast("bigint"),
                lambda acc, b: acc + F.element_at(arr, (b + 1).cast("int")),
            ).alias("logw_micro"),
        )
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame = None,
    k: int = 10_000,
    *,
    seed: int = 0,
    sample: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    log_ratio=None,
    corpus_model: DataFrame = None,
) -> DataFrame:
    """DSIR selection: the top-``k`` corpus documents by Gumbel-perturbed
    importance weight — exactly sampling-without-replacement proportional
    to the importance weights (the Gumbel-top-k identity), which is the
    paper's resampling step. ``sample=False`` drops the noise: a pure
    deterministic top-k by weight (mode-seeking, less diverse — the
    documented trade-off).

    Output (id_col, n_grams, logw_micro, key_micro), key_micro =
    logw_micro + floor(1e6 * gumbel) with the Gumbel drawn from a
    seeded md5 uniform on the doc id — deterministic, partition-invariant,
    re-runnable. Scale shape: orderBy(...).limit(k) plans
    TakeOrderedAndProject (per-partition top-k then a k-row merge), never
    a global sort; ties at the boundary break on the id.

    Float honesty: the Gumbel transform is the one transcendental in the
    family (ln via StrictMath on the JVM vs libm elsewhere); landing the
    FLOORED micro value on a 1-ulp disagreement boundary has probability
    ~1e-13 per doc — accepted and documented rather than engineered away.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    w = dsir_importance_weights(
        corpus,
        target,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
        log_ratio=log_ratio,
        corpus_model=corpus_model,
    )
    noise = _dsir_gumbel_micro(id_col, seed) if sample else F.lit(0).cast("bigint")
    return (
        w.select(
            id_col,
            "n_grams",
            "logw_micro",
            (F.col("logw_micro") + noise).alias("key_micro"),
        )
        .orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _dsir_gumbel_micro(id_col: str, seed: int):
    """Floored micro-nat Gumbel noise from a seeded md5 uniform on the doc
    id — deterministic, partition-invariant, SQL-twinnable. Shared by the
    k-mode and budget-mode selectors so the perturbed key cannot fork."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"dsir:{int(seed)}:"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13 + 2))
    return F.floor(-F.log(-F.log(u)) * _DSIR_MICRO).cast("bigint")


def _dsir_budget_scored(
    corpus: DataFrame,
    target: DataFrame,
    *,
    seed: int,
    sample: bool,
    id_col: str,
    text_col: str,
    n_tokens_col: str,
    n_buckets: int,
    alpha: float,
    log_ratio,
    corpus_model: DataFrame,
    extra_cols: tuple = (),
) -> DataFrame:
    """The budget-mode scoring pass shared by :func:`dsir_select_budget`
    and its stratified form: (id, *extra_cols, n_tokens, key_micro) in
    ONE narrow shuffle-free projection — the table rides as a folded
    literal, the per-doc sum is array-native, Gumbel noise optional."""
    if log_ratio is None:
        log_ratio = dsir_log_ratio_table(
            corpus_model if corpus_model is not None else corpus,
            target,
            text_col=text_col,
            n_buckets=n_buckets,
            alpha=alpha,
        )
    if len(log_ratio) != n_buckets:
        raise ValueError(
            f"log_ratio length {len(log_ratio)} != n_buckets {n_buckets}"
        )
    arr = _lit_bigint_array(log_ratio)
    ntok = (
        F.col(n_tokens_col).cast("bigint")
        if n_tokens_col is not None
        else F.size(_tokens(F.col(text_col))).cast("bigint")
    )
    noise = _dsir_gumbel_micro(id_col, seed) if sample else F.lit(0).cast("bigint")
    return (
        corpus.filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            *extra_cols,
            _dsir_buckets(F.col(text_col), n_buckets).alias("bk"),
            ntok.alias("n_tokens"),
        )
        .select(
            id_col,
            *extra_cols,
            "n_tokens",
            (
                F.aggregate(
                    "bk",
                    F.lit(0).cast("bigint"),
                    lambda acc, b: acc + F.element_at(arr, (b + 1).cast("int")),
                )
                + noise
            ).alias("key_micro"),
        )
    )


def dsir_select_budget(
    corpus: DataFrame,
    target: DataFrame = None,
    budget_tokens: int = 0,
    *,
    seed: int = 0,
    sample: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str = None,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    log_ratio=None,
    corpus_model: DataFrame = None,
    n_select_buckets: int = 256,
) -> DataFrame:
    """Budget-mode DSIR: spend a TOKEN budget along the
    importance-resampled ranking instead of taking a fixed document
    count — the composition every pretraining run actually wants once
    the Chinchilla budget is fixed ("the best N tokens that look like
    the target"), built from the two primitives this module already
    gates: :func:`dsir_select`'s Gumbel-perturbed key orders the corpus,
    :func:`token_budget_selection`'s distributed two-phase prefix sum
    cuts it at the budget (no single-partition global window; the
    rejected mass never shuffles).

    ``n_tokens_col`` names a precomputed token-count column; left None,
    whitespace tokens are counted in the SAME narrow projection that
    scores the document (no extra pass). Output matches
    token_budget_selection's contract with the key exposed:
    (id_col, key_micro, n_tokens, sel_rank, cum_tokens) — selection
    order is (key DESC, md5 tiebreak), ranks are global, cum_tokens the
    inclusive running mass, every selected row's cum_tokens <= budget.

    EXACTNESS BOUND (documented, r13 review): the bigint ``key_micro``
    rides through token_budget_selection's double ``score`` column, so
    the documented exact-bigint ordering holds only for |key_micro| <
    2^53 micro-nats (~9e15). A doc's key is (sum of per-gram log ratios,
    each bounded by the table's clip) + Gumbel noise (~1e7), so reaching
    2^53 takes on the order of 1e9 grams in ONE document — unreachable
    for chunked corpora (doc_chunk_plan caps far below), reachable only
    by a pathological unchunked blob, and even then the failure mode is
    two near-tied keys comparing equal and falling back to the
    deterministic md5 tiebreak, never a wrong mass sum (n_tokens stays
    bigint throughout). Pinned by
    tests/test_textops_pipeline.py::test_dsir_budget_key_exactness_bound.
    """
    scored = _dsir_budget_scored(
        corpus,
        target,
        seed=seed,
        sample=sample,
        id_col=id_col,
        text_col=text_col,
        n_tokens_col=n_tokens_col,
        n_buckets=n_buckets,
        alpha=alpha,
        log_ratio=log_ratio,
        corpus_model=corpus_model,
    )
    sel = token_budget_selection(
        scored.select(
            id_col,
            # exact for |key_micro| < 2^53 (see the docstring's EXACTNESS
            # BOUND — ~1e9 grams/doc to reach; beyond it near-ties merge
            # and the md5 tiebreak decides, mass arithmetic unaffected)
            F.col("key_micro").cast("double").alias("score"),
            "n_tokens",
        ),
        budget_tokens,
        "score",
        id_col=id_col,
        n_buckets=n_select_buckets,
    )
    return sel.select(
        id_col,
        F.col("score").cast("bigint").alias("key_micro"),
        "n_tokens",
        "sel_rank",
        "cum_tokens",
    )


def dsir_select_budget_stratified(
    corpus: DataFrame,
    target: DataFrame = None,
    budgets: dict = None,
    *,
    seed: int = 0,
    sample: bool = True,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str = None,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    log_ratio=None,
    corpus_model: DataFrame = None,
    n_select_buckets: int = 256,
) -> DataFrame:
    """Per-source budget DSIR (r14): the mixture-aware corner of the
    selection matrix — {global, per-source} x {quality, DSIR}. Each
    source spends ITS OWN token budget along the shared DSIR importance
    ranking ("code gets 40B tokens, prose 10B, both filled with the
    documents that look most like the target"), composing the two
    already-gated primitives: :func:`_dsir_budget_scored`'s shuffle-free
    Gumbel-perturbed key and :func:`stratified_budget_selection`'s
    level-batched per-source prefix sums. One model, one scoring pass,
    per-source cuts — never a per-source window task.

    ``budgets`` maps source -> token budget (every corpus source must be
    named — the stratified coverage rule). Output
    (id_col, source_col, key_micro, n_tokens, sel_rank, cum_tokens),
    ranks and running mass PER SOURCE. The multi-target table composes
    here unchanged via ``log_ratio=``
    (:func:`dsir_multi_target_log_ratio_table`). Same documented 2^53
    micro-nat exactness bound as :func:`dsir_select_budget`."""
    if budgets is None:
        raise ValueError(
            "budgets is required: source -> token budget for every "
            "corpus source"
        )
    scored = _dsir_budget_scored(
        corpus,
        target,
        seed=seed,
        sample=sample,
        id_col=id_col,
        text_col=text_col,
        n_tokens_col=n_tokens_col,
        n_buckets=n_buckets,
        alpha=alpha,
        log_ratio=log_ratio,
        corpus_model=corpus_model,
        extra_cols=(source_col,),
    )
    sel = stratified_budget_selection(
        scored.select(
            id_col,
            source_col,
            # exact for |key_micro| < 2^53 (dsir_select_budget's
            # documented EXACTNESS BOUND applies verbatim)
            F.col("key_micro").cast("double").alias("score"),
            "n_tokens",
        ),
        budgets,
        "score",
        source_col=source_col,
        id_col=id_col,
        n_buckets=n_select_buckets,
    )
    return sel.select(
        id_col,
        source_col,
        F.col("score").cast("bigint").alias("key_micro"),
        "n_tokens",
        "sel_rank",
        "cum_tokens",
    )


def source_divergence_audit(
    corpus: DataFrame,
    target: DataFrame = None,
    *,
    source_col: str = "source",
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-source distribution drift vs a TARGET corpus: the
    Jensen-Shannon divergence (micro-nats, exact bigint) between each
    source's hashed unigram+bigram multinomial and the target's — the
    AUDIT complement to the mixture family (source_mixture_plan /
    epoch_mixture_plan decide how much of each source to take; DSIR
    selects documents; this reports WHICH sources drifted and how far,
    the signal that tells an operator where reweighting will bite).

    Output one row per source: (source_col, n_grams, jsd_micro) with
    jsd_micro = sum over buckets of floor(1e6 * per-bucket JS term)
    under Laplace ``alpha`` smoothing of both multinomials. Each bucket
    term is non-negative (per-bucket f-divergence), the total is
    bounded by ln 2 * 1e6 ~ 693147, and identical distributions score
    near 0 — a calibrated, comparable drift scale across sources.

    Scale shape: ONE explode + hash aggregate over the corpus to
    (source, bucket) occurrence counts — bounded by |sources| *
    n_buckets rows, the model space, never the corpus — and the target
    model rides in as a folded literal array (the DSIR trick), so the
    divergence arithmetic runs on the small grid: per-source totals,
    explode(sequence) to the full bucket grid (absent buckets still
    carry smoothing mass), one aggregate back to |sources| rows. After
    the first aggregate nothing scales with corpus size. The histogram
    is a COUNT MONOID, so the streaming twin
    (streaming/sketch.py::NgramHistogramSink) maintains the same
    (source, bucket) table incrementally and its drift report calls the
    same :func:`jsd_from_histogram` — the math cannot fork."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if target is None:
        raise ValueError("target is required to fit the drift reference model")
    tb = _dsir_bucket_histogram(target, text_col, n_buckets)
    pc = ngram_bucket_histogram(
        corpus, source_col=source_col, text_col=text_col, n_buckets=n_buckets
    )
    return jsd_from_histogram(
        pc, tb, source_col=source_col, n_buckets=n_buckets, alpha=alpha
    )


def ngram_bucket_histogram(
    corpus: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    n_buckets: int = _DSIR_BUCKETS,
) -> DataFrame:
    """ONE corpus pass -> the bounded (source_col, b, c) hashed-n-gram
    occurrence histogram (<= |sources| * n_buckets rows). A count
    monoid: histograms of disjoint corpus slices merge by summing c —
    the property the streaming drift monitor builds on.

    NULL-source rows are coalesced to the explicit sentinel ``(null)``
    (r13 review finding: a bare NULL group would flow through
    jsd_from_histogram and the divergence report as source=null —
    surfaced and nameable beats silent). Lazy-op tradeoff, documented
    rather than validated: a real source literally named ``(null)``
    would merge with that group; rename it upstream if you have one."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return (
        corpus.filter(F.col(text_col).isNotNull())
        .select(
            F.coalesce(
                F.col(source_col).cast("string"), F.lit("(null)")
            ).alias(source_col),
            F.explode(_dsir_buckets(F.col(text_col), n_buckets)).alias("b"),
        )
        .groupBy(source_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def jsd_from_histogram(
    pc: DataFrame,
    target_hist: dict,
    *,
    source_col: str = "source",
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-source JSD (micro-nats, exact bigint) from a (source, b, c)
    histogram frame and a {bucket: count} target histogram — the shared
    arithmetic core of :func:`source_divergence_audit` and the streaming
    drift monitor. Bounded-grid work only; nothing here scales with the
    corpus that produced the histogram."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t_total = sum(target_hist.values())
    if t_total == 0:
        raise ValueError("target has no text rows: cannot fit the target model")
    tarr = _lit_bigint_array([target_hist.get(b, 0) for b in range(n_buckets)])
    totals = pc.groupBy(source_col).agg(F.sum("c").alias("t_s"))
    grid = totals.select(
        source_col,
        "t_s",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("b"),
    ).join(pc, [source_col, "b"], "left")
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha)) / (
        F.col("t_s") + F.lit(alpha * n_buckets)
    )
    q = (F.element_at(tarr, (F.col("b") + 1).cast("int")) + F.lit(alpha)) / (
        F.lit(float(t_total)) + F.lit(alpha * n_buckets)
    )
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * (p * F.log(p / m) + q * F.log(q / m))
    return (
        grid.select(
            source_col,
            F.col("t_s").alias("n_grams"),
            F.floor(F.lit(float(_DSIR_MICRO)) * term).cast("bigint").alias(
                "term_micro"
            ),
        )
        .groupBy(source_col, "n_grams")
        .agg(F.sum("term_micro").alias("jsd_micro"))
    )


def q_doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring (the Gopher/MassiveText quality
    signal): fraction of NON-distinct word 3-grams inside each doc. Highly
    repetitive machine-generated text scores near 1; natural prose near 0.

    Entirely array-native per row — gram construction, distinct, and the
    ratio all run inside one narrow projection, so the operator is
    shuffle-FREE and embarrassingly parallel at 100 TB (contrast with the
    cross-doc dedup family, which must join). The ratio is one IEEE
    division of exact ints."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    tokenized = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
                F.element_at(toks, (i + 3).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = tokenized.select("doc_id", grams.alias("g"))
    n_grams = F.size("g")
    n_distinct = F.size(F.array_distinct("g"))
    return g.select(
        "doc_id",
        n_grams.cast("int").alias("n_grams"),
        n_distinct.cast("int").alias("n_distinct_grams"),
        F.when(
            n_grams > 0,
            (n_grams - n_distinct).cast("double") / n_grams,
        ).alias("dup_gram_ratio"),
    )


_PACK_BUDGET = 2048


def q_sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch construction: pack documents into fixed token-budget
    sequences (budget 2048) per source, in deterministic doc_id order —
    the greedy-prefix packing a sequence-building pipeline runs before
    tokenizer concatenation. A doc belongs to the sequence its starting
    offset falls in: seq_id = (running_total_before_doc) div budget.

    Plan: one shuffle on source for the ordered running sum (window
    cumsum), then a narrow re-aggregation on (source, seq_id) — the window
    and the groupBy share the source partitioning. At 100 TB the order-by
    key inside each source partition is a monotone id, so the window is
    one sort per partition, not a global sort. All arithmetic is exact
    integer; fill_ratio is one IEEE division."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    per_doc = d.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = per_doc.select(
        "source",
        "n_tokens",
        F.floor(offset.cast("double") / _PACK_BUDGET).cast("bigint").alias("seq_id"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        (F.sum("n_tokens").cast("double") / _PACK_BUDGET).alias("fill_ratio"),
    )


def q_corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile (Zipf diagnostics for a training corpus):
    total token instances, distinct terms, hapax legomena (terms occurring
    exactly once — the long tail a tokenizer's vocab cut drops), and the
    dominant term with its corpus share.

    Scale shape: explode -> one groupBy on the term (corpus-sized key set,
    map-side partials), then two SCALAR aggregations over the vocab frame.
    The top term is found distributed-safe: max count first (scalar), then
    min(token) among terms at that count — no global row_number window,
    which would single-partition the corpus-sized vocab at 100 TB. Counts
    are exact ints; the share is one IEEE division."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(F.explode(_tokens(F.col("text"))).alias("token"))
    vocab = tracked_cache(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    agg = vocab.agg(
        F.sum("n").alias("n_token_instances"),
        F.count(F.lit(1)).alias("n_distinct_terms"),
        F.count(F.when(F.col("n") == 1, 1)).alias("n_hapax"),
        F.max("n").alias("_mx"),
    )
    top = (
        vocab.join(F.broadcast(agg.select("_mx")), vocab["n"] == F.col("_mx"))
        .agg(F.min("token").alias("top_term"))
    )
    return agg.crossJoin(F.broadcast(top)).select(
        "n_token_instances",
        "n_distinct_terms",
        "n_hapax",
        "top_term",
        F.col("_mx").alias("top_term_count"),
        (F.col("_mx").cast("double") / F.col("n_token_instances")).alias(
            "top_term_share"
        ),
    )


def q_source_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) corpus composition — the mixture table a
    pretraining run reports next to its sampling weights: doc counts, token
    mass, and each language's share WITHIN its source (window sum over the
    source partition). One groupBy plus one tiny window over the grouped
    frame (|sources x langs| rows); integer-exact counts, one IEEE division
    for the share."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).alias("total_tokens"),
    )
    w = Window.partitionBy("source")
    return per.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias(
            "share_of_source"
        ),
    )


_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def q_doc_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the sequence-prep step that slices each
    document into fixed token windows (size 32, stride 24, i.e. 8-token
    overlap) before tokenization, the way a long-context training pipeline
    chunks documents that exceed the model's window.

    Chunk starts are the stride multiples below n_tokens, so every token is
    covered and consecutive chunks overlap by size-stride. Entirely
    array-native per row (sequence -> explode -> slice): after the scan
    redistribution there is NO shuffle — embarrassingly parallel at 100 TB.
    The chunk content is carried as md5(joined tokens) so the hash compare
    pins the exact slice boundaries, not just the counts."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = _tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    starts = F.sequence(
        F.lit(0), ((F.col("n_tokens") - 1) / _CHUNK_STRIDE).cast("int")
    )
    c = t.select("doc_id", "n_tokens", "toks", F.explode(starts).alias("chunk_idx"))
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    clen = F.least(F.lit(_CHUNK_SIZE), F.col("n_tokens") - start)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_token"),
        clen.cast("int").alias("chunk_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), start + 1, clen)).cast("binary")
        ).alias("chunk_hash"),
    )


_BOILERPLATE_MIN_DF = 5


def q_boilerplate_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (CCNet-style): word-3-grams that occur in >=5
    DISTINCT documents are corpus boilerplate (headers, navigation chrome,
    license blurbs); each document is scored by the fraction of its distinct
    grams that are boilerplate — the signal used to drop template-heavy docs.

    Scale shape: the shingle frame is per-doc DISTINCT (bounds hot keys),
    document frequency is a hash aggregate on the gram (map-side partials —
    deliberately NOT a count-over-window, whose unsplittable hot-gram
    partition would OOM at 100 TB), the flag join shuffles on the gram key
    (AQE skew-split applies; the filtered common set is usually small enough
    to broadcast), and ONE doc_id aggregation computes both counts. Ratio is
    one IEEE division of exact ints."""
    d = load(spark, sf_dir, "documents")
    sh = tracked_cache(_shingles(d))
    common = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _BOILERPLATE_MIN_DF)
        .select("shingle", F.lit(1).alias("is_common"))
    )
    per_doc = (
        sh.join(common, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.count("is_common").alias("n_boilerplate_grams"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct_grams", F.lit(0)).cast("int").alias(
                "n_distinct_grams"
            ),
            F.coalesce("n_boilerplate_grams", F.lit(0)).cast("int").alias(
                "n_boilerplate_grams"
            ),
            F.when(
                F.col("n_distinct_grams").isNotNull(),
                F.coalesce("n_boilerplate_grams", F.lit(0)).cast("double")
                / F.col("n_distinct_grams"),
            ).alias("boilerplate_ratio"),
        )
    )


_PREFIX_K = 12


def q_prefix_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template detection by shared document prefix: documents whose first
    12 tokens are identical (md5 of the joined prefix) are instances of one
    generation template — the cheap O(n) screen a pipeline runs before the
    expensive near-dup pass, and the standard way to catch SEO/boilerplate
    farms that vary only the tail.

    One narrow projection (prefix hash) + one groupBy on the 16-byte hash;
    dedup-on-digest, never on full text — the same 100 TB posture as the
    exact-dedup profile. Emits only multi-doc clusters with their canonical
    (min) member."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = _tokens(F.col("text"))
    pref = d.select(
        "doc_id",
        F.when(
            F.size(toks) >= _PREFIX_K,
            F.md5(F.concat_ws(" ", F.slice(toks, 1, _PREFIX_K)).cast("binary")),
        ).alias("prefix_hash"),
    ).filter(F.col("prefix_hash").isNotNull())
    return (
        pref.groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def q_quality_filter_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality filter (the Gopher/RedPajama rule stack as ONE
    decision table): per document, the four signals a pretraining filter
    gates on — token count, mean token length, within-doc 3-gram repetition,
    stopword density (applied to English only) — each threshold as a rule,
    plus the final keep flag and the FIRST failing rule as drop_reason.

    This is the decision layer over the signal queries (doc_token_stats /
    doc_quality_scores / doc_repetition_scores): what ships to the corpus is
    keep=1; what the curator audits is the drop_reason histogram. One narrow
    projection over the scan — all four signals are array/string expressions
    on the row, so the operator is shuffle-free and embarrassingly parallel
    at 100 TB. Ratios are single IEEE divisions of exact ints; threshold
    comparisons on those doubles are engine-portable because both engines
    compute bit-identical operands."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toksc = _tokens(F.col("text"))
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    stop_hits = sum(
        _occurrences(padded, w) for w in (" the ", " and ", " of ", " to ")
    ).cast("int")
    chars_no_ws = F.length(F.regexp_replace(F.col("text"), _WS, ""))
    base = d.select(
        "doc_id",
        "lang",
        toksc.alias("toks"),
        F.size(toksc).alias("n_tokens"),
        stop_hits.alias("n_stop"),
        chars_no_ws.alias("n_chars_no_ws"),
    )
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
                F.element_at(toks, (i + 3).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = base.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stop",
        "n_chars_no_ws",
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_grams"),
    )
    avg_len = F.col("n_chars_no_ws").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    dup_ratio = F.when(
        F.col("n_grams") > 0,
        (F.col("n_grams") - F.col("n_distinct_grams")).cast("double")
        / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    scored = g.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        dup_ratio.alias("dup_gram_ratio"),
    )
    fail_length = (F.col("n_tokens") < 20) | (F.col("n_tokens") > 5000)
    fail_token_len = (F.col("avg_token_len") < 3.0) | (F.col("avg_token_len") > 8.0)
    fail_repetition = F.col("dup_gram_ratio") > 0.2
    fail_stopwords = (F.col("lang") == "en") & (F.col("stopword_ratio") < 0.01)
    reason = (
        F.when(fail_length, "LENGTH")
        .when(fail_token_len, "TOKEN_LEN")
        .when(fail_repetition, "REPETITION")
        .when(fail_stopwords, "STOPWORDS")
    )
    return scored.select(
        "*",
        F.when(reason.isNull(), 1).otherwise(0).cast("int").alias("keep"),
        reason.alias("drop_reason"),
    )


def q_training_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep pipeline, driver-visible: run
    plans/textpipe.py::run_text_pipeline (quality -> exact dedup -> LSH
    near-dup + connected components -> 5-gram decontamination -> mixture
    sampling -> sequence packing) and return the per-stage survivor counts
    as ONE row. Every stage is deterministic (content hashes, id hashes,
    min-id canonicals) and SQL-expressible, so a full DuckDB twin replays
    the whole composition — including the recursive-CTE connected
    components — and must reproduce every count exactly.

    The counts are computed by the pipeline itself (each stage persisted
    and materialized once — see textpipe.py); this wrapper only lifts the
    summary dict into a one-row DataFrame with pinned bigint types."""
    from ..plans.textpipe import run_text_pipeline

    s = run_text_pipeline(spark, sf_dir)
    schema = (
        "input_docs bigint, after_quality bigint, after_exact_dedup bigint, "
        "after_near_dedup bigint, after_decontamination bigint, "
        "after_mixture bigint, packed_sequences bigint"
    )
    row = (
        int(s["input_docs"]),
        int(s["after_quality"]),
        int(s["after_exact_dedup"]),
        int(s["after_near_dedup"]),
        int(s["after_decontamination"]),
        int(s["after_mixture"]),
        int(s["packed_sequences"]),
    )
    return spark.createDataFrame([row], schema)


_PASSAGE_WORDS = 8


def dedup_passages(docs: DataFrame, words: int = _PASSAGE_WORDS) -> DataFrame:
    """Passage-level duplicate REMOVAL — the rewrite stage the profile
    query above only measures (Dolma / RefinedWeb run this between
    doc-level dedup and n-gram decontamination: boilerplate paragraphs
    and syndicated passages are excised, the surrounding document
    survives).

    Contract (deterministic, engine-independent): each document is cut
    into consecutive non-overlapping ``words``-word passages on its
    ORIGINAL whitespace tokenization plus a (< words)-word tail that is
    always kept; a passage instance survives iff it is the globally
    FIRST occurrence of its content — the minimum (doc_id, block index)
    over the md5 digest of the LOWERCASED space-joined words (matching
    is case-insensitive; the rewrite is not); the rewritten text is the
    surviving passages in original order plus the tail, joined by
    single spaces (whitespace-normalization — the one textual change
    beyond removal: case, punctuation and word content pass through
    untouched). Every input document comes back exactly once, assuming
    unique doc_ids (duplicate-id inputs are collapsed per block at
    reassembly — see rewrite_from_kept), including fully-boilerplate
    ones (empty rewrite) and sub-``words`` ones (normalized, nothing
    removable).

    Scale shape: ONE explode pass cuts passages (array-native, no
    shuffle beyond the scan redistribution); the winner election is a
    single hash aggregate on the 16-byte digest (map-side partials,
    uniform keys — no hot digests) whose min-struct output IS the
    survivor set — no re-join to the instance stream (r12: the r11 cut
    paid a second explode pass + a digest-keyed shuffle to reproduce
    rows the aggregate already held); surviving block indices fold back
    per doc_id (collect_list bounded by the doc's own passage count)
    and the reassembly join is id-keyed, so bucketing by doc_id makes
    it shuffle-free at 100 TB. Passage TEXT never shuffles — only
    digests and integer block indices move; words are re-sliced from
    the document row at reassembly.

    Returns (doc_id, source, text_deduped, n_passages,
    n_passages_dropped).
    """
    base, inst = passage_frames(docs, "doc_id", "text", words)
    # the winner row IS the kept instance: min (doc_id, block) per digest
    # projects straight to the survivor set — no join back to inst (the
    # r11 cut re-joined inst to winners on the digest, which reproduced
    # exactly the winner rows at the cost of a second explode pass over
    # the corpus text and a full digest-keyed shuffle; r12 simplification)
    kept = inst.groupBy("__h").agg(
        F.min(F.struct("doc_id", "__b")).alias("w0")
    ).select(
        F.col("w0.doc_id").alias("doc_id"), F.col("w0.__b").alias("__b")
    )
    rewritten = rewrite_from_kept(base, kept, "doc_id", words)
    return rewritten.select(
        "doc_id",
        "source",
        F.col("__rebuilt").alias("text_deduped"),
        "n_passages",
        "n_passages_dropped",
    )


def decontaminate_passages(
    docs: DataFrame,
    benchmark: DataFrame,
    words: int = _PASSAGE_WORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    return_decision: bool = False,
) -> DataFrame:
    """Passage-level BENCHMARK decontamination — the span-granularity
    excision Dolma-style pipelines run where whole-document dropping is
    too blunt (``benchmark_contamination`` flags and drops the DOC; this
    rewrites it, removing only the leaked span's passages and keeping
    the rest of the document in the training set).

    Contract (shares dedup_passages' cut exactly): each document is cut
    into consecutive non-overlapping ``words``-word passages on its
    case-preserving whitespace tokenization + an always-kept tail; a
    passage is EXCISED iff its lowercased digest equals the digest of
    ANY ``words``-word SLIDING window of any benchmark text (sliding on
    the benchmark side, so doc-side block alignment never hides a leak
    that starts mid-block on the benchmark; a leaked span straddling a
    doc-side block boundary is excised only where its blocks match —
    the granularity bound of any fixed-cut rewrite). Rewrite is
    whitespace-normalized and case-preserving, one output row per input
    row, same columns as dedup_passages (text_deduped, n_passages,
    n_passages_dropped).

    Scale shape: the doc side is passage_frames' (digest, int) streams
    — passage text never shuffles; the benchmark side explodes to
    n-w+1 sliding digests per doc and DISTINCTs (eval suites are small
    by construction). The anti-join routes through the measured join
    planner with a caller-supplied bound (probe 0: total benchmark
    token count bounds the distinct window set at zero evaluation
    cost), so the common case is a broadcast anti-join against 16-byte
    digests and a pathological benchmark degrades to the measured
    ladder instead of an oversized broadcast."""
    from ..operators.skew import adaptive_join, plan_equi_join

    base, inst = passage_frames(docs, id_col, text_col, words)

    btoks = F.split(
        F.trim(F.coalesce(F.col(bench_text_col), F.lit(""))), _WS + "+"
    )
    bt = benchmark.select(btoks.alias("__bw"), F.size(btoks).alias("__bn")).filter(
        F.col("__bn") >= words
    )
    starts = F.explode(F.sequence(F.lit(1), F.col("__bn") - words + 1))
    bench_digests = (
        bt.select("__bw", starts.alias("__s"))
        .select(
            F.md5(
                F.lower(F.concat_ws(" ", F.slice(F.col("__bw"), F.col("__s"), words)))
                .cast("binary")
            ).alias("__h")
        )
        .distinct()
    )
    # probe-0 bound: each bench doc contributes at most __bn - words + 1
    # windows <= __bn tokens; ONE narrow aggregate, no explode
    bound = benchmark.select(
        F.coalesce(
            F.sum(
                F.greatest(
                    F.size(
                        F.split(
                            F.trim(F.coalesce(F.col(bench_text_col), F.lit(""))),
                            _WS + "+",
                        )
                    )
                    - (words - 1),
                    F.lit(0),
                )
            ),
            F.lit(0),
        ).alias("b")
    ).first()["b"]
    decision = plan_equi_join(
        inst.select("__h"), bench_digests, ["__h"], right_rows_upper_bound=int(bound)
    )
    kept = adaptive_join(inst, bench_digests, ["__h"], "left_anti", decision=decision)
    rewritten = rewrite_from_kept(base, kept, id_col, words)
    others = [c for c in rewritten.columns if c not in (
        "__rebuilt", "n_passages", "n_passages_dropped"
    )]
    out = rewritten.select(
        *others,
        F.col("__rebuilt").alias("text_deduped"),
        "n_passages",
        "n_passages_dropped",
    )
    if return_decision:
        # composed pipelines (plans/textpipe.py) log the planner decision
        # in their summary audit trail, same as the doc-drop join
        return out, decision
    return out


def passage_frames(
    docs: DataFrame, id_col: str, text_col: str, words: int
) -> tuple[DataFrame, DataFrame]:
    """Shared passage-cutting stage for the batch rewrite above and the
    incremental refresh (plans/incremental.py): returns

    - ``base``: every input row with its non-text columns plus
      ``__w`` (tokens), ``__n`` (token count), ``__nblk`` (passage
      count);
    - ``inst``: one row per passage instance — (id_col, ``__b`` block
      index, ``__h`` md5 digest of the LOWERCASED space-joined words:
      passage MATCHING is case-insensitive, the REBUILT text is not).

    The token array is built with a case-preserving split (trim +
    whitespace split, no lower()) so the rewrite stage reassembles the
    document's original words — case-folding lives ONLY inside the
    digest expression. (r11 ADVICE high: ``_tokens`` lowercases, and
    routing ``__w`` through it silently case-folded every rewritten
    corpus while the oracle mirrored the same bug.)

    Array-native and shuffle-free after the scan redistribution;
    passage text never leaves the document row."""
    d = parallelize_scan(docs, id_col)
    # case-preserving twin of _tokens: same trim + whitespace split,
    # NO lower() — the rewrite must hand back the original words
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), _WS + "+")
    others = [c for c in docs.columns if c != text_col]
    base = d.select(
        *others,
        toks.alias("__w"),
        F.size(toks).alias("__n"),
        F.floor(F.size(toks) / words).cast("int").alias("__nblk"),
    )
    blocks = F.explode(F.sequence(F.lit(0), F.col("__nblk") - 1))
    inst = (
        base.filter(F.col("__nblk") >= 1)
        .select(id_col, "__w", blocks.alias("__b"))
        .select(
            id_col,
            "__b",
            F.md5(
                F.lower(
                    F.concat_ws(
                        " ", F.slice(F.col("__w"), F.col("__b") * words + 1, words)
                    )
                ).cast("binary")
            ).alias("__h"),
        )
    )
    return base, inst


def rewrite_from_kept(
    base: DataFrame, kept: DataFrame, id_col: str, words: int
) -> DataFrame:
    """Reassemble documents from surviving passage instances: joins the
    per-doc sorted kept-block list back to ``base`` (id-keyed — bucketing
    makes it shuffle-free at scale) and re-slices the document's own word
    array, so passage text never shuffles. Output: base's non-helper
    columns + ``__rebuilt`` (kept passages in order + tail, single-space
    joined) + ``n_passages`` + ``n_passages_dropped``.

    Duplicate-id guard (r11 ADVICE low): if an id appears twice in one
    input/increment, a kept stream carrying one row per INSTANCE would
    repeat each block and a plain collect_list would duplicate every
    kept passage in the rebuilt text. Since the r12 winner-projection
    simplification, both callers pass winner-derived kept streams that
    are unique per (id, block) by construction — the DISTINCT
    kept-block list here (sort_array + array_distinct inside the same
    single aggregate, no extra shuffle; ``__nkept`` = distinct count)
    stays as the documented contract so ANY caller-supplied kept frame
    rebuilds each passage exactly once."""
    kept_per_doc = kept.groupBy(id_col).agg(
        F.array_distinct(F.sort_array(F.collect_list("__b"))).alias("__kb"),
    ).select(
        id_col, "__kb", F.size("__kb").alias("__nkept")
    )
    w, n, nblk = F.col("__w"), F.col("__n"), F.col("__nblk")
    kb = F.coalesce(F.col("__kb"), F.array().cast("array<int>"))
    tail = F.when(
        n > nblk * words, F.slice(w, nblk * words + 1, n - nblk * words)
    ).otherwise(F.array().cast("array<string>"))
    rebuilt = F.concat(
        F.flatten(F.transform(kb, lambda b: F.slice(w, b * words + 1, words))),
        tail,
    )
    others = [
        c for c in base.columns if c not in ("__w", "__n", "__nblk")
    ]
    return base.join(kept_per_doc, id_col, "left").select(
        *others,
        F.concat_ws(" ", rebuilt).alias("__rebuilt"),
        nblk.alias("n_passages"),
        (nblk - F.coalesce(F.col("__nkept"), F.lit(0))).cast("int").alias(
            "n_passages_dropped"
        ),
    )


def q_passage_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible form of :func:`dedup_passages` — the passage-level
    duplicate REMOVAL rewrite over the documents table (global first
    occurrence per lowercased-digest survives; rewritten text is the
    surviving passages + tail, whitespace-normalized, case-preserving).

    Supersedes the retired ``passage_dedup_profile`` (r12, 1:1 under the
    100-query cap): the profile only MEASURED passage repetition per
    source; the rewrite performs the removal the profile motivates and
    its (n_passages, n_passages_dropped) columns carry the same signal
    at document granularity. The profile keeps its implementation and
    pytest hash oracle via the retirement mechanism.

    Scale shape is dedup_passages' (see its docstring): digests and int
    block indices shuffle, passage text never does."""
    return dedup_passages(load(spark, sf_dir, "documents"))


def q_passage_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level deduplication profile (the granularity Dolma's and
    RefinedWeb's dedup stages work at between exact-doc and n-gram):
    documents are cut into consecutive non-overlapping 8-word passages,
    each keyed by md5 of its joined words, and each source is profiled by
    how much passage-level repetition it carries — the signal that finds
    boilerplate paragraphs and template chrome that doc-level dedup misses.

    Per source: total passage instances, distinct passages, passages seen
    in >=2 distinct documents (cross-doc boilerplate), and the duplicated-
    instance share ((instances - distinct) / instances — ONE IEEE division
    of exact ints).

    Scale shape: per-row slicing is array-native and shuffle-free after
    the scan redistribution; the only wide operations are a hash aggregate
    on (source, 16-byte digest) — map-side partials, no hot keys: digests
    are uniform — and the 20-row source rollup."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = _tokens(F.col("text"))
    t = d.select("doc_id", "source", toks.alias("w"), F.size(toks).alias("n")).filter(
        F.col("n") >= _PASSAGE_WORDS
    )
    blocks = F.explode(
        F.sequence(F.lit(0), (F.col("n") / _PASSAGE_WORDS).cast("int") - 1)
    )
    inst = t.select("doc_id", "source", "w", blocks.alias("b")).select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("w"), F.col("b") * _PASSAGE_WORDS + 1, _PASSAGE_WORDS)
            ).cast("binary")
        ).alias("passage_hash"),
    )
    pstats = inst.groupBy("source", "passage_hash").agg(
        F.count(F.lit(1)).alias("n_inst"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return pstats.groupBy("source").agg(
        F.sum("n_inst").alias("n_passages"),
        F.count(F.lit(1)).alias("n_distinct_passages"),
        F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
            "n_cross_doc_passages"
        ),
        (
            (F.sum("n_inst") - F.count(F.lit(1))).cast("double") / F.sum("n_inst")
        ).alias("dup_instance_share"),
    )


# PII patterns: explicit character classes and bounded quantifiers ONLY —
# the subset where Java regex (Spark) and RE2 (DuckDB) agree exactly.
# The five shapes are mutually non-overlapping by construction (dash
# groupings 3-3-4 vs 3-2-4 cannot share a match; IBAN needs leading
# uppercase letters; IP needs dots), so detection counts and redaction
# order are independent.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
# IBAN-like: country code + 2 check digits + 12-30 BBAN chars (uppercase
# alphanumeric — the corpus is lowercase, so no word-soup false positives)
_PII_IBAN = r"[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}"
# national-ID shape (SSN-style 3-2-4 dash grouping)
_PII_NATID = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def pii_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministically planted PII (the testdata corpus is
    PII-free, so the detector needs known positives): doc_id % 7 == 0 rows
    gain an email, % 11 a phone, % 13 an IPv4 — all built JVM-side from
    doc_id, so the oracle replants them with the same arithmetic. Rows can
    satisfy several conditions (91, 143, ...) and then carry several PII
    kinds, exercising multi-pattern redaction on one document."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    text = F.col("text")
    text = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(text, F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            text,
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 900).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 9000).cast("string"), 4, "0"),
        ),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            text,
            F.lit(" host 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".1"),
        ),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 17 == 0,
        F.concat(
            text,
            F.lit(" iban DE"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lpad(F.col("doc_id").cast("string"), 16, "0"),
        ),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 19 == 0,
        F.concat(
            text,
            F.lit(" ssn "),
            F.lpad((F.col("doc_id") % 900).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 90).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 9000).cast("string"), 4, "0"),
        ),
    ).otherwise(text)
    return d.select("doc_id", "source", text.alias("text"))


def pii_per_doc(d: DataFrame) -> DataFrame:
    """Stateless per-document PII projection (source, e, p, i, removed).

    Pure narrow projection — no shuffle, no state — so the SAME expression
    tree runs unchanged on a batch frame or a streaming source (pinned by
    tests/test_streaming.py::test_stateless_text_op_runs_on_stream: a
    compliance sweep over a file-arrival stream needs no rewrite)."""
    n_emails = F.regexp_count(F.col("text"), F.lit(_PII_EMAIL))
    n_phones = F.regexp_count(F.col("text"), F.lit(_PII_PHONE))
    n_ips = F.regexp_count(F.col("text"), F.lit(_PII_IP))
    n_ibans = F.regexp_count(F.col("text"), F.lit(_PII_IBAN))
    n_natids = F.regexp_count(F.col("text"), F.lit(_PII_NATID))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]"),
                    _PII_PHONE,
                    "[PHONE]",
                ),
                _PII_IP,
                "[IP]",
            ),
            _PII_IBAN,
            "[IBAN]",
        ),
        _PII_NATID,
        "[ID]",
    )
    return d.select(
        "source",
        n_emails.alias("e"),
        n_phones.alias("p"),
        n_ips.alias("i"),
        n_ibans.alias("b"),
        n_natids.alias("s"),
        (F.length("text") - F.length(redacted)).alias("removed"),
    )


def q_pii_redaction_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection / redaction profile (the CCNet/RefinedWeb-style
    compliance pass every pretraining pipeline runs before release):
    count emails / phone numbers / IPv4 addresses per document with
    engine-portable regexes, redact them to typed placeholders, and roll
    up per source: docs scanned, docs carrying any PII, hits per kind,
    total characters removed by redaction, and the PII-document share
    (ONE IEEE division of exact ints).

    Scale shape: regex matching is a narrow per-row projection inside
    whole-stage codegen (no UDF, no Python); the only exchange is the
    final 20-key source rollup with map-side partials. At 100 TB this is
    scan-bound — exactly what a compliance sweep should be."""
    per_doc = pii_per_doc(pii_fixture(spark, sf_dir))
    any_pii = (
        F.col("e") + F.col("p") + F.col("i") + F.col("b") + F.col("s") > 0
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(any_pii, 1).otherwise(0)).alias("docs_with_pii"),
        F.sum("e").cast("bigint").alias("n_emails"),
        F.sum("p").cast("bigint").alias("n_phones"),
        F.sum("i").cast("bigint").alias("n_ips"),
        F.sum("b").cast("bigint").alias("n_ibans"),
        F.sum("s").cast("bigint").alias("n_natids"),
        F.sum("removed").cast("bigint").alias("chars_redacted"),
        (
            F.sum(F.when(any_pii, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("pii_doc_share"),
    )


# train/val/test boundaries on the [0, 1e6) hash line: 90 / 5 / 5
_SPLIT_TRAIN_LT = 900_000
_SPLIT_VAL_LT = 950_000


def q_dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) — the reproducibility
    primitive every training pipeline needs: a document's split depends
    ONLY on its id, never on partitioning, engine, or rerun, so the same
    corpus always splits identically and new documents join a split
    without reshuffling old ones.

    The hash is SALTED ('split:' prefix) so split membership is
    independent of the mixture-sampling hash (q_source_mixture_plan) —
    reusing one hash for both decisions would correlate them and bias the
    sampled mixture's split ratios. Every doc lands in exactly one split
    by construction (half-open ranges covering [0, 1e6)).

    Report per (source, split): docs, token mass, and the within-source
    doc share (ONE IEEE division of exact ints). Plan: one narrow
    projection, one hash aggregate on (source, split) — at most
    |sources| x 3 rows — and a broadcast join back for the shares."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    split = (
        F.when(h < _SPLIT_TRAIN_LT, "train")
        .when(h < _SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    per_doc = d.select(
        "source",
        split.alias("split"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )
    agg = per_doc.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("split_tokens"),
    )
    totals = per_doc.groupBy("source").agg(F.count(F.lit(1)).alias("source_docs"))
    return agg.join(F.broadcast(totals), "source").select(
        "source",
        "split",
        F.col("n_docs").cast("int").alias("n_docs"),
        "split_tokens",
        (F.col("n_docs").cast("double") / F.col("source_docs")).alias("doc_share"),
    )


def component_aware_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Leakage-controlled train/val/test assignment: the split hash is
    computed on the NEAR-DUP COMPONENT canonical (min id over the
    MinHash-LSH + connected-components clustering), so two near-
    duplicate documents can never land in different splits — the
    eval-leakage mode a plain per-doc hash split
    (``dataset_split_assignment``) cannot prevent when dedup runs AFTER
    splitting, or keeps one representative per component per split.

    Same 90/5/5 salted-hash arithmetic as the per-doc split (the
    'split:' salt keeps membership independent of the mixture hash),
    applied to the component id instead of the doc id; singleton
    documents hash on their own id, so a corpus with no near-dups
    splits identically to the per-doc op.

    Returns (id_col, component, split) — one row per input document.

    Scale shape: LSH banding + min-label CC are the measured shapes the
    dedup family already runs (1 job per CC round, candidate volume
    bounded by band collisions); the split itself adds one narrow
    projection and a left join of docs to the (component-sized) label
    frame on ``id_col``."""
    from ..extensions.dedup_fuzzy import connected_components, minhash_near_duplicates

    pairs = minhash_near_duplicates(
        docs, id_col=id_col, text_col=text_col,
        n_hashes=n_hashes, bands=bands, shingle_n=shingle_n,
        threshold=threshold, seed=seed,
    )
    labels = connected_components(pairs, "d1", "d2").select(
        F.col("id").alias("__cid"), F.col("label").alias("__clabel")
    )
    with_comp = docs.select(F.col(id_col)).join(
        labels, F.col(id_col) == F.col("__cid"), "left"
    ).select(
        id_col,
        F.coalesce(F.col("__clabel"), F.col(id_col)).alias("component"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("component").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    return with_comp.select(
        id_col,
        "component",
        F.when(h < _SPLIT_TRAIN_LT, "train")
        .when(h < _SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


def split_leakage_audit(
    docs: DataFrame,
    assignment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Post-hoc eval-leakage audit of a COMPLETED train/val/test split:
    find the near-duplicate pairs (MinHash-LSH, same parameters as
    :func:`component_aware_split`) and count them by the (unordered)
    pair of splits their endpoints landed in. A pair with
    ``leaked = 1`` (endpoints in different splits) is a benchmark
    document whose near-twin is in train — exactly the contamination
    mode the component-aware split PREVENTS by construction and a plain
    per-doc hash split cannot; this operator is the verification side of
    that pair: run it on any split you didn't build leakage-free (a
    legacy split, a vendor's split, the per-doc hash split) before
    trusting its eval numbers.

    ``assignment`` is any (id, split) frame — the output of
    :func:`component_aware_split`, the per-doc hash arithmetic, or an
    external split table. Returns one row per observed unordered split
    pair: (split_a, split_b, n_pairs, leaked), split_a <= split_b,
    ordered by n_pairs DESC. A pair endpoint MISSING from the
    assignment (exactly the id gaps legacy/vendor splits exhibit)
    surfaces as the split value ``(unassigned)`` and counts as leaked —
    conservative by design: an inner join would silently DROP such
    pairs, and an audit that loses the contaminated docs' pairs would
    report leak_share 0.0 and green-light a leaked split (r13 review
    finding).

    PRECONDITIONS (validated eagerly, r13 review findings): the
    assignment must carry at most one row per id (a duplicate-id vendor
    table would silently MULTIPLY pair counts through the joins), and
    its split values must be non-NULL and never the literal
    ``(unassigned)`` — the sentinel must mean exactly "id missing from
    the assignment", or a NULL-split row / a real split named like the
    sentinel would be indistinguishable from a coverage gap (and
    intra-split pairs of such a split would all read as leaked). Both
    checks are ONE narrow aggregate over the assignment; violations
    raise instead of corrupting the report.

    Scale shape: candidate volume is the LSH-banded pair stream (the
    measured dedup-family bound — never all-pairs); the audit itself
    adds two id-keyed equi-joins of that pair stream against the narrow
    (id, split) projection and ONE hash aggregate over at most
    |splits|^2 keys. The corpus text never moves after shingling."""
    from ..extensions.dedup_fuzzy import minhash_near_duplicates

    chk = assignment.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col(id_col))).alias("dups"),
        F.sum(
            (
                F.col(split_col).isNull()
                | (F.col(split_col) == "(unassigned)")
            ).cast("bigint")
        ).alias("bad_splits"),
    ).first()
    if int(chk["dups"] or 0) > 0:
        raise ValueError(
            f"assignment carries duplicate (or NULL) {id_col!r} rows — "
            f"{int(chk['dups'])} surplus row(s); a duplicate-id assignment "
            "would silently multiply pair counts through the audit joins. "
            f"Deduplicate it first (e.g. dropDuplicates(['{id_col}']))"
        )
    if int(chk["bad_splits"] or 0) > 0:
        raise ValueError(
            f"assignment has {int(chk['bad_splits'])} row(s) whose "
            f"{split_col!r} is NULL or the literal '(unassigned)' — the "
            "audit reserves that sentinel for ids MISSING from the "
            "assignment; rename the split or fix the NULLs first"
        )
    pairs = minhash_near_duplicates(
        docs, id_col=id_col, text_col=text_col,
        n_hashes=n_hashes, bands=bands, shingle_n=shingle_n,
        threshold=threshold, seed=seed,
    )
    a = assignment.select(
        F.col(id_col).alias("__aid"), F.col(split_col).alias("__asplit")
    )
    b = assignment.select(
        F.col(id_col).alias("__bid"), F.col(split_col).alias("__bsplit")
    )
    tagged = (
        pairs.join(a, pairs["d1"] == F.col("__aid"), "left")
        .join(b, pairs["d2"] == F.col("__bid"), "left")
        .select(
            F.coalesce("__asplit", F.lit("(unassigned)")).alias("__sa"),
            F.coalesce("__bsplit", F.lit("(unassigned)")).alias("__sb"),
        )
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
    )
    return (
        tagged.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            # any (unassigned) endpoint sorts into split_a ('(' < letters),
            # so the second clause marks EVERY uncovered pair leaked —
            # including (unassigned, unassigned), which the inequality
            # alone would miss
            F.when(
                (F.col("split_a") != F.col("split_b"))
                | (F.col("split_a") == "(unassigned)"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("leaked"),
        )
        .orderBy(F.col("n_pairs").desc(), "split_a", "split_b")
    )


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per source — the
    length-distribution profile every pretraining pipeline reads before
    choosing chunking and packing parameters (and the cheap skew check:
    one bucket dominating a source means packing will stall there).

    The bucket index is floor(log2(n_tokens)) computed EXACTLY via the
    binary-string length (length(bin(n)) - 1) — never floating log2,
    whose rounding at power-of-two boundaries differs between libm
    implementations. Plan: narrow projection over the scan, one hash
    aggregate on (source, bucket) — |sources| x ~12 groups, map-side
    combined; embarrassingly parallel at 100 TB."""
    d = load(spark, sf_dir, "documents")
    n = F.size(_tokens(F.col("text")))
    per = d.select(
        "source",
        n.alias("n_tokens"),
        (F.length(F.bin(n.cast("bigint"))) - 1).cast("int").alias("log2_bucket"),
    )
    return per.groupBy("source", "log2_bucket").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def q_bigram_association_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram association (lift) scores over the corpus — the
    collocation-mining primitive (phrase detection, tokenizer-merge
    candidates). lift(a,b) = P(ab) / (P(a)P(b)) rewritten over exact
    counts as (n_ab * T) / (n_a * n_b): the numerator and denominator
    are exact int64 products (< 2^53 at any tested SF), so the score is
    ONE IEEE division — bit-reproducible cross-engine, no logs.

    Spark-first shape: bigrams come from zip_with over two slices of the
    per-doc token array (narrow, inside the scan stage — no positional
    self-join); then two bounded hash aggregates (vocab and vocab² keys)
    and broadcast joins of the unigram counts back onto the pair table.
    At 100 TB the vocab tables stay bounded (natural-language vocabulary
    growth is sublinear), so the broadcasts hold; if a vocab outgrows the
    threshold the same plan degrades gracefully to shuffle joins on the
    word key."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    words = d.select(F.explode(toks).alias("tok"))
    # vocab-sized (bounded at any corpus scale) -> persist once; the total
    # token count then derives from the SAME aggregate instead of a second
    # full scan+explode of the corpus
    unic = tracked_cache(words.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok")))
    total = unic.agg(F.sum("n_tok").cast("bigint").alias("t"))
    arr = d.select(toks.alias("w")).filter(F.size("w") >= 2)
    pairs = arr.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, F.size("w") - 1),
                F.slice("w", 2, F.size("w") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bigc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    scored = (
        bigc.join(
            F.broadcast(unic.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_w1"))),
            "w1",
        )
        .join(
            F.broadcast(unic.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
    )
    return scored.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        (
            (F.col("n_pair") * F.col("t")).cast("double")
            / (F.col("n_w1") * F.col("n_w2"))
        ).alias("lift"),
    )


# Ubiquity cap for cross-source overlap: shingles present in more than
# this many sources are boilerplate (navigation chrome, licence headers)
# and are excluded BEFORE the pair join — they carry no discriminative
# signal and are exactly the keys whose per-shingle fanout would explode
# quadratically in |sources| at corpus scale.
_OVERLAP_MAX_SOURCES = 10


def source_overlap_matrix(d: DataFrame, max_sources: int) -> DataFrame:
    """Core of q_cross_source_overlap over any (doc_id, text, source)
    frame, with the ubiquity cap as a parameter so the scale probe
    (stress.py overlap) can measure the capped vs uncapped join fanout
    on a planted high-boilerplate corpus."""
    # distinct (source, shingle) is consumed twice (the per-shingle source
    # count AND the capped join input, both sides of whose lineage would
    # otherwise re-run the explode+join) -> stage-persist once, same
    # pattern as the MinHash shingle stage; entries are plan-keyed and
    # released by the registry wrapper after the query
    sh = tracked_cache(
        _shingles(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    per_shingle = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("src_cnt")
    )
    kept = tracked_cache(
        sh.join(
            per_shingle.filter(F.col("src_cnt") <= max_sources),
            "shingle",
        ).select("source", "shingle")
    )
    per_source = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a = kept.select(F.col("source").alias("source_a"), "shingle")
    b = kept.select(F.col("source").alias("source_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = per_source.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("_na")
    )
    nb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_shingles").alias("_nb")
    )
    return (
        pairs.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("_na")).alias("share_of_a"),
            (F.col("n_shared").cast("double") / F.col("_nb")).alias("share_of_b"),
        )
    )


def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source x source content-overlap matrix via shared word-3-gram
    shingles — the corpus-curation view that finds mirrored/scraped
    content BETWEEN sources (a crawl snapshot duplicated under two names,
    a dataset vendored into another) before mixture weights are chosen.
    Whole-document digests miss this (near-identical docs differ in one
    byte); shingle containment catches partial overlap.

    Spark-first shape: the ONE shared shingle definition
    (functions/text.py::word_shingles — the same tokenizer the dedup
    family uses) -> distinct (source, shingle) -> per-shingle source
    count -> ubiquity cap (see _OVERLAP_MAX_SOURCES: bounds the
    per-shingle pair fanout at cap^2 and drops boilerplate) ->
    shingle-keyed self-join with source_a < source_b -> |sources|^2
    rollup. All joins are equi-joins on the shingle digest-space; the
    per-source denominators are a |sources|-row broadcast. Containment
    shares are relative to each source's capped shingle vocabulary, ONE
    IEEE division of exact counts. The cap's fanout effect is MEASURED
    on a planted high-boilerplate corpus (stress.py overlap; table in
    docs/SCALE.md)."""
    return source_overlap_matrix(
        load(spark, sf_dir, "documents"), _OVERLAP_MAX_SOURCES
    )


def q_normalized_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust dedup profile per source: how many documents
    remain distinct after canonicalizing text (lowercase, accent-fold,
    punctuation strip, whitespace collapse — functions/text.py::
    normalize_for_dedup, the CCNet-style form), versus raw-byte
    distinctness — the pre-dedup audit that tells a pipeline whether
    trivial formatting variants are inflating the corpus, plus how many
    bytes normalization removes.

    Exactness: digests are md5 over byte-identical canonical forms
    (explicit translate table + explicit character classes — no Unicode
    mapping tables, which differ across engines); counts and length sums
    are exact int64; removal_ratio is ONE IEEE division.

    Plan shape: narrow per-doc projection (digest + two lengths) inside
    the scan stage, then one grouped aggregate with two COUNT(DISTINCT
    digest)s — Spark expands 2x for the multi-distinct, keys are
    (source, 16-byte digest): uniform, map-side partials. At 100 TB the
    same profile runs with approx_count_distinct (fixed HLL state, no
    expand) and this exact plan stays the verification tier."""
    from ..functions.text import normalize_for_dedup

    d = load(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.md5(F.col("text")).alias("raw_digest"),
        F.md5(normalize_for_dedup(F.col("text"))).alias("norm_digest"),
        F.length("text").alias("raw_len"),
        F.length(normalize_for_dedup(F.col("text"))).alias("norm_len"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("raw_digest").alias("n_raw_distinct"),
        F.count_distinct("norm_digest").alias("n_norm_distinct"),
        F.sum("raw_len").cast("bigint").alias("chars_total"),
        (F.sum("raw_len") - F.sum("norm_len")).cast("bigint").alias("chars_removed"),
        (
            (F.sum("raw_len") - F.sum("norm_len")).cast("double")
            / F.sum("raw_len")
        ).alias("removal_ratio"),
    )


_BALANCED_K = 10  # docs per source in the balanced sample


def q_balanced_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fixed-size balanced sample: exactly K documents from
    EVERY source, chosen by deterministic hash rank — the eval-set /
    inspection-set construction primitive (uniform Bernoulli sampling
    over-represents big sources; mixture sampling weights by token
    budget; this gives each stratum equal representation, reproducibly).

    Selection is rank-by-md5(doc_id) with the raw digest as its own
    total tiebreak, so membership is independent of partition layout and
    engine, and re-runs (or a re-shard of the corpus) pick the identical
    documents. Plan: narrow digest projection -> ONE window shuffle on
    the source key -> rank filter. Catalyst rewrites the rank<=K filter
    into a map-side WindowGroupLimit before the exchange (same rewrite
    the keep-latest dedup relies on), so each reducer receives at most
    map_partitions x K rows per source — hot sources cost the same as
    cold ones, which is what makes this safe at 100 TB."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("pick_key")
    return (
        d.select(
            "doc_id",
            "source",
            F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))).alias(
                "pick_key"
            ),
            F.size(_tokens(F.col("text"))).alias("n_tokens"),
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= _BALANCED_K)
        .select("source", "sample_rank", "doc_id", "n_tokens")
    )


def q_doc_lm_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: every document scored under a
    trigram Stupid Backoff LM (Brants et al. 2007) whose count tables
    are built from the reference slice ``doc_id % 10 == 0`` — the
    CCNet-style curation stage the rule stacks (`doc_quality_scores`)
    can't express. Off-distribution text (template spam, non-prose)
    scores low; in-distribution prose high.

    Exactness: per-token integer micro-scores (one floored integer
    division per backoff depth, alpha = 0.4 applied as exact scaled
    integers), integer sum per doc, ONE IEEE division for the mean —
    bit-identical to the DuckDB twin. Scale shape and the 100 TB story
    live in operators/lm.py (count tables are Zipf-small one-pass
    groupBys; scoring is a per-doc lag window + gram-key hash joins)."""
    from ..operators.lm import stupid_backoff_doc_scores, tokenize_positions

    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    toks = tracked_cache(tokenize_positions(d, "doc_id", _tokens(F.col("text"))))
    ref = toks.filter(F.col("doc_id") % 10 == 0)
    return stupid_backoff_doc_scores(toks, ref)


QUERIES = {
    "doc_token_stats": q_doc_token_stats,
    "doc_lm_backoff_scores": q_doc_lm_backoff_scores,
    "token_length_histogram": q_token_length_histogram,
    "bigram_association_scores": q_bigram_association_scores,
    "doc_quality_scores": q_doc_quality_scores,
    "language_id": q_language_id,
    "doc_dedup_profile": q_doc_dedup_profile,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "contained_doc_pairs": q_contained_doc_pairs,
    "shared_substring_pairs": q_shared_substring_pairs,
    "doc_fingerprint": q_doc_fingerprint,
    "minhash_near_duplicates": q_minhash_near_duplicates,
    "simhash_fingerprints": q_simhash_fingerprints,
    "doc_dup_components": q_doc_dup_components,
    "tfidf_top_terms": q_tfidf_top_terms,
    "doc_winnow_fingerprint": q_doc_winnow_fingerprint,
    "benchmark_contamination": q_benchmark_contamination,
    "bloom_decontaminated_docs": q_bloom_decontaminated_docs,
    "source_mixture_plan": q_source_mixture_plan,
    "doc_repetition_scores": q_doc_repetition_scores,
    "sequence_packing_plan": q_sequence_packing_plan,
    "training_pipeline_summary": q_training_pipeline_summary,
    "corpus_vocab_stats": q_corpus_vocab_stats,
    "source_lang_profile": q_source_lang_profile,
    "doc_chunk_plan": q_doc_chunk_plan,
    "boilerplate_ngram_profile": q_boilerplate_ngram_profile,
    "prefix_template_clusters": q_prefix_template_clusters,
    "quality_filter_decisions": q_quality_filter_decisions,
    "passage_dedup_profile": q_passage_dedup_profile,
    "passage_dedup_rewrite": q_passage_dedup_rewrite,
    "pii_redaction_profile": q_pii_redaction_profile,
    "dataset_split_assignment": q_dataset_split_assignment,
    "cross_source_overlap": q_cross_source_overlap,
    "normalized_dedup_profile": q_normalized_dedup_profile,
    "balanced_sample_plan": q_balanced_sample_plan,
}

_DUCK_SHINGLES = """
        toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
          FROM documents
        ),
        shingles AS (
          SELECT DISTINCT doc_id,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
        )
"""

ORACLES = {
    "doc_token_stats": """
        SELECT
          doc_id,
          lang,
          CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS INTEGER) AS n_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]+'))
               AS INTEGER) AS n_bpe_tokens,
          CAST(length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) AS INTEGER) AS n_chars_no_ws,
          CAST(length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) AS DOUBLE)
            / len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS avg_token_len,
          CAST(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS INTEGER) AS flag_short
        FROM documents
    """,
    # exact floor(log2) via binary-string length on both engines — no
    # floating log2 at power-of-two boundaries
    "token_length_histogram": """
        WITH per AS (
          SELECT source,
                 CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+'))
                      AS INTEGER) AS n_tokens
          FROM documents
        )
        SELECT source,
               CAST(length(bin(CAST(n_tokens AS BIGINT))) - 1 AS INTEGER)
                 AS log2_bucket,
               CAST(COUNT(1) AS INTEGER) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(n_tokens) AS min_tokens,
               MAX(n_tokens) AS max_tokens
        FROM per
        GROUP BY 1, 2
    """,
    # lift = (n_ab * T) / (n_a * n_b): exact int64 products, ONE division
    "bigram_association_scores": """
        WITH toks AS (
          SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
          FROM documents
        ),
        uni AS (SELECT unnest(w) AS tok FROM toks),
        unic AS (SELECT tok, COUNT(1) AS n FROM uni GROUP BY 1),
        tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS t FROM uni),
        big AS (
          SELECT w[CAST(i AS INTEGER)] AS w1,
                 w[CAST(i AS INTEGER) + 1] AS w2
          FROM toks, UNNEST(range(1, len(w))) AS r(i)
        ),
        bigc AS (SELECT w1, w2, COUNT(1) AS n_pair FROM big GROUP BY 1, 2)
        SELECT bigc.w1, bigc.w2,
               bigc.n_pair,
               a.n AS n_w1,
               b.n AS n_w2,
               CAST(bigc.n_pair * tot.t AS DOUBLE) / (a.n * b.n) AS lift
        FROM bigc
        CROSS JOIN tot
        JOIN unic a ON bigc.w1 = a.tok
        JOIN unic b ON bigc.w2 = b.tok
    """,
    "doc_quality_scores": """
        WITH base AS (
          SELECT doc_id, lang,
                 length(text) AS n_chars_total,
                 length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \\t\\n\\f\\r]', '', 'g'))
                   AS n_punct,
                 CAST((length(p) - length(replace(p, ' the ', ''))) / 5.0
                    + (length(p) - length(replace(p, ' and ', ''))) / 5.0
                    + (length(p) - length(replace(p, ' of ', ''))) / 4.0
                    + (length(p) - length(replace(p, ' to ', ''))) / 4.0 AS INTEGER)
                   AS n_stopword_hits,
                 len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n_tokens
          FROM (SELECT *, ' ' || lower(text) || ' ' AS p FROM documents)
        ),
        scored AS (
          SELECT doc_id, lang,
                 CAST(n_chars_total AS INTEGER) AS n_chars_total,
                 CAST(n_punct AS INTEGER) AS n_punct,
                 n_stopword_hits,
                 CAST(n_tokens AS INTEGER) AS n_tokens,
                 CAST(n_punct AS DOUBLE) / n_chars_total AS punct_ratio,
                 CAST(n_stopword_hits AS DOUBLE) / n_tokens AS stopword_ratio
          FROM base
          WHERE n_chars_total > 0
        )
        SELECT *,
               CASE WHEN n_chars_total < 100 THEN 'SHORT'
                    WHEN punct_ratio > 0.1 THEN 'NOISY'
                    WHEN stopword_ratio >= 0.05 THEN 'FLUENT'
                    ELSE 'OK' END AS quality_bucket
        FROM scored
    """,
    "language_id": """
        WITH scored AS (
          SELECT doc_id, lang,
            (length(p) - length(replace(p, ' the ', ''))) / 5.0
              + (length(p) - length(replace(p, ' and ', ''))) / 5.0 AS s_en,
            (length(p) - length(replace(p, ' el ', ''))) / 4.0
              + (length(p) - length(replace(p, ' que ', ''))) / 5.0 AS s_es,
            (length(p) - length(replace(p, ' le ', ''))) / 4.0
              + (length(p) - length(replace(p, ' et ', ''))) / 4.0 AS s_fr,
            (length(p) - length(replace(p, ' der ', ''))) / 5.0
              + (length(p) - length(replace(p, ' und ', ''))) / 5.0 AS s_de
          FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents)
        ),
        predicted AS (
          SELECT doc_id, lang,
            CASE WHEN s_en + s_es + s_fr + s_de = 0 THEN 'unknown'
                 WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                 WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                 WHEN s_fr >= s_de THEN 'fr'
                 ELSE 'de' END AS predicted_lang
          FROM scored
        )
        SELECT doc_id, lang, predicted_lang,
               CAST(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END AS INTEGER)
                 AS lang_match
        FROM predicted
    """,
    "doc_dedup_profile": """
        WITH groups AS (
          SELECT md5(text) AS h, COUNT(1) AS n FROM documents GROUP BY 1
        )
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
               COUNT(1) AS n_distinct_texts,
               COUNT(CASE WHEN n > 1 THEN 1 END) AS n_dup_groups,
               CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
                 AS n_redundant_docs
        FROM groups
    """,
    "ngram_jaccard_pairs": f"""
        WITH {_DUCK_SHINGLES},
        counts AS (SELECT doc_id, COUNT(1) AS n_sh FROM shingles GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(1) AS n_inter
          FROM shingles a JOIN shingles b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT d1, d2,
               CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
        FROM inter
        JOIN counts ca ON ca.doc_id = d1
        JOIN counts cb ON cb.doc_id = d2
        WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.8
    """,
    "doc_fingerprint": f"""
        WITH {_DUCK_SHINGLES}
        SELECT doc_id,
               MIN(md5(shingle)) AS fingerprint,
               COUNT(1) AS n_shingles
        FROM shingles
        GROUP BY doc_id
    """,
}

# the LSH path must reproduce the exact join's answer (see its docstring)
ORACLES["minhash_near_duplicates"] = ORACLES["ngram_jaccard_pairs"]

# Connected components: DuckDB's recursive CTE computes, for every doc in
# the near-dup edge list (identical to the minhash oracle's pair set),
# the minimum reachable doc id — exactly the fixpoint the engine's
# min-label propagation converges to. UNION (not UNION ALL) dedups the
# frontier, so the recursion terminates.
ORACLES["doc_dup_components"] = f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    counts AS (SELECT doc_id, COUNT(1) AS n_sh FROM shingles GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(1) AS n_inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2
      FROM inter
      JOIN counts ca ON ca.doc_id = d1
      JOIN counts cb ON cb.doc_id = d2
      WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.8
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION ALL SELECT d2, d1 FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS src, id AS dst FROM nodes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src)
    SELECT doc_id, component,
           CAST(COUNT(1) OVER (PARTITION BY component) AS BIGINT) AS component_size,
           doc_id = component AS is_canonical
    FROM comp
"""

# SimHash twin: same md5-derived 60-bit token hash as the engine
# (('0x'||hex)::BIGINT == Spark conv(hex,16,10)), same per-bit majority and
# bit packing. range(32) supplies the bit positions.
ORACLES["simhash_fingerprints"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM toks
    ),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN ((h >> CAST(b AS INTEGER)) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed CROSS JOIN (SELECT unnest(range(32)) AS b) bs
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
"""

# TF-IDF twin: ratio idf (see q_tfidf_top_terms docstring — ln is not
# cross-engine ulp-exact; * and / are). Association order mirrors the
# Spark expression exactly: tf * (N / df).
ORACLES["tfidf_top_terms"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             tf.tf * (n.n_docs / dfreq.df) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY doc_id, tfidf DESC, token) -
                row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) + 1 AS _x,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS INTEGER) AS rank, token,
           CAST(tf AS INTEGER) AS tf, CAST(df AS INTEGER) AS df, tfidf
    FROM ranked WHERE rnk <= 3
"""

# Winnowing twin: identical md5-derived token hashes, identical polynomial
# (B=131, M=2^31-1), identical W=5 min-window selection.
ORACLES["doc_winnow_fingerprint"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             list_transform(w, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647) AS hs
      FROM toks
    ),
    kgrams AS (
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
             (hs[i] * 2248091 + hs[i+1] * 17161 + hs[i+2] * 131 + hs[i+3]) % 2147483647 AS kh
      FROM hashed, UNNEST(range(1, len(hs) - 2)) AS t(i)
    ),
    winnow AS (
      SELECT doc_id, pos,
             MIN(kh) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id) AS nk
      FROM kgrams
    ),
    agg AS (
      SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints,
             MIN(fp) AS min_fp, MAX(fp) AS max_fp
      FROM winnow WHERE pos <= nk - 5 GROUP BY doc_id
    )
    SELECT h.doc_id,
           CAST(GREATEST(len(h.hs) - 3, 0) AS INTEGER) AS n_kgrams,
           CAST(COALESCE(a.n_fingerprints, 0) AS INTEGER) AS n_fingerprints,
           a.min_fp, a.max_fp
    FROM hashed h LEFT JOIN agg a USING (doc_id)
"""

# Contamination twin: same eval slice (doc_id % 17 = 0), same DISTINCT
# 5-gram tokenization as _DUCK_SHINGLES but width 5.
ORACLES["benchmark_contamination"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
      FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
    ),
    overlap AS (
      SELECT t.doc_id, e.doc_id AS eval_id, COUNT(*) AS n_shared
      FROM shingles t JOIN shingles e USING (shingle)
      WHERE t.doc_id % 17 <> 0 AND e.doc_id % 17 = 0
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n_shared DESC, eval_id) AS rn
      FROM overlap
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_eval_matches,
           MAX(CASE WHEN rn = 1 THEN eval_id END) AS top_eval_id,
           CAST(MAX(CASE WHEN rn = 1 THEN n_shared END) AS INTEGER) AS top_shared
    FROM ranked GROUP BY doc_id
"""

# Decontamination-survivor twin: the Spark side prunes with a broadcast
# Bloom filter (zero false negatives => provably answer-preserving), so
# the oracle is the PLAIN anti-join the pruning is equivalent to. Same
# eval slice (doc_id % 17 = 0) and DISTINCT 5-gram tokenization as the
# contamination oracle above.
ORACLES["bloom_decontaminated_docs"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
      FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM shingles t JOIN shingles e USING (shingle)
      WHERE t.doc_id % 17 <> 0 AND e.doc_id % 17 = 0
    ),
    counts AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(COALESCE(c.n_shingles, 0) AS INTEGER) AS n_shingles
    FROM documents d
    LEFT JOIN counts c USING (doc_id)
    WHERE d.doc_id % 17 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""

# Mixture twin: identical md5-derived membership hash, identical IEEE rate
# arithmetic. SUM(int) promotes to HUGEINT in DuckDB -> cast the RESULT
# (not the argument) to BIGINT, or pandas renders float64 and the value
# hash diverges on identical data.
ORACLES["source_mixture_plan"] = """
    WITH per_doc AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS h
      FROM documents
    ),
    totals AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM per_doc GROUP BY source
    ),
    target AS (SELECT CAST(MIN(total_tokens) AS DOUBLE) AS target FROM totals),
    rated AS (
      SELECT source, n_docs, total_tokens,
             target.target / total_tokens AS rate
      FROM totals CROSS JOIN target
    ),
    sel AS (
      SELECT p.source, COUNT(*) AS n_selected,
             CAST(SUM(p.n_tokens) AS BIGINT) AS selected_tokens
      FROM per_doc p JOIN rated r USING (source)
      WHERE CAST(p.h AS DOUBLE) < r.rate * 1000000.0
      GROUP BY p.source
    )
    SELECT r.source,
           CAST(r.n_docs AS INTEGER) AS n_docs,
           r.total_tokens,
           r.rate,
           CAST(COALESCE(s.n_selected, 0) AS INTEGER) AS n_selected,
           CAST(COALESCE(s.selected_tokens, 0) AS BIGINT) AS selected_tokens
    FROM rated r LEFT JOIN sel s USING (source)
"""

# Repetition twin: non-distinct grams via UNNEST + COUNT vs COUNT(DISTINCT);
# docs with <3 tokens re-enter via LEFT JOIN with zero grams.
ORACLES["doc_repetition_scores"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct
      FROM grams GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_grams, 0) AS INTEGER) AS n_grams,
           CAST(COALESCE(a.n_distinct, 0) AS INTEGER) AS n_distinct_grams,
           CASE WHEN a.n_grams > 0
                THEN CAST(a.n_grams - a.n_distinct AS DOUBLE) / a.n_grams
           END AS dup_gram_ratio
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# Packing twin: same running sum (doc_id order within source), same
# floor((offset)/budget) sequence assignment, HUGEINT-safe sums.
ORACLES["sequence_packing_plan"] = """
    WITH per_doc AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS seq_id
      FROM per_doc
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS INTEGER) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / 2048 AS fill_ratio
    FROM packed GROUP BY source, seq_id
"""

# Vocab twin: same tokenizer, same two-phase top-term selection (max count,
# then MIN(token) at that count). SUM over BIGINT -> HUGEINT in DuckDB, so
# results are cast back to BIGINT for the hash compare.
ORACLES["corpus_vocab_stats"] = """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS token
      FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    agg AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_token_instances,
             COUNT(*) AS n_distinct_terms,
             COUNT(CASE WHEN n = 1 THEN 1 END) AS n_hapax,
             CAST(MAX(n) AS BIGINT) AS mx
      FROM vocab
    )
    SELECT n_token_instances,
           n_distinct_terms,
           n_hapax,
           (SELECT MIN(token) FROM vocab WHERE n = agg.mx) AS top_term,
           mx AS top_term_count,
           CAST(mx AS DOUBLE) / n_token_instances AS top_term_share
    FROM agg
"""

# Chunking twin: identical start-multiple rule (range over ceil(n/stride)),
# identical slice boundaries (DuckDB list slicing is 1-based inclusive, so
# w[s+1 : s+len] == Spark slice(toks, s+1, len)), md5 over the same joined
# string pins the content byte-for-byte.
ORACLES["doc_chunk_plan"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, len(w) AS n_tokens, w, CAST(t.i AS INTEGER) AS chunk_idx
      FROM toks, UNNEST(range(0, (len(w) - 1) // 24 + 1)) AS t(i)
      WHERE len(w) > 0
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * 24 AS INTEGER) AS start_token,
           CAST(LEAST(32, n_tokens - chunk_idx * 24) AS INTEGER) AS chunk_tokens,
           md5(array_to_string(
             w[chunk_idx * 24 + 1 :
               chunk_idx * 24 + LEAST(32, n_tokens - chunk_idx * 24)], ' '))
             AS chunk_hash
    FROM chunks
"""

ORACLES["boilerplate_ngram_profile"] = f"""
    WITH {_DUCK_SHINGLES},
    dfreq AS (SELECT shingle, COUNT(1) AS df FROM shingles GROUP BY 1),
    per_doc AS (SELECT doc_id, COUNT(1) AS n FROM shingles GROUP BY 1),
    hits AS (
      SELECT s.doc_id, COUNT(1) AS nb
      FROM shingles s JOIN dfreq USING (shingle)
      WHERE df >= 5 GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n, 0) AS INTEGER) AS n_distinct_grams,
           CAST(COALESCE(h.nb, 0) AS INTEGER) AS n_boilerplate_grams,
           CASE WHEN p.n IS NOT NULL
                THEN CAST(COALESCE(h.nb, 0) AS DOUBLE) / p.n
           END AS boilerplate_ratio
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
"""

ORACLES["prefix_template_clusters"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    pref AS (
      SELECT doc_id, md5(array_to_string(w[1:12], ' ')) AS prefix_hash
      FROM t WHERE len(w) >= 12
    )
    SELECT prefix_hash,
           CAST(COUNT(1) AS INTEGER) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM pref GROUP BY 1 HAVING COUNT(1) >= 2
"""

# Filter-decision twin: same four signals (stopword counts via the
# length/replace trick, 3-gram dup ratio as in doc_repetition_scores),
# same thresholds, same first-failing-rule reason order.
ORACLES["quality_filter_decisions"] = """
    WITH base AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w,
             length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) AS n_chars_no_ws,
             CAST((length(p) - length(replace(p, ' the ', ''))) / 5.0
                + (length(p) - length(replace(p, ' and ', ''))) / 5.0
                + (length(p) - length(replace(p, ' of ', ''))) / 4.0
                + (length(p) - length(replace(p, ' to ', ''))) / 4.0 AS INTEGER)
               AS n_stop
      FROM (SELECT *, ' ' || lower(text) || ' ' AS p FROM documents)
    ),
    grams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM base, UNNEST(range(1, len(w) - 1)) AS t(i)
    ),
    gagg AS (
      SELECT doc_id, COUNT(1) AS n_grams, COUNT(DISTINCT g) AS n_distinct
      FROM grams GROUP BY 1
    ),
    scored AS (
      SELECT b.doc_id, b.lang,
             CAST(len(b.w) AS INTEGER) AS n_tokens,
             CAST(b.n_chars_no_ws AS DOUBLE) / len(b.w) AS avg_token_len,
             CAST(b.n_stop AS DOUBLE) / len(b.w) AS stopword_ratio,
             CASE WHEN g.n_grams > 0
                  THEN CAST(g.n_grams - g.n_distinct AS DOUBLE) / g.n_grams
                  ELSE 0.0 END AS dup_gram_ratio
      FROM base b LEFT JOIN gagg g USING (doc_id)
    ),
    decided AS (
      SELECT *,
             CASE WHEN n_tokens < 20 OR n_tokens > 5000 THEN 'LENGTH'
                  WHEN avg_token_len < 3.0 OR avg_token_len > 8.0 THEN 'TOKEN_LEN'
                  WHEN dup_gram_ratio > 0.2 THEN 'REPETITION'
                  WHEN lang = 'en' AND stopword_ratio < 0.01 THEN 'STOPWORDS'
             END AS drop_reason
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, avg_token_len, stopword_ratio, dup_gram_ratio,
           CAST(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep,
           drop_reason
    FROM decided
"""

ORACLES["source_lang_profile"] = """
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')))
                  AS BIGINT) AS total_tokens
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, total_tokens,
           CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source)
             AS share_of_source
    FROM per
"""

# Full-pipeline twin: replays quality (length >= 100) -> exact dedup (md5
# min-id) -> exact 3-gram Jaccard >= 0.8 pairs over the survivors (the LSH
# path's oracle contract) -> recursive-CTE connected components, drop
# non-canonical members -> 5-gram eval-slice decontamination -> min-budget
# mixture with the md5 membership hash -> token-budget packing; emits the
# same seven stage counts the engine's summary row carries.
ORACLES["training_pipeline_summary"] = """
    WITH RECURSIVE
    quality AS (SELECT * FROM documents WHERE length(text) >= 100),
    keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    exact AS (SELECT * FROM quality WHERE doc_id IN (SELECT doc_id FROM keep_exact)),
    toks3 AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM exact
    ),
    sh3 AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks3, UNNEST(range(1, len(w) - 1)) AS t(i)
    ),
    counts AS (SELECT doc_id, COUNT(1) AS n_sh FROM sh3 GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(1) AS n_inter
      FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM inter
      JOIN counts ca ON ca.doc_id = d1
      JOIN counts cb ON cb.doc_id = d2
      WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.8
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION ALL SELECT d2, d1 FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS src, id AS dst FROM nodes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS label FROM reach GROUP BY src),
    neardup AS (
      SELECT * FROM exact
      WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> label)
    ),
    toks5 AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM neardup
    ),
    sh5 AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM toks5, UNNEST(range(1, len(w) - 3)) AS t(i)
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM sh5 t JOIN sh5 e ON t.shingle = e.shingle
      WHERE t.doc_id % 17 <> 0 AND e.doc_id % 17 = 0
    ),
    clean AS (
      SELECT * FROM neardup
      WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    with_tok AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n_tokens
      FROM clean
    ),
    totals AS (SELECT source, SUM(n_tokens) AS total_tokens FROM with_tok GROUP BY source),
    target AS (SELECT CAST(MIN(total_tokens) AS DOUBLE) AS target FROM totals),
    rates AS (
      SELECT source, target.target / total_tokens AS rate
      FROM totals CROSS JOIN target
    ),
    mixed AS (
      SELECT w.doc_id, w.source, w.n_tokens
      FROM with_tok w JOIN rates r USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 AS DOUBLE) < r.rate * 1000000.0
    ),
    packed AS (
      SELECT source,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS seq_id
      FROM mixed
    )
    SELECT
      (SELECT COUNT(*) FROM documents) AS input_docs,
      (SELECT COUNT(*) FROM quality) AS after_quality,
      (SELECT COUNT(*) FROM exact) AS after_exact_dedup,
      (SELECT COUNT(*) FROM neardup) AS after_near_dedup,
      (SELECT COUNT(*) FROM clean) AS after_decontamination,
      (SELECT COUNT(*) FROM mixed) AS after_mixture,
      (SELECT COUNT(*) FROM (SELECT DISTINCT source, seq_id FROM packed))
        AS packed_sequences
"""

ORACLES["passage_dedup_profile"] = """
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    inst AS (
      SELECT doc_id, source,
             md5(array_to_string(w[b.i * 8 + 1 : b.i * 8 + 8], ' ')) AS passage_hash
      FROM toks, UNNEST(range(0, len(w) // 8)) AS b(i)
      WHERE len(w) >= 8
    ),
    pstats AS (
      SELECT source, passage_hash,
             COUNT(1) AS n_inst, COUNT(DISTINCT doc_id) AS n_docs
      FROM inst GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n_inst) AS BIGINT) AS n_passages,
           COUNT(1) AS n_distinct_passages,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_doc_passages,
           CAST(SUM(n_inst) - COUNT(1) AS DOUBLE) / SUM(n_inst)
             AS dup_instance_share
    FROM pstats GROUP BY source
"""

# Full DuckDB twin of the passage REMOVAL rewrite: case-preserving
# split, case-insensitive matching via lower() INSIDE the digest only,
# first occurrence = min (doc_id, block) per digest, rebuilt text =
# kept blocks in order + always-kept tail, single-space joined.
ORACLES["passage_dedup_rewrite"] = """
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
    kept AS (
      SELECT doc_id, b FROM (
        SELECT doc_id, b,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, b) AS rn
        FROM inst
      ) WHERE rn = 1
    ),
    kpd AS (
      SELECT doc_id, list(b ORDER BY b) AS kb, COUNT(1) AS nkept
      FROM kept GROUP BY doc_id
    )
    SELECT base.doc_id, source,
           -- coalesce: DuckDB's array_to_string([]) is NULL where Spark's
           -- concat_ws is '' (the fully-boilerplate-doc case)
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

# The placeholders keep the single-source-of-truth patterns out of f-string
# brace hell ({2,} would be parsed as a format field).
ORACLES["pii_redaction_profile"] = """
    WITH planted AS (
      SELECT source,
             text
             || CASE WHEN doc_id % 7 = 0
                THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                THEN ' host 10.' || (doc_id % 256) || '.' || (doc_id % 200) || '.1'
                ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                THEN ' iban DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                     || lpad(CAST(doc_id AS VARCHAR), 16, '0')
                ELSE '' END
             || CASE WHEN doc_id % 19 = 0
                THEN ' ssn ' || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0')
                     || '-' || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')
                ELSE '' END AS text
      FROM documents
    ),
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(text, '@EMAIL@')) AS e,
             len(regexp_extract_all(text, '@PHONE@')) AS p,
             len(regexp_extract_all(text, '@IP@')) AS i,
             len(regexp_extract_all(text, '@IBAN@')) AS b,
             len(regexp_extract_all(text, '@NATID@')) AS s,
             length(text) - length(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '@EMAIL@', '[EMAIL]', 'g'),
                       '@PHONE@', '[PHONE]', 'g'),
                     '@IP@', '[IP]', 'g'),
                   '@IBAN@', '[IBAN]', 'g'),
                 '@NATID@', '[ID]', 'g')) AS removed
      FROM planted
    )
    SELECT source,
           COUNT(1) AS n_docs,
           CAST(SUM(CASE WHEN e + p + i + b + s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(i) AS BIGINT) AS n_ips,
           CAST(SUM(b) AS BIGINT) AS n_ibans,
           CAST(SUM(s) AS BIGINT) AS n_natids,
           CAST(SUM(removed) AS BIGINT) AS chars_redacted,
           CAST(SUM(CASE WHEN e + p + i + b + s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(1) AS pii_doc_share
    FROM per_doc GROUP BY source
""".replace("@EMAIL@", _PII_EMAIL).replace("@PHONE@", _PII_PHONE).replace(
    "@IP@", _PII_IP
).replace("@IBAN@", _PII_IBAN).replace("@NATID@", _PII_NATID)

ORACLES["dataset_split_assignment"] = f"""
    WITH per_doc AS (
      SELECT source,
             CASE
               WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < {_SPLIT_TRAIN_LT} THEN 'train'
               WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000 < {_SPLIT_VAL_LT} THEN 'val'
               ELSE 'test'
             END AS split,
             len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+')) AS n_tokens
      FROM documents
    ),
    agg AS (
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS split_tokens
      FROM per_doc GROUP BY 1, 2
    ),
    totals AS (SELECT source, COUNT(*) AS source_docs FROM per_doc GROUP BY 1)
    SELECT a.source, a.split,
           CAST(a.n_docs AS INTEGER) AS n_docs,
           a.split_tokens,
           CAST(a.n_docs AS DOUBLE) / t.source_docs AS doc_share
    FROM agg a JOIN totals t USING (source)
"""


# Mirrors q_cross_source_overlap: the SAME shingle fragment the dedup
# oracles use, the same ubiquity cap, counts only (COUNT is BIGINT on
# both engines — no HUGEINT), one IEEE division per share.
ORACLES["cross_source_overlap"] = f"""
    WITH {_DUCK_SHINGLES},
    src AS (
      SELECT DISTINCT d.source, s.shingle
      FROM shingles s JOIN documents d USING (doc_id)
    ),
    cnt AS (SELECT shingle, COUNT(1) AS c FROM src GROUP BY 1),
    kept AS (
      SELECT source, shingle
      FROM src JOIN cnt USING (shingle)
      WHERE c <= {_OVERLAP_MAX_SOURCES}
    ),
    per AS (SELECT source, CAST(COUNT(1) AS BIGINT) AS n FROM kept GROUP BY 1),
    pr AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(1) AS BIGINT) AS n_shared
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           CAST(n_shared AS DOUBLE) / pa.n AS share_of_a,
           CAST(n_shared AS DOUBLE) / pb.n AS share_of_b
    FROM pr
    JOIN per pa ON pr.source_a = pa.source
    JOIN per pb ON pr.source_b = pb.source
"""


# Mirrors q_normalized_dedup_profile: identical accent table and explicit
# classes (byte-identical canonical form), BIGINT casts on the HUGEINT
# sums, one IEEE division.
from ..functions.text import ACCENT_FROM as _ACC_FROM, ACCENT_TO as _ACC_TO

ORACLES["normalized_dedup_profile"] = f"""
    WITH per AS (
      SELECT source,
             md5(text) AS raw_digest,
             md5(trim(regexp_replace(regexp_replace(
                    translate(lower(text), '{_ACC_FROM}', '{_ACC_TO}'),
                    '[^a-z0-9 \\t\\n\\f\\r]+', '', 'g'),
                  '[ \\t\\n\\f\\r]+', ' ', 'g'))) AS norm_digest,
             length(text) AS raw_len,
             length(trim(regexp_replace(regexp_replace(
                    translate(lower(text), '{_ACC_FROM}', '{_ACC_TO}'),
                    '[^a-z0-9 \\t\\n\\f\\r]+', '', 'g'),
                  '[ \\t\\n\\f\\r]+', ' ', 'g'))) AS norm_len
      FROM documents
    )
    SELECT source,
           CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_digest) AS BIGINT) AS n_raw_distinct,
           CAST(COUNT(DISTINCT norm_digest) AS BIGINT) AS n_norm_distinct,
           CAST(SUM(raw_len) AS BIGINT) AS chars_total,
           CAST(SUM(raw_len) - SUM(norm_len) AS BIGINT) AS chars_removed,
           CAST(SUM(raw_len) - SUM(norm_len) AS DOUBLE)
             / CAST(SUM(raw_len) AS BIGINT) AS removal_ratio
    FROM per GROUP BY 1
"""


# Mirrors q_balanced_sample_plan: identical md5 pick key, ROW_NUMBER over
# the same (source, pick_key) total order.
ORACLES["balanced_sample_plan"] = f"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5('bal:' || CAST(doc_id AS VARCHAR)) AS pick_key,
             CAST(len(string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+'))
                  AS INTEGER) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY pick_key)
                  AS INTEGER) AS sample_rank,
             doc_id, n_tokens
      FROM keyed
    )
    SELECT source, sample_rank, doc_id, n_tokens
    FROM ranked WHERE sample_rank <= {_BALANCED_K}
"""

# Quadratic position() scan — the oracle baseline for the anchor-blocked
# engine path (q_contained_doc_pairs); both directed pairs appear for
# equal texts under distinct ids, matching contains() on the engine side.
# Ground truth for the shared-substring query: the same diagonal-islands
# LCS algebra over every doc pair with a matching gram hash. Both engines
# join on the identical md5-prefix 60-bit hash, so the comparison is
# bit-exact by construction (collisions, were one ever to occur, would
# affect both sides identically).
ORACLES["shared_substring_pairs"] = f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS len
      FROM documents
      WHERE length(text) >= {_SHARED_MIN}
    ),
    p AS (
      SELECT doc_id, text,
             unnest(range(1, len - {_SHARED_K} + 2)) AS pos
      FROM d
    ),
    g AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(substring(text, CAST(pos AS INT), {_SHARED_K})), 1, 15))::BIGINT AS gh
      FROM p
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM g a
      JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pa
             ) AS grp
      FROM m
    ),
    isl AS (
      SELECT doc_a, doc_b, COUNT(*) AS run
      FROM runs GROUP BY doc_a, doc_b, diag, grp
    ),
    ov AS (
      SELECT doc_a, doc_b, MAX(run) + {_SHARED_K} - 1 AS overlap_chars
      FROM isl GROUP BY doc_a, doc_b
      HAVING MAX(run) + {_SHARED_K} - 1 >= {_SHARED_MIN}
    )
    SELECT ov.doc_a, ov.doc_b,
           CAST(ov.overlap_chars AS BIGINT) AS overlap_chars,
           CAST(da.len AS BIGINT) AS len_a,
           CAST(db.len AS BIGINT) AS len_b,
           ov.overlap_chars = LEAST(da.len, db.len) AS is_containment
    FROM ov
    JOIN d da ON da.doc_id = ov.doc_a
    JOIN d db ON db.doc_id = ov.doc_b
"""

ORACLES["contained_doc_pairs"] = """
    WITH d AS (SELECT doc_id, text FROM documents)
    SELECT a.doc_id AS contained_doc_id,
           b.doc_id AS container_doc_id,
           CAST(length(a.text) AS BIGINT) AS contained_len,
           CAST(length(b.text) AS BIGINT) AS container_len
    FROM d a
    JOIN d b
      ON a.doc_id <> b.doc_id
     AND position(a.text IN b.text) > 0
"""

# Stupid Backoff twin: identical tokenization (the portable whitespace
# class), identical per-doc lag context, identical count tables from the
# doc_id % 10 reference slice, and the same floored integer division at
# every backoff depth (DuckDB // == Spark div on nonnegative ints) — the
# only double is the final one-division mean.
ORACLES["doc_lm_backoff_scores"] = """
    WITH tok_arrays AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS w
      FROM documents
    ),
    toks AS (
      SELECT doc_id, i AS pos, w[i] AS w
      FROM tok_arrays, UNNEST(range(1, len(w) + 1)) AS t(i)
      WHERE w[i] <> ''
    ),
    ctx AS (
      SELECT doc_id,
             lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             w AS w3
      FROM toks
    ),
    refctx AS (SELECT * FROM ctx WHERE doc_id % 10 = 0),
    uni AS (SELECT w3 AS w, CAST(COUNT(*) AS BIGINT) AS c FROM refctx GROUP BY w3),
    bi AS (
      SELECT w2 AS wa, w3 AS wb, CAST(COUNT(*) AS BIGINT) AS c
      FROM refctx WHERE w2 IS NOT NULL GROUP BY w2, w3
    ),
    tri AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c
      FROM refctx WHERE w1 IS NOT NULL GROUP BY w1, w2, w3
    ),
    nref AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ref FROM refctx),
    joined AS (
      SELECT ctx.doc_id, ctx.w1, ctx.w2,
             tri.c AS c_tri, b12.c AS c_ctx12, b23.c AS c_bi23,
             u2.c AS c_uni2, u3.c AS c_uni3, nref.n_ref
      FROM ctx
      LEFT JOIN tri ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2 AND tri.w3 = ctx.w3
      LEFT JOIN bi b12 ON b12.wa = ctx.w1 AND b12.wb = ctx.w2
      LEFT JOIN bi b23 ON b23.wa = ctx.w2 AND b23.wb = ctx.w3
      LEFT JOIN uni u2 ON u2.w = ctx.w2
      LEFT JOIN uni u3 ON u3.w = ctx.w3
      CROSS JOIN nref
    ),
    scored AS (
      SELECT doc_id,
        CASE
          WHEN w2 IS NULL THEN (1000000 * COALESCE(c_uni3, 0)) // n_ref
          WHEN w1 IS NULL THEN
            CASE WHEN c_bi23 IS NOT NULL THEN (1000000 * c_bi23) // c_uni2
                 ELSE (400000 * COALESCE(c_uni3, 0)) // n_ref END
          ELSE
            CASE WHEN c_tri IS NOT NULL THEN (1000000 * c_tri) // c_ctx12
                 WHEN c_bi23 IS NOT NULL THEN (400000 * c_bi23) // c_uni2
                 ELSE (160000 * COALESCE(c_uni3, 0)) // n_ref END
        END AS micro
      FROM joined
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(micro) AS BIGINT) AS lm_score_sum,
           CAST(SUM(micro) AS DOUBLE) / COUNT(*) AS lm_score_avg
    FROM scored
    GROUP BY doc_id
"""
