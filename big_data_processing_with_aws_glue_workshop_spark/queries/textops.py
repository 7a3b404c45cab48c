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

from ._tables import load


# Portable whitespace class: Java regex \s includes \x0B (vertical tab),
# RE2's (DuckDB) does not — spelling the class out keeps Spark and the
# oracle bit-identical on any input.
_WS = r"[ \t\n\f\r]"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), _WS + "+")


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
    sh = _shingles(d).cache()
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


QUERIES = {
    "doc_token_stats": q_doc_token_stats,
    "doc_quality_scores": q_doc_quality_scores,
    "language_id": q_language_id,
    "doc_dedup_profile": q_doc_dedup_profile,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "doc_fingerprint": q_doc_fingerprint,
    "minhash_near_duplicates": q_minhash_near_duplicates,
    "simhash_fingerprints": q_simhash_fingerprints,
    "doc_dup_components": q_doc_dup_components,
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
