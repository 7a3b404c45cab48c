"""Count-Min sketch: bounded-size frequency state for ultra-wide key
domains (Cormode & Muthukrishnan 2005).

Why this exists next to exact groupBy counts: at 100 TB the key domain
of URLs / shingles / n-grams can be billions-wide — an exact count
table IS the corpus-scale object, and maintaining it incrementally
means an O(distinct keys) state rewrite per refresh. A CMS caps the
state at ``depth x width`` counters REGARDLESS of domain size, never
underestimates, and overestimates by at most eps*N (eps = e/width)
with probability 1 - (1/e)^depth per query — the right tool for
"which shingles/URLs are hot" when the long tail doesn't matter.

Spark shape (everything JVM-side, no UDFs):

- ``cms_sketch``: per input row, compute ``depth`` bucket indexes with
  seeded xxhash64 and explode to (row, bucket) pairs; one groupBy sums
  them. The output is a DataFrame of at most depth*width rows — a
  COUNT MONOID keyed by (row, bucket), so it merges with plain
  ``union + groupBy sum`` (``cms_merge``) and, critically, rides
  ``plans/incremental.incremental_agg_refresh`` unchanged: group keys
  = (row, bucket), agg = count — bounded-size incremental frequency
  state with the existing crash-replay discipline (pinned by
  tests/test_sketch.py).
- ``cms_estimate``: recompute the same buckets for the queried keys,
  left-join the sketch (missing bucket = 0), take the per-key MIN over
  depth rows. Estimates are deterministic given (seed, depth, width) —
  xxhash64 is the same function everywhere — so tests pin exact
  values, not distributions.
- ``cms_heavy_hitters``: filter a candidate key set by estimate >=
  threshold. CMS never underestimates, so recall over the candidates
  is 1.0 by construction; false positives are bounded by eps*N.
  (Candidate generation is the caller's job — e.g. the increment's own
  distinct keys during a refresh, the standard streaming pattern.)

No reference-repo counterpart (beyond-reference family, like the HLL
``approx_distinct_profile``); the estimator is engine-deterministic
but not SQL-portable, so it ships pytest-pinned rather than
driver-oracled — same contract class as the ANN recall pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: module defaults, exported so CLIs/readouts never re-type them (a
#: hardcoded copy that drifts from these yields wrong fill/FP readouts
#: — r9 review)
BLOOM_N_BITS = 1 << 20
BLOOM_K = 5
HLL_P = 12
CMS_DEPTH = 5
CMS_WIDTH = 65_536
SKETCH_SEED = 42


def _bucket(key_col, row: int, width: int, seed: int):
    # one independent hash row per sketch row: seed the hash with the row
    # index so rows disagree on collisions
    return F.pmod(F.xxhash64(F.lit(seed + row), key_col), F.lit(width))


def cms_bucket_pairs(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """Per input row: the ``depth`` (row, bucket) pairs of ``key_col`` —
    the ROW-WISE expansion that lets the CMS ride
    ``plans/incremental.incremental_agg_refresh`` directly from raw key
    files (keys=["row", "bucket"], aggs={"n": ("count", "*")}), exactly
    like ``hll_register_pairs`` / ``bloom_mask_pairs``. NULL keys
    excluded."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _bucket(F.col(key_col), r, width, seed).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .select(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Build a Count-Min sketch of ``key_col`` occurrences: returns
    ``(row, bucket, n)`` with at most depth*width rows. NULL keys are
    excluded (count them separately if they matter)."""
    return (
        cms_bucket_pairs(df, key_col, depth=depth, width=width, seed=seed)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over disjoint data unions are additive (the monoid):
    merge = union + groupBy sum. Only valid for sketches built with the
    same (depth, width, seed) — the caller owns that calibration, as
    with the near-dup signature state."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate the count of every key in ``keys`` (one column, or
    a frame whose ``key_col`` is queried): returns ``(key_col, est)``
    with est = min over rows of the bucket counters. Never less than
    the true count."""
    k = keys.select(key_col).distinct().filter(F.col(key_col).isNotNull())
    probes = k.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width, seed).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Candidates whose estimated count reaches ``threshold`` —
    perfect recall over the candidate set (CMS never underestimates),
    precision bounded by the eps*N overestimate."""
    return cms_estimate(
        sketch, candidates, key_col, depth=depth, width=width, seed=seed
    ).filter(F.col("est") >= threshold)


def cms_join_size_estimate(a: DataFrame, b: DataFrame, depth: int = CMS_DEPTH) -> int:
    """Equi-join OUTPUT cardinality estimate from two CMS tables — the
    Cormode-Muthukrishnan inner-product estimator (2005, §4.2): per
    sketch row, sum bucket-wise products of the two counter vectors;
    report the MIN over rows.

    Why it earns its place: |A ⋈ B| on a key equals the inner product
    of the two key-frequency vectors, and that number — not |A| or |B|
    — is what decides broadcast-vs-shuffle-vs-salt for a join whose
    inputs are corpus-scale (a hot-key pair can make a "small" join's
    OUTPUT explode; ``operators/skew.py::skew_profile`` sees one side's
    skew, this sees the interaction). Both sketches are the bounded
    depth*width tables the refresh machinery already maintains, so the
    estimate costs one (row, bucket) inner join over <= depth*width
    rows — no scan of either input.

    Guarantees (same direction as every CMS readout): NEVER
    underestimates — every row's inner product equals the true join
    size plus nonnegative collision cross-terms — and overestimates by
    at most eps * |A| * |B| (eps = e/width) with probability
    1 - (1/e)^depth. Both sketches must share (depth, width, seed);
    the caller owns that calibration, as with cms_merge. Missing
    buckets contribute zero product, so the inner join is exact.
    Driver-side scalar readout, like hll_estimate."""
    prod = (
        a.join(b.withColumnRenamed("n", "__n_b"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("n") * F.col("__n_b")).alias("ip"))
    )
    rows = prod.collect()
    if len(rows) < depth:
        # a row absent from the product means that row's vectors share
        # no occupied bucket: its inner product — and the min — is 0
        return 0
    return int(min(r["ip"] for r in rows))


# ---------------------------------------------------------------------------
# HyperLogLog register table: the distinct-count twin of the CMS story
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct answers one-shot queries; what it cannot
# do is MAINTAIN a distinct count across incremental refreshes without
# re-reading history. An explicit HLL register table can: registers are
# (register, max_rho) rows — a MAX MONOID — so the same
# incremental_agg_refresh that maintains counts maintains distincts
# ({"rho": ("max", "rho")}), and merging corpora is a groupBy max. All
# JVM-side: the register index and rank come from xxhash64 bit tricks,
# deterministic across engines and runs.


def hll_register_pairs(
    df: DataFrame, key_col: str, p: int = HLL_P, seed: int = SKETCH_SEED
) -> DataFrame:
    """Per input row: the (register, rho) pair of ``key_col``'s hash —
    land these (or groupBy-max them) and the max monoid does the rest.
    m = 2^p registers; rho = leading-zeros-of-suffix + 1 per the HLL
    paper, computed from bin() length (bit-exact, no floats)."""
    h = F.xxhash64(F.lit(seed), F.col(key_col))
    m = 1 << p
    # register = low p bits; suffix = the remaining 64-p bits (as a
    # nonnegative value): rho = (64-p) - bitlength(suffix) + 1, with the
    # all-zero suffix taking the max rank (64-p+1). length(bin(x)) for
    # x > 0 is exactly its bit length; shiftrightunsigned keeps the
    # suffix nonnegative.
    suffix = F.shiftrightunsigned(h, p)
    rho = F.when(suffix == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p + 1) - F.length(F.bin(suffix))
    )
    return df.filter(F.col(key_col).isNotNull()).select(
        F.pmod(h, F.lit(m)).cast("int").alias("register"),
        rho.cast("int").alias("rho"),
    )


def hll_sketch(
    df: DataFrame, key_col: str, p: int = HLL_P, seed: int = SKETCH_SEED
) -> DataFrame:
    """The register table: (register, rho) with rho = max rank seen —
    at most 2^p rows regardless of cardinality."""
    return (
        hll_register_pairs(df, key_col, p=p, seed=seed)
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union + groupBy max — the monoid. Same (p, seed) required, as
    with cms_merge."""
    return a.unionByName(b).groupBy("register").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = HLL_P) -> float:
    """Cardinality estimate from a register table (Flajolet et al. 2007
    with the standard small-range linear-counting correction). One tiny
    aggregate over <= 2^p rows; the only driver-side math is the final
    closed-form arithmetic."""
    import math

    m = 1 << p
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    ).first()
    nonzero = agg["nz"] or 0
    zeros = m - nonzero
    s = (agg["s"] or 0.0) + zeros  # absent registers contribute 2^0
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / s
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)  # linear counting
    return raw


def hll_intersection_estimate(a: DataFrame, b: DataFrame, p: int = HLL_P) -> float:
    """|A intersect B| by inclusion-exclusion over three HLL readouts:
    est(A) + est(B) - est(A union B), with the union register table
    coming free from the max monoid (hll_merge — EXACTLY the registers
    a single pass over A ++ B would produce, no extra data pass).

    The overlap-planning readout for corpus curation: "how much of this
    new crawl is already in the standing corpus" / "how contaminated is
    this source pair" from two register tables the refresh machinery
    already maintains — without the exact distinct-join that is itself
    a corpus-scale shuffle. Caveat callers must own: the absolute error
    is driven by the UNION's cardinality (~1.04/sqrt(2^p) relative on
    each term), so a small true intersection under a huge union drowns
    in the union's noise — use the Jaccard readout of
    ``minima_sample``/``minima_jaccard`` when the expected overlap
    share is tiny; clamped at 0 below. Same (p, seed) required on both
    sketches, as with hll_merge."""
    est_a = hll_estimate(a, p=p)
    est_b = hll_estimate(b, p=p)
    est_union = hll_estimate(hll_merge(a, b), p=p)
    return max(0.0, est_a + est_b - est_union)


# ---------------------------------------------------------------------------
# Bloom filter: map-side membership for decontamination-scale anti-joins
# ---------------------------------------------------------------------------
#
# The decontamination shape at 100 TB: "does this corpus shingle appear
# in the benchmark set" is an anti-join of a corpus-scale probe side
# against a small-but-not-tiny build side. A Bloom filter turns it into
# a MAP-SIDE membership check: the benchmark's shingles compress to an
# n_bits bitmap (built with one groupBy bit_or over word indexes), the
# bitmap's <= n_bits/64 words broadcast-join to the probes, and only
# bloom-positive probes reach the exact verify. Zero false negatives by
# construction (tested as an exact invariant) — the filter can only
# ADMIT extra candidates, never lose a contaminated one — and the
# false-positive rate follows (1 - e^{-kn/m})^k. All JVM-side xxhash64
# bit arithmetic, deterministic under the seed.


def bloom_mask_pairs(
    df: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """Per input row: the k (word, mask) pairs of ``key_col``'s Bloom
    bits — the ROW-WISE expansion that lets the filter state ride
    ``plans/incremental.incremental_agg_refresh`` directly from raw key
    files (keys=["word"], aggs={"bits": ("bit_or", "mask")}), exactly
    like ``hll_register_pairs`` does for the HLL max monoid. NULL keys
    excluded."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.lit(seed + i), F.col(key_col)),
                            F.lit(n_bits),
                        )
                        for i in range(k)
                    ]
                )
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """Build the bitmap as a (word, bits) table: word = bit_index div 64,
    bits = OR of the member masks — at most n_bits/64 rows, a BIT-OR
    MONOID (merge = groupBy bit_or; rides incremental_agg_refresh via
    ``bloom_mask_pairs`` as the transform — pinned by
    tests/test_sketch.py)."""
    return (
        bloom_mask_pairs(df, key_col, n_bits=n_bits, k=k, seed=seed)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union + groupBy bit_or — the monoid. Same (n_bits, k, seed)
    required, as with cms_merge/hll_merge."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """Rows of ``probes`` whose key is bloom-POSITIVE (all k bits set).

    The bitmap is packed into ONE row — a DENSE ``array<long>`` of
    n_bits/64 words (128 KB at the defaults; absent words filled with
    0) — by a single aggregation, broadcast once, and the k membership
    lookups run as pure JVM expressions (positional ``element_at`` +
    bitwise AND, O(1) per lookup) over every probe row: map-side, no
    shuffle of probe rows, no per-row id, fully deterministic under
    retries. Every earlier formulation had a flaw this one doesn't
    (all r9-measured): the explode/groupBy round trip needed a
    retry-unstable monotonically_increasing_id; k chained broadcast
    joins recomputed the entire bloom-build subtree k times (no
    exchange reuse across differently-aliased projections); a
    word->bits MAP pack made each lookup a linear scan over the 16k
    entries (Spark's non-literal-map element_at does not hash — 7x
    slower at an 8M-row probe side). The only internal columns are
    ``__``-prefixed, so probe frames may themselves carry ``word``/
    ``bits`` columns. Feed the output to an exact verify: positives
    are candidates, negatives are PROVEN absent."""
    # the packed formulation is only safe while the whole bitmap fits a
    # single broadcast row: 2^28 bits = 32 MB of longs, already past the
    # comfortable broadcast size. A billions-key filter needs n_bits ~
    # 2^33+, which must NOT silently build a gigabyte collect_list row —
    # refuse loudly and point at the scale paths.
    if n_bits > (1 << 28):
        raise ValueError(
            f"bloom_probe: n_bits={n_bits} packs to a "
            f"{n_bits // 64 * 8 / 2**20:.0f} MB single-row broadcast — "
            "beyond 2^28 bits, shard the filter (one bloom_probe per key "
            "range) or join the (word, bits) table directly instead of "
            "broadcasting the packed bitmap"
        )
    cols = probes.columns
    n_words = (n_bits + 63) // 64
    dense = (
        bloom.sparkSession.range(n_words)
        .select(F.col("id").alias("word"))
        .join(bloom, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    packed = dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("word"), F.col("bits")))),
            lambda s: s["bits"],
        ).alias("__bloombits")
    )
    out = probes.crossJoin(F.broadcast(packed))
    hit = None
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(seed + i), F.col(key_col)), F.lit(n_bits))
        out = out.withColumn(f"__pos{i}", pos)
        # element_at is 1-based; word index = pos div 64. SQL shiftleft:
        # the Python API wants a literal bit count, the SQL form accepts
        # a column
        word1 = (F.col(f"__pos{i}") / 64).cast("int") + 1
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))")
        c = F.element_at(F.col("__bloombits"), word1).bitwiseAND(mask) != 0
        hit = c if hit is None else hit & c
    return out.filter(hit).select(*cols)


# ---------------------------------------------------------------------------
# Slot-minima coordinated sample: bounded-size MERGEABLE uniform sample
# ---------------------------------------------------------------------------
#
# The fourth member of the sketch family (frequency = CMS, distinct =
# HLL, membership = Bloom, SAMPLE/quantiles = this): hash every key to
# one of ``slots`` buckets with an md5-derived slot hash, rank it with
# an INDEPENDENT md5-derived 60-bit uniform, and keep, per slot, the
# single row with the minimum (rank, key, payload...) struct. The state
# is at most ``slots`` rows and is a MIN MONOID on a struct column, so
# it merges with plain ``union + groupBy min`` and rides
# ``plans/incremental.incremental_agg_refresh`` UNCHANGED (group key =
# slot, agg = min over the struct) — the no-new-framework property the
# rest of the family establishes. Classic constructions this composes:
# per-bucket minima of a shared hash are Cohen's coordinated /
# bottom-k samples (Cohen & Kaplan 2007), the bucketed layout is
# Flajolet-Martin stochastic averaging, and one shared permutation
# across buckets is one-permutation hashing (Li, Owen & Zhang 2012).
#
# What the one small state answers, all order- and partition-
# independently (every readout is deterministic given (slots, seed)):
#
# - a uniform-without-replacement sample of ~min(n, slots) rows that
#   stays uniform under incremental refresh — the "maintain a held-out
#   eval sample of the whole corpus as it grows" pipeline primitive;
# - empirical quantiles of any payload column with DKW sampling error
#   O(1/sqrt(slots)) INDEPENDENT of the value distribution (the
#   log-histogram path bounds RELATIVE value error instead — the two
#   are complementary);
# - a distinct-count estimate from the rank minima (MinCount /
#   order-statistics estimator, Lumbroso 2010, with a linear-counting
#   small-range fallback, Whang et al. 1990) — cross-checks the HLL;
# - corpus-vs-corpus resemblance: two states with the SAME calibration
#   are coordinated, so slot-wise min agreement estimates the Jaccard
#   of the two key sets (the one-permutation MinHash estimator).
#
# Unlike CMS/HLL (xxhash64, not SQL-portable), the md5 rank IS
# cross-engine (same construction as operators/mixture.py::_id_hash;
# DuckDB twin ('0x'||substr(md5(x),1,15))::BIGINT), so the sample —
# and any exact readout over it, e.g. quantiles — can be DuckDB-
# hash-oracled end to end.

SAMPLE_SLOTS = 4_096
_RANK_MOD = 1 << 60  # 15 hex digits of md5 — the full conv() width


def _md5_uniform(col, salt: str):
    """60-bit md5-derived uniform integer in [0, 2^60), engine-portable
    (DuckDB: ('0x'||substr(md5(x||'<salt>'),1,15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")


def sample_minima_pairs(
    df: DataFrame,
    key_col: str,
    payload_cols: list | None = None,
    slots: int = SAMPLE_SLOTS,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """(slot, r) pairs feeding the min monoid: r = struct(rank, key,
    payload...). The refresh ``transform`` partner (cf. cms_bucket_pairs/
    hll_register_pairs/bloom_mask_pairs): row-wise, deterministic, so the
    crash-replay contract of incremental_agg_refresh carries over. Slot
    and rank hashes use different salts so they are independent. NULL
    keys excluded, like the sibling pair builders (a NULL key would
    hash to a NULL slot row and break the <= slots state bound)."""
    key = F.col(key_col)
    fields = [
        _md5_uniform(key, f"#{seed}").alias("rank"),
        key.cast("string").alias("key"),
    ]
    for c in payload_cols or []:
        fields.append(F.col(c))
    return df.filter(key.isNotNull()).select(
        F.pmod(_md5_uniform(key, f"@{seed}"), F.lit(slots)).alias("slot"),
        F.struct(*fields).alias("r"),
    )


def minima_sample(
    df: DataFrame,
    key_col: str,
    payload_cols: list | None = None,
    slots: int = SAMPLE_SLOTS,
    seed: int = SKETCH_SEED,
) -> DataFrame:
    """One-shot build: at most ``slots`` rows of (slot, r). Duplicate
    keys collapse (same slot, same rank, min takes one) — the sample is
    of the DISTINCT key set, which is what makes the distinct estimator
    and the Jaccard readout sound."""
    return (
        sample_minima_pairs(df, key_col, payload_cols, slots, seed)
        .groupBy("slot")
        .agg(F.min("r").alias("r"))
    )


def minima_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Monoid merge — associative, commutative, idempotent (min of
    struct). States must share (slots, seed, key_col): pin the
    calibration exactly as the other sketches do."""
    return a.unionByName(b).groupBy("slot").agg(F.min("r").alias("r"))


def sample_rows(state: DataFrame) -> DataFrame:
    """Unpack the state to plain sample rows (slot, rank, key,
    payload...): ~min(n_distinct, slots) rows, uniform over the distinct
    key set by symmetry of the hashes."""
    return state.select("slot", "r.*")


def minima_distinct_estimate(
    state: DataFrame, slots: int = SAMPLE_SLOTS
) -> float:
    """Distinct-key estimate from the rank minima.

    Large range (all slots filled): order-statistics MLE
    n ~= m(m-1)/sum(u_i) with u_i = (rank_i+1)/2^60 (Lumbroso 2010) —
    std error ~ 1/sqrt(m). Small range (empty slots exist): linear
    counting n ~= -m ln(e/m) over the e empty slots (Whang et al.
    1990), exact in expectation while collisions are rare. The
    crossover is the same small-range-correction shape HLL uses.
    Driver-side scalar readout of a <= ``slots``-row state. Refuses a
    ``slots`` that contradicts the state (a slot id out of range or
    more rows than slots) — a mismatched calibration would silently
    skew the estimate instead of erroring."""
    import math

    rows = state.select("slot", "r.rank").collect()
    filled = len(rows)
    if filled and (filled > slots or max(r["slot"] for r in rows) >= slots):
        raise ValueError(
            f"state has {filled} rows with max slot "
            f"{max(r['slot'] for r in rows)} — inconsistent with "
            f"slots={slots}; pass the calibration the state was built with"
        )
    empty = slots - filled
    if empty > 0:
        return -slots * math.log(empty / slots)
    total_u = sum((r["rank"] + 1) / _RANK_MOD for r in rows)
    return slots * (slots - 1) / total_u


def minima_jaccard(a: DataFrame, b: DataFrame) -> float:
    """Estimate the Jaccard similarity of the two states' DISTINCT key
    sets: same-calibration states are coordinated samples, so
    P(slot minima agree | slot occupied by either) = J(A, B) up to
    O(1/sqrt(slots)) (one-permutation MinHash, Li-Owen-Zhang 2012;
    empty-slot alignment per Shrivastava-Li 2014 densification caveat:
    slots occupied by NEITHER corpus are simply excluded, which keeps
    the estimator unbiased without densifying). Scalar readout —
    the full outer join is on <= slots rows per side."""
    pa = a.select("slot", F.col("r.rank").alias("ra"), F.col("r.key").alias("ka"))
    pb = b.select("slot", F.col("r.rank").alias("rb"), F.col("r.key").alias("kb"))
    both = pa.join(pb, "slot", "full_outer")
    agg = both.agg(
        F.count(F.lit(1)).alias("union_slots"),
        F.sum(
            ((F.col("ra") == F.col("rb")) & (F.col("ka") == F.col("kb")))
            .cast("int")
        ).alias("agree"),
    ).collect()[0]
    if not agg["union_slots"]:
        return 0.0
    return (agg["agree"] or 0) / agg["union_slots"]


def sample_quantiles(
    state: DataFrame, field: str, qs: list
) -> dict:
    """Empirical quantiles of a payload column over the sample: sort
    the <= slots sample values, take the LOWER empirical quantile
    (index floor(q*(n-1))) — a deterministic selection of an actual
    data value, so exact-dtype readouts survive cross-engine hashing.
    Sampling error in RANK terms is bounded by DKW:
    P(|F_sample - F| > eps) <= 2 exp(-2*n*eps^2) — eps ~ 2.1% at
    n = 4096 slots with 99% confidence, independent of the value
    distribution."""
    vals = sorted(
        r[0] for r in state.select(f"r.{field}").collect() if r[0] is not None
    )
    if not vals:
        return {q: None for q in qs}
    n = len(vals)
    return {q: vals[int(q * (n - 1))] for q in qs}
