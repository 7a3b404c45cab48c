"""Iterative graph primitives on DataFrames: PageRank, triangle census,
k-core peeling, degree capping.

Companions to the min-label-propagation connected components in
extensions/dedup_fuzzy.py — together the standard graph toolkit a
training-data pipeline needs over link/co-occurrence graphs: components
(dedup canonicalization), rank (importance / crawl-prioritization /
quality priors), local density (community structure, link-spam), cores
(community kernels), and hub curation (skew control).

Exactness contract: ranks are INTEGER micro-mass (a fixed total mass
split by integer division); every per-edge contribution is
``pr div outdeg`` and every damping update is
``(15*base + 85*incoming) div 100`` — all BIGINT ops, so results are
independent of partitioning and aggregation order (a floating-point sum
would expose both). Bit-identical to a chained-CTE SQL evaluation of the
same algebra (pinned by the copurchase_pagerank driver oracle).

Scale notes: the caller supplies a CACHED adjacency-list DataFrame
``(src, dsts: array)`` — one row per vertex, built with one shuffle from
the pair stream (see queries/relational.py::q_copurchase_pagerank).
Per iteration: one vertex-keyed join (ranks ⋈ exploded adjacency; the
explode is map-side off the cached adjacency) and one groupBy(dst) with
map-side partial sums. Lineage grows one join+agg per round, so past a
handful of rounds the plan itself becomes the bottleneck —
``checkpoint_every`` truncates it with a lazy localCheckpoint, the same
pattern the CC loop uses. Skew unit = the adjacency row of a ubiquitous
vertex; cap neighbor lists upstream with ``cap_vertex_degree`` (a
vertex linked to everything carries no ranking signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(
    adj: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000_000_000,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Damped (d=0.85) integer-exact PageRank over an adjacency list.

    ``adj``: one row per vertex — ``(src, dsts: array)`` with dsts the
    DISTINCT out-neighbors; must contain every vertex (graphs built from
    symmetric co-occurrence edges satisfy this — no dangling vertices,
    so no dangling-mass term). ASYMMETRIC input violates the contract:
    a vertex with out-edges but zero in-edges receives no ``incoming``
    row, so it silently leaves the rank vector after round 1 and its
    base mass leaks — ``cap_vertex_degree`` output is only valid here
    with ``resymmetrize=True``. Returns ``(node, pr)`` with pr the BIGINT
    micro-mass rank. Total mass is conserved up to integer-division
    truncation (bounded by n_edges + n_nodes per round).
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    n_nodes = adj.count()
    if n_nodes == 0:
        raise ValueError(
            "adjacency is empty — PageRank needs at least one vertex "
            "(a source whose every order holds a single part builds an "
            "edgeless co-purchase graph)"
        )
    base = scale // n_nodes
    # r18 note: a shuffle-once iterate shape (explode + repartition(src) +
    # persist of the round-invariant edge list, the GraphX recipe) was
    # implemented, measured NEUTRAL at sf0.1, and REVERTED on plan
    # evidence: an InMemoryRelation whose child is an AdaptiveSparkPlan
    # reports opaque output partitioning to the outer planner, so every
    # round's join re-added the src exchange anyway — the DataFrame+AQE
    # API cannot express the partitioning reuse the recipe needs (the
    # same opacity q_sole_late_supplier_blame documents on its cached
    # aggregate). The explode itself is cheap map work off the caller's
    # cached adjacency; re-deriving it per round costs less than caching
    # the per-edge rows would at 100 TB.
    edges_deg = adj.select(
        "src", F.size("dsts").alias("outdeg"), F.explode("dsts").alias("dst")
    )
    ranks = adj.select(F.col("src").alias("node"), F.lit(base).alias("pr"))
    for i in range(n_iter):
        incoming = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("pr div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
        )
        ranks = incoming.select(
            F.col("dst").alias("node"),
            (F.lit(15 * base) + F.lit(85) * F.col("incoming")).alias("num"),
        ).select("node", F.expr("num div 100").alias("pr"))
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            # truncate lineage: past ~8 rounds the accumulated join+agg
            # plan dominates executor time (measured in docs/SCALE.md)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def personalized_pagerank(
    adj: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000_000_000,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Personalized PageRank: the damping reset returns mass to a SEED
    set instead of spreading it uniformly — the seed-expansion primitive
    (given a trusted/curated seed corpus, rank everything by proximity to
    it: related-item retrieval, quality-prior propagation from vetted
    sources, topic-local crawl prioritization).

    Same integer micro-mass algebra as ``pagerank_integer`` (bit-exact,
    order-independent): seeds start with ``scale div n_seeds`` each, and
    every update is ``(15·seed_base·[node∈seeds] + 85·incoming) div 100``.

    The scale property global PageRank lacks: the rank vector is SPARSE —
    only nodes already reached by mass carry a row (absent = exactly 0,
    and integer truncation re-zeroes negligible far-field mass), so state
    is frontier-sized, not graph-sized: k rounds touch at most the
    seeds' k-hop neighborhood regardless of graph size. Per round: one
    vertex-keyed join against the (small) rank frontier + one groupBy —
    the full edge list is only ever probed, never materialized into the
    state. Returns ``(node, pr)`` for nodes with pr > 0.
    """
    from ..util import tracked_cache

    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    # the seed set is referenced by every round's reset join plus the
    # initial frontier; Spark shares no common subplans, so an uncached
    # seed DataFrame re-executes its (possibly fact-sized) defining plan
    # once per reference — measured 4x on the scored query. Seeds are
    # small by definition; pin them.
    seed_nodes = tracked_cache(
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("seed set is empty — personalized PageRank needs seeds")
    seed_base = scale // n_seeds
    reset = seed_nodes.select("node", F.lit(15 * seed_base).alias("reset"))
    # r18: the shuffle-once edge-list persist was reverted here too — see
    # pagerank_integer's note (AQE-cached partitioning is opaque, the
    # per-round exchange came back in the plan dump)
    edges_deg = adj.select(
        "src", F.size("dsts").alias("outdeg"), F.explode("dsts").alias("dst")
    )
    ranks = seed_nodes.select("node", F.lit(seed_base).alias("pr"))
    for i in range(n_iter):
        incoming = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("pr div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
            .select(F.col("dst").alias("node"), "incoming")
        )
        ranks = (
            incoming.join(reset, "node", "full_outer")
            .select(
                "node",
                (
                    F.coalesce(F.col("reset"), F.lit(0))
                    + F.lit(85) * F.coalesce(F.col("incoming"), F.lit(0))
                ).alias("num"),
            )
            .select("node", F.expr("num div 100").alias("pr"))
            .filter(F.col("pr") > 0)
        )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_census(adj: DataFrame) -> DataFrame:
    """Global triangle/wedge census of an undirected graph given as a
    symmetric adjacency list ``(src, dsts: array)`` — one row:
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering).
    The symmetry is load-bearing: on asymmetric input (e.g. raw
    ``cap_vertex_degree`` output) ``n_edges = sum(deg) div 2``
    undercounts and the orientation can miss triangles — re-symmetrize
    first (``cap_vertex_degree(..., resymmetrize=True)``).

    Scale design — degree-ordered orientation + edge-iterator
    intersection (the standard distributed triangle count): direct every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one; each triangle then has exactly one vertex with out-edges to the
    other two, so triangles = Σ over oriented edges (u,v) of
    |N⁺(u) ∩ N⁺(v)| — each triangle counted once, at its (min, mid)
    edge. The orientation bounds every out-degree at O(sqrt(m))
    REGARDLESS of raw-degree skew (a celebrity vertex with 10^7
    neighbors keeps out-edges only toward its few higher-degree peers),
    so total intersection work is O(m^1.5) worst-case, the known optimum
    for exact counting. The intersection runs as ONE array_intersect per
    edge inside whole-stage codegen — no wedge-pair materialization: the
    first-cut explode-pairs + semi-join variant shuffled ~35M candidate
    rows at sf0.1 and ran 7.0 s; this formulation carries m rows with
    two bounded arrays each and runs 4.6 s on the same graph
    (docs/SCALE.md).

    n_wedges is the raw Σ C(deg, 2) over undirected degrees (the
    clustering-coefficient denominator), computed in the same pass as
    the degrees — no extra shuffle. global_clustering = 3·triangles /
    wedges, ONE IEEE division of exact BIGINT inputs (oracle contract).
    """
    deg = adj.select(
        "src",
        F.size("dsts").alias("deg"),
        "dsts",
    )
    # coalesce(0): an EMPTY adjacency must yield zero counts, not the
    # NULLs SQL sums produce over zero rows
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.expr("sum(deg) div 2"), F.lit(0)).alias("n_edges"),
        F.coalesce(
            F.sum(F.expr("deg * (deg - 1) div 2")), F.lit(0)
        ).alias("n_wedges"),
    )
    # oriented edges: (src, dst) with (deg_src, src) < (deg_dst, dst)
    edges = deg.select("src", F.col("deg").alias("sdeg"), F.explode("dsts").alias("dst"))
    ddeg = deg.select(F.col("src").alias("dst"), F.col("deg").alias("ddeg"))
    oriented = edges.join(ddeg, "dst").filter(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")
    # per-vertex out-neighbor sets (bounded at O(sqrt(m)) by orientation),
    # attached to both endpoints of every oriented edge; a sink vertex has
    # no out-set -> left join + empty-array coalesce contributes zero
    out_adj = oriented.groupBy("src").agg(F.collect_set("dst").alias("outs"))
    e_u = oriented.join(out_adj, "src").select(
        "src", "dst", F.col("outs").alias("outs_u")
    )
    out_v = out_adj.select(F.col("src").alias("dst"), F.col("outs").alias("outs_v"))
    tri = (
        e_u.join(out_v, "dst", "left")
        .select(
            F.size(
                F.array_intersect(
                    "outs_u",
                    F.coalesce(
                        "outs_v",
                        F.array().cast(
                            out_adj.schema["outs"].dataType.simpleString()
                        ),
                    ),
                )
            ).alias("common")
        )
        .agg(F.coalesce(F.sum("common"), F.lit(0)).alias("n_triangles"))
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        # wedge-free graphs (perfect matchings, empty input) are in
        # contract: clustering is 0.0 there, not a NULL division
        F.when(
            F.col("n_wedges") > 0,
            (F.lit(3) * F.col("n_triangles")).cast("double")
            / F.col("n_wedges"),
        ).otherwise(F.lit(0.0)).alias("global_clustering"),
    )


def k_core(adj: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Vertices of the k-core — the maximal subgraph where every vertex
    keeps degree ≥ k — by iterative peeling: drop every vertex whose
    CURRENT degree is below k, delete its edges, repeat to fixpoint.
    The fourth graph primitive alongside CC (components), PageRank
    (importance) and the triangle census (density): cores isolate the
    tightly-knit region of a link/co-occurrence graph (community
    kernels; spam farms peel away early).

    Input is the symmetric adjacency list ``(src, dsts: array)``;
    output ``(node, core_degree)`` — the surviving vertices with their
    within-core degree (every core_degree ≥ k by construction).

    Scale shape, one Spark job per round (the CC loop's recipe): degrees
    are one map-side size()/explode aggregation; peeling is two
    semi-joins of the edge list against the survivor set; the edge list
    is localCheckpoint()ed each round so lineage stays flat, and the
    convergence probe (a full count of surviving vertices) is the action
    that materializes it. Rounds = the graph's peeling depth, typically
    tens even for billion-edge graphs (degeneracy ordering literature);
    a non-converged loop fails loud like connected_components.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    edges = adj.select("src", F.explode("dsts").alias("dst")).localCheckpoint()
    n_prev = edges.select("src").distinct().count()
    converged = n_prev == 0  # an edgeless graph has an empty k-core
    for _ in range(max_iter):
        if converged:
            break
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.filter(F.col("core_degree") >= k)
        new_edges = (
            edges.join(keep.select("src"), "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n_now = new_edges.select("src").distinct().count()
        old = edges
        edges = new_edges
        try:
            old.unpersist()
        except Exception:
            pass
        if n_now in (n_prev, 0):
            # fixpoint: edges are removed only when an endpoint is peeled,
            # and any peeled/edge-stripped vertex leaves src — so an
            # unchanged vertex count means new_edges == edges exactly
            # (0 = everything peeled; the final aggregate is empty)
            converged = True
        n_prev = n_now
    if not converged:
        raise RuntimeError(
            f"k_core did not converge within max_iter={max_iter} rounds; "
            "the peeling cascade is deeper than expected — raise max_iter"
        )
    return edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("core_degree")
    ).select(F.col("src").alias("node"), "core_degree")


def cap_vertex_degree(
    adj: DataFrame, cap: int, resymmetrize: bool = False
) -> DataFrame:
    """Bound every neighbor list at ``cap`` — the skew mitigation the
    rank/census docstrings prescribe for ubiquitous vertices (a part
    co-bought with everything, a page linked from everywhere: such hubs
    dominate memory and carry little signal).

    Deterministic: lists are sorted before slicing, so the kept neighbors
    are partitioning-independent (same engine-portability rule as every
    other sampling decision in this repo — never "first k seen").

    Capping is explicitly an APPROXIMATION of the graph, and the raw
    slice BREAKS edge symmetry: the capped hub may be dropped from a
    neighbor's list while keeping that neighbor (or vice versa), which
    violates the symmetric-adjacency input contract of
    ``pagerank_integer`` (a vertex with out-edges but no in-edges
    silently leaves the rank vector after round 1 and its base mass
    leaks) and skews ``triangle_census``'s ``n_edges = sum(deg) div 2``.
    Two supported modes:

    - ``resymmetrize=False`` (default): one map-side projection, no
      shuffle. Use ONLY where asymmetry is acceptable (e.g. feeding a
      pair-stream consumer that re-canonicalizes edges itself); do NOT
      feed the result to pagerank/census/k_core.
    - ``resymmetrize=True``: keeps edge (u, v) iff it survived the slice
      in BOTH directions, then rebuilds sorted neighbor lists — the
      output is again a valid symmetric adjacency (degrees ≤ cap;
      vertices left edgeless are dropped, matching
      ``copurchase_adjacency``'s no-isolated-vertices shape). Costs one
      self-join + one groupBy shuffle; this is the mode to use upstream
      of the iterative operators.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    capped = adj.select(
        "src", F.slice(F.array_sort("dsts"), 1, cap).alias("dsts")
    )
    if not resymmetrize:
        return capped
    edges = capped.select("src", F.explode("dsts").alias("dst"))
    reverse = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = edges.join(reverse, ["src", "dst"], "left_semi")
    return mutual.groupBy("src").agg(
        F.array_sort(F.collect_set("dst")).alias("dsts")
    )


def copurchase_adjacency(lineitem: DataFrame) -> DataFrame:
    """Part co-purchase adjacency list from the lineitem fact: vertices
    are parts, neighbors are parts sharing an order. Array-native build —
    collect_set per order (bounded basket, single-digit k), explode the
    basket twice (fanout k²), then ONE shuffle aggregates pairs into
    per-vertex neighbor sets (collect_set dedups; size() is the
    out-degree downstream). Callers should cache the result before
    iterating on it."""
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    pairs = (
        baskets.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return pairs.groupBy("src").agg(F.collect_set("dst").alias("dsts"))
