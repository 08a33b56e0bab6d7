"""Graph operators over edge relations (beyond-reference analytics
tier, alongside PageRank in ``registry/advancedq`` and the
connected-components clustering in ``operators/dedup``).

Scale design notes: every iteration of a propagation algorithm is
one join of the label relation to the (pre-partitioned) edge
relation plus one aggregation — O(E) shuffled bytes per round, no
driver-side state beyond the loop counter. Fixed iteration counts
keep plans finite and oracles unrollable; convergence-looped
variants belong behind checkpointed iteration like dedup_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    2007), DETERMINISTIC variant: every node starts as its own label;
    each round it adopts the most frequent label among its neighbors,
    ties → lowest label, isolated nodes keep their own. Unlike the
    min-label propagation in ``dedup_clusters`` (which converges to
    connected components), the mode rule lets dense subgraphs hold
    distinct labels — communities, not components.

    ``edges`` holds each undirected edge ONCE as ``u < v``; both
    directions are materialized here. Each of the ``iters`` rounds is
    one labels⋈edges join + one (node, label) count + one per-node
    argmax aggregation — O(E) per round. Output: (node, community).

    Round shape (r11 optimization, guide §2.4): the per-node argmax
    is a two-level AGGREGATION — ``min(struct(-votes, community))``
    over the (node, label) counts — not a row_number window: the
    final agg is map-side combinable and skips the window's
    partition sort. The per-round ``nodes LEFT JOIN winners`` +
    coalesce the window form carried was dropped outright: ``adj``
    is symmetric (both directions materialized), so the src set
    equals the dst set, every label lookup matches, and winners
    covers exactly the node set every round — the left join was a
    provable no-op costing a distinct + join per round. Isolated
    nodes (no edges at all) never enter ``adj`` under either
    formulation.
    """
    fwd = edges.select(F.col(u_col).alias("src"), F.col(v_col).alias("dst"))
    rev = edges.select(F.col(v_col).alias("src"), F.col(u_col).alias("dst"))
    adj = fwd.unionByName(rev)
    nodes = adj.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(iters):
        neighbor_labels = (
            adj.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("__votes__"))
        )
        # struct ordering: lowest -votes = most votes, tie -> lowest
        # community (identical to the desc(votes), asc(community)
        # row_number this replaces)
        labels = (
            neighbor_labels.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__votes__")).alias("nv"),
                        F.col("community").alias("c"),
                    )
                ).alias("__best__")
            )
            .select("node", F.col("__best__.c").alias("community"))
        )
    return labels


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Fixed-round k-core peel: each round drops every node whose
    CURRENT degree is below ``k``, plus all its edges, simultaneously
    (the synchronous variant — both engines run the identical
    ``rounds`` peels, so results match even on graphs where the peel
    hasn't converged yet; convergence is when a round removes
    nothing, reached quickly on support-thresholded graphs whose
    low-degree fringe is shallow). Output: ``(node_id, core_degree)``
    for the nodes surviving all rounds, with their degree in the
    surviving subgraph — the dense backbone used for community
    seeding and fraud-ring screens.

    Shape: per round one degree aggregation + two semi joins, all
    keyed on node ids — O(E) per round, same-key shuffles. ``edges``
    holds each undirected edge once as ``u < v``.
    """
    from .dedup import attach_cache, checkpoint_handle

    spark = edges.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None
    und = edges.select(
        F.col(u_col).alias("src"), F.col(v_col).alias("dst")
    ).unionByName(
        edges.select(F.col(v_col).alias("src"), F.col(u_col).alias("dst"))
    )
    # Eager per-round materialization, the dedup_clusters discipline:
    # each round's relation is read three times (degree + both semi
    # joins) AND feeds the next round, so leaving it lazy compounds
    # recompute 3^rounds (measured 157 s at sf0.01), while persist()
    # pins cached subtrees to non-adaptive full-width shuffles (AQE is
    # disabled under caching; measured 6x slower than checkpoints at
    # test scale). localCheckpoint is the local fast path; a session
    # checkpoint dir upgrades to reliable mode for executor-loss
    # recovery on real clusters. Superseded rounds release eagerly.
    handle = None
    for _ in range(rounds):
        und = und.checkpoint() if reliable else und.localCheckpoint()
        prev, handle = handle, checkpoint_handle(und)
        if prev is not None:
            prev.unpersist()
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("__d__"))
        keep = deg.filter(F.col("__d__") >= k).select("src")
        und = und.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )
    out = und.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
    return attach_cache(out, *([] if handle is None else [handle]))


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components via ALTERNATING LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the diameter-independent algorithm:
    O(log² n) rounds worst case, a handful in practice, REGARDLESS of
    graph diameter.

    Why this exists next to ``dedup_clusters``: min-label propagation
    with pointer jumping needs rounds proportional to log(diameter)
    with a long constant tail — measured 25+ rounds (past its
    iteration cap) on a geometric ε-neighbor graph at sf0.1, whose
    giant component has hundreds-of-hops diameter. Near-dup graphs are
    shallow (cliques of copies), geometric/spatial graphs are not.
    Star contraction restructures the graph itself each round instead
    of walking labels along it, so the round count stays flat as the
    data (and its diameter) grows — the property that matters at
    100 TB.

    Round = two edge rewrites, each one groupBy + one join on O(E):
    - large-star: every node's strictly-larger neighbors reattach to
      the minimum of its closed neighborhood;
    - small-star: every node's smaller-or-equal neighbors (and the
      node) reattach to that minimum.
    Edges stay canonical (id_a < id_b); both rewrites only ever
    decrease the small endpoint, so the fixpoint is a star forest
    whose centers are the component minima. Convergence check per
    round: edge count + empty anti-join (exact set equality, no
    hash-collision risk). Each round's edge relation is eagerly
    checkpointed (the ``k_core`` discipline) and superseded rounds
    are released.

    Output: ``(id_col, cluster_id)`` — every node labeled with its
    component's minimum node id; isolated nodes label themselves.
    """
    from .dedup import attach_cache, checkpoint_handle, release_cached

    spark = edges.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _ck(df: DataFrame):
        c = df.checkpoint() if reliable else df.localCheckpoint()
        return c, checkpoint_handle(c)

    e, handle = _ck(
        edges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    release_cached(edges)
    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        # large-star: for each u over the SYMMETRIC adjacency, m(u) =
        # min(closed neighborhood); strictly-larger neighbors v > u
        # re-point to m(u). (m <= u < v, so (m, v) is canonical.)
        sym = e.unionByName(
            e.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        m = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("m").alias("id_a"), F.col("dst").alias("id_b"))
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        # small-star: group by the LARGER endpoint u; its smaller
        # neighbors and u itself re-point to min(smaller neighbors).
        ms = large.groupBy("id_b").agg(F.min("id_a").alias("m"))
        small = (
            large.join(ms, "id_b")
            .select(F.col("m").alias("id_a"), F.col("id_a").alias("id_b"))
            .unionByName(
                ms.select(F.col("m").alias("id_a"), F.col("id_b"))
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        new, new_h = _ck(small)
        n_new = new.count()
        changed = (
            n_new != n_edges
            or new.join(e, ["id_a", "id_b"], "left_anti").limit(1).count() > 0
        )
        if handle is not None:
            handle.unpersist()
        e, handle, n_edges = new, new_h, n_new
        if not changed:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iters} rounds"
        )
    labels = e.groupBy(F.col("id_b").alias("__n__")).agg(
        F.min("id_a").alias("__root__")
    )
    out = (
        nodes.join(labels, nodes[id_col] == F.col("__n__"), "left")
        .select(
            nodes[id_col],
            F.coalesce("__root__", nodes[id_col]).alias("cluster_id"),
        )
    )
    return attach_cache(out, *([] if handle is None else [handle]))
