"""Graph operators over edge DataFrames.

Beyond-reference extension: fixed-iteration PageRank, the canonical
iterative algorithm over a relational edge list (public formulation,
Brin/Page 1998). Used here to rank documents inside a near-duplicate
similarity graph — cluster "centrality" picks better canonical survivors
than min-id when clusters are large — but the operator is generic over any
(src, dst) edge DataFrame.

Scale notes: each iteration is one shuffle of the edge list by ``src``
(join with current ranks + out-degree) and one by ``dst`` (contribution
sum, partial-aggregated map-side). The rank and degree tables are
node-sized; iterations unroll lazily into one plan — for iteration counts
beyond ~10, checkpoint between rounds the way
``operators/dedup.connected_components`` does (lineage truncation), which
matters before shuffle volume does.

Determinism discipline: per-edge contributions ``rank/out_degree`` are
cast to DECIMAL(38,12) before the sum (exact, associative — independent of
partition combine order), and the damping update is plain IEEE arithmetic
on bit-identical inputs, so an SQL oracle running the same unrolled
iterations reproduces ranks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,12)"


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank: (node, rank) after ``iterations`` rounds.

    ``nodes`` must contain every vertex (isolated vertices settle at
    ``(1-d)/N``); dangling-mass redistribution is intentionally omitted
    (the classic simplified recurrence) so the oracle stays a pure
    unrolled join chain. Ranks start uniform at ``1/N``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    n1 = nodes.select(F.col(node_col).alias("node"))
    n_df = F.broadcast(n1.agg(F.count(F.lit(1)).alias("__n")))
    # Materialize the edge list once: every iteration joins it twice, and
    # without the checkpoint a lazily-derived edge list (e.g. a near-dup
    # pair pipeline) would re-run its full lineage per iteration — 2×
    # iterations recomputations of the expensive part (observed 23 s → 3 s
    # at sf0.01 on the ngram-pair graph).
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = n1.join(n_df).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__deg")).cast(_DEC).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__in"))
        )
        ranks = (
            n1.join(contrib, "node", "left")
            .join(n_df)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def triangle_stats(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Global triangle census of an undirected pair graph: one row with
    (n_nodes, n_edges, n_triangles, n_wedges, clustering_coeff).

    Triangles are counted on a DEGREE-ordered orientation (lower
    (degree, id) endpoint → higher): joining oriented edges
    (u→v)·(v→w)·(u→w) sees each triangle exactly once, and degree
    ordering bounds every node's out-degree by O(√|E|) (Schank & Wagner
    2005, public algorithm) — the skew guard that keeps the two
    self-joins from exploding on hub nodes, where an id-ordered
    orientation would fan a low-id hub out to its full degree. The
    triangle COUNT is orientation-invariant, so an SQL oracle may use
    the simpler id ordering and still match. Wedges (length-2 paths) are
    Σ d·(d−1)/2 — exact integers — and the global clustering coefficient
    3·T / wedges is a fixed-order double division.

    Scale: degree table is node-sized; the oriented edge list shuffles
    twice (once per join hop). All aggregates are map-side combinable.
    """
    # Materialize the pair stream once: it is referenced by the degree
    # table, the edge-count aggregate, AND three aliases of the oriented
    # edge list — without the checkpoint an expensive pair lineage (e.g.
    # the ngram near-dup pipeline) re-runs per reference (observed: ~290
    # exchanges in one plan at sf0.001).
    e_raw = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    deg = (
        e_raw.select(F.col("a").alias("v"))
        .unionByName(e_raw.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # The oriented list feeds three join aliases — checkpoint it too so
    # the degree-orientation join runs once, not three times. ADAPTIVE:
    # below ~100k edges (count is free — e_raw is already materialized)
    # re-running a broadcast-sized orientation join 3× is cheaper than
    # the extra checkpoint JOB + storage round-trip, the same
    # runtime-adaptivity call as connected_components' small-graph path.
    e = (
        e_raw.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    if e_raw.count() > 100_000:
        e = e.localCheckpoint(eager=True)
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src"))
            & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # Σ d·(d−1) is even and stays in exact long arithmetic (float /2
    # would round above 2^53 at hub-node degrees); halve with int div.
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(d * (d - 1)) div 2").alias("n_wedges"),
    )
    edges_n = e_raw.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(edges_n)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                (F.col("n_triangles") * 3).cast("double") / F.col("n_wedges"),
            ).alias("clustering_coeff"),
        )
    )


def kcore(
    pairs: DataFrame,
    k: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 12,
) -> DataFrame:
    """k-core of an undirected pair graph: the (unique) maximal subgraph
    in which every node has degree ≥ k, computed by iterative peeling —
    drop all nodes of degree < k, recompute, repeat to the fixed point.

    The dense-core extractor for near-dup graphs: a k-core survives only
    where duplication is mutually reinforcing (template farms, mirror
    rings), while chains and stray pair edges peel away — a sharper
    "boilerplate cluster" signal than connected components, which glue
    everything reachable together.

    Each round is one degree aggregation (map-side combinable) plus two
    semi-joins of the edge list against the surviving-node set, and rounds
    are localCheckpoint()ed with the convergence check (edge count
    unchanged) riding the materializing action — the
    ``connected_components`` loop discipline. The fixed point is
    order-independent, so any engine peeling to convergence agrees;
    convergence within ``max_iter`` is enforced (raise) so a returned
    result IS the true k-core. Peeling removes at least one node per
    non-final round — rounds needed is typically ≪ diameter.

    Output: (node, degree) — survivors with their in-core degree.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    for _ in range(max_iter):
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionByName(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        pruned = (
            edges.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_new = pruned.count()  # materializes the checkpoint
        if n_new == n_edges:
            break
        edges, n_edges = pruned, n_new
    else:
        raise RuntimeError(
            f"k-core peeling did not converge in {max_iter} rounds — "
            "raise max_iter (each round is one degree agg + two semi-joins)"
        )
    return (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def katz(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iterations: int = 3,
    alpha: float = 0.1,
) -> DataFrame:
    """Fixed-iteration Katz centrality: x ← 1 + α·Aᵀx, x₀ = 1.

    Counts walks of every length discounted by α per hop — unlike
    PageRank it rewards NUMBER of connections (no degree normalization),
    so a node feeding many low-degree neighbors scores high where
    PageRank splits its mass. α must stay below 1/λ_max for the series
    to converge; fixed low iteration counts are the bounded-walk
    approximation. Same scale posture as :func:`pagerank`: one eager-free
    localCheckpoint of the edge list, per-iteration contributions cast
    to DECIMAL(38,12) so the aggregation is order-independent.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    n1 = nodes.select(F.col(node_col).alias("node"))
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    xs = n1.select("node", F.lit(1.0).alias("x"))
    for _ in range(iterations):
        contrib = (
            e.join(xs, e.src == xs.node)
            .select(
                F.col("dst").alias("node"),
                F.col("x").cast(_DEC).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__in"))
        )
        xs = n1.join(contrib, "node", "left").select(
            "node",
            (
                1.0 + alpha * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("x"),
        )
    return xs.select("node", F.col("x").alias("katz"))
