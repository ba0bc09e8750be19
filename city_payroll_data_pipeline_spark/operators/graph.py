"""Iterative graph analytics on edge-list DataFrames: PageRank, HITS.

Beyond-parity operator family (the reference — a payroll CSV→report
pipeline, serve_flight.py — has no graph surface at all): a
training-data pipeline at 100 TB needs link/authority analysis for
source weighting (domain authority → corpus mix weights), and the
same join-aggregate iteration pattern as connected components
(operators/dedup.py) applies.

Determinism contract: ranks are held as **integer-scaled BIGINTs**
(rank × 10^9) and every update uses exact integer arithmetic —
multiply, truncating division (all operands positive, so trunc ==
floor in both Spark ``div`` and DuckDB ``//``), and integer sums.
Float enters only in the final display division by 10^9, which is a
single exact-operand double division — bit-identical across engines.
This is the same strategy as the suite's DECIMAL-routed money sums:
never let an order-dependent float sum cross an aggregation.

Scale: each iteration is one shuffle-join of edges⋈ranks on ``src``
plus one group-by shuffle on ``dst`` — the same budget as a single
large join; `localCheckpoint` every few rounds truncates the lineage
exactly as connected_components does (operators/dedup.py:335+,
measured plan-growth blowup documented there). Edge normalization
(out-degree totals) is computed once, outside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9  # rank fixed-point scale: 1e-9 resolution


def pagerank_scaled(
    edges: DataFrame,
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 8,
    checkpoint_every: int = 4,
    teleport_node=None,
) -> DataFrame:
    """Exact integer-scaled PageRank over ``edges(src, dst, weight)``.

    ``weight`` must be a positive integer (e.g. an interaction count).
    Returns ``(node, rank_scaled)`` where ``rank_scaled`` ≈ rank × 1e9.

    The update per node v is the standard damped rank with truncating
    integer division applied at each step (the oracle unrolls the same
    expression, so truncation is part of the spec, not an error term):

        contrib(u→v) = (rank[u] * w(u,v)) div out_w(u)
        rank'[v] = ((den-num) * SCALE div den) div N
                   + (num * Σ_u contrib(u→v)) div den
                   + (num * dangling) div (den * N)

    Dangling mass (nodes with no out-edges) is redistributed uniformly,
    keeping total mass ≈ SCALE (up to truncation dust — bounded by
    N + E per iteration, i.e. < 1e-3 at 1e-9 resolution for graphs
    under a million edges per node).

    ``teleport_node``: when set, runs PERSONALIZED PageRank — the
    teleport mass (and dangling mass) goes entirely to that node
    instead of uniformly to all, ranking nodes by proximity to the
    seed (related-entity ranking). rank_0 is likewise concentrated
    on the seed.
    """
    # Materialize the edge list once before anything else: node
    # universe, out-weights, and the dangling probe all re-derive from
    # it, and without this the (possibly expensive) upstream plan that
    # produced the edges — e.g. a multi-way fact join — would be
    # recomputed for each of those derivations. The aggregated edge
    # frame is the small thing here; its producer is not.
    edges = edges.localCheckpoint(eager=True)

    # node universe: anything appearing as src or dst (dedup shuffle, once)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # scalar; required by the formula itself
    if n_nodes == 0:
        raise ValueError("pagerank_scaled: edge list is empty (no nodes)")

    # per-source total outgoing weight, computed once outside the loop
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    norm_edges = edges.join(out_w, "src").select("src", "dst", "weight", "out_w")
    norm_edges = norm_edges.persist()

    if teleport_node is None:
        base_col = F.lit(
            (damping_den - damping_num) * SCALE // damping_den // n_nodes
        )
        ranks = nodes.withColumn(
            "rank_scaled", F.lit(SCALE // n_nodes).cast("long")
        )
    else:
        seed_base = (damping_den - damping_num) * SCALE // damping_den
        base_col = F.when(
            F.col("node") == F.lit(teleport_node), F.lit(seed_base)
        ).otherwise(F.lit(0))
        ranks = nodes.withColumn(
            "rank_scaled",
            F.when(F.col("node") == F.lit(teleport_node), F.lit(SCALE))
            .otherwise(F.lit(0))
            .cast("long"),
        )

    # nodes with no outgoing edge contribute their mass uniformly.
    # Materialized once: when the graph has none (typical for
    # interaction graphs where every node acts), the per-iteration
    # dangling-mass collect is skipped entirely — saving one full
    # evaluation of the rank lineage per round.
    dangling_nodes = nodes.join(
        out_w.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0

    for i in range(iters):
        contribs = (
            norm_edges.join(ranks, norm_edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_scaled * weight) div out_w").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_contrib"))
        )
        if has_dangling:
            dangling = int(
                dangling_nodes.join(ranks, "node")
                .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )  # bounded scalar (one long), same as CC convergence checks
            if teleport_node is None:
                share_col = F.lit(
                    damping_num * dangling // (damping_den * n_nodes)
                )
            else:
                share_col = F.when(
                    F.col("node") == F.lit(teleport_node),
                    F.lit(damping_num * dangling // damping_den),
                ).otherwise(F.lit(0))
        else:
            share_col = F.lit(0)
        ranks = (
            ranks.join(contribs, "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.expr(
                        f"({damping_num} * coalesce(in_contrib, 0))"
                        f" div {damping_den}"
                    )
                    + share_col
                ).alias("rank_scaled"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # truncate lineage: the iterative plan otherwise doubles per
            # round (same pathology measured in connected_components)
            ranks = ranks.localCheckpoint(eager=True)

    # materialize the node-sized result BEFORE dropping the cached
    # inputs: the in-loop checkpoint deliberately skips the final
    # round, so the returned lineage still references norm_edges —
    # unpersisting first would force a full recompute on the caller's
    # first action
    ranks = ranks.localCheckpoint(eager=True)
    norm_edges.unpersist()
    dangling_nodes.unpersist()
    return ranks


def _sum_normalize(scores: DataFrame, raw: str, out: str) -> DataFrame:
    """Rescale an integer score column so it sums to SCALE:
    ``out = (raw * SCALE) div total``, all operands exact
    (DECIMAL(38,0) product, truncating div — Spark ``div`` and DuckDB
    ``//`` agree on positives). The 1-row total rides a broadcast
    nested-loop join, never a driver collect."""
    total = scores.agg(F.sum(raw).alias("__total"))
    return scores.crossJoin(F.broadcast(total)).select(
        "node",
        F.expr(f"CAST({raw} * {SCALE} div __total AS BIGINT)").alias(out),
    )


def hits_scaled(edges: DataFrame, iters: int = 6) -> DataFrame:
    """Exact integer-scaled HITS (Kleinberg 1999) over
    ``edges(src, dst, weight)`` — the hub/authority twin of
    :func:`pagerank_scaled`, same determinism contract.

    Returns ``(node, hub_scaled, auth_scaled)`` where each column is
    sum-normalized to SCALE after its half-step (the integer analogue
    of HITS's L1 renormalization; L2 would need a square root and
    break oracle exactness — with everything positive the two induce
    the same ranking and the same fixed-point direction).

        auth_raw[v] = Σ_u hub[u]  · w(u,v)   then sum-normalize
        hub_raw[u]  = Σ_v auth[v] · w(u,v)   then sum-normalize

    Overflow bound: hub ≤ SCALE = 1e9 and Σw is the total interaction
    count, so raw ≤ 1e9·Σw < 1e22 even at 10^13 interactions — the
    DECIMAL(38,0) sums and the ×SCALE product (< 1e31) never saturate.

    Scale shape: per half-step ONE edges⋈scores shuffle join + ONE
    group-by on the opposite endpoint (identical budget to a PageRank
    round), then a node-sized eager localCheckpoint that both
    truncates the iterative lineage and makes the 1-row normalization
    total a cheap re-read instead of a plan re-evaluation. Zero driver
    round trips — the total stays in-plan via a broadcast cross join.
    """
    if iters < 1:
        raise ValueError(f"hits_scaled: iters must be >= 1, got {iters}")
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # scalar; sets the uniform init, as in PageRank
    if n_nodes == 0:
        raise ValueError("hits_scaled: edge list is empty (no nodes)")
    nodes = nodes.localCheckpoint(eager=True)

    hubs = nodes.withColumn("hub_scaled", F.lit(SCALE // n_nodes).cast("long"))
    auths = None
    for _ in range(iters):
        a_raw = (
            edges.join(hubs, edges.src == hubs.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.col("hub_scaled").cast("decimal(38,0)") * F.col("weight")
                ).alias("raw")
            )
        )
        # keep sinks/sources with no incoming mass on the board at 0
        a_raw = (
            nodes.join(a_raw, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("raw"), F.lit(0).cast("decimal(38,0)")).alias(
                    "raw"
                ),
            )
            .localCheckpoint(eager=True)
        )
        auths = _sum_normalize(a_raw, "raw", "auth_scaled")
        h_raw = (
            edges.join(auths, edges.dst == auths.node)
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.sum(
                    F.col("auth_scaled").cast("decimal(38,0)") * F.col("weight")
                ).alias("raw")
            )
        )
        h_raw = (
            nodes.join(h_raw, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("raw"), F.lit(0).cast("decimal(38,0)")).alias(
                    "raw"
                ),
            )
            .localCheckpoint(eager=True)
        )
        hubs = _sum_normalize(h_raw, "raw", "hub_scaled")
    return hubs.join(auths, "node").select("node", "hub_scaled", "auth_scaled")
