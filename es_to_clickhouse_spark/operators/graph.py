"""Connected components — the clustering step that turns near-duplicate
PAIRS (operators/dedup.lsh_neardup_pairs) into duplicate GROUPS, so a
pipeline can keep one canonical doc per cluster. Spark has no native CC;
GraphFrames isn't in this environment and would be overkill for the
dedup-cluster shape (many tiny components).

Implementation: iterative min-label propagation on DataFrames.
label(n) <- min(label(n), min over neighbors label) until fixpoint.

Scale design:
- each round is one shuffle join (edges x labels) + one groupBy min —
  both map-side combinable; rounds needed = graph diameter, which for
  near-dup clusters is small (a handful), NOT O(V);
- the static undirected edge list is cached once; per-round labels are
  localCheckpoint()ed so the plan doesn't grow with iterations (the
  classic iterative-algorithm lineage trap);
- convergence is detected by counting changed labels (an O(V) agg,
  not a collect); non-convergence within max_iter raises instead of
  returning silently wrong clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    out_node: str = "node",
    out_label: str = "label",
    check_every: int = 4,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the minimum node id of
    its connected component (undirected). Deterministic, so the result is
    oracle-checkable against a recursive-CTE transitive closure.

    ``check_every``: convergence is probed every k-th round rather than
    every round — the changed-label count is a cheap O(V) distributed agg,
    but each probe is still a driver round-trip plus a full job over the
    lazy round chain, and the per-round label frames are tiny, so the
    probe jobs DOMINATE wall clock (measured at sf0.1, d9's graph:
    check_every 2 -> 2.99 s, 3 -> 2.74 s, 4 -> 2.49 s warm; default 4). Propagation past the fixpoint
    is a no-op (min-label is idempotent), so probing late never changes
    the result; the final round always probes so non-convergence within
    ``max_iter`` still raises instead of returning wrong clusters.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint(eager=True)  # materialize once; reused every round

    labels = und.select(F.col("a").alias("n")).distinct().withColumn(
        "lab", F.col("n")
    )
    rounds_since_check = 0
    for i in range(max_iter):
        nbr = und.join(labels, und["b"] == labels["n"]).select(
            F.col("a").alias("n"), F.col("lab")
        )
        m1 = (
            labels.unionByName(nbr)
            .groupBy("n")
            .agg(F.min("lab").alias("lab"))
        )
        # POINTER JUMPING (path halving): also adopt the label OF the
        # label (always defined — labels are node ids and every node is
        # in the frame). Neighbor-min alone advances a chain one hop per
        # round, so rounds ~ component diameter (measured: 36 labels
        # still changing after 8 rounds on near-dup chains at sf0.1);
        # the shortcut doubles the jump length per round -> O(log d)
        # rounds. Min-label stays monotone, so the fixpoint — and the
        # oracle-checked output — is unchanged.
        m1a = m1.alias("x")
        short = (
            m1a.join(m1.alias("y"), F.col("x.lab") == F.col("y.n"))
            .select(F.col("x.n").alias("n"), F.col("y.lab").alias("lab"))
        )
        # second halving per round: labels are tiny relative to edges, so
        # an extra label-to-label join is nearly free while quartering
        # the pointer depth — fewer rounds, and each round is a full
        # scheduling round-trip
        short = (
            short.alias("x")
            .join(m1.alias("y"), F.col("x.lab") == F.col("y.n"))
            .select(F.col("x.n").alias("n"), F.col("y.lab").alias("lab"))
        )
        # LAZY checkpoint: flattens lineage identically, but rounds
        # between convergence probes schedule NO job at all — the
        # probe's count() materializes the (check_every)-round chain in
        # one job (with eager=True every round paid its own scheduling
        # round-trip, which dominates when the label frame is small).
        new = (
            m1.unionByName(short)
            .groupBy("n")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=False)
        )
        rounds_since_check += 1
        if rounds_since_check >= check_every or i == max_iter - 1:
            # Probe against the IMMEDIATELY preceding round's labels
            # (still bound to `labels` here), never a stale snapshot from
            # the last probe: min-label propagation is monotone, so "one
            # round changed nothing" == fixpoint, while comparing to a
            # k-rounds-old snapshot could spuriously report change (and
            # raise) when the graph converged during the skipped rounds.
            changed = (
                new.alias("x")
                .join(labels.alias("y"), "n")
                .where(F.col("x.lab") != F.col("y.lab"))
                .count()
            )
            if changed == 0:
                return new.select(
                    F.col("n").alias(out_node), F.col("lab").alias(out_label)
                )
            rounds_since_check = 0
        labels = new
    raise RuntimeError(
        f"connected_components did not CONFIRM convergence in {max_iter} "
        "rounds: propagation needs up to diameter rounds plus one extra "
        "no-change probe round to prove the fixpoint, so max_iter must "
        "exceed the worst-case component diameter by at least one (plus "
        "check_interval slack when probes are sparse)"
    )


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "a",
    dst: str = "b",
    node_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Exact BFS distance (min hop count) from a seed set along directed
    edges, bounded at ``max_hops``. Returns (node_col, hop) — every node
    reachable within the bound, labeled with its FIRST-reach hop, which
    the per-level visited anti-join makes equal to the true minimum hop.

    The decontamination closure shape (corpus g3): seeds are the known
    bad set, edges the verified near-dup pairs, and the result is what a
    pipeline drops. Scale: edges are localCheckpoint()ed once so the
    per-hop frontier⋈edges hash joins never re-run the upstream pair
    pipeline; the frontier and visited frames stay sparse relative to
    the corpus, and each level is one join + one anti-join (both
    shuffle-partitioned on node id, no driver collect).

    Pass edges pre-symmetrized for undirected semantics."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.localCheckpoint(eager=True)
    visited = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(F.col("node").alias(node_col), "hop")


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank by power iteration, pure DataFrame ops.

    Each iteration: rank flows along out-edges proportionally to weight;
    dangling nodes (no out-edges) redistribute their mass uniformly;
    rank' = (1-d)/N + d * (inflow + dangling/N).

    Scale design: the per-iteration join shuffles edges on src (ranks are
    node-sized — broadcast); the dangling mass is a 1-row aggregate
    cross-joined back (broadcast nested loop over ONE row). N is computed
    once up front — a single count, not a per-row collect. Iterations are
    a driver loop over lazily-chained frames with a localCheckpoint each
    round to keep lineage flat (same device as connected_components).

    ``nodes`` defaults to the union of edge endpoints; pass the full node
    frame (one column named like ``src``) to include isolated nodes.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    n = nodes.count()
    # materialize the edge frame ONCE before iterating: each power
    # iteration references `edges` in its plan, so an un-materialized
    # edge frame re-executes its whole upstream plan (g1: a 5-way
    # lineitem join) every iteration — measured 3.2 s -> 2.6 s at sf0.1
    # with 3 iterations (the residual is per-iteration job overhead on a
    # 25-node graph; at a real edge scale the saving is x iterations).
    # localCheckpoint stores partitions on executors
    # and flattens lineage (the same device GraphX uses for iterative
    # graph state; for edge sets past executor storage this becomes a
    # spill-backed cache, still the right trade for >= 2 iterations).
    edges = edges.localCheckpoint(eager=True)
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("_out_w"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(out_w, src)
            .join(F.broadcast(ranks), F.col(src) == F.col("node"))
            .groupBy(F.col(dst).alias("_dst"))
            .agg(
                F.sum(F.col("rank") * F.col(weight) / F.col("_out_w")).alias(
                    "_contrib"
                )
            )
        )
        dangling = (
            ranks.join(out_w, ranks.node == out_w[src], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib._dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
