"""Graph analytics over materialized edge tables (degrees, PageRank,
triangle counts).

The KG pipeline materializes two first-class graphs — the mention->concept
edges table (plans/graph.py, the reference's ``source_standard_map``
star, reference src/backend/db/seed.sql:90-98) and the near-duplicate
candidate-pair graph (operators/dedup.py).  Connected components
(operators/connected_components.py) canonicalizes them; this module adds
the read-side analytics a KG consumer runs on the result: degree
distributions, fixed-iteration PageRank, and per-node triangle counts.

All three are pure DataFrame compositions (no UDFs, no driver-side
iteration over rows).  Scale shapes:

* ``degrees`` / ``degree_distribution``: one keyed shuffle each with
  map-side partial aggregation — a 10^9-edge graph shuffles only
  (node, partial count) pairs.
* ``pagerank``: each iteration is join(ranks, edges) + groupBy(dst), the
  canonical Pregel-as-DataFrame shape.  Out-degrees are folded into the
  edge list ONCE before the loop (carried through every iteration instead
  of re-joined), ranks are ``localCheckpoint``-ed per iteration so the
  plan does not grow exponentially, and AQE handles hub skew in the join
  (same rationale as connected_components.py).  Iterations are fixed (the
  caller picks k), so the whole job is k joins — no convergence-test
  actions on the hot path.
* ``triangle_counts``: ordered edge enumeration e1(a,b) |><| e2(b,c)
  |><| e3(a,c) over ``a < b < c`` — each triangle is generated exactly
  once.  With ``degree_oriented=True`` edges are first re-oriented from
  the lower-degree endpoint to the higher-degree endpoint (ties by id),
  the standard preprocessing that bounds the join fan-out by
  O(m^{3/2}) total work instead of O(sum deg^2) — the difference between
  feasible and not on a 100 TB graph with hubs.  Orientation never
  changes the triangle set, only the enumeration cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Project a bipartite (group, item) relation into an undirected
    item–item co-occurrence pair list (doc_id_1 < doc_id_2, distinct) —
    how a KG turns an order–part / conversation–concept incidence table
    into an entity graph the analytics below can run on.

    Scale shape: distinct-ify the incidence list first (dedup within a
    group costs one keyed shuffle and caps the self-join input), then
    self-equijoin on the group key.  Output size is sum over groups of
    C(k, 2) — the caller bounds group fan-out (e.g. a HAVING k <= cap on
    pathological groups) when the data has mega-groups; the join itself
    is AQE-skew-splittable because the key is the group id.
    """
    inc = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    left = inc.select("_g", F.col("_i").alias("doc_id_1"))
    right = inc.select("_g", F.col("_i").alias("doc_id_2"))
    return (
        left.join(right, "_g")
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )


def _bidir(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Both directions of an undirected pair list, as (src, dst)."""
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(
        pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )


def degrees(
    pairs: DataFrame, src: str = "doc_id_1", dst: str = "doc_id_2"
) -> DataFrame:
    """Per-node undirected degree over a (src, dst) pair list.

    Pairs are assumed deduplicated with ``src < dst`` (the shape every
    candidate-pair operator in this repo emits), so degree = plain count
    over the bidirected list.  One shuffle, map-side partial count.
    """
    return (
        _bidir(pairs, src, dst)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"))
    )


def degree_distribution(
    pairs: DataFrame, src: str = "doc_id_1", dst: str = "doc_id_2"
) -> DataFrame:
    """Degree histogram (degree, n_nodes) — the shape a capacity planner
    reads to pick salting/broadcast thresholds before running CC or
    PageRank at full scale."""
    return (
        degrees(pairs, src, dst)
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )


def pagerank(
    pairs: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint: bool = True,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair list.

    Returns (node, rank) with ranks summing to ~1.  Undirected: each pair
    contributes both directions, so every node has out-degree >= 1 and
    there are no dangling nodes (rank mass is conserved without the
    dangling-redistribution term).

    The out-degree is attached to the edge list ONCE before the loop —
    each iteration then needs exactly one join (ranks on src) and one
    groupBy (dst), both keyed shuffles with map-side partial sums.  With
    ``checkpoint`` the per-iteration result is lazily
    ``localCheckpoint``-ed, truncating lineage so iteration k's plan does
    not embed k-1 joins (same pattern as connected_components.py).
    """
    edges = _bidir(pairs, src, dst)
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # fold degree into the edge list once; carried through every iteration.
    # Both loop-invariant sides are localCheckpoint-ed so the (possibly
    # expensive) upstream pair derivation runs ONCE, not once per
    # iteration — without this, iteration k re-executes the caller's
    # whole candidate-pair pipeline k times.
    edges_deg = edges.join(deg, "src").select("src", "dst", "out_deg")
    if checkpoint:
        edges_deg = edges_deg.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()  # one scalar action; O(1) driver data (also
    # materializes the lazy checkpoints before the loop)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        # no nodes re-join (r7): ``edges`` is ALWAYS the bidirected list
        # (built unconditionally above), so every node of the graph has at
        # least one in-edge — its own reversed edge — and ``contribs``
        # covers the full node set every iteration.  The former
        # ``nodes.join(contribs, "node", "left")`` was therefore an
        # identity (its coalesce branch unreachable) costing one extra
        # join per iteration (guide §2.4).
        ranks = contribs.select(
            "node",
            (F.lit(base) + F.lit(damping) * F.col("in_sum")).alias("rank"),
        )
        # checkpoint every k-th iteration, not every one: each snapshot is
        # a materialization barrier (a whole job at small scale), while the
        # un-truncated plan only grows by `checkpoint_interval` joins —
        # linear in the interval, so lineage stays bounded either way
        if checkpoint and (it + 1) % checkpoint_interval == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(
    pairs: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    degree_oriented: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected pair list.

    Enumerates each triangle once via the ordered two-join shape, then
    credits all three corners.  ``degree_oriented`` re-orients every edge
    from its lower-degree endpoint to its higher-degree endpoint (id as
    tiebreak) before enumerating — join fan-out is then bounded by the
    oriented out-degree (<= sqrt(2m) on average), the classic
    hub-taming preprocessing.  The triangle SET is orientation-invariant,
    so the plain-SQL oracle can enumerate over the raw ``a < b`` ordering
    and match exactly.

    ``checkpoint`` snapshots the input pair list once — it is consumed
    three times (oriented edges, degree side, closing-edge lookup), and
    without the snapshot a pair list that is itself a pipeline (LSH
    candidates, a co-occurrence self-join) would re-execute per consumer.
    """
    if checkpoint:
        pairs = pairs.localCheckpoint(eager=False)
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if degree_oriented:
        d = degrees(pairs, src, dst).select(
            F.col("node"), F.col("degree")
        )
        e = (
            e.join(d.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), "a")
            .join(d.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), "b")
            .select(
                F.when(
                    (F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                )
                .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
                .alias("e")
            )
            .select("e.u", "e.v")
        )
        # wedge at u: (u->v1, u->v2); triangle iff the closing edge exists
        # in EITHER orientation
        e1 = e.select(F.col("u").alias("w"), F.col("v").alias("x"))
        e2 = e.select(F.col("u").alias("w"), F.col("v").alias("y"))
        wedges = e1.join(e2, "w").where(F.col("x") < F.col("y"))
        # the closing-edge lookup side is just the input pair list (already
        # distinct with a < b) — no re-derivation, no extra shuffle
        closing = pairs.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        tri = wedges.join(closing, ["x", "y"]).select(
            F.col("w").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
        )
    else:
        e1 = e.select(F.col("a"), F.col("b"))
        e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
        e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
        tri = (
            e1.join(e2, "b")
            .join(
                e3,
                (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            )
            .select("a", "b", "c")
        )
    corners = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def k_hop(
    pairs: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
) -> DataFrame:
    """Minimum hop distance from a source node set, bounded at ``k`` hops
    (undirected; ``pairs`` is the deduplicated ``src < dst`` list every
    pair operator here emits).  ``sources`` must have a ``node`` column.

    Output: (node, dist int) for every node within k hops, dist = the
    MINIMUM number of edges from any source (sources themselves at 0).

    Scale shape: frontier BFS — each round joins ONLY the newly
    discovered frontier against the edge list (never the accumulated
    visited set), then anti-joins visited to keep the frontier minimal;
    this is the delta-expansion trick that makes iterative graph jobs
    O(edges touched) instead of O(visited x edges) per round.  Frontier
    and visited are ``localCheckpoint``-ed each round so the plan stays
    flat across iterations (same discipline as ``pagerank`` /
    connected_components.py), and the loop exits early on an empty
    frontier — the ``take(1)`` probe is one tiny job per round, bounded
    by k.  The frontier-edge join key is the node id, so AQE's skew
    handling covers hub nodes.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    # snapshot the (possibly expensive — e.g. a co-occurrence self-join)
    # edge derivation ONCE: every BFS round's frontier join consumes it,
    # and without the checkpoint each round re-executes the upstream
    # pipeline (r7; same discipline as pagerank/label_propagation)
    edges = _bidir(pairs, src, dst).localCheckpoint(eager=False)
    # LAZY checkpoints (r7): each round's take(1) probe is the action that
    # materializes the new frontier — the eager form paid a dedicated
    # checkpoint job per round on top of the probe.  The visited union is
    # a union of already-cached checkpoints (map-only to materialize), so
    # it rides the next round's probe / the final consumer.
    visited = (
        sources.select(F.col("node"), F.lit(0).alias("dist"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=False)
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def label_propagation(
    pairs: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    iterations: int = 5,
    checkpoint: bool = True,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over an undirected pair list, made DETERMINISTIC: every node
    starts labeled with its own id; each round it adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label.  The
    async/random-order variant of the paper is layout-dependent —
    synchronous rounds + total tie order make the output a pure function
    of the graph, so an unrolled SQL oracle can reproduce it.

    Returns (node, label) after ``iterations`` rounds.  Labels are node
    ids (non-negative longs; the arg-max packs ``-label`` into a struct,
    so Long.MIN_VALUE labels are out of contract).

    Shape per round: one join (labels onto edge sources) and two keyed
    aggregations — (node, label) vote counts with map-side partials, then
    an arg-max per node via ``max(struct(count, -label))``, which stays a
    partial-aggregable agg instead of a window sort.  Same lineage
    truncation as ``pagerank``; hot nodes are bounded by their distinct
    neighbor-label count, which propagation itself shrinks every round.
    """
    edges = _bidir(pairs, src, dst)
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    if checkpoint:
        edges = edges.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    for it in range(iterations):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        winners = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("w")
            )
            .select("node", (-F.col("w.nl")).alias("_new_label"))
        )
        # no labels re-join (r7): ``edges`` is always the bidirected list,
        # so every node has at least one in-neighbor (its own reversed
        # edge) and ``winners`` covers the full node set — the former
        # ``labels.join(winners, "node", "left")`` was an identity (its
        # coalesce branch unreachable) costing one join per round.
        labels = winners.select("node", F.col("_new_label").alias("label"))
        if checkpoint and (it + 1) % checkpoint_interval == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels
