"""Connected components via alternating large-star / small-star (G2).

Canonicalizes linked entities: mention-entities that map to the same OMOP
concept collapse into one component (the reference's analog is the
one-to-many ``source_standard_map`` star around each concept_id,
reference src/backend/db/seed.sql:90-98; the algorithm itself is the
Kiveris et al. "Connected Components in MapReduce and Beyond" two-phase
star contraction — O(log n) rounds, each round pure DataFrame ops).

Scale notes:
* every round is two shuffles (groupBy min + join); AQE handles skewed hub
  nodes (a hot concept with millions of mentions is a single star and
  contracts in one round);
* ``localCheckpoint`` every round truncates the lineage so plans don't grow
  exponentially across iterations;
* convergence check = the edge multiset is a fixed point (count + hash
  checksum), computed in the same job as the transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of u to min(N(u) ∪ {u})."""
    bidir = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = bidir.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", F.col("src")).alias("mn"))
    out = (
        bidir.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges downward, connect all small neighbors to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    nbrs = oriented.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("mn").alias("dst")
    )
    roots = mins.select(F.col("src"), F.col("mn").alias("dst"))
    out = nbrs.union(roots)
    return out.where(F.col("src") != F.col("dst")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: no ANSI long-overflow on the hash sum
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iterations: int = 20, stats: dict | None = None
) -> DataFrame:
    """Compute components of an undirected graph.

    Input: DataFrame(src long, dst long).  Output: DataFrame(node long,
    component long) covering every node, component = min node id reachable.
    ``stats`` (optional dict) receives {"rounds": n} — used by the scale
    tests to pin O(log n) convergence and one-round hub contraction.
    """
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    cur = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    cur = cur.localCheckpoint(eager=True)
    prev_sig = _checksum(cur)
    rounds = 0
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        rounds += 1
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    # fixed point: every edge is (node -> component root)
    labels = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = all_nodes.join(
        labels.select(F.col("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return labels.union(roots)
