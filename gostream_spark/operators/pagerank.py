"""PageRank over a candidate-pair graph (iterative BSP, same
discipline as ``components.py``): centrality of documents inside
near-duplicate neighborhoods — the ranking signal used to pick the
CANONICAL copy of a duplicate cluster (keep the most-linked variant,
drop satellites) when the keep-rule needs more than min-id.

Scale properties (mirrors connected_components):
- one join + one aggregate per iteration, hash-partitioned on node
  id — no single-task stage;
- the edge list and each iteration's ranks are ``localCheckpoint``ed
  so the plan never grows with iterations;
- FIXED iteration count (no driver-side convergence scan needed —
  PageRank's contribution decays geometrically with the damping
  factor, so k iterations bound the error by d^k); per-iteration
  driver traffic is zero.

Determinism note: rank values are float sums over shuffled neighbor
contributions, so the last ulp depends on partial-sum order — the
REGISTERED query therefore surfaces ranks quantized to 1e-6 and is
rows-only checked with invariants (mass conservation, positivity)
pinned in tests/test_rows_only.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Rank every node of an undirected graph. ``nodes``: one-column
    ids; ``edges``: two-column pairs (any names). Returns (id, rank).

    Pass nodes that all appear in ``edges`` (undirected ⇒ every such
    node has out-degree ≥ 1): then no rank mass dangles and
    sum(rank) == number of nodes at every iteration (the conservation
    invariant tests pin). Isolated nodes would leak their damped mass
    — callers wanting them ranked add the dangling-mass
    redistribution term instead of passing them here silently.

    POSTCONDITION (stronger than the signature suggests): the output
    id set is exactly the set of edge endpoints. A node present in
    ``nodes`` but absent from ``edges`` violates the contract above
    and is silently DROPPED — there is no per-iteration reinstatement
    join, so contract-violating ids never re-enter the aggregate.
    tests/test_rows_only.py pins output-ids == edge-endpoints."""
    id_col = nodes.columns[0]
    # No checkpoint on the node set: it is consumed exactly once (the
    # initial uniform ranks below); everything after iteration 1 is
    # derived from out_edges, which IS checkpointed.
    n = nodes.select(F.col(id_col).alias("id"))
    a, b = edges.columns
    e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = sym.join(deg, "src").localCheckpoint(eager=True)

    ranks = n.withColumn("rank", F.lit(1.0))
    for i in range(n_iter):
        # No per-iteration reinstatement join against n: the caller
        # contract (every node appears in edges) plus the symmetric
        # union means every node has in-degree >= 1, so the contrib
        # aggregate already emits one row per node — joining n back
        # each round would only re-add a join stage per iteration.
        ranks = (
            out_edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
            .select(
                F.col("dst").alias("id"),
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.col("in_mass")
                ).alias("rank"),
            )
        )
        # Truncate lineage every third round, not every round: an
        # EAGER checkpoint is a full materializing job, and at small
        # scale the per-job floor — not the joins — dominated the
        # operator's wall clock (r10 cold audit: 10 checkpoints made
        # this the slowest cold query in the registry). Three rounds
        # of pending lineage keep the plan a small constant size while
        # cutting the serial job count ~3x; the final iteration always
        # checkpoints so callers never re-execute the whole loop.
        if i % 3 == 2 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
