"""Connected components over a pair/edge table — the clustering step
that turns near-duplicate PAIRS (dedup.py:jaccard_pairs, simhash,
MinHash-LSH) into duplicate GROUPS, so a pipeline can keep one
representative per group.  The reference stops at pairwise similarity
(its cache/top-k scans, /root/reference/app/main.py:78-87); grouping is
the north-star extension a training-data dedup pipeline actually needs.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round a node takes the min label across itself and
its neighbors; fixpoint = per-component min node id.  Converges in
O(graph diameter) rounds, and near-dup graphs are shallow (dup clusters
are cliques or short chains), so a handful of rounds suffice.

Scale notes (100 TB):
- Each round is ONE shuffle (join on node + min-agg).  Labels are two
  longs; document bodies never enter the loop.
- `localCheckpoint` after every round truncates the lineage — without
  it the plan doubles per iteration and Catalyst analysis time blows up
  long before data size matters.  On a cluster, prefer reliable
  `checkpoint()` to survive executor loss across a long loop.
- Convergence is detected with a one-number action (sum of labels,
  which strictly decreases until fixpoint) — no driver-side collect of
  the label table.
- For adversarial graphs (long chains, giant components) the
  O(diameter) bound degrades; the published fix is alternating
  large-star/small-star rounds (Kiveris et al., "Connected Components
  in MapReduce and Beyond"), which converges in O(log n) rounds with
  the same join+min building block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node, component = min node id in its
    connected component.  `edges` is undirected pairs; `nodes` optionally
    supplies isolated vertices (single-row column of ids) so they appear
    in the output as their own singleton components."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.union(e.select(F.col("d"), F.col("s")))
    verts = sym.select(F.col("s").alias("node"))
    if nodes is not None:
        first = nodes.columns[0]
        verts = verts.union(nodes.select(F.col(first).alias("node")))
    labels = verts.distinct().select("node", F.col("node").alias("component"))
    sym = sym.distinct().localCheckpoint(eager=False)

    prev_sum = None
    converged = False
    for _ in range(max_iter):
        prop = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("component")
        )
        # lazy checkpoint: the convergence-sum action below materializes
        # it, so each round costs ONE job instead of two
        labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Partially-propagated labels are silently WRONG clusters; a
        # >max_iter-diameter graph (e.g. a long duplicate chain) must
        # fail loudly.  The O(log n) fix is large-star/small-star
        # (Kiveris et al.); raise until a caller needs it.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the iteration budget); raise "
            "max_iter or switch to the large-star/small-star variant"
        )
    return labels
