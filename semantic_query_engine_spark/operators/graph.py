"""Connected components over a pair/edge table — the clustering step
that turns near-duplicate PAIRS (dedup.py:jaccard_pairs, simhash,
MinHash-LSH) into duplicate GROUPS, so a pipeline can keep one
representative per group.  The reference stops at pairwise similarity
(its cache/top-k scans, /root/reference/app/main.py:78-87); grouping is
the north-star extension a training-data dedup pipeline actually needs.

Algorithm: alternating large-star / small-star rounds (Kiveris et al.,
"Connected Components in MapReduce and Beyond", 2014).  Each round
rewires edges toward the minimum id in every neighborhood:

- large-star(u): m = min(N(u) + {u}); replace each edge (u, v) with
  v > u by (v, m).
- small-star(u): orient every edge toward its larger endpoint, then
  with m = min(N(u)) emit (v, m) for every smaller neighbor v plus
  (u, m).

The edge set converges to a forest of stars — every node linked
directly to its component's minimum id — in O(log n) rounds even on
adversarial diameters (a path graph collapses geometrically), unlike
plain min-label propagation whose round count is the graph DIAMETER.

Scale notes (100 TB):
- Each half-round is ONE hash-partition shuffle: the neighborhood min
  is a window aggregate over partitionBy(u) — no join in the loop.
  Edges are two longs; document bodies never enter the loop.
- `localCheckpoint` per round truncates lineage — without it the plan
  doubles per iteration and Catalyst analysis time blows up long
  before data size matters.  On a cluster, prefer reliable
  `checkpoint()` to survive executor loss across a long loop.
- Convergence is detected with a one-row action (edge count + xxhash64
  content sum, both order-insensitive) — no driver-side collect of the
  edge table.
- Known skew: a giant star (one node adjacent to most of the graph)
  lands its whole neighborhood in one window partition.  That is the
  terminal SHAPE of the algorithm (stars), reached in the last rounds;
  the paper's alternation keeps intermediate neighborhoods balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.plan import truncate_plan


def _large_star(edges: DataFrame, dedup: bool = False) -> DataFrame:
    """One large-star round: (u,v) edges -> (v, min(N(u)+{u})) for v>u.

    `dedup=False` (default) omits the historical `.distinct()` on the
    output: duplicate edges cannot change a window `min`, the row count
    out equals the row count in (each undirected edge passes the v>u
    filter exactly once), and the following small-star round ends in
    its own `.distinct()` — so the dedup bought nothing but one extra
    full-edge-volume shuffle per round.  In the round-10 multi-JVM
    plateau experiment (SCALE.md) this is the "fused" configuration;
    `dedup=True` preserves the measured round-9 baseline shape."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    out = (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over larger-endpoint-oriented edges."""
    o = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    w = Window.partitionBy("u")
    om = o.withColumn("m", F.min("v").over(w))
    nbrs = om.select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfe = om.select("u", F.col("m").alias("v"))
    return nbrs.union(selfe).filter(F.col("u") != F.col("v")).distinct()


def _union_find_labels(pairs) -> dict[int, int]:
    """Exact union-find with min-id roots (driver-side small-graph path).
    `pairs` is any iterable of (u, v) int pairs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    driver_cc_threshold: int = 250_000,
    fuse_large_star: bool = True,
) -> DataFrame:
    """(node, component) for every node, component = min node id in its
    connected component.  `edges` is undirected pairs; `nodes` optionally
    supplies isolated vertices (single-row column of ids) so they appear
    in the output as their own singleton components.

    Size-adaptive: when the distinct edge set fits
    `driver_cc_threshold` rows, it is pulled to the driver via Arrow
    (two int64 numpy columns — 4 MB at the 250k default) and solved
    with exact union-find: a near-dup graph that small does not
    justify paying several distributed stages PER ROUND (measured
    ~5s/round of pure stage overhead on a 200-edge fixture graph).
    The union-find dict itself is Python objects — roughly 100-200
    bytes per distinct node — so the REAL driver cost at the default
    is tens of MB plus sub-second single-threaded time, not just the
    raw Arrow bytes; that is why the default is 250k and not higher.
    Larger graphs run the alternating star rounds — the 100 TB path.
    Both produce the identical (node, min-id) labeling
    (tests/test_dedup.py::
    test_connected_components_paths_agree_at_threshold_boundary pins
    them equal across the boundary).

    max_iter bounds large+small round PAIRS; convergence needs
    O(log n) of them, so 50 covers any graph that fits in storage —
    the loud failure below guards algorithm bugs, not graph shape.

    `fuse_large_star=True` (default) drops the large-star round's
    historical output `.distinct()` — 3 instead of 4 full-edge-volume
    shuffles per round pair; see _large_star.  The labeling is
    IDENTICAL either way (duplicate edges never change a window min,
    and small-star's terminal distinct restores the set semantics the
    convergence fingerprint compares); the flag exists so the round-10
    multi-JVM transfer experiment (SCALE.md) can measure both shapes.
    """
    # Truncate the caller's pair pipeline ONCE (r14): `edges` is
    # typically an expensive near-dup join (jaccard_pairs & co), and it
    # used to be re-derived three times — for `e` and for BOTH legs of
    # `all_nodes`.  The projection is 2 longs a row, the lightweight
    # proxy the CC loop was already designed around.
    ep = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).transform(truncate_plan)
    e = (
        ep.filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(truncate_plan)
    )
    all_nodes = ep.select(F.col("u").alias("node")).union(
        ep.select(F.col("v").alias("node"))
    )
    if nodes is not None:
        first = nodes.columns[0]
        all_nodes = all_nodes.union(nodes.select(F.col(first).alias("node")))
    all_nodes = all_nodes.distinct()  # single-use: no checkpoint needed

    # One probe job decides the path AND delivers the edges: pull at
    # most threshold+1 rows via Arrow (limit stops early on big
    # graphs).  Replaces the count()-then-collect pair — at fixture
    # scale the saved action is a whole Spark job per CC call.
    head = e.limit(driver_cc_threshold + 1).toPandas()
    if len(head) <= driver_cc_threshold:
        labels = _union_find_labels(
            zip(head["u"].tolist(), head["v"].tolist())
        )
        spark = edges.sparkSession
        import pandas as pd  # Arrow-path createDataFrame, no Row objects

        member = spark.createDataFrame(
            pd.DataFrame(
                {
                    "node": pd.Series(list(labels.keys()), dtype="int64"),
                    "component": pd.Series(list(labels.values()), dtype="int64"),
                }
            ),
            "node long, component long",
        )
        selfmap = all_nodes.join(
            member.select("node"), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
        return member.union(selfmap)

    prev = None
    converged = False
    for _ in range(max_iter):
        e = _small_star(
            _large_star(e, dedup=not fuse_large_star)
        ).transform(truncate_plan)
        # one-row fingerprint action materializes the lazy checkpoint;
        # (count, xor of content hashes) is order-insensitive, cannot
        # overflow under ANSI mode (sum of hashes can), and changes
        # whenever the distinct edge set changes
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        cur = (row["n"], row["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # Partially-rewired edges are silently WRONG clusters; fail
        # loudly — hitting this means a bug, not a big graph (50
        # alternating rounds handle any representable diameter).
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "large/small-star round pairs"
        )
    # At fixpoint every non-root node has exactly one star edge to its
    # component root; roots and isolated vertices map to themselves.
    member = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    selfmap = all_nodes.join(
        member.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return member.union(selfmap)
