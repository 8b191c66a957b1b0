"""Graph-analytics queries over the similarity graph (round 5,
session 2).  connected_components (operators/graph.py) covers the
dedup-clustering side; this module adds ITERATIVE rank propagation —
the GraphX-class workload expressed as pure DataFrame loops with
lineage control, no RDDs.

PageRank over a k-NN similarity graph is a real curation operator:
centrality in the near-duplicate/similarity graph identifies canonical
or hub documents (and, inverted, outliers) for representative
selection and diversity sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import fmt_doc, register
from ..functions.plan import truncate_eager

_POOL = 200  # bounded demo pool; the scale path for edge generation is
# the IVF-pruned ivf_knn_join (operators/ann.py), which produces the
# same (src, dst) edge schema without the all-pairs score stage.
_K = 3
_ITERS = 10
_DAMP = 0.85


def _pagerank_oracle() -> str:
    """Unrolled power iteration as chained CTEs (DuckDB disallows
    aggregation in a recursive CTE term, so the fixed iteration count
    is unrolled mechanically)."""
    parts = [
        f"""
    WITH pool AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < {_POOL}),
    n AS (SELECT COUNT(*) AS n FROM pool),
    scored AS (
      SELECT a.id AS src, b.id AS dst,
             list_cosine_similarity(a.v, b.v) AS raw
      FROM pool a JOIN pool b ON a.id <> b.id),
    edges AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY raw DESC, dst) AS rn
        FROM scored) WHERE rn <= {_K}),
    pr0 AS (SELECT id, 1.0 / n.n AS r FROM pool, n)"""
    ]
    for i in range(1, _ITERS + 1):
        parts.append(
            f""",
    pr{i} AS (
      SELECT p.id,
             {1 - _DAMP} / n.n + {_DAMP} * COALESCE(c.in_r, 0) AS r
      FROM pool p CROSS JOIN n
      LEFT JOIN (
        SELECT e.dst AS id, SUM(pr{i - 1}.r / {_K}) AS in_r
        FROM edges e JOIN pr{i - 1} ON pr{i - 1}.id = e.src
        GROUP BY e.dst) c ON c.id = p.id)"""
        )
    parts.append(
        f"""
    SELECT id AS vec_id, ROUND(r, 6) AS pagerank FROM pr{_ITERS}"""
    )
    return "".join(parts)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 power iterations, damping 0.85) over the top-3
    cosine k-NN graph of a bounded embedding pool — similarity-graph
    centrality for canonical-document selection.  Every node has
    out-degree exactly k, so transition weight is uniformly 1/k and
    there are no dangling nodes; nodes without in-edges receive the
    teleport term only.  The oracle unrolls the identical power
    iteration as chained SQL CTEs; both engines round only the FINAL
    ranks to 6 decimals (double accumulation differences over 10
    iterations stay ~1e-13, far inside the rounding).

    Scale shape: each iteration is ONE equi-join (edges src = ranks id,
    both sides partitioned by the join key) plus one dst-keyed hash
    aggregate with map-side combine — the textbook distributed PR step.
    Ranks are eagerly localCheckpoint'd per iteration so the plan stays
    one-iteration deep (no 10-join lineage for Catalyst to re-derive,
    same discipline as operators/graph.py's CC loop).  At 100 TB the
    edge table partitioning is REUSED across iterations (the join key
    never changes), so only the small ranks side moves."""
    from ..operators.retrieval import knn_join

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _POOL)
    pool = emb.select("vec_id", "embedding")
    probes = pool.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    edges = (
        knn_join(probes, pool, k=_K, exclude_self=True)
        .select(F.col("probe_id").alias("src"), F.col("vec_id").alias("dst"))
        .transform(truncate_eager)  # computed once, reused 10x
    )
    n = pool.count()  # bounded pool (<= _POOL rows) — setup scalar
    ranks = pool.select("vec_id", F.lit(1.0 / n).alias("r"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.vec_id)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / _K).alias("in_r"))
        )
        ranks = (
            pool.select("vec_id")
            .join(contrib, F.col("vec_id") == F.col("dst"), "left")
            .select(
                "vec_id",
                (
                    F.lit((1 - _DAMP) / n)
                    + F.lit(_DAMP) * F.coalesce(F.col("in_r"), F.lit(0.0))
                ).alias("r"),
            )
            .transform(truncate_eager)
        )
    return ranks.select("vec_id", F.round("r", 6).alias("pagerank"))


_PR_EPS = 0.011  # L1 stop threshold — sits >= 3.7% from every measured
# per-iteration delta at sf0.001/0.01/0.1 (deltas decay ~0.73x/iter;
# cross-engine double-sum noise is ~1e-15 relative), so the stop
# iteration is boundary-safe on the fixtures.  All three SFs stop at 8.
_PR_MAX = 15


def _pagerank_converged_oracle() -> str:
    """The convergence-terminated twin: unroll _PR_MAX materialized
    iterations AND their L1 deltas, derive the stop iteration IN SQL
    (min i with d_i < eps, fallback _PR_MAX), and select that pr level.
    AS MATERIALIZED throughout — each pr{i} is referenced by pr{i+1},
    two deltas and the final union, so inlining would re-expand the
    chain exponentially (the bpe_merges_n10 lesson)."""
    parts = [
        f"""
    WITH pool AS MATERIALIZED (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < {_POOL}),
    n AS MATERIALIZED (SELECT COUNT(*) AS n FROM pool),
    scored AS MATERIALIZED (
      SELECT a.id AS src, b.id AS dst,
             list_cosine_similarity(a.v, b.v) AS raw
      FROM pool a JOIN pool b ON a.id <> b.id),
    edges AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY raw DESC, dst) AS rn
        FROM scored) WHERE rn <= {_K}),
    pr0 AS MATERIALIZED (SELECT id, 1.0 / n.n AS r FROM pool, n)"""
    ]
    for i in range(1, _PR_MAX + 1):
        parts.append(
            f""",
    pr{i} AS MATERIALIZED (
      SELECT p.id,
             {1 - _DAMP} / n.n + {_DAMP} * COALESCE(c.in_r, 0) AS r
      FROM pool p CROSS JOIN n
      LEFT JOIN (
        SELECT e.dst AS id, SUM(pr{i - 1}.r / {_K}) AS in_r
        FROM edges e JOIN pr{i - 1} ON pr{i - 1}.id = e.src
        GROUP BY e.dst) c ON c.id = p.id),
    d{i} AS MATERIALIZED (
      SELECT SUM(ABS(a.r - b.r)) AS d
      FROM pr{i} a JOIN pr{i - 1} b ON a.id = b.id)"""
        )
    dunion = " UNION ALL ".join(
        f"SELECT {i} AS i, (SELECT d FROM d{i}) AS d"
        for i in range(1, _PR_MAX + 1)
    )
    parts.append(
        f""",
    stop AS MATERIALIZED (
      SELECT COALESCE(MIN(i), {_PR_MAX}) AS it
      FROM ({dunion}) WHERE d < {_PR_EPS}),
    final AS ("""
        + " UNION ALL ".join(
            f"SELECT id, r FROM pr{i} WHERE (SELECT it FROM stop) = {i}"
            for i in range(1, _PR_MAX + 1)
        )
        + f""")
    SELECT id AS vec_id, ROUND(r, 6) AS pagerank,
           CAST((SELECT it FROM stop) AS INT) AS iterations
    FROM final"""
    )
    return "".join(parts)


@register("graph_pagerank_converged", oracle=_pagerank_converged_oracle())
@fmt_doc(eps=_PR_EPS, mx=_PR_MAX)
def graph_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank with CONVERGENCE-BASED termination (VERDICT r11
    #8): iterate until the L1 rank delta drops below {eps} (max
    {mx} rounds) instead of a fixed 10.  The per-iteration driver
    check is ONE double (sum |r_i - r_(i-1)|, a bounded scalar agg over
    the pool-sized rank table); the stop iteration rides along as an
    `iterations` output column, and the oracle derives the SAME stop
    level in SQL from its own unrolled delta chain — so the iteration
    count itself is value-hash-checked, not asserted.  The threshold
    sits >= 3.7% from every measured fixture delta (deltas decay
    ~0.73x/iter; cross-engine summation noise ~1e-15), so no float
    boundary is live.

    Scale shape: identical per-iteration plan to graph_pagerank (one
    src-keyed equi-join + one dst-keyed combining agg, ranks
    localCheckpoint'd so lineage stays one deep); the delta adds one
    pool-sized join + scalar agg per round.  Convergence
    termination is what makes PR affordable on a 100-TB similarity
    graph: web-scale rank vectors converge long before a conservative
    fixed iteration budget, and every skipped round is a full
    edge-table join saved."""
    from ..operators.retrieval import knn_join

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _POOL)
    pool = emb.select("vec_id", "embedding")
    probes = pool.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    edges = (
        knn_join(probes, pool, k=_K, exclude_self=True)
        .select(F.col("probe_id").alias("src"), F.col("vec_id").alias("dst"))
        .transform(truncate_eager)
    )
    n = pool.count()  # bounded pool (<= _POOL rows) — setup scalar
    ranks = pool.select("vec_id", F.lit(1.0 / n).alias("r"))
    iters = _PR_MAX
    for i in range(1, _PR_MAX + 1):
        contrib = (
            edges.join(ranks, edges.src == ranks.vec_id)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / _K).alias("in_r"))
        )
        new = (
            pool.select("vec_id")
            .join(contrib, F.col("vec_id") == F.col("dst"), "left")
            .select(
                "vec_id",
                (
                    F.lit((1 - _DAMP) / n)
                    + F.lit(_DAMP) * F.coalesce(F.col("in_r"), F.lit(0.0))
                ).alias("r"),
            )
            .transform(truncate_eager)
        )
        # bounded per-iteration driver check: ONE double
        delta = (
            new.alias("a")
            .join(ranks.alias("b"), "vec_id")
            .agg(F.sum(F.abs(F.col("a.r") - F.col("b.r"))))
            .head()[0]
        )
        ranks = new
        if delta < _PR_EPS:
            iters = i
            break
    return ranks.select(
        "vec_id",
        F.round("r", 6).alias("pagerank"),
        F.lit(iters).cast("int").alias("iterations"),
    )




_CP_ANCHORS = 20
_CP_NEGS = 3


@register(
    "contrastive_pairs",
    oracle=f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
      FROM embeddings WHERE vec_id < {_CP_ANCHORS}),
    cands AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT a.anchor_id, c.vec_id,
             list_cosine_similarity(c.v, a.av) AS raw
      FROM cands c JOIN anchors a ON c.vec_id <> a.anchor_id),
    pos AS (
      SELECT anchor_id, vec_id AS other_id, 'pos' AS role, 1 AS rank
      FROM (
        SELECT anchor_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY raw DESC, vec_id) AS rn
        FROM scored) WHERE rn = 1),
    nonpos AS (
      SELECT s.anchor_id, s.vec_id,
             md5(CAST(s.anchor_id AS VARCHAR) || '|' || CAST(s.vec_id AS VARCHAR)) AS m
      FROM scored s
      LEFT JOIN pos p ON p.anchor_id = s.anchor_id AND p.other_id = s.vec_id
      WHERE p.other_id IS NULL),
    negs AS (
      SELECT anchor_id, vec_id AS other_id, 'neg' AS role, CAST(rn AS INT) AS rank
      FROM (
        SELECT anchor_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY ({{poly}}), vec_id) AS rn
        FROM nonpos) WHERE rn <= {_CP_NEGS})
    SELECT anchor_id, role, other_id, rank FROM pos
    UNION ALL SELECT anchor_id, role, other_id, rank FROM negs
    """.replace("{poly}", "(strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(m, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(m, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(m, 8, 1)) - 1)"),
)
def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining for embedding-model training:
    per anchor, ONE positive (its nearest neighbor by cosine, the
    standard self-supervised positive) and THREE reproducible random
    negatives drawn by ranking candidates on a portable md5-derived
    hash of (anchor, candidate) — deterministic "random" sampling that
    any engine reproduces bit-for-bit, the same discipline as
    hash_split.  Positives are excluded from the negative pool.

    Scale shape: positives ride the broadcast-probe kNN scan; negative
    ranking is one window per anchor over hash keys computed map-side —
    no RNG state, no shuffle beyond the per-anchor window.  At 100 TB
    the anchor set shards and each shard mines independently."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _CP_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("av")
    )
    from ..functions.vectors import cosine

    scored = (
        # bounded: _CP_ANCHORS constant anchor rows
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select("anchor_id", "vec_id", cosine("embedding", "av").alias("raw"))
    )
    wpos = Window.partitionBy("anchor_id").orderBy(F.desc("raw"), F.asc("vec_id"))
    pos = (
        scored.withColumn("rn", F.row_number().over(wpos))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("other_id"),
            F.lit("pos").alias("role"),
            F.lit(1).alias("rank"),
        )
    )
    nonpos = scored.join(
        pos.select("anchor_id", F.col("other_id").alias("vec_id")),
        ["anchor_id", "vec_id"],
        "left_anti",
    ).withColumn(
        "hk",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("anchor_id").cast("string"),
                        F.lit("|"),
                        F.col("vec_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    wneg = Window.partitionBy("anchor_id").orderBy(F.asc("hk"), F.asc("vec_id"))
    negs = (
        nonpos.withColumn("rn", F.row_number().over(wneg))
        .filter(F.col("rn") <= _CP_NEGS)
        .select(
            "anchor_id",
            F.col("vec_id").alias("other_id"),
            F.lit("neg").alias("role"),
            F.col("rn").cast("int").alias("rank"),
        )
    )
    return pos.unionByName(negs)
