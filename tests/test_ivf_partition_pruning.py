"""IVF cluster-partitioned layout: dynamic partition pruning, MEASURED.

VERDICT r6 #6: "DPP-ready" was the one 100-TB claim in the ANN ladder
backed by prose instead of a measurement.  This test writes the
assigned index `partitionBy('cluster_id')` (operators/ann.py
write_ivf_index), runs ivf_topk over the read-back layout, and asserts

  (a) the optimized plan carries a `dynamicpruning` subquery in the
      scan's partition filters,
  (b) the EXECUTED scan's metrics show file-level pruning:
      numFiles < staticFilesNum and numPartitions == nprobe,
  (c) the pruned result equals the unpartitioned path bit-for-bit.

The DPP trigger is the `csim >= -1` no-op filter in ivf_topk: Spark's
PartitionPruning rule requires a "likely selective" dimension-side
predicate (a bare Limit does not qualify), so dropping that filter
silently reverts the scan to all-files — exactly what (b) would catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_CLUSTERS = 8
NPROBE = 2


def _scan_metrics(df) -> dict[str, int]:
    """Walk the executed (post-AQE) plan and return the parquet scan's
    metric values.  Query stages nest their plan behind .plan() /
    .executedPlan(), not .children()."""
    out: dict[str, int] = {}

    def walk(node):
        name = node.nodeName()
        if name.startswith("Scan parquet"):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif name.endswith("QueryStage"):
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return out


@pytest.fixture(scope="module")
def ivf(spark, sf_dir, tmp_path_factory):
    from semantic_query_engine_spark.operators.ann import (
        build_ivf,
        read_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = build_ivf(emb, n_clusters=N_CLUSTERS)
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    write_ivf_index(assigned, path)
    qv = [float(x) for x in emb.limit(1).toPandas()["embedding"][0]]
    return assigned, centroids, read_ivf_index(spark, path), qv


def test_dpp_subquery_is_planned(ivf):
    from semantic_query_engine_spark.operators.ann import ivf_topk

    _, centroids, idx, qv = ivf
    res = ivf_topk(idx, centroids, qv, k=3, nprobe=NPROBE)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_files_are_pruned_at_run_time(ivf):
    from semantic_query_engine_spark.operators.ann import ivf_topk

    _, centroids, idx, qv = ivf
    res = ivf_topk(idx, centroids, qv, k=3, nprobe=NPROBE)
    res.collect()
    m = _scan_metrics(res)
    assert m, "no parquet scan metrics found in executed plan"
    assert m["staticFilesNum"] >= N_CLUSTERS  # one file per cluster dir
    assert m["numPartitions"] == NPROBE, m
    assert m["numFiles"] < m["staticFilesNum"], m


def test_partitioned_layout_matches_unpartitioned_path(ivf):
    from semantic_query_engine_spark.operators.ann import ivf_topk

    assigned, centroids, idx, qv = ivf
    on_layout = ivf_topk(idx, centroids, qv, k=3, nprobe=NPROBE).collect()
    in_memory = ivf_topk(assigned, centroids, qv, k=3, nprobe=NPROBE).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in on_layout] == [
        (r["vec_id"], round(r["score"], 9)) for r in in_memory
    ]


def test_pruning_survives_probe_breadth(ivf):
    """nprobe drives scanned-partition count 1:1 — the knob the
    reference exposes as ef/refine maps to files read here."""
    from semantic_query_engine_spark.operators.ann import ivf_topk

    _, centroids, idx, qv = ivf
    for nprobe in (1, 3):
        res = ivf_topk(idx, centroids, qv, k=3, nprobe=nprobe)
        res.collect()
        assert _scan_metrics(res)["numPartitions"] == nprobe


@pytest.fixture(scope="module")
def ivfpq_layout(spark, sf_dir, tmp_path_factory):
    """The persisted IVF-PQ serving layout (operators/pq.py
    write_ivfpq_index) over the raw embeddings table."""
    from semantic_query_engine_spark.operators.ann import (
        build_ivf,
        sample_vectors,
    )
    from semantic_query_engine_spark.operators.pq import (
        build_pq,
        pq_encode,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    X = sample_vectors(emb)
    assigned, centroids = build_ivf(emb, n_clusters=N_CLUSTERS, sample_X=X)
    books = build_pq(emb, m=8, k=16, sample_X=X)
    enc = pq_encode(emb, books)
    path = str(tmp_path_factory.mktemp("ivfpq") / "serving")
    write_ivfpq_index(assigned, enc, centroids, books, path)
    qv = [float(x) for x in emb.limit(1).toPandas()["embedding"][0]]
    return emb, (assigned, centroids, enc, books), read_ivfpq_index(
        spark, path
    ), qv


def test_ivfpq_serving_layout_prunes_statically(ivfpq_layout, tmp_path):
    """The probe's literal isin(cluster_ids) filter prunes the
    partitionBy(cluster_id) code-table scan at PLAN time (static
    pruning, so no `staticFilesNum`/DPP metrics — the non-probed files
    never enter the plan at all): the executed scan touches exactly
    nprobe partitions and fewer files than the layout holds on disk.
    This is the physical claim behind ann_ivfpq_topk_indexed:
    per-query cost ~ nprobe/n_clusters of an 8-byte-per-vector table,
    decoupled from build cost."""
    import glob

    from semantic_query_engine_spark.operators.pq import ivfpq_probe

    emb, _, (codes, centroids, books), qv = ivfpq_layout
    layout_files = glob.glob(
        codes.inputFiles()[0].rsplit("/cluster_id=", 1)[0].replace("file:", "")
        + "/cluster_id=*/*.parquet"
    )
    res = ivfpq_probe(codes, centroids, emb, books, qv, k=3, nprobe=NPROBE)
    res.collect()
    # per-scan metrics (the plan also scans the raw-vector table for the
    # exact re-rank; _scan_metrics would merge the two scans' numFiles)
    scans: list[dict] = []

    def walk(node):
        name = node.nodeName()
        if name.startswith("Scan parquet"):
            d = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                d[kv._1()] = kv._2().value()
            scans.append(d)
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif name.endswith("QueryStage"):
            walk(node.plan())

    walk(res._jdf.queryExecution().executedPlan())
    pruned = [d for d in scans if "numPartitions" in d]
    assert pruned, scans
    m = pruned[0]
    assert m["numPartitions"] == NPROBE, m
    assert len(layout_files) >= N_CLUSTERS
    assert m["numFiles"] < len(layout_files), (m, len(layout_files))


def test_ivfpq_serving_probe_matches_in_plan_build(ivfpq_layout):
    """Probing the persisted layout returns bit-for-bit what the
    in-plan build-and-probe (ivfpq_topk) returns with the same build
    inputs — the layout round-trip (codes parquet, partition-column
    rewrite, codebooks JSON) changes WHERE the work happens, never the
    answer."""
    from semantic_query_engine_spark.operators.pq import (
        ivfpq_probe,
        ivfpq_topk,
    )

    emb, (assigned, centroids, enc, books), (codes, cent2, books2), qv = (
        ivfpq_layout
    )
    served = ivfpq_probe(
        codes, cent2, emb, books2, qv, k=3, nprobe=NPROBE
    ).collect()
    in_plan = ivfpq_topk(
        assigned, centroids, enc, emb, books, qv, k=3, nprobe=NPROBE
    ).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in served] == [
        (r["vec_id"], round(r["score"], 9)) for r in in_plan
    ]
