"""Plan-shape + property tests for the sketch/bitmap/XML and
text-mining query families (sketch_q.py, textmining_q.py).  Value
correctness is already oracle-gated; these pin the physical shapes and
the accuracy-gate invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prune_join_shape(spark, sf_dir):
    """The bit-position table must broadcast (fact side never moves for
    the membership test) and nothing may degenerate to a cartesian."""
    from semantic_query_engine_spark.queries.sketch_q import bloom_prune_join

    df = bloom_prune_join(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_prune_join_equals_plain_join(spark, sf_dir):
    """No false negatives: the bloom-pruned join returns exactly the
    plain join (false positives are removed by the exact join)."""
    from semantic_query_engine_spark.queries.sketch_q import bloom_prune_join
    from semantic_query_engine_spark.sources.fixtures import load_table

    got = {
        (r.o_orderkey, r.o_custkey)
        for r in bloom_prune_join(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    )
    want = {
        (r.o_orderkey, r.o_custkey)
        for r in o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    assert got == want


def test_cms_sketch_is_bounded(spark, sf_dir):
    """The counter table is <= depth x width rows no matter the input
    size — the whole point of a count-min sketch."""
    from semantic_query_engine_spark.queries.sketch_q import (
        _CMS_DEPTH,
        _CMS_WIDTH,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "CAST(user_id AS LONG) AS k"
    )
    stack_expr = "stack({}, {}) AS (depth, bucket)".format(
        _CMS_DEPTH,
        ", ".join(
            f"{d}, pmod(xxhash64(k, {d}), {_CMS_WIDTH})" for d in range(_CMS_DEPTH)
        ),
    )
    n_cells = (
        ev.selectExpr(stack_expr).groupBy("depth", "bucket").count().count()
    )
    assert n_cells <= _CMS_DEPTH * _CMS_WIDTH


def test_cms_estimates_hold_bound(spark, sf_dir):
    """The oracle gates only the guaranteed direction (est >= exact);
    the probabilistic Markov upper bound est <= exact + ceil(e*N/w)
    (per-key success ~1 - e^-depth) is asserted HERE, where an unlucky
    fixture would fail a test instead of flapping a hash gate."""
    import math

    from semantic_query_engine_spark.queries.sketch_q import (
        _CMS_WIDTH,
        cms_estimates,
        cms_frequency,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    rows = cms_frequency(spark, sf_dir).collect()
    assert rows and all(r.cms_ok for r in rows)

    n_total = load_table(spark, sf_dir, "events").count()
    bound = math.ceil(math.e * n_total / _CMS_WIDTH)
    ests = cms_estimates(spark, sf_dir).collect()
    assert ests
    for r in ests:
        assert r.exact_cnt <= r.est <= r.exact_cnt + bound, (
            r.user_id,
            r.exact_cnt,
            r.est,
            bound,
        )


def test_hll_union_rollup_within_tol(spark, sf_dir):
    from semantic_query_engine_spark.queries.sketch_q import hll_union_rollup

    rows = hll_union_rollup(spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows)


def test_bitmap_distinct_no_raw_id_shuffle(spark, sf_dir):
    """Level-1 aggregation must be a bitmap agg (partial bitmaps merge
    map-side); no cartesian anywhere."""
    from semantic_query_engine_spark.queries.sketch_q import bitmap_distinct

    plan = _plan(bitmap_distinct(spark, sf_dir))
    assert "bitmap_construct_agg" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_match_join_is_equi_join(spark, sf_dir):
    """Normalization blocking must compile to an equality join on the
    canonical key — never an all-pairs comparison."""
    from semantic_query_engine_spark.queries.textmining_q import fuzzy_match_join

    plan = _plan(fuzzy_match_join(spark, sf_dir))
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_match_join_finds_planted_typos(spark, sf_dir):
    """Every probe row has >= 1 match (its own original: distance == the
    number of substituted characters, capped at 3 by the filter)."""
    from semantic_query_engine_spark.queries.textmining_q import fuzzy_match_join

    rows = fuzzy_match_join(spark, sf_dir).collect()
    self_pairs = [r for r in rows if r.c_custkey == r.probe_key]
    assert self_pairs, "expected self-matches for lightly-corrupted names"
    assert all(0 <= r.dist <= 3 for r in rows)


def test_xml_roundtrip_lossless(spark, sf_dir):
    from semantic_query_engine_spark.queries.sketch_q import xml_funcs

    rows = xml_funcs(spark, sf_dir).collect()
    assert rows and all(r.roundtrip_ok for r in rows)


def test_url_canonical_dedup_strips_aliases(spark, sf_dir):
    """Scheme case, host case, trailing slash, and tracking params must
    all collapse: every canonical url is lowercase-schemed with no query
    string and no trailing slash."""
    from semantic_query_engine_spark.queries.textmining_q import url_canonical_dedup

    rows = url_canonical_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.canonical_url.startswith("https://")
        assert "?" not in r.canonical_url
        assert not r.canonical_url.endswith("/")
        assert r.canonical_url == r.canonical_url.lower()


def test_entity_resolution_is_equi_join_and_resolves_variants(spark, sf_dir):
    """Blocking must compile to an equality join; every master record
    must absorb both of its corrupted feed variants."""
    from semantic_query_engine_spark.queries.textmining_q import entity_resolution

    df = entity_resolution(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r.entity_id, set()).add(r.record_id)
    masters = [e for e in by_entity if e < 100000]
    assert masters
    for e in masters:
        assert by_entity[e] == {e, e + 100000, e + 200000}
    canon = [r for r in rows if r.is_canonical]
    assert len(canon) == len(by_entity)


def test_binarize_hamming_self_distance_zero(spark, sf_dir):
    """A vector's signature must have Hamming distance 0 to itself:
    re-derive signatures two ways and compare — pins the packing."""
    from semantic_query_engine_spark.queries.semantic import (
        embedding_binarize_hamming,
    )

    rows = embedding_binarize_hamming(spark, sf_dir).collect()
    assert rows and all(r.hamming >= 0 for r in rows)
    # per probe: ranks 1..3 strictly ordered by (hamming, vec_id)
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.probe_id].append((r.rank, r.hamming, r.vec_id))
    for probe, lst in per.items():
        lst.sort()
        assert [x[0] for x in lst] == [1, 2, 3]
        assert all(
            (a[1], a[2]) <= (b[1], b[2]) for a, b in zip(lst, lst[1:])
        )


def test_mmr_rerank_is_diverse_and_bounded(spark, sf_dir):
    """MMR must return 5 distinct ids ranked 1..5 with non-increasing
    scores after the first pick's pure-relevance score."""
    from semantic_query_engine_spark.queries.semantic import semantic_mmr_rerank

    rows = sorted(semantic_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5


def test_tfidf_cosine_pairs_planted_and_plan(spark, sf_dir):
    """Every planted 80%-prefix copy (id+50000) must pair back to its
    own source above 0.8; the pair stage must be an equi-join on the
    bigram term (inverted index), never a cartesian/BNLJ — at 100 TB
    the term-keyed shuffle is the entire scale story."""
    from semantic_query_engine_spark.queries.textmining_q import (
        tfidf_cosine_pairs,
    )

    df = tfidf_cosine_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only BNLJ allowed is the broadcast 1-row corpus count (a
    # Cross build, same shape as tfidf_keywords; the shared subtree
    # prints once per consumer) — the PAIR stage must be an equi-join
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert ", Cross" in line, line
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    rows = df.collect()
    planted = {(r.id_a, r.id_b) for r in rows if r.id_b >= 50000}
    assert planted, "planted prefix near-dups must be detected"
    # each surfaced planted doc must include the pair with its source
    for src in {b - 50000 for _, b in planted}:
        assert (src, src + 50000) in planted
    assert all(0.8 <= r.sim <= 1.0 for r in rows)


def test_tfidf_cosine_pairs_invariant_to_shuffle_partitioning(spark, sf_dir):
    """The integer-quantized weights make every pair/norm sum exact in
    any accumulation order, so the 6-decimal sims must be BIT-IDENTICAL
    under different shuffle partitionings (a float-sum pipeline would
    only be approximately equal)."""
    from semantic_query_engine_spark.queries.textmining_q import (
        tfidf_cosine_pairs,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, tfidf_cosine_pairs(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = sorted(map(tuple, tfidf_cosine_pairs(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b and a


def test_tfidf_high_tf_no_overflow(spark, tmp_path):
    """ADVICE r10: under the old 1e-6 idf quantization, a single
    (doc, bigram) with tf >= ~500 made wq^2 exceed 2^63, so the long
    sums in norms/dots overflowed — an ANSI runtime failure on Spark
    while DuckDB silently kept going in HUGEINT.  Pin the fixed
    pipeline (1e-4 idf scale + DECIMAL(38,0) quadratic sums) on a
    corpus whose doc 0 repeats one bigram 600 times: Spark must
    neither raise nor diverge bit-for-bit from the DuckDB oracle."""
    import os

    import duckdb
    import pandas as pd

    from semantic_query_engine_spark.queries import REGISTRY

    n = 300
    texts = [
        ("alpha beta " * 600).strip()
        if i == 0
        else f"w{i}a w{i}b w{i}c w{i}d w{i}e"
        for i in range(n)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": list(range(n)),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["synthetic"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path / "hightf")
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    spec = REGISTRY["tfidf_cosine_pairs"]
    got = sorted(
        (int(r.id_a), int(r.id_b), float(r.sim))
        for r in spec.fn(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), float(s))
        for a, b, s in con.execute(spec.oracle).fetchall()
    )
    assert got == want and got
    # the tf=600 doc and its 80%-prefix plant must pair near 1.0
    by_pair = {(a, b): s for a, b, s in got}
    assert by_pair.get((0, 50000), 0.0) > 0.95
