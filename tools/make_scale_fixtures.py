"""Generate the sf1 scale fixtures used by tools/scale_run.py and the
SCALE.md evidence table.

/root/testdata is read-only and the driver provides no sf1, so this
replicates the driver's sf0.1 parquet 10x into .scale_data/sf1/
(gitignored) with id offsets; replica 0 is bit-identical to sf0.1:

- documents: doc_id + k*1e6; replica k prefixes every word with 'zqK'
  (v2), so replicas share NO shingles and are genuinely distinct
  content — near-dup answers scale ~linearly with data instead of
  blowing up quadratically inside replica cliques (the v1 suffix-token
  artifact).
- embeddings: vec_id + k*1e6; replica k applies an orthogonal
  coordinate transform (v3: cyclic rotation by k%64, half-negation for
  64<=k<128; v4 for k>=128: rotation composed with a per-replica
  md5-hashed diagonal ±1 matrix), so within-replica geometry is
  exactly preserved while cross-replica cosines are ~0 AND SRP sign
  patterns are decorrelated (v2's one-element nudge kept replica
  families sign-identical, which collapsed SRP-LSH buckets at sf10;
  v3 reused transforms beyond 128 replicas, making same-transform
  replicas bit-identical — SCALE.md "Round 10" ceiling, lifted here).
- events: event_id + k*1e7; ts/user untouched (10x events per user).
- orders + lineitem: keys offset by the SAME k*1e7, so every replicated
  order keeps its lineitems and orders-lineitem joins stay 100%-matching
  at every scale (referential integrity preserved, ADVICE r5).
- small TPC-H dims copied as-is (the scale queries don't read them).

Deterministic: same input -> same output; no randomness.

Usage: python tools/make_scale_fixtures.py [src_sf_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPY_AS_IS = ("region", "nation", "customer", "supplier", "part")

# Driver fixture embedding dimensionality (all sf* embeddings are 64-d).
EMB_DIM = 64


def diag_signs(k: int, dim: int = EMB_DIM) -> tuple[int, ...]:
    """v4 per-replica diagonal ±1 pattern for k >= 128: sign i is the
    top bit of md5(f"{k}:{i}")'s first hex digit.  md5 (not a linear
    integer form) because a Weyl-style hash's bit sequences for two
    replicas in the same rotation class came out exactly COMPLEMENTARY
    (flat-mass cosine -1); md5 patterns measured over k in [128, 1128)
    have pairwise agreement in [17, 47] of 64 → worst same-base
    |cosine| 0.47 on a flat-mass vector, far under every 0.8+ near-dup
    threshold.  Engine-independent: DuckDB's md5() reproduces it
    inside the COPY, this Python twin pins it in tests."""
    import hashlib

    return tuple(
        -1 if hashlib.md5(f"{k}:{i}".encode()).hexdigest()[0] in "89abcdef" else 1
        for i in range(dim)
    )


# v3 transforms the v4 diagonals must stay distinct from (identity and
# first-half negation — both composed with the same rotation family).
V3_PATTERNS = (tuple([1] * EMB_DIM), tuple([-1] * (EMB_DIM // 2) + [1] * (EMB_DIM // 2)))


def assert_sign_diversity(replicas: int) -> None:
    """Every pair of replicas sharing a rotation class must get
    DISTINCT diagonal patterns (else two replicas of one base vector
    are bit-identical — the exact failure the 128 ceiling guarded), and
    each pattern must be sign-balanced enough (8..56 of 64 positive)
    that same-base cross-replica cosines stay far from ±1."""
    by_rot: dict[int, set[tuple[int, ...]]] = {}
    for k in range(128, replicas):
        p = diag_signs(k)
        ones = sum(1 for s in p if s == 1)
        if not 8 <= ones <= 56:
            raise SystemExit(f"replica {k}: degenerate sign balance {ones}/64")
        seen = by_rot.setdefault(k % EMB_DIM, set(V3_PATTERNS))
        if p in seen:
            raise SystemExit(
                f"replica {k}: diagonal pattern collides within rotation "
                f"class {k % EMB_DIM} — two replicas would be bit-identical"
            )
        seen.add(p)


def make(src: str, dst: str, replicas: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({replicas})) AS k) r"
    # v2 (round 6): replica k prefixes EVERY word with 'zq{k}', so no
    # shingle of any n survives across replicas — replicas are truly
    # DISTINCT content, not near-duplicates.  The v1 suffix-token
    # (' zqK') only changed fingerprints: replicas stayed mutual
    # near-dups at jaccard ~0.95, so every near-dup/substring workload's
    # TRUE ANSWER grew quadratically inside 10-replica cliques (~1000x
    # pairs at 10x data) and wall-clock ratios read super-linear for
    # answer-size reasons, not plan reasons.  Word count per doc is
    # preserved; n_chars is recomputed to stay = len(text).
    con.sql(f"""
    COPY (
      SELECT d.doc_id + r.k * 1000000 AS doc_id,
             CASE WHEN r.k = 0 THEN d.text
                  ELSE array_to_string(list_transform(
                         regexp_split_to_array(
                           trim(regexp_replace(d.text, chr(10), ' ', 'g')),
                           '\\s+'),
                         w -> 'zq' || r.k || w), ' ') END AS text,
             d.lang, d.source,
             CASE WHEN r.k = 0 THEN d.n_chars
                  ELSE len(array_to_string(list_transform(
                         regexp_split_to_array(
                           trim(regexp_replace(d.text, chr(10), ' ', 'g')),
                           '\\s+'),
                         w -> 'zq' || r.k || w), ' ')) END AS n_chars
      FROM read_parquet('{src}/documents.parquet') d, {rep}
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    # v3: replica k applies an ORTHOGONAL coordinate transform to every
    # vector — a cyclic rotation by k%64 positions, plus (for k>=64) a
    # sign flip of the first half.  Two properties v2 lacked:
    #   1. WITHIN-replica geometry is bit-preserved (a permutation /
    #      diagonal-±1 matrix applied uniformly keeps every pairwise
    #      cosine exactly), so each replica contributes exactly the
    #      sf0.1 near-dup answer — answers scale exactly linearly by
    #      construction, not approximately.
    #   2. CROSS-replica SIGN DIVERSITY: v2 changed one coordinate, so
    #      all replicas of a base vector shared near-identical SRP sign
    #      patterns; at sf10 every SRP band bucket held a whole
    #      100-replica family (~3e8 candidate pairs, semantic_full
    #      unrunnable — VERDICT r8 #1).  A rotation decorrelates the
    #      random-projection signs, spreading replicas across buckets.
    # Cross-replica cosines for i.i.d.-ish coordinates are ~0 (incoher-
    # ent), far below every near-dup threshold in the suite.  Label
    # structure untouched; replica 0 stays bit-identical to the source.
    #
    # v4 (round 11, lifts the 128-replica ceiling — SCALE.md "Round
    # 10"): replica k >= 128 composes the rotation with a deterministic
    # md5-hashed diagonal ±1 matrix (see diag_signs).  permutation x
    # diagonal(±1) is still orthogonal, so within-replica geometry is
    # still EXACTLY preserved; the transform family grows from 128 to
    # 64 x 2^64, distinct-by-assertion for every generated k, and each
    # diagonal is a fresh SRP hyperplane (sign(w . Dx) = sign((Dw) . x))
    # so sign patterns stay decorrelated at sf100 replica counts.
    # Replicas 0..127 are BIT-IDENTICAL to v3 output (no regeneration
    # churn for the committed sf1/sf10 evidence).
    assert_sign_diversity(replicas)
    v4 = (
        "CAST(list_transform(range(len(t.rot)), i -> t.rot[i + 1] * "
        "(CASE WHEN substr(md5(t.k || ':' || i), 1, 1) >= '8' "
        "THEN -1 ELSE 1 END)) AS FLOAT[])"
    )
    con.sql(f"""
    COPY (
      SELECT t.vec_id + t.k * 1000000 AS vec_id,
             CASE WHEN t.k = 0 THEN t.embedding
                  WHEN t.k // 64 = 0 THEN CAST(t.rot AS FLOAT[])
                  WHEN t.k // 64 = 1 THEN CAST(list_concat(
                         list_transform(t.rot[1:32], x -> -x),
                         t.rot[33:]) AS FLOAT[])
                  ELSE {v4}
                  END AS embedding,
             t.label
      FROM (
        SELECT e.*, r.k,
               list_concat(e.embedding[(r.k % 64) + 1:],
                           e.embedding[1:(r.k % 64)]) AS rot
        FROM read_parquet('{src}/embeddings.parquet') e, {rep}
      ) t
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT e.event_id + r.k * 10000000 AS event_id,
             e.ts, e.user_id, e.event_type, e.value, e.props
      FROM read_parquet('{src}/events.parquet') e, {rep}
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    # orders is the fact side of the bitmap/bloom/merge scale rows: 10x
    # the rows per (unchanged) customer, so dim joins stay valid and the
    # fact-growth behavior is real
    con.sql(f"""
    COPY (
      SELECT o.o_orderkey + r.k * 10000000 AS o_orderkey,
             o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
             o.o_orderpriority
      FROM read_parquet('{src}/orders.parquet') o, {rep}
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    # lineitem rides with orders: the SAME k*1e7 key offset keeps every
    # replicated order's lineitems attached (100%-matching joins)
    con.sql(f"""
    COPY (
      SELECT l.l_orderkey + r.k * 10000000 AS l_orderkey,
             l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
             l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
             l.l_linestatus, l.l_shipdate
      FROM read_parquet('{src}/lineitem.parquet') l, {rep}
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in COPY_AS_IS:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".scale_data/sf1")
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, replicas)
    # A regenerated fixture can legitimately flip a probabilistic gate
    # whose oracle hardcodes TRUE (recall_ok / within_tol) and would
    # then present as a mysterious driver hash failure.  Fail loudly
    # NOW instead (VERDICT r6 #1).  Opt out (e.g. for a quick partial
    # fixture) with SPARK_GRAFT_SKIP_GATE_REVALIDATION=1.
    if not os.environ.get("SPARK_GRAFT_SKIP_GATE_REVALIDATION"):
        sys.path.insert(0, REPO)
        from tools.revalidate_gates import check_gates  # noqa: E402

        from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
        from semantic_query_engine_spark.session import get_spark  # noqa: E402

        spark = get_spark("fixture-gate-revalidation")
        spark.sparkContext.setLogLevel("ERROR")
        failures = check_gates(spark, REGISTRY, dst)
        if failures:
            print(f"\nfixture {dst} BREAKS {len(failures)} hardcoded-TRUE gates:")
            for f in failures:
                print(f"  - {f}")
            raise SystemExit(1)
        print(f"\nall gates hold on the regenerated fixture {dst}")
