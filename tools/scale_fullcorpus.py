"""Full-corpus (UNBOUNDED) scale sweep for the near-dup production
operators — VERDICT r5 #2.

SCALE.md's dedup_minhash_lsh / dedup_semantic / dedup_cluster rows run
the registered queries, whose pools are bounded (doc_id < 100) for
oracle tractability; this harness times the underlying OPERATORS over
the ENTIRE corpus at sf0.1 (2k docs / 2k vectors) vs sf1 (20k / 20k),
so the 10x-data scaling of the unbounded LSH paths is measured
directly:

- minhash_full:  minhash_lsh_pairs, production xxhash64 mode, over all
  documents PLUS one 80%-prefix copy of every document (ids + 1e9,
  clear of every fixture replica id range,
  planted in-plan exactly like the registered bounded query) — the
  true near-dup density is CONSTANT (~1 pair per document), so the
  10x-data ratio measures the operator, not answer growth.  Requires
  the v2 scale fixtures (make_scale_fixtures), whose replicas share
  no shingles; the v1 suffix-token replicas formed 10-doc near-dup
  cliques whose ~1000x pair growth swamped any wall-clock reading.
- semantic_full: embedding_near_dups in SRP-banded mode (8 bands x 16
  bits; key width sized to the corpus, see in-function note) at cosine
  >= 0.98 over all embeddings plus one scaled copy each (x * 1.001,
  cosine exactly 1) — constant true-pair density, and the plant is
  EQUIVARIANT under the v3 fixture's orthogonal replica transforms
  (scaling commutes with rotation/sign-flip), so the true answer is
  exactly 1 pair per nonzero vector at every scale.  The v2-era
  additive plant (first element + 0.1) was not: each replica's
  rotation moved which coordinate the nudge hit, so borderline pairs
  differed per replica and exact-multiple answer counts were
  unattainable by construction.
- cluster_full:  connected_components over the minhash_full pair set
  with driver_cc_threshold=0, FORCING the distributed alternating-star
  path (the 100 TB form) even though the edge set would fit the
  driver shortcut.

Same methodology as tools/scale_run.py: fresh SparkContext per
(workload, sf), one untimed warmup, median of SPARK_GRAFT_BENCH_RUNS
(default 3) timed runs, persistent RDDs released between runs.

Usage: python tools/scale_fullcorpus.py [small_sf_dir] [big_sf_dir]
Prints one JSON object {workload: {small, big, ratio, small_rows,
big_rows}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.session import get_spark  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402
from tools.harness_util import release_persistent_rdds  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _docs(spark, sf_dir):
    """Full documents scan, conditioned to 32 input splits.  The fixture
    is a SINGLE ~5 MB parquet file -> 2 Spark splits, so the heavy
    map-side work (shingle explode, 64 signature hashes per doc) would
    run on 2 of 32 cores — a fixture-layout artifact, not a plan
    property (a 100 TB corpus arrives as thousands of splits and never
    needs this).  The repartition is harness-level input conditioning
    so the sweep measures the OPERATOR's scaling, not the file count;
    its own shuffle cost is inside the timed region, so the numbers
    stay conservative."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(32)
    )


PLANT_OFFSET = 1_000_000_000
# MUST clear the fixture's replica id range: make_scale_fixtures offsets
# replica k by k*1e6, so sf10 (k <= 99) reaches doc_id ~99e6 and the
# old +1e7 plant offset COLLIDED with replica 10+ ids — two different
# texts under one doc_id collapse the pair count and poison the sweep
# (caught in round 8: sf10 minhash_full returned 28k pairs, not ~602k;
# the same id-collision class round 7 fixed in the registered ANN rows).


def _docs_with_copies(spark, sf_dir):
    """Full corpus + one 80%-prefix copy per document at id +
    PLANT_OFFSET — the _docs_with_truncated_copies construction WITHOUT
    the bounded doc_id < 100 pool."""
    from semantic_query_engine_spark.functions.text import words_of

    docs = _docs(spark, sf_dir)
    ws = words_of(F.col("text"))
    keep = F.ceil(F.size(ws) * 0.8).cast("int")
    variants = docs.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.array_join(F.slice(ws, 1, keep), " ").alias("text"),
    )
    return docs.unionByName(variants)


def minhash_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_with_copies(spark, sf_dir), threshold=0.5, n=2)


def semantic_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import embedding_near_dups

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .repartition(32)  # same input conditioning as _docs
    )
    # x * 1.001: cosine with the original is exactly 1 (>= any
    # threshold), SRP signs are identical (guaranteed band collision,
    # recall 1 with no banding luck), and the construction commutes
    # with the v3 fixture's orthogonal replica transforms — so the
    # true answer is EXACTLY one pair per nonzero-norm vector at every
    # scale and the wall-clock ratio measures the operator alone.
    variants = emb.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    # srp_bits sizes the per-band key space and must grow with the
    # corpus (~log2 n): at 4 bits (the bounded demo's setting) 40k
    # vectors pile ~2.5k into each of 16 buckets and the band join
    # explodes toward n^2/16 candidates; at 16 bits the keyspace is
    # 65k and buckets hold only true-ish neighbors.  Recall per pair
    # at cosine 0.995 stays ~0.999 (1 - (1 - 0.968^16)^8).
    # SPARK_GRAFT_SRP_BITS overrides for bigger corpora (sf10's 400k
    # vectors want ~18; recall at cosine 0.995 is still ~0.998).
    bits = int(os.environ.get("SPARK_GRAFT_SRP_BITS", "16"))
    return embedding_near_dups(
        emb.unionByName(variants), threshold=0.98, srp_bands=8, srp_bits=bits
    )


def cluster_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import minhash_lsh_pairs
    from semantic_query_engine_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(_docs_with_copies(spark, sf_dir), threshold=0.5, n=2)
    # SPARK_GRAFT_CC_FUSE=0 re-enables the historical large-star output
    # distinct (4 shuffles/round) for the round-10 transfer experiment;
    # default is the fused 3-shuffle round (operators/graph.py).
    fuse = os.environ.get("SPARK_GRAFT_CC_FUSE", "1") != "0"
    return connected_components(pairs, driver_cc_threshold=0, fuse_large_star=fuse)


def phash_full(spark, sf_dir):
    """multimodal_phash_dedup's operator with the demo cap LIFTED
    (VERDICT r12 #2): fused encode+parse+dHash mapInPandas over EVERY
    document, then the banded-Hamming join.  Same plant as the
    registered demo (every 8th doc emits a brightness-shifted variant)
    but at +1e9 ids — the registered +1e6 offset COLLIDES with the
    scale fixture's replica-k id range (k*1e6).  True plant density is
    constant (~1 pair per 8 docs); beyond plants, birthday collisions
    of the (w ~ id mod 56, h ~ id mod 41, seed = n_chars) triple add a
    small quadratic exact-dup term (the pair count printed makes it
    visible); the banded join's CANDIDATE volume stays ~linear because
    signatures spread over 4x65k band buckets."""
    from semantic_query_engine_spark.operators.multimodal import (
        dhash64,
        encode_bmp,
    )
    from semantic_query_engine_spark.operators.simhash import (
        banded_hamming_pairs,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .repartition(32)  # same input conditioning as _docs
    )

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            ids, sigs = [], []
            for d, s in zip(pdf["doc_id"], pdf["n_chars"]):
                d, s = int(d), int(s)
                w, h = d % 56 + 9, d % 41 + 8
                ids.append(d)
                sigs.append(dhash64(encode_bmp(w, h, s)))
                if d % 8 == 0:
                    ids.append(d + PLANT_OFFSET)
                    sigs.append(dhash64(encode_bmp(w, h, s + 1)))
            yield _pd.DataFrame({"id": ids, "sig": sigs})

    sigs = docs.mapInPandas(run, "id long, sig long")
    return banded_hamming_pairs(sigs, max_hamming=3)


def audio_full(spark, sf_dir):
    """multimodal_audio_dedup's operator with the demo cap LIFTED —
    fused encode+RIFF-walk+fingerprint over every document, banded
    Hamming join.  Plants as in the registered demo (re-encoded copy
    per 8th doc, +1 DC offset per (8k+4)th) at replica-safe +1e9/+2e9
    ids.  Audio seeds are the doc_id itself, so unlike phash_full there
    is no birthday-collision term — pair growth beyond plants comes
    only from genuine same-length DC-shift families."""
    from semantic_query_engine_spark.operators.multimodal import (
        audio_fingerprint64,
        encode_wav,
    )
    from semantic_query_engine_spark.operators.simhash import (
        banded_hamming_pairs,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .repartition(32)
    )

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            ids, sigs = [], []
            for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                d, n = int(d), int(nc) % 1000 + 8
                ids.append(d)
                sigs.append(
                    audio_fingerprint64(encode_wav(n, seed=d, quad_step=9))
                )
                if d % 8 == 0:
                    ids.append(d + PLANT_OFFSET)
                    sigs.append(
                        audio_fingerprint64(
                            encode_wav(
                                n, seed=d, sample_rate=16000, quad_step=9
                            )
                        )
                    )
                if d % 8 == 4:
                    ids.append(d + 2 * PLANT_OFFSET)
                    sigs.append(
                        audio_fingerprint64(
                            encode_wav(n, seed=d + 1, quad_step=9)
                        )
                    )
            yield _pd.DataFrame({"id": ids, "sig": sigs})

    sigs = docs.mapInPandas(run, "id long, sig long")
    return banded_hamming_pairs(sigs, max_hamming=3)


WORKLOADS = {
    "minhash_full": minhash_full,
    "semantic_full": semantic_full,
    "cluster_full": cluster_full,
    "phash_full": phash_full,
    "audio_full": audio_full,
}


def _plant_pairs(spark, fn, sf_dir):
    """Exact planted-twin pair count (UNTIMED — runs outside the timed
    region, after the median): a planted near-dup lives at base_id +
    PLANT_OFFSET (or +2*PLANT_OFFSET for audio's DC-shift family), so
    the pairs that couple a base id with its own offset twin are the
    CONSTANT-density part of the answer and must scale exactly with the
    corpus (1 per 8 docs) at every SF — the proportionality check
    VERDICT r13 #5 asked the sf10 rows to carry.  Everything else in
    the pair list (birthday collisions of the synthetic parameter
    space, same-length DC families) is the corpus-dependent term the
    SCALE.md prose attributes separately."""
    pairs = fn(spark, sf_dir)
    return (
        pairs.filter(
            (F.col("id_b") - F.col("id_a")).isin(
                PLANT_OFFSET, 2 * PLANT_OFFSET
            )
            & (F.col("id_a") < PLANT_OFFSET)
        ).count()
    )


def _shuffle_bytes(spark):
    """Total shuffle-write bytes so far, or None when the UI/REST API
    is off (the sweep still reports wall + rows)."""
    try:
        from tools.longdoc_stress import shuffle_write_bytes

        return shuffle_write_bytes(spark)
    except Exception:
        return None


def _median_time(spark, fn, sf_dir):
    rows = fn(spark, sf_dir).count()  # untimed warmup (codegen javac)
    release_persistent_rdds(spark)
    samples = []
    shuffle_deltas = []
    for _ in range(RUNS):
        sh0 = _shuffle_bytes(spark)
        t0 = time.time()
        fn(spark, sf_dir).count()
        samples.append(time.time() - t0)
        sh1 = _shuffle_bytes(spark)
        if sh0 is not None and sh1 is not None:
            shuffle_deltas.append(sh1 - sh0)
        release_persistent_rdds(spark)
    # median ACROSS runs, matching the wall-time statistic: keeping only
    # the last run's delta paired a median wall with a possibly-outlier
    # shuffle figure when AQE replans or cache effects vary per run
    # (ADVICE r13)
    shuffle_mb = (
        round(sorted(shuffle_deltas)[len(shuffle_deltas) // 2] / 1e6, 2)
        if shuffle_deltas
        else None
    )
    return round(sorted(samples)[len(samples) // 2], 3), rows, shuffle_mb


def main() -> None:
    # shuffle metrics come from the UI REST API; on by default here
    # (get_spark leaves it off for tests/bench)
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale_data/sf1"
    )
    # SPARK_GRAFT_SCALE_QUERIES=minhash_full,cluster_full limits the
    # sweep (same convention as tools/scale_run.py) — used for the
    # sf10 extension where semantic_full's SRP key width would need
    # re-sizing first (srp_bits ~ log2 n, see in-function note)
    sel = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    chosen = (
        {k: WORKLOADS[k] for k in sel.split(",") if k in WORKLOADS}
        if sel
        else WORKLOADS
    )
    out = {}
    for name, fn in chosen.items():
        spark = get_spark("scale-fullcorpus")
        s, sr, ssh = _median_time(spark, fn, small)
        b, br, bsh = _median_time(spark, fn, big)
        out[name] = {
            "small": s,
            "big": b,
            "ratio": round(b / s, 2) if s else None,
            "small_rows": sr,
            "big_rows": br,
            "small_shuffle_mb": ssh,
            "big_shuffle_mb": bsh,
        }
        # plant proportionality (untimed) for the workloads with planted
        # offset twins in (id_a, id_b) form — see _plant_pairs
        if name in ("phash_full", "audio_full", "minhash_full"):
            out[name]["small_plant_pairs"] = _plant_pairs(spark, fn, small)
            out[name]["big_plant_pairs"] = _plant_pairs(spark, fn, big)
        spark.stop()
        print(f"# {name}: {s}s ({sr} rows, {ssh} MB) -> "
              f"{b}s ({br} rows, {bsh} MB) "
              f"({out[name]['ratio']}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
