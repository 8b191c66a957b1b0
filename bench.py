"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

`value` is the flagship RAG pipeline's end-to-end latency (embed-in-plan
-> cache probe -> top-3 retrieval -> context assembly -> prompt ->
generation), the direct analog of the reference's published "< 3.5 s
end-to-end query latency" (BASELINE.md).  Per-query timings for the
wider operator surface ride along in "queries".

Each query is fully materialized (count) so timings cover
scan -> shuffle -> result, not plan construction.  Each query runs
$SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the MEDIAN:
single-run timings showed ±25% noise on sub-second queries across
rounds 1-2 — bigger than the regressions the bench exists to catch.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

FLAGSHIP = "rag_ask_flagship"


def _foreign_jvms() -> int:
    """Count JVMs on this machine that are NOT descendants of this process.

    BENCH_r09 was produced while another Spark JVM ran concurrently and
    showed a uniform ~1.2-1.5x inflation across 21 rows with zero
    improvements — the fingerprint of a loaded machine, not a
    regression (VERDICT r9).  Stamping the count into the JSON makes a
    poisoned run self-identifying instead of requiring a quiet re-run
    to adjudicate.  Ancestry is walked via /proc/<pid>/stat ppid chains
    so our own local[*] JVM (a child of this process) never counts.
    """
    me = os.getpid()
    count = 0
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return -1  # non-procfs platform: unknown, not zero
    for pid_s in pids:
        try:
            with open(f"/proc/{pid_s}/comm") as f:
                if f.read().strip() != "java":
                    continue
        except OSError:
            continue
        p = int(pid_s)
        ours = False
        for _ in range(64):  # bounded walk; init has ppid 0
            try:
                with open(f"/proc/{p}/stat") as f:
                    # comm may contain spaces/parens: split after last ')'
                    ppid = int(f.read().rsplit(")", 1)[1].split()[1])
            except (OSError, ValueError, IndexError):
                break
            if ppid == me:
                ours = True
                break
            if ppid <= 1:
                break
            p = ppid
        if not ours:
            count += 1
    return count

HEADLINE = [
    FLAGSHIP,            # the reference's core read path (A20)
    "semantic_topk",     # brute-force ANN (A15)
    "semantic_topk_dim1024",  # ANN at the reference's 1024-dim width
    "knn_join",          # batch kNN join
    "cache_probe",       # semantic cache (A12)
    "doc_chunk",         # chunking (A2)
    "context_assembly",  # group-concat (A16)
    "text_stats",        # text analysis extension
    "doc_fingerprint",   # hashing/dedup key
    "winnow_fingerprints",  # MOSS window-min k-gram selection (r10)
    "embedding_project_srp",  # signed random-projection 64->16 dims (r10)
    "dedup_exact",       # exact dedup at 2x corpus
    "dedup_jaccard",     # shingle-join near-dup
    "dedup_cluster",     # connected-components dup grouping
    "dedup_semantic",    # embedding pairs -> CC -> representatives
    "decontaminate",     # eval-set n-gram overlap check
    "decontaminate_semantic",  # eval-set embedding-cosine check (r9)
    "tfidf_cosine_pairs",  # weighted lexical near-dup, inverted index (r9)
    "bm25_topk",         # full-text keyword retrieval
    "hybrid_rrf",        # BM25 + cosine rank fusion
    "q1_pricing_summary",  # agg workhorse
    "join_q5_region",    # 6-table star join
    "window_topk_per_group",
    "events_sessionize",
    # LLM-pipeline breadth (round 2): regressions here must be visible
    "pack_sequences",    # per-shard greedy packing
    "hash_split",        # reproducible train/val/test buckets
    "weighted_sample_es",  # one-pass weighted sample w/o replacement (r10)
    "mixture_token_budget",  # per-source token-budget mixture (r10)
    "span_corruption_masks",  # T5 denoising mask plan (r10)
    "vocab_coverage",    # tokenizer OOV-rate eval vs top-1k vocab (r10)
    "boilerplate_line_removal",  # C4 line-frequency strip + reassembly (r11)
    "bpe_pair_counts",   # BPE merge-candidate kernel over word table (r11)
    "bpe_merges",        # 3 driver-coordinated BPE training steps (r11)
    "bpe_encode_fertility",  # apply merges via un-hinted vocab join (r11)
    "bpe_merges_n10",    # 10-round parameterized trainer, early-stop (r12)
    "dedup_incremental",  # new-batch vs historical asymmetric dedup (r11)
    "dedup_incremental_indexed",  # probe via persisted bucketed index (r12)
    "neardup_keep_longest",  # keep-longest policy over CC clusters (r11)
    "dup_cluster_stats",  # cluster-size histogram monitor (r11)
    "epoch_shuffle",     # deterministic per-epoch shard/order plan (r11)
    "fim_transform",     # fill-in-middle PSM objective plan, map-only (r11)
    "multimodal_decode_meta",  # Arrow mapInPandas binary decode (r11)
    "multimodal_byte_features",  # pandas-UDF payload featurization (r11)
    "multimodal_real_decode",  # genuine BMP/WAV header parsing (r12)
    "embedding_drift",   # two-snapshot per-dim drift monitor (r12)
    "source_datacard",   # per-source mixing report + epoch plan (r12)
    "bpe_roundtrip",     # detokenize(encode(w)) == w corpus gate (r12)
    # renamed r7: rounds <=5 timed the LSH pipeline under
    # "dedup_minhash_lsh"; since r6 that registered row ALSO runs the
    # exact all-pairs join for its recall gate, so the bench times the
    # raw operator via a bench-only callable to keep cross-round ratios
    # meaningful (ADVICE r6).  r6's dedup_minhash_lsh=2.13s measured
    # LSH + exact join and is not comparable to either series.
    "minhash_lsh_pairs",  # banded minhash near-dup (LSH only)
    "lsh_bucket_stats",  # pre-join bucket-occupancy monitor (r10)
    "ann_ivf_knn_join",  # partition-pruned IVF batch kNN (gate + operator)
    "retrieval_eval_srp",  # recall@3/MRR eval harness, SRP vs exact (r10)
    "ivf_knn_join_op",   # same operator WITHOUT the recall gate's exact
    #                      ground-truth side — comparable to rounds <= 5
    #                      and the row that sees a production regression
    "ivfpq_topk_op",     # per-query IVF-PQ probe over a process-cached
    #                      built index (r9): the registered row's ~3 s is
    #                      build-dominated; at scale the index is built
    #                      once and probed millions of times
    "ivf_topk_partitioned",  # probe over the write_ivf_index partitioned
    #                      layout: times the DPP-pruned scan (r9); a jump
    #                      toward ann_ivf_topk means the DPP trigger broke
    "stream_dedup",      # exactly-once streaming dedup (state store)
    "training_data_prep",  # composed clean->dedup->split->pack pipeline
    "training_data_prep_neardup",  # + capped-jaccard near-dedup + CC stage
    "ann_ivfpq_topk",    # IVF-PQ: cluster-pruned 8-byte-code ADC scan
    "unigram_perplexity",  # corpus-LM quality scoring
    "bigram_perplexity",  # order-sensitive LM quality scoring (r10)
    "dsir_importance",   # hashed-ngram importance weights, DSIR (r10)
    "substring_dedup",   # repeated k-token span detection (Lee et al.)
    "merge_upsert",      # CDC MERGE as broadcast anti-join + union
    "curation_verdict",  # composed per-doc keep/drop audit table
    # round-5 session-2 additions (cheap rows only; the heavy new ones
    # — stream_watermark_append, graph_pagerank — are scale-sweep rows)
    "bitmap_distinct",   # two-level bitmap exact distinct
    "cms_frequency",     # declarative count-min heavy hitters
    "bloom_prune_join",  # broadcast bloom bit-position join prune
    "tfidf_keywords",    # per-doc top-3 TF-IDF keyword extraction
    "url_canonical_dedup",  # crawl URL canonicalize + keep-min dedup
    # round-12 session-2 additions
    "html_extract",      # crawl front door: markup strip, one map stage
    "paragraph_dedup",   # corpus-wide keep-first paragraph rule (r12)
    "multimodal_phash_dedup",  # image dHash + banded-Hamming join (r12)
    "multimodal_audio_dedup",  # PCM frame-energy fingerprint dedup (r12)
    "multimodal_dedup_stats",  # cross-modality pair-volume monitor (r12)
    "imagetext_alignment",     # CLIP-filter-shaped pair scoring (r12)
    "video_scene_detect",      # per-clip dHash scene segmentation (r12)
    "video_keyframe_sample",   # one keyframe per detected scene (r12)
    "stream_phash_dedup",      # streaming exact perceptual dedup (r12)
    "multimodal_quality_filter",  # decode -> rule -> verdict gates (r12)
    "dataset_manifest",        # per-split release checksum row (r12)
    "join_skew_profile",       # pre-join key-distribution monitor (r12)
    "shard_skew_report",       # trainer-shard token-balance monitor (r12)
    "dedup_eval_lsh",    # sketch recall/precision confusion report (r12)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # The console progress bar writes \r-separated frames that interleave
    # with stdout when the caller captures both streams, corrupting the
    # one-JSON-line contract (BENCH_r04's tail carried raw progress
    # frames).  Must be set before the JVM starts.
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        "--conf spark.ui.showConsoleProgress=false pyspark-shell",
    )
    from semantic_query_engine_spark.queries import REGISTRY
    from semantic_query_engine_spark.queries.dedup_q import (
        ivf_knn_join_bench,
        ivf_topk_partitioned_bench,
        ivfpq_topk_bench,
        minhash_lsh_pairs_bench,
    )
    from semantic_query_engine_spark.session import get_spark
    from tools.harness_util import release_persistent_rdds

    # Quiet-machine wait (VERDICT r11 #6): when a foreign JVM is still
    # running (e.g. a gate run winding down) or the pre-JVM loadavg has
    # not decayed, WAIT — bounded — instead of stamping a loaded run.
    # The budget is env-tunable; on timeout we proceed and the loaded
    # flag below still tells the truth.
    cpus = os.cpu_count() or 1
    quiet_budget = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_SEC", "360"))
    waited = 0.0
    while waited < quiet_budget and (
        _foreign_jvms() > 0 or os.getloadavg()[0] > 0.25 * cpus
    ):
        if waited == 0.0:
            sys.stderr.write(
                "bench: machine not quiet (foreign JVM or loadavg); "
                f"waiting up to {quiet_budget:.0f}s\n"
            )
        time.sleep(15)
        waited += 15

    # Machine-load evidence, sampled BEFORE our JVM exists so a quiet
    # machine reads near-zero load and zero JVMs (VERDICT r9 #1).
    load_before = list(os.getloadavg())
    jvms_before = _foreign_jvms()

    # timing-only rows with no registry entry (see HEADLINE comments)
    bench_only = {
        "minhash_lsh_pairs": minhash_lsh_pairs_bench,
        "ivf_knn_join_op": ivf_knn_join_bench,
        "ivf_topk_partitioned": ivf_topk_partitioned_bench,
        "ivfpq_topk_op": ivfpq_topk_bench,
    }

    def q_fn(name):
        return REGISTRY[name].fn if name in REGISTRY else bench_only[name]

    spark = get_spark("bench")
    # ERROR-only logging for the bench run: release_persistent_rdds
    # emits one WARN per unpersisted localCheckpoint RDD ("lineage has
    # been truncated...") and those frames landed in BENCH_r04/r05's
    # recorded tail, making the artifact un-diffable across rounds
    # (VERDICT r5 #4).  The warning is expected here — the harness
    # releases checkpoints only after each result is consumed.
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in HEADLINE if n in REGISTRY or n in bench_only]
    # warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch class loading
    q_fn(names[0])(spark, sf_dir).limit(1).collect()
    from semantic_query_engine_spark.streaming.jobs import drop_live_sinks

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    for name in names:
        # untimed warmup: a query's first execution in a session pays
        # whole-stage-codegen javac compilation for its own plan (and,
        # under AQE, sometimes for a re-planned variant on the second
        # run too) — measured 6.8s -> 2.5s on training_data_prep.  One
        # throwaway run makes the timed samples measure the engine, not
        # the compiler; median-of-3 then guards the residual noise.
        for _ in range(warmup):
            q_fn(name)(spark, sf_dir).count()
            drop_live_sinks(spark)
        samples = []
        for _ in range(runs):
            t0 = time.time()
            q_fn(name)(spark, sf_dir).count()
            samples.append(time.time() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 4)
        # a streaming query's last memory sink would otherwise pin its
        # result in memory for every subsequent query's timing
        drop_live_sinks(spark)
        # ... and checkpointed intermediates (CC/PageRank/prep plans)
        # would otherwise accumulate in the block manager for the whole
        # session, degrading later queries' timings
        release_persistent_rdds(spark)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    load_after = list(os.getloadavg())
    jvms_after = _foreign_jvms()
    # "loaded": another JVM was present, or the 1-min load BEFORE our
    # JVM started was already a nontrivial fraction of the machine.  A
    # True here means the timings are inflated and must not be read as
    # a regression signal (the r9 driver run would have flagged True).
    loaded = (
        jvms_before > 0
        or jvms_after > 0
        or load_before[0] > 0.25 * cpus
    )
    line = json.dumps(
        {
            "metric": "flagship_rag_e2e_latency",
            "value": timings[FLAGSHIP],
            "unit": "sec",
            "queries": timings,
            "total_sec": round(sum(timings.values()), 4),
            "sf": float(sf) if sf else None,
            "load": {
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in load_after],
                "foreign_jvms_before": jvms_before,
                "foreign_jvms_after": jvms_after,
                "cpus": cpus,
                "loaded_machine": loaded,
            },
        }
    )
    # own line + explicit flush: the JSON must be the last clean stdout
    # line even if a library wrote a partial line before it
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()


def _reexec_with_clean_stderr() -> int:
    """Run bench.py as a child with stderr captured to a file.

    The JVM writes unavoidable startup noise to stderr before any
    log4j/setLogLevel control exists ("WARNING: Using incubator
    modules", "Using Spark's default log4j profile", the
    NativeCodeLoader warning) and callers that capture combined
    output record those frames in the BENCH tail (VERDICT r6 #2).
    No in-process config can suppress them, so the parent re-execs
    itself with stderr redirected; the child prints only the JSON
    line to stdout.  On failure the captured stderr is replayed so
    diagnostics are not lost.
    """
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(
        mode="w+", prefix="bench_stderr_", suffix=".log", delete=False
    ) as errf:
        env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__)],
            stderr=errf,
            env=env,
        )
        if rc != 0:
            errf.seek(0)
            sys.stderr.write(errf.read())
            sys.stderr.write(f"\n[bench] stderr retained at {errf.name}\n")
    if rc == 0:
        os.unlink(errf.name)  # don't leak one log per clean run
    return rc


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        main()
    else:
        raise SystemExit(_reexec_with_clean_stderr())
