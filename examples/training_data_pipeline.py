"""End-to-end demo: a pretraining data-prep pipeline on this engine.

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]

Composes the curation surface the way a 100 TB corpus run would:
quality scoring -> exact dedup -> LSH bucket monitor -> MinHash
near-dedup + connected components -> repeated-span stats -> PII
redaction -> deterministic train/val/test split -> per-source token
budgeting -> tokenizer vocab-coverage gate -> T5 span-corruption mask
plan -> per-split sequence packing -> partitioned parquet sink.
Everything is one declarative DAG per stage; nothing collects to the
driver except the final previews.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prep_out"
    spark = get_spark("training-data-pipeline")

    def show(name: str, n: int = 5):
        df = REGISTRY[name].fn(spark, sf_dir)
        print(f"\n== {name} ({df.count()} rows) ==")
        df.show(n, truncate=80)
        return df

    # 1. corpus health before anything else
    show("profile_documents")
    show("expect_documents")

    # 2. duplication landscape: exact, near (minhash), substring-level.
    #    lsh_bucket_stats runs FIRST — the pre-join occupancy monitor
    #    that catches a band-bucket blowup (boilerplate floods one
    #    bucket -> quadratic candidate pairs) BEFORE paying for the
    #    join it de-risks; it shares the band-table CTE with the dedup.
    show("lsh_bucket_stats", 5)
    show("dedup_exact", 3)
    show("dedup_minhash_lsh", 5)
    show("dedup_eval_lsh", 1)  # sketch recall/precision vs exact truth
    show("substring_dedup", 5)

    # 2a0. the crawl front door runs before ANY text curation:
    #      markup removal (script/style blocks, tags, entities)
    show("html_extract", 3)

    # 2a. boilerplate stripping (the C4 line-frequency rule) runs before
    #     near-dup detection so shared banners can't glue unrelated docs;
    #     paragraph_dedup then removes the 2nd..Nth copy of ANY repeated
    #     paragraph corpus-wide (the Dolma keep-first rule)
    show("boilerplate_line_removal", 3)
    show("paragraph_dedup", 3)

    # 2c. the recurring shape: tomorrow's batch checks against TODAY's
    #     corpus only — cost keyed by the increment, never corpus^2;
    #     the indexed twin probes the PERSISTED bucketed shingle
    #     layout a production pipeline re-uses across daily runs
    show("dedup_incremental", 3)
    show("dedup_incremental_indexed", 3)

    # 2d. cluster resolution policy: keep the longest member per
    #     near-dup component (RefinedWeb), not just min-id
    show("neardup_keep_longest", 3)

    # 2b. contamination sweep against the held-out eval split: verbatim
    #     (8-gram overlap) and paraphrase-level (embedding cosine,
    #     broadcast eval set) — both run before any training split is cut
    show("decontaminate", 3)
    show("decontaminate_semantic", 3)

    # 2e. multimodal columns ride the same corpus: per-modality dedup
    #     (image dHash, audio fingerprint — one banded-Hamming path
    #     with text SimHash), the cross-modality pair-volume monitor
    #     BEFORE acting on any pair list, and the CLIP-shaped
    #     image-text alignment filter
    show("multimodal_dedup_stats", 3)
    show("multimodal_phash_dedup", 3)
    show("multimodal_audio_dedup", 3)
    show("imagetext_alignment", 3)
    show("video_scene_detect", 3)  # scene cuts before frame sampling
    show("video_keyframe_sample", 3)  # one keyframe per scene
    show("multimodal_quality_filter", 3)  # decode-metadata gates
    show("stream_phash_dedup", 3)  # streaming arrivals vs phash index

    # 3. the composed prep plan (quality -> dedup -> neardup CC ->
    #    split -> pack) and its packed output
    prep = show("training_data_prep_neardup", 5)

    # 3a2. the per-source datacard + proportional epoch plan the
    #      mixture is specified from (and the drift monitor a
    #      re-embed would be gated on)
    show("source_datacard", 5)
    show("embedding_drift", 5)

    # 3b. mixture construction AFTER sampling: cap each source's
    #     contribution at a token budget ("200B web, 30B books") via a
    #     per-source running-sum greedy prefix
    show("mixture_token_budget", 5)

    # 3c. tokenizer loop: train three BPE merges on the corpus word
    #     table, then gate on vocab coverage (OOV rate) and fertility
    #     (symbols per word) before committing to the tokenizer
    show("bpe_merges", 3)
    show("bpe_merges_n10", 5)  # parameterized depth, cnt>=2 early stop
    show("bpe_roundtrip", 1)  # detokenize(encode(w)) == w gate
    show("vocab_coverage", 5)
    show("bpe_encode_fertility", 5)

    # 3d. the training objective's sampling step as a DataFrame plan:
    #     deterministic T5 span-corruption masks (which spans are
    #     masked is a pure hash of (doc_id, position), so a grown
    #     corpus never re-masks old documents differently) — and the
    #     FIM/PSM reordering for infilling objectives
    show("span_corruption_masks", 5)
    show("fim_transform", 3)

    # 3e. the order the trainer reads: deterministic per-epoch shards,
    #     plus the per-shard token-balance check a data-parallel run
    #     reads before spending GPU time (stragglers tax every step)
    show("epoch_shuffle", 5)
    show("shard_skew_report", 5)

    # 3f. the release manifest: per-split doc/token counts + the
    #     order-independent content fingerprint the data release ships
    show("dataset_manifest", 3)

    # 4. write the result partitioned by split — the layout a trainer
    #    reads shard-by-shard
    prep.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    sizes = (
        spark.read.parquet(out_dir)
        .groupBy("split")
        .agg(F.count("*").alias("docs"), F.max("pack_id").alias("max_pack"))
    )
    print(f"\n== written to {out_dir} ==")
    sizes.show()


if __name__ == "__main__":
    main()
