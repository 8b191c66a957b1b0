"""Smoke the two documented entry points in examples/ at sf0.001 so the
README quickstart can't rot (VERDICT r8 #7).  Each runs exactly as
documented — `python examples/<name>.py [args]` in a fresh process —
so import paths, CLI arg handling, and the composed pipelines are all
covered, not just the library functions they call."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(args, timeout=600):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{args} failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    return proc.stdout


def test_training_data_pipeline_example(tmp_path):
    out = _run(
        ["examples/training_data_pipeline.py", SF, str(tmp_path / "prep_out")]
    )
    assert "profile_documents" in out
    # the r10 pretraining stages must compose in the pipeline, not just
    # sit in the registry (VERDICT r10 #6)
    for stage in (
        "lsh_bucket_stats",
        "mixture_token_budget",
        "vocab_coverage",
        "span_corruption_masks",
        "boilerplate_line_removal",
        "dedup_incremental",
        "neardup_keep_longest",
        "bpe_merges",
        "bpe_encode_fertility",
        "fim_transform",
        "epoch_shuffle",
        # r12 stages (VERDICT r11: new operators must compose, not just
        # sit in the registry)
        "dedup_incremental_indexed",
        "bpe_merges_n10",
        "bpe_roundtrip",
        "source_datacard",
        "embedding_drift",
        # r12 session-2 stages: crawl front door, paragraph keep-first,
        # sketch eval, and the multimodal curation leg
        "html_extract",
        "paragraph_dedup",
        "dedup_eval_lsh",
        "multimodal_dedup_stats",
        "multimodal_phash_dedup",
        "multimodal_audio_dedup",
        "imagetext_alignment",
        "video_scene_detect",
        "video_keyframe_sample",
        "stream_phash_dedup",
        "multimodal_quality_filter",
        "dataset_manifest",
        "shard_skew_report",
    ):
        assert f"== {stage} (" in out, f"stage {stage} missing from pipeline"
    # the sink stage must actually have written the split layout
    assert any((tmp_path / "prep_out").rglob("*.parquet")), out[-2000:]


def test_reference_workflow_example(tmp_path):
    # a corpus dir of two tiny files exercises the corpus-scan path;
    # names must match the reference's PMC*.txt filter (A3) to be kept
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "PMC_a.txt").write_text(
        "Spark structured streaming handles late data with watermarks. " * 20
    )
    (corpus / "PMC_b.txt").write_text(
        "Vector search retrieves the nearest neighbors by cosine. " * 20
    )
    out = _run(["examples/reference_workflow.py", str(corpus)])
    assert "index:" in out


def test_build_from_empty_corpus_raises_clearly(spark, tmp_path):
    """A corpus dir with no PMC*.txt files must fail with an actionable
    error, not MLlib's 'Haven't seen any document yet' (found by the
    r9 example smoke)."""
    import pytest

    from semantic_query_engine_spark.api import SemanticQueryEngine

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "notes.txt").write_text("filtered out by the name filter")
    eng = SemanticQueryEngine(spark, chunk_size=64, dim=32)
    with pytest.raises(ValueError, match="PMC"):
        eng.build_from_corpus_dir(str(corpus))
