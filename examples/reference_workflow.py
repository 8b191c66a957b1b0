"""End-to-end demo: the reference user's workflow on this engine.

Run:  python examples/reference_workflow.py [corpus_dir]

Builds the chunk index from a text corpus (defaults to the reference's
PMC corpus when present, else the documents fixture), then serves the
reference's read paths: ask (with conversation memory + semantic LFU
cache), streamed ask, and raw top-k search.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.api import SemanticQueryEngine  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("reference-workflow")
    engine = SemanticQueryEngine(spark, chunk_size=512, dim=256)

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/PMC"
    if os.path.isdir(corpus):
        print(f"building index from corpus dir {corpus} ...")
        engine.build_from_corpus_dir(corpus)
    else:
        print("corpus dir missing; using documents fixture")
        from semantic_query_engine_spark.sources.fixtures import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        engine.build_from_documents(docs)
    print(f"index: {engine.index.count()} chunks")

    q = "What are the effects of the treatment on patients?"
    print("\n/ask ->", engine.ask(q, chat_id="demo")[:120])
    print("/ask (cache hit) ->", engine.ask(q)[:60])
    print("\n/ws/ask stream:")
    for chunk in engine.ask_stream("Summarize the key findings."):
        print("  token-chunk:", chunk[:60])
        break
    print("\ntop-3 search:")
    for r in engine.search(q, k=3).collect():
        print(f"  {r.chunk_key}  score={r.score:.4f}")
    print("\ncache:", engine.cache_stats())


if __name__ == "__main__":
    main()
