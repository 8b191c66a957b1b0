"""semantic_query_engine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of NeuralRevenant/semantic-query-engine.

The reference (see /root/reference, SURVEY.md) is a RAG semantic-search
microservice: ingest text -> chunk -> embed -> index; query -> semantic
cache probe -> ANN top-k -> context assembly -> LLM generation.  This
package re-expresses every one of those data operations as idiomatic
Spark DataFrame / SQL / Structured Streaming plans (SURVEY.md §2 Part A),
exposes the full relational operator surface (§2 Part B), and adds the
LLM-training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the north star mandates — all designed for
100 TB scale: declarative plans that Catalyst can push down and
broadcast, no driver-side loops, Arrow-batched Pandas UDFs only where
built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
