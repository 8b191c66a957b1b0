"""Source-format ingestion parity: semi-structured corpus formats a
pretraining pipeline actually receives (JSONL dumps with malformed
lines), read with Spark's native reader and its error-handling
contract, and oracle-checked by parsing the SAME bytes in DuckDB.

Both engines read one shared deterministic file generated into
`.scratch/shared-jsonl-v1/` from the sf0.001 fixture (pure function of
the committed testdata — same bytes every run, atomically written, so
concurrent runs can never tear it and a re-creation is always
bit-identical).  The path is CONSTANT because the registered oracle is
a static SQL string: the driver may execute it in any order relative
to the Spark side, so the query function AND `__spark_entry__
.oracle_sql()` both ensure the file exists first.

The thing under test is READER semantics: PERMISSIVE corrupt-record
capture, missing-field nulls, schema projection.  At 100 TB these
readers are scan-parallel exactly like parquet (each task takes a byte
range; JSONL splits on line boundaries), so the plan is one map-only
stage."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import SCRATCH_BASE
from .registry import register

# Constant, process-independent location (NOT the per-pid scratch: the
# oracle SQL string must name one path every process agrees on).
_JSONL_PATH = os.path.join(SCRATCH_BASE, "shared-jsonl-v1", "corpus.jsonl")
# The JSONL content derives from the SMALLEST committed fixture so the
# file is a pure function of driver testdata, independent of which
# sf_dir the query is invoked with (the registered oracle is static).
# Overridable (ADVICE r11) so a different testdata layout doesn't break
# the registered query; the default keeps the static-oracle contract.
_JSONL_SRC = os.environ.get(
    "SPARK_GRAFT_JSONL_SRC", "/root/testdata/sf0.001/documents.parquet"
)

# corrupt payloads planted between records: unclosed object, bare text
_CORRUPT = ('{"doc_id": 7777, "lang": "en"', "not json at all {{{")


def ensure_jsonl() -> str:
    """Create the shared JSONL corpus slice if missing: the first 40
    documents (doc_id order) as compact JSON lines; after every 10th
    record one corrupt line; record 5 omits `lang` (missing-field null,
    NOT corrupt); record 15 carries an extra field (dropped by the
    declared schema on both sides).  Atomic write; deterministic
    bytes."""
    if os.path.exists(_JSONL_PATH):
        return _JSONL_PATH
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{_JSONL_SRC}') WHERE doc_id < 40 ORDER BY doc_id"
    ).fetchall()
    lines = []
    for i, (doc_id, lang, n_chars) in enumerate(rows):
        rec = {"doc_id": int(doc_id), "lang": lang, "n_chars": int(n_chars)}
        if i == 5:
            del rec["lang"]
        if i == 15:
            rec["extra"] = "ignored"
        lines.append(json.dumps(rec, sort_keys=True))
        if i % 10 == 9:
            lines.append(_CORRUPT[(i // 10) % len(_CORRUPT)])
    os.makedirs(os.path.dirname(_JSONL_PATH), exist_ok=True)
    tmp = f"{_JSONL_PATH}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, _JSONL_PATH)
    return _JSONL_PATH


@register(
    "jsonl_ingest",
    oracle=f"""
    WITH raw AS (
      SELECT line
      FROM read_csv('{_JSONL_PATH}', columns={{'line': 'VARCHAR'}},
                    header=false, delim=chr(1), quote='')),
    parsed AS (
      SELECT CASE WHEN json_valid(line)
                  THEN CAST(line->>'doc_id' AS BIGINT) END AS doc_id,
             CASE WHEN json_valid(line)
                  THEN line->>'lang' END AS lang,
             CASE WHEN json_valid(line)
                  THEN CAST(line->>'n_chars' AS BIGINT) END AS n_chars,
             NOT json_valid(line) AS is_corrupt
      FROM raw)
    SELECT doc_id, lang, n_chars, is_corrupt FROM parsed
    """,
)
def jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus ingestion with the PERMISSIVE error contract — the
    format crawl dumps and API exports actually arrive in: well-formed
    records parse to typed columns, a record missing a field yields a
    NULL (not a corrupt row), unknown fields are dropped by the
    declared schema, and malformed lines survive as is_corrupt=true
    rows (columnNameOfCorruptRecord) instead of killing the job — the
    quarantine-don't-crash semantics a 100 TB ingest needs, with
    corrupt rows routable to a quarantine sink.  The oracle parses the
    SAME bytes line-by-line in DuckDB (json_valid + JSON extraction),
    so the happy path and every planted failure mode are
    value-hash-checked.

    Scale shape: Spark's json reader splits files on line boundaries
    across tasks like any text source — one map-only stage, no
    shuffle; the explicit schema (never inferSchema, which scans
    twice) keeps it single-pass."""
    path = ensure_jsonl()
    df = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return df.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
    )
