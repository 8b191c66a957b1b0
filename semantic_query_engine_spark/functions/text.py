"""Text expression library — cleaning, tokenization, fingerprinting,
language-ID heuristics, quality scoring.  Pure built-in functions
(JVM-side, codegen'd); every scalar here has an exact DuckDB-SQL
equivalent so the oracle can check it.

Reference semantics replicated:
- basic_cleaning: newline->space, trim (/root/reference/app/main.py:379-380, SURVEY A1)
- whitespace tokenization feeding the 512-word chunker
  (/root/reference/app/main.py:383-393, SURVEY A2)
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

# Small English stopword list (public, standard) for the language-ID /
# quality heuristics.  Kept short and hard-coded so the DuckDB oracle can
# embed the identical list.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "by", "at", "be", "this", "that",
)


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def clean_text(c: ColumnOrName) -> Column:
    """newline -> space, trim (SURVEY A1)."""
    return F.trim(F.regexp_replace(_col(c), "\n", " "))


def words_of(c: ColumnOrName) -> Column:
    """Whitespace tokenization of cleaned text (the reference's
    text.split(), /root/reference/app/main.py:388).  Python's
    ''.split() returns [] — Spark's split('') returns [''] — so empty
    tokens are filtered to keep reference parity on empty/whitespace
    documents (zero tokens, zero chunks)."""
    return F.filter(F.split(clean_text(c), r"\s+"), lambda w: w != F.lit(""))


def token_count(c: ColumnOrName) -> Column:
    return F.size(words_of(c))


def stopword_count(c: ColumnOrName) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(words_of(c), lambda w: F.array_contains(stops, F.lower(w))))


def stopword_ratio(c: ColumnOrName) -> Column:
    n = token_count(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(c).cast("double") / n.cast("double")
    )


def punct_ratio(c: ColumnOrName) -> Column:
    txt = _col(c)
    n = F.length(txt)
    punct = F.length(F.regexp_replace(txt, r"[^.,;:!?'\"()-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def avg_word_len(c: ColumnOrName) -> Column:
    ws = words_of(c)
    total = F.aggregate(ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double"))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(total / F.size(ws).cast("double"))


def quality_score(c: ColumnOrName) -> Column:
    """Composite [0,1] quality heuristic for training-data filtering:
    rewards stopword presence (naturalness) and reasonable word length,
    penalizes punctuation soup.  Deterministic, SQL-expressible."""
    sw = stopword_ratio(c)
    pr = punct_ratio(c)
    awl = avg_word_len(c)
    len_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.least(F.lit(1.0), sw * 2.0) * 0.5 + len_ok * 0.3 + (1.0 - F.least(F.lit(1.0), pr * 5.0)) * 0.2
    return F.round(score, 6)


def lang_id(c: ColumnOrName, threshold: float = 0.08) -> Column:
    """N-gram-free language-ID heuristic: stopword hit ratio >= threshold
    -> 'en', else 'unk'.  (A real model would be a Pandas UDF; this keeps
    the hot path JVM-side and oracle-checkable.)"""
    return F.when(stopword_ratio(c) >= F.lit(threshold), F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(c: ColumnOrName) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text.  Used for exact dedup at scale — hash first, group on the
    128-bit digest instead of the full document body."""
    normalized = F.lower(F.array_join(words_of(c), " "))
    return F.md5(normalized.cast("binary"))
