"""Scalar text expressions (JVM-side, whole-stage-codegen friendly).

Everything here returns a Column built from pyspark.sql.functions only —
no Python UDFs — so these stay inside codegen spans in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference silver normalization (airflow/dags/etl.py:158-176):
#   strip chars outside [\w\d\s.,!?;:\-()] -> lowercase
#   -> collapse whitespace -> trim.
# Java regex and DuckDB RE2 both treat \w as ASCII by default
# (SURVEY.md §2.2 P5) so the expression is dialect-portable.
_STRIP_RE = r"[^\w\d\s\.,!?;:\-\(\)]"
_WS_RE = r"\s+"


def normalize_text(col: str | Column) -> Column:
    """The P5 normalization pipeline as one nested JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.lower(F.regexp_replace(c, _STRIP_RE, " ")), _WS_RE, " ")
    )


def word_tokens(col: str | Column) -> Column:
    """Whitespace tokenization (reference duckdb_queries.py:103
    STRING_SPLIT(content, ' ') — keeps empty tokens; -1 limit matches)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ", -1)


# A small multilingual stopword inventory for the language-ID heuristic
# (public-knowledge closed-class words; the n-gram/stopword approach is
# the standard cheap langid baseline).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "por"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "bu4", "ren2"],
}

ENGLISH_STOPWORDS = STOPWORDS["en"] + [
    "that", "this", "with", "as", "are", "was", "at", "by", "an", "be",
]
