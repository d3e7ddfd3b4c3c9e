"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (whole-stage codegen, no Python in the
hot path): language id (stopword-hit heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace +
word-regex), and document fingerprinting (normalized md5). Each has a
DuckDB-expressible twin in __spark_entry__.py::oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets — heuristic langid, not a model
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    # regexp_count per word (round-6): same non-overlapping left-to-
    # right match count as the old regexp_replace length-diff — ' w w '
    # still counts 1 because the first match consumes the shared space —
    # but without materializing a replaced copy of the document per
    # marker word (20 string rebuilds per row became 20 counters).
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in words:
        h = F.regexp_count(padded, F.lit(f" {w} "))
        hits = h if hits is None else hits + h
    return hits.cast("int")


def lang_id(text: Column) -> Column:
    """Best-scoring marker language, 'und' when nothing hits.
    Deterministic tie-break: language code ascending.

    Shape note: argmax via ``array_max`` over (hits, priority) structs —
    each language's marker-hit expression appears exactly once. A
    when/otherwise fold references its accumulator twice per step, so
    the expression tree (and codegen) doubles per language; measured
    ~100 ms/row at 4 languages before this rewrite, sub-ms after.
    """
    items = sorted(_LANG_MARKERS.items())
    scores = [
        F.struct(
            _marker_hits(text, ws).alias("hits"),
            # higher priority = earlier code, so equal-hits ties pick the
            # lexicographically first language, matching a first-wins fold
            F.lit(len(items) - 1 - idx).alias("prio"),
            F.lit(code).alias("code"),
        )
        for idx, (code, ws) in enumerate(items)
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """Word-regex token count (BPE-ish pre-tokenizer: word chars or
    single non-space symbol)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda s: s != ""))


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (punct / F.greatest(F.length(text), F.lit(1))).cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    hits = _marker_hits(text, _LANG_MARKERS[lang])
    return (hits / F.greatest(whitespace_token_count(text), F.lit(1))).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: favors moderate length, low
    punctuation density, presence of stopwords (prose-likeness)."""
    n = F.length(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return ((len_score + punct_score + stop_score) / 3).cast("double")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace/case-normalized text —
    catches trivial near-duplicates (reference uses content hashes for
    change detection, json_storage.py:550-552)."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized.cast("binary"))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "*",
        lang_id(t).alias("lang_pred"),
        token_count(t).alias("n_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
