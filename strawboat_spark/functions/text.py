"""Text-analysis expressions for training-data pipelines.

Everything here is built from pyspark.sql.functions primitives —
JVM-evaluated, codegen-friendly, zero Python-worker round-trips — so
each scales linearly over 100 TB of documents with no shuffle.

Covers SURVEY.md §2C ⊕ text analysis: language ID (marker-word
heuristic), quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (the DuckDB oracles
# replicate the same scoring), which is the point — langid here is a
# declared, testable operator, not a black-box model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens(col) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(F.trim(F.col(col) if isinstance(col, str) else col)), r"\s+")


def token_count(col) -> Column:
    """Number of non-whitespace runs (BPE-agnostic token proxy)."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(r"\S+"))


def shingles_from_tokens(toks_col, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-PROJECTED token array.

    Perf contract: pass a materialized column reference (project the
    token array in a prior select), NOT an inline split(...) expression
    — the (x, i) lambda indexes back into the array with F.get, and an
    inline expression would be re-evaluated per element (observed 8x
    slowdown from the regex split re-running per shingle).

    Guarded for short docs: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0], so texts with fewer than n tokens must short-circuit to [].
    """
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda x, i: F.concat_ws(" ", F.array(x, *[F.get(toks, i + j) for j in range(1, n)])),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def word_shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles of a raw text column (convenience form —
    for hot paths pre-project tokens() and use shingles_from_tokens)."""
    return shingles_from_tokens(tokens(col), n)


def _marker_score(col, words: list[str]) -> Column:
    # \b word boundaries; counts occurrences of any marker word.
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pattern))


def lang_scores(col) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _marker_score(c, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col, langs: list[str] | None = None) -> Column:
    """argmax over marker-word counts as a first-match-wins CASE chain
    (earlier languages win ties); all-zero scores -> 'unknown'.
    The chain shape is deliberately plain so a SQL oracle can replicate
    it verbatim."""
    scores = lang_scores(col)
    langs = langs or list(LANG_MARKERS)
    expr: Column | None = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for later in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: length band + punctuation
    density + stopword presence (the classic Gopher-style cheap filters)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_words = token_count(c)
    n_punct = F.regexp_count(c, F.lit(r"[.,;:!?]"))
    n_stop = _marker_score(c, LANG_MARKERS["en"])
    avg_word = n_chars / F.greatest(n_words, F.lit(1))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    word_ok = F.when((avg_word >= 2) & (avg_word <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(n_punct / F.greatest(n_words, F.lit(1)) <= 0.3, F.lit(0.2)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(n_stop > 0, F.lit(0.1)).otherwise(F.lit(0.0))
    return F.round(len_ok + word_ok + punct_ok + stop_ok, 1)


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (rolling-hash stand-in that the SQL oracle can replicate exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def repetition_ratio(toks_col, n: int = 3) -> Column:
    """Duplicated word-n-gram fraction of a document: 1 − distinct/total
    n-grams, 0 for docs shorter than n tokens. The classic cheap
    repetition filter for LLM corpus quality (a high ratio flags boiler-
    plate, keyword stuffing, and decode loops). Pass a pre-projected
    token array (see shingles_from_tokens perf contract)."""
    grams = shingles_from_tokens(toks_col, n)
    return F.when(
        F.size(grams) > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))


def token_chunks(toks_col, chunk_size: int = 64, overlap: int = 16) -> Column:
    """Overlapping token windows from an ALREADY-PROJECTED token array
    (the RAG chunking primitive): chunk k starts at 1 + k*(chunk_size -
    overlap) (1-based), length chunk_size, last chunk truncated. Pure
    JVM higher-order functions — chunking a 100 TB corpus is a map-only
    stage, no Python, no shuffle. Returns array<struct<chunk_idx int,
    chunk array<string>>>; explode downstream."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    c = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    n_chunks = F.floor((F.size(c) - 1) / step) + 1
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda k: F.struct(
            k.cast("int").alias("chunk_idx"),
            F.slice(c, k * step + 1, chunk_size).alias("chunk"),
        ),
    )
    # empty input -> empty output, guarded BEFORE sequence():
    # sequence(0, -1) DESCENDS in Spark and would fabricate chunks
    return F.when(F.size(c) > 0, chunks).otherwise(
        F.array().cast(f"array<struct<chunk_idx:int,chunk:array<string>>>")
    )
