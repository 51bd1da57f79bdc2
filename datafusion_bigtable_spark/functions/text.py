"""Text-analysis functions for large-scale training-data pipelines.

All of these are pure Catalyst column expressions (JVM-side, codegen'd,
zero Python in the hot path) — at 100 TB they run inside the same
whole-stage-codegen pass as the scan that feeds them.  Each has an exact
ANSI-SQL twin used by the DuckDB oracles in queries.py.

Components: language ID (stopword-hit heuristic), quality scoring
(length / punctuation / stopword / word-shape ratios), token counting
(whitespace + BPE-ish regex), and document fingerprinting (normalized
md5, the portable stand-in for a rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Language → characteristic stopwords.  Tiny on purpose: the heuristic is
# the operator; a production list would be larger but identical in shape.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "que", "es", "una", "para"),
}
# Deterministic tie-break order (higher priority first on equal scores).
LANG_ORDER = ("en", "de", "fr", "es")

WORD_RE = "[^a-z0-9]+"
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def words(col: Column) -> Column:
    """Lowercased word array with empties removed."""
    return F.filter(F.split(F.lower(col), WORD_RE), lambda x: x != F.lit(""))


def stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def lang_hits(col: Column, lang: str) -> Column:
    """Number of stopword occurrences for one language."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(stopword_pattern(lang)), 1))


def langid(col: Column) -> Column:
    """argmax over language scores; ties resolve by LANG_ORDER; all-zero →
    'und' (undetermined)."""
    scores = {lang: lang_hits(col, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed: earlier languages win ties because they overwrite later ones
    for lang in reversed(LANG_ORDER):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


def n_words(col: Column) -> Column:
    return F.size(words(col))


def n_chars(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"([,.;:!?'\"()\[\]{}-])"), 1))


def avg_word_len(col: Column) -> Column:
    w = words(col)
    total = F.aggregate(F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x)
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    nw = n_words(col)
    return F.when(nw > 0, lang_hits(col, lang).cast("double") / nw.cast("double"))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation soup,
    some stopwords (prose-like), sane word lengths."""
    len_ok = F.least(n_chars(col).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars(col), F.lit(1)).cast("double")
    punct_ok = F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))
    stop_ok = F.least(F.coalesce(stopword_ratio(col), F.lit(0.0)) * 5, F.lit(1.0))
    wl = F.coalesce(avg_word_len(col), F.lit(0.0))
    shape_ok = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_ok + stop_ok + shape_ok) / 4, 4)


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.filter(F.split(col, r"\s+"), lambda x: x != F.lit("")))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pretokens: letter runs, digit runs, single
    punctuation — the standard pre-tokenizer shape, as a regex."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0))


def normalized_text(col: Column) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "), " +", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


# -- repetition signals (Gopher-style quality rules) ------------------------
# Excessively repetitive documents (boilerplate, keyword stuffing, broken
# scrapes) are the canonical pre-training junk class; the standard filters
# threshold on repetition RATIOS.  All three signals below are pure array
# expressions over the document's own word list — they run inside the scan's
# codegen stage with ZERO shuffle, the only shape that matters when scoring
# 100 TB.  The per-distinct-word count is O(n_distinct × n_words) per doc —
# fine for natural documents (n ≲ 10⁴); pathological single-doc gigabytes
# would use the explode+groupBy variant instead.


def distinct_word_ratio(col: Column) -> Column:
    """|distinct words| / |words|; 1.0 for empty docs (nothing repeats)."""
    w = words(col)
    return F.when(
        F.size(w) > 0, F.size(F.array_distinct(w)) / F.size(w)
    ).otherwise(F.lit(1.0))


def top_word_share(col: Column) -> Column:
    """Share of the document occupied by its most frequent word; 0.0 for
    empty docs."""
    w = words(col)
    counts = F.transform(
        F.array_distinct(w), lambda d: F.size(F.filter(w, lambda x: x == d))
    )
    return F.when(F.size(w) > 0, F.array_max(counts) / F.size(w)).otherwise(F.lit(0.0))


def duplicate_bigram_ratio(col: Column) -> Column:
    """Fraction of word bigrams that are duplicates of an earlier bigram —
    the n-gram-level repetition signal (catches looping phrases that
    word-level ratios miss); 0.0 for docs with <2 words."""
    w = words(col)
    grams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(
        F.size(grams) > 0,
        (F.size(grams) - F.size(F.array_distinct(grams))) / F.size(grams),
    ).otherwise(F.lit(0.0))
