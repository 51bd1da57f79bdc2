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
PUNCT_RE = r"([,.;:!?'\"()\[\]{}-])"
SENT_PUNCT_RE = r"([,.;:!?])"


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
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 1))


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


def curation_reason(col: Column) -> Column:
    """The curation gate's keep/drop verdict as ONE first-failing-reason
    expression ('keep' when every rule passes) — pure Catalyst, fuses
    into the scan.  Shared by the batch query (text_curation_filter),
    the pipeline gate, and the streaming twin, so the decision cannot
    drift between them.  Rules: length window [120, 10000], ≥20 BPE-ish
    pretokens, punctuation ratio < 0.1, known language."""
    chars = F.length(col)
    tokens = bpe_ish_token_count(col)
    punct_ratio = F.size(F.regexp_extract_all(col, F.lit(SENT_PUNCT_RE), 1)).cast(
        "double"
    ) / F.greatest(chars, F.lit(1))
    return (
        F.when(chars < 120, "too_short")
        .when(chars > 10000, "too_long")
        .when(tokens < 20, "too_few_tokens")
        .when(punct_ratio >= 0.1, "punct_soup")
        .when(langid(col) == "und", "lang_unknown")
        .otherwise("keep")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


# -- repetition signals (Gopher-style quality rules) ------------------------
# Excessively repetitive documents (boilerplate, keyword stuffing, broken
# scrapes) are the canonical pre-training junk class; the standard filters
# threshold on repetition RATIOS.  All three signals below are pure array
# expressions over the document's own word list — they run inside the scan's
# codegen stage with ZERO shuffle, the only shape that matters when scoring
# 100 TB.  Each is an O(n log n) sort + ONE O(n) fold: the naive
# per-distinct-word scan (transform over array_distinct × filter) is
# O(n_distinct × n_words) and measured 3× slower at sf0.1.


def _run_stats(arr: Column) -> Column:
    """Fold over the SORTED array: struct(distinct, best) where ``distinct``
    counts value transitions (= distinct elements) and ``best`` is the
    longest equal-run (= max multiplicity).  Elements are non-empty strings
    (words/grams), so '' is a safe initial sentinel."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("distinct"),
    )

    def merge(acc, x):
        is_new = x != acc["prev"]
        run = F.when(is_new, F.lit(1)).otherwise(acc["run"] + 1)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["distinct"] + F.when(is_new, 1).otherwise(0)).alias("distinct"),
        )

    return F.aggregate(
        F.array_sort(arr),
        acc0,
        merge,
        lambda acc: F.struct(acc["distinct"].alias("distinct"), acc["best"].alias("best")),
    )


def _bigrams(w: Column) -> Column:
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    return F.zip_with(
        F.slice(w, 1, n1), F.slice(w, 2, n1), lambda a, b: F.concat_ws(" ", a, b)
    )


def distinct_word_ratio(col: Column) -> Column:
    """|distinct words| / |words|; 1.0 for empty docs (nothing repeats)."""
    w = words(col)
    return F.when(
        F.size(w) > 0, _run_stats(w)["distinct"] / F.size(w)
    ).otherwise(F.lit(1.0))


def top_word_share(col: Column) -> Column:
    """Share of the document occupied by its most frequent word; 0.0 for
    empty docs."""
    w = words(col)
    return F.when(F.size(w) > 0, _run_stats(w)["best"] / F.size(w)).otherwise(F.lit(0.0))


def duplicate_bigram_ratio(col: Column) -> Column:
    """Fraction of word bigrams that are duplicates of an earlier bigram —
    the n-gram-level repetition signal (catches looping phrases that
    word-level ratios miss); 0.0 for docs with <2 words."""
    grams = _bigrams(words(col))
    return F.when(
        F.size(grams) > 0,
        (F.size(grams) - _run_stats(grams)["distinct"]) / F.size(grams),
    ).otherwise(F.lit(0.0))


# -- PII redaction ----------------------------------------------------------
# Pattern subset chosen for ENGINE PORTABILITY (Java regex and RE2 agree on
# it: no backrefs, no lookaround) so the DuckDB oracle can verify redacted
# content byte-for-byte.  Order matters and is part of the contract: emails
# first (their local part can contain digits), then SSN-shaped ids (which a
# phone pattern would otherwise half-consume), then phone-like runs.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PII_PHONE_RE = r"\+?[0-9][0-9\- ]{7,}[0-9]"


def redact_pii(col: Column) -> Column:
    """Replace emails/ids/phones with typed placeholders — a chain of
    JVM-side regexp_replace, fused into the scan stage (zero shuffle,
    no Python in the hot path)."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN_RE, "<ID>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(col: Column) -> dict:
    """Per-category match counts (audit columns for a redaction run)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0)),
        "n_ids": F.size(F.regexp_extract_all(col, F.lit(PII_SSN_RE), 0)),
    }


def with_repetition_signals(df, text_col: str = "text", round_to: int = 4):
    """Append ``distinct_ratio`` / ``top_word_share`` / ``dup_bigram_ratio``
    via SHARED projections: tokenize once, fold the sorted word array once,
    build+fold bigrams once.  Computing the three public per-signal
    functions as sibling columns re-parses and re-sorts per column (Spark's
    subexpression elimination does not span lambda functions) — measured 7×
    slower at sf0.1 (4.0 s vs 0.6 s).  Use this for any multi-signal scan.
    """
    from pyspark.sql import DataFrame  # local: avoid cycle at import time

    assert isinstance(df, DataFrame)
    cols = df.columns
    d = df.withColumn("_w", words(F.col(text_col)))
    d = d.withColumn("_ws", _run_stats(F.col("_w"))).withColumn("_g", _bigrams(F.col("_w")))
    d = d.withColumn("_gs", _run_stats(F.col("_g")))
    r = lambda c: F.round(c, round_to)  # noqa: E731
    return d.select(
        *cols,
        r(
            F.when(F.size("_w") > 0, F.col("_ws.distinct") / F.size("_w")).otherwise(1.0)
        ).alias("distinct_ratio"),
        r(
            F.when(F.size("_w") > 0, F.col("_ws.best") / F.size("_w")).otherwise(0.0)
        ).alias("top_word_share"),
        r(
            F.when(
                F.size("_g") > 0, (F.size("_g") - F.col("_gs.distinct")) / F.size("_g")
            ).otherwise(0.0)
        ).alias("dup_bigram_ratio"),
    )
