"""SQL-surface registration of the text-curation functions.

The reference's user model is SQL-first: register a table, query it with
SQL (src/lib.rs registers a TableProvider; every reference test is a SQL
string).  This module gives the curation toolkit the same surface —
``register_sql_functions(spark)`` creates session-scoped SQL scalar
functions (Spark 4 ``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN
expr``) so a SQL-only user runs the EXACT same gate as the DataFrame
API:

    SELECT doc_id, dbs_curation_reason(text) FROM corpus

Scale note: SQL scalar functions are macro-EXPANDED into the plan at
analysis time — no UDF call boundary, no serialization, the expression
lands in the same whole-stage-codegen pass as the Column version.  They
are free abstraction, unlike ``spark.udf.register`` (a Python
round-trip per row).

Drift control: the bodies are GENERATED from the same constants
(``WORD_RE``, ``TOKEN_RE``, ``PUNCT_RE``, ``LANG_STOPWORDS``,
``PII_*_RE``) the Column functions use, and tests/test_sqlapi.py pins
SQL-vs-Column equality per function over real documents — an edit to
one surface that misses the other fails loud.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from datafusion_bigtable_spark.functions.text import (
    LANG_ORDER,
    PII_EMAIL_RE,
    PII_PHONE_RE,
    PII_SSN_RE,
    PUNCT_RE,
    SENT_PUNCT_RE,
    TOKEN_RE,
    WORD_RE,
    stopword_pattern,
)


def _lit(s: str) -> str:
    """Spark-SQL single-quoted string literal (backslashes and quotes
    escaped — Spark SQL treats backslash as an escape in literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_function_defs(prefix: str = "dbs_") -> dict[str, str]:
    """name → ``(signature) RETURNS type RETURN body`` for every exposed
    function.  Pure strings; composition uses the prefixed names so the
    whole set registers as one coherent namespace."""
    p = prefix
    words = f"filter(split(lower(x), {_lit(WORD_RE)}), w -> w != '')"
    en_hits = f"size(regexp_extract_all(lower(x), {_lit(stopword_pattern('en'))}, 1))"
    ws_re = _lit(r"\s+")
    defs: dict[str, str] = {}
    defs[f"{p}n_words"] = f"(x STRING) RETURNS INT RETURN size({words})"
    defs[f"{p}n_chars"] = "(x STRING) RETURNS INT RETURN length(x)"
    defs[f"{p}token_count_ws"] = (
        f"(x STRING) RETURNS INT RETURN size(filter(split(x, {ws_re}), w -> w != ''))"
    )
    defs[f"{p}token_count_bpeish"] = (
        f"(x STRING) RETURNS INT RETURN size(regexp_extract_all(lower(x), {_lit(TOKEN_RE)}, 0))"
    )
    defs[f"{p}normalize"] = (
        "(x STRING) RETURNS STRING RETURN "
        "trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9]+', ' '), ' +', ' '))"
    )
    defs[f"{p}fingerprint"] = f"(x STRING) RETURNS STRING RETURN md5({p}normalize(x))"
    defs[f"{p}redact_pii"] = (
        "(x STRING) RETURNS STRING RETURN regexp_replace(regexp_replace(regexp_replace("
        f"x, {_lit(PII_EMAIL_RE)}, '<EMAIL>'), {_lit(PII_SSN_RE)}, '<ID>'), "
        f"{_lit(PII_PHONE_RE)}, '<PHONE>')"
    )
    scores = {
        lang: f"size(regexp_extract_all(lower(x), {_lit(stopword_pattern(lang))}, 1))"
        for lang in LANG_ORDER
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER)
        + " ELSE 'und' END"
    )
    defs[f"{p}langid"] = (
        f"(x STRING) RETURNS STRING RETURN CASE WHEN {best} > 0 THEN {case} ELSE 'und' END"
    )
    defs[f"{p}stopword_ratio"] = (
        f"(x STRING) RETURNS DOUBLE RETURN CASE WHEN {p}n_words(x) > 0 "
        f"THEN CAST({en_hits} AS DOUBLE) / CAST({p}n_words(x) AS DOUBLE) END"
    )
    defs[f"{p}avg_word_len"] = (
        f"(x STRING) RETURNS DOUBLE RETURN CASE WHEN size({words}) > 0 THEN "
        f"CAST(aggregate(transform({words}, w -> length(w)), 0, (acc, y) -> acc + y) AS DOUBLE)"
        f" / size({words}) END"
    )
    defs[f"{p}quality_score"] = (
        "(x STRING) RETURNS DOUBLE RETURN ROUND(("
        "LEAST(CAST(length(x) AS DOUBLE) / 200.0, 1.0)"
        f" + (1.0 - LEAST(CAST(size(regexp_extract_all(x, {_lit(PUNCT_RE)}, 1)) AS DOUBLE)"
        " / CAST(greatest(length(x), 1) AS DOUBLE) * 10, 1.0))"
        f" + LEAST(coalesce({p}stopword_ratio(x), 0.0) * 5, 1.0)"
        f" + CASE WHEN coalesce({p}avg_word_len(x), 0.0) >= 3"
        f" AND coalesce({p}avg_word_len(x), 0.0) <= 10 THEN 1.0 ELSE 0.5 END"
        ") / 4, 4)"
    )
    defs[f"{p}curation_reason"] = (
        "(x STRING) RETURNS STRING RETURN "
        "CASE WHEN length(x) < 120 THEN 'too_short' "
        "WHEN length(x) > 10000 THEN 'too_long' "
        f"WHEN {p}token_count_bpeish(x) < 20 THEN 'too_few_tokens' "
        f"WHEN CAST(size(regexp_extract_all(x, {_lit(SENT_PUNCT_RE)}, 1)) AS DOUBLE)"
        " / greatest(length(x), 1) >= 0.1 THEN 'punct_soup' "
        f"WHEN {p}langid(x) = 'und' THEN 'lang_unknown' "
        "ELSE 'keep' END"
    )
    return defs


def register_sql_functions(spark: SparkSession, prefix: str = "dbs_") -> list[str]:
    """Register every function (CREATE OR REPLACE — idempotent,
    session-scoped).  Returns the sorted registered names.  Order
    matters only in that composed functions resolve at CALL time, so
    any registration order works; dict order here is define-before-use
    anyway."""
    defs = sql_function_defs(prefix)
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(defs)
