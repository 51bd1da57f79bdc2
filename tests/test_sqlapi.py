"""SQL-surface equivalence pins (functions/sqlapi.py): every registered
SQL scalar function must equal its Column twin bit-for-bit over real
documents plus crafted hostile strings — this is the drift gate that
lets the two surfaces share one semantic definition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.functions import text as X
from datafusion_bigtable_spark.functions.sqlapi import register_sql_functions


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    register_sql_functions(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    hostile = spark.createDataFrame(
        [
            (9001, "mail me at a.b+c@ex-ample.org or call +1 555-123 4567 id 123-45-6789"),
            (9002, ""),
            (9003, "der die und das ist nicht ein"),
            (9004, "!!!???;;;"),
            (9005, "le la et les des est une " * 40),
        ],
        "doc_id long, text string",
    )
    return docs.unionByName(hostile)


PAIRS = [
    ("dbs_n_words(text)", lambda: X.n_words(F.col("text"))),
    ("dbs_n_chars(text)", lambda: X.n_chars(F.col("text"))),
    ("dbs_token_count_ws(text)", lambda: X.whitespace_token_count(F.col("text"))),
    ("dbs_token_count_bpeish(text)", lambda: X.bpe_ish_token_count(F.col("text"))),
    ("dbs_normalize(text)", lambda: X.normalized_text(F.col("text"))),
    ("dbs_fingerprint(text)", lambda: X.fingerprint(F.col("text"))),
    ("dbs_redact_pii(text)", lambda: X.redact_pii(F.col("text"))),
    ("dbs_langid(text)", lambda: X.langid(F.col("text"))),
    ("dbs_stopword_ratio(text)", lambda: X.stopword_ratio(F.col("text"))),
    ("dbs_avg_word_len(text)", lambda: X.avg_word_len(F.col("text"))),
    ("dbs_quality_score(text)", lambda: X.quality_score(F.col("text"))),
    ("dbs_curation_reason(text)", lambda: X.curation_reason(F.col("text"))),
]


@pytest.mark.parametrize("sql_expr,col_fn", PAIRS, ids=[p[0].split("(")[0] for p in PAIRS])
def test_sql_equals_column(spark, corpus, sql_expr, col_fn):
    mism = corpus.select(
        F.expr(sql_expr).alias("s"), col_fn().alias("c")
    ).filter(
        ~F.col("s").eqNullSafe(F.col("c"))  # null-safe: both-null counts as equal
    )
    rows = mism.limit(5).collect()
    assert not rows, f"{sql_expr}: SQL != Column, first diffs {rows}"


def test_sql_functions_stay_in_codegen(spark, corpus):
    # Macro expansion, not a UDF boundary: the plan must contain no
    # Python evaluation node and keep whole-stage codegen over the scan.
    df = spark.sql("SELECT dbs_quality_score('abc def') AS q")
    corpus.createOrReplaceTempView("t_sqlapi_codegen")
    plan = (
        spark.sql("SELECT doc_id, dbs_curation_reason(text) AS r FROM t_sqlapi_codegen")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the `*(n)` stage prefix is the compact-format whole-stage-codegen marker
    assert "*(1) Project" in plan
    assert df.collect()[0].q is not None


def test_reregistration_is_idempotent(spark):
    names1 = register_sql_functions(spark)
    names2 = register_sql_functions(spark)
    assert names1 == names2 and "dbs_curation_reason" in names1
