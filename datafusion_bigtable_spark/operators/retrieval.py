"""Sparse lexical retrieval: TF-IDF inverted-index top-k search.

The sparse complement to the dense ANN tier (operators/similarity.py):
given a handful of query documents, find the k most lexically similar
corpus documents by TF-IDF dot product — the BM25/TF-IDF retrieval shape
every training-data pipeline runs for benchmark decontamination sweeps,
near-duplicate triage, and retrieval-augmented filtering.  No reference
analogue (the reference is a Bigtable scan connector, SURVEY.md §0).

The 100 TB shape, stage by stage:

- postings (the inverted index): tokenize → groupBy(doc, term) → join the
  vocabulary-sized df table back by BROADCAST — identical economics to
  operators/tfidf.py (one token-pair shuffle with map-side partial agg;
  the corpus-sized tf table never reshuffles for the vocabulary join),
  including the explicit ``localCheckpoint`` so the df branch does not
  re-tokenize the corpus (2-FileScan trap measured there).
- stop-term pruning: a term appearing in more than ``max_df_frac`` of
  documents is dropped from the index.  This is not a quality tweak but
  the SCALE bound: a stop word's postings list is O(corpus), so an
  unpruned index makes the candidate join quadratic in the worst case;
  after pruning, each query term's posting list is ≤ max_df_frac·N.
  Both engines prune on the exact integer df, so the oracle sees the
  identical index.
- candidate generation: the query side is a FILTER of the same postings
  (queries are documents of the corpus), and it is tiny — q docs × their
  terms — so it BROADCASTS: the full postings table is matched map-side,
  no index reshuffle.  Only the matched (query, candidate, partial)
  pairs enter the one scoring shuffle, grouped by (query, candidate).
- scoring: dot product of TF-IDF weights = SUM(w_doc · w_query) with
  map-side partial aggregation; ``round(score, 4)`` BEFORE ranking on
  both engines so rank never hangs on 1e-12 float-sum association noise
  (same discipline as the ANN queries' rounded cosine).
- top-k: row_number over (query) ordered by (score DESC, neighbor ASC) —
  per-query partitions are ≤ candidate count, never corpus-sized.

Driver state: none (no collect; the plan is lazy end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from datafusion_bigtable_spark.operators.tfidf import corpus_term_stats


def tfidf_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """The pruned TF-IDF inverted index: ``(term, id_col, wt)`` with
    ``wt = tf · ln(N/df)`` and terms with ``df > max_df_frac·N`` dropped
    (the stop-postings bound — see module doc).  Built on the shared
    tf/df/total base (``operators/tfidf.py::corpus_term_stats`` — one
    token-pair shuffle, materialized tf, broadcast vocabulary)."""
    tf, dfreq, total = corpus_term_stats(docs, id_col=id_col, text_col=text_col)
    return (
        tf.join(dfreq, "term")
        .crossJoin(total)
        .filter(F.col("df") <= max_df_frac * F.col("_n_docs"))
        .select(
            "term",
            id_col,
            (F.col("tf") * F.log(F.col("_n_docs") / F.col("df"))).alias("wt"),
        )
    )


def sparse_topk(
    docs: DataFrame,
    query_pred: Column,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Top-``k`` TF-IDF-cosine-free dot-product neighbors for every corpus
    document matching ``query_pred`` (a predicate over ``docs`` columns,
    e.g. ``F.col("doc_id") % 50 == 0``), self excluded.

    Returns ``(query_id, neighbor_id, score, rk)``, ``rk`` 1..k ordered by
    ``(round(score,4) DESC, neighbor_id ASC)``.  Candidates are only
    documents sharing ≥1 surviving index term with the query — exactly
    the inverted-index contract (a no-overlap pair scores 0 and is never
    generated)."""
    postings = tfidf_postings(
        docs, id_col=id_col, text_col=text_col, max_df_frac=max_df_frac
    )
    # postings is consumed twice (index side + query side); without an
    # explicit materialization Catalyst would tokenize the corpus once per
    # branch — same trap, same fix as the tf table inside tfidf_postings
    postings = postings.localCheckpoint(eager=False)
    # both joins that touch the corpus-sized postings table carry an
    # EXPLICIT broadcast hint on their small side (the query-id list here,
    # the assembled query postings below): at real scale nothing
    # auto-broadcasts, and a shuffle join on either re-exchanges the
    # whole index per query batch
    queries = F.broadcast(
        F.broadcast(docs.filter(query_pred).select(F.col(id_col).alias("query_id")))
        .join(postings, F.col("query_id") == F.col(id_col))
        .select("query_id", "term", F.col("wt").alias("qwt"))
    )
    scored = (
        postings.join(queries, "term")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.round(F.sum(F.col("wt") * F.col("qwt")), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )
