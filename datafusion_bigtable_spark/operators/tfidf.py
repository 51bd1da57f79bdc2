"""Corpus-level TF-IDF term scoring — the classic text-analysis operator
the reference (a Bigtable connector; SURVEY.md §0) has no notion of, built
the way it has to look at 100 TB:

- tokenize + term-frequency: explode → groupBy(doc, term) — ONE shuffle of
  token pairs, partial-aggregated map-side (Catalyst plans partial_count
  before the exchange, so the wire carries (doc, term, partial_tf), not
  raw tokens).
- document frequency: a second aggregate over the tf table keyed by term —
  output is VOCABULARY-sized (≤ a few million terms for natural language,
  independent of corpus size), which is why it then joins back as a
  BROADCAST: the corpus-sized tf table never reshuffles for the join.
  The tf table is MATERIALIZED once (localCheckpoint, the same pattern as
  operators/graph.py): without it Catalyst recomputes the tokenize+
  explode+aggregate subtree for the df branch — column pruning drops the
  unused tf count from that branch, the two subtrees stop being
  canonically equal, ReuseExchange can't fire, and the corpus gets
  scanned and tokenized TWICE (measured: 2 FileScans, 0 ReusedExchange).
  A window `count over (partition by term)` would avoid the second branch
  without materializing — but a stop-word's partition is every document
  (no map-side partial agg in windows), a guaranteed straggler at 100 TB,
  so the groupBy+broadcast shape with an explicit materialization is the
  one that scales.  On a real cluster the equivalent is staging tf to a
  table; localCheckpoint is the in-session stand-in.
- top-k per doc: row_number over (doc) — re-uses the tf table's existing
  (doc, term) clustering; ordering is (tf DESC, df ASC, term ASC), an
  integer-only total order (rarity-aware: equal tf → rarer term wins) so
  ranks are EXACTLY reproducible across engines — ordering by the float
  score itself would tie-break on 1e-16 noise and flap between runs.

The tf·idf score (tf × ln(N/df)) is carried as a value column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_bigtable_spark.functions.text import words


def corpus_term_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared TF-IDF base every term-weighting consumer builds on —
    ``(tf, dfreq, total)``:

    - ``tf``: the MATERIALIZED ``(id_col, term, tf)`` table (one
      token-pair shuffle; localCheckpoint against the 2-FileScan trap —
      module docstring),
    - ``dfreq``: the vocabulary-sized ``(term, df)`` table,
      broadcast-hinted when ``broadcast_vocab``,
    - ``total``: a broadcast 1-row ``(_n_docs)`` frame (keeps consumers
      one lazy plan — no driver-side ``.count()`` action).

    Single definition on purpose: the materialization + broadcast-vocab
    discipline here is measurement-backed and subtle; consumers
    (``tfidf_top_terms`` below, ``operators/retrieval.py``'s postings
    builder) must evolve with it, not fork it.
    """
    toks = docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # one tokenize pass, two consumers (join probe + df aggregate) — see
    # module docstring for why this must be an explicit materialization
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    total = F.broadcast(docs.agg(F.count("*").alias("_n_docs")))
    return tf, dfreq, total


def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Returns ``(id_col, term, tf, df, score, rank)`` with ``rank`` 1..k per
    doc.  ``broadcast_vocab=True`` (default) broadcasts the df table —
    right whenever the vocabulary fits in executor memory; set False for
    adversarial vocabularies (e.g. unfiltered URLs) to fall back to a
    shuffle join on term.
    """
    tf, dfreq, total = corpus_term_stats(
        docs, id_col=id_col, text_col=text_col, broadcast_vocab=broadcast_vocab
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(total)
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 4),
        )
        .drop("_n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )
