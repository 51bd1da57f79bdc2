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

import json
import os
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from datafusion_bigtable_spark.operators.tfidf import corpus_term_stats

POSTINGS_DIR = "postings"
POSTINGS_META = "_postings_meta.json"


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


def _guard_query_set(n_queries: int, max_query_docs: int) -> None:
    """Fail loud on an unbounded query set BEFORE it is force-broadcast.

    VERDICT r14 #5: the query postings are broadcast and every query
    multiplies the candidate-pair volume, so a predicate matching an
    unbounded fraction of the corpus re-creates the measured 23-45×
    superlinearity (queries.py r10) — and a force-broadcast side that
    grows with the corpus eventually OOMs every executor.  The count is
    one cheap aggregate over the pred columns; a caller who really wants
    a huge sweep raises ``max_query_docs`` explicitly, making the cost a
    decision instead of an accident (same posture as
    ``write_range_sorted_shards``'s NULL guard)."""
    if n_queries > max_query_docs:
        raise ValueError(
            f"query predicate matches {n_queries} documents, over the "
            f"max_query_docs={max_query_docs} broadcast bound; narrow the "
            "predicate (cap it on an absolute id range) or raise "
            "max_query_docs if the cost is intended"
        )


def sparse_topk(
    docs: DataFrame,
    query_pred: Column,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
    max_query_docs: int = 10_000,
) -> DataFrame:
    """Top-``k`` TF-IDF-cosine-free dot-product neighbors for every corpus
    document matching ``query_pred`` (a predicate over ``docs`` columns,
    e.g. ``F.col("doc_id") % 50 == 0``), self excluded.

    Returns ``(query_id, neighbor_id, score, rk)``, ``rk`` 1..k ordered by
    ``(round(score,4) DESC, neighbor_id ASC)``.  Candidates are only
    documents sharing ≥1 surviving index term with the query — exactly
    the inverted-index contract (a no-overlap pair scores 0 and is never
    generated).  ``max_query_docs`` bounds the query set (fail-loud —
    see :func:`_guard_query_set`)."""
    _guard_query_set(docs.filter(query_pred).count(), max_query_docs)
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


# ---------------------------------------------------------------------------
# Persistent postings index (build once, search forever) + BM25
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PostingsIndex:
    """Handle over a saved postings store — meta only; the postings frame
    is lazy (``postings()`` plans a scan, triggers nothing)."""

    path: str
    meta: dict
    _spark: SparkSession

    def postings(self) -> DataFrame:
        return self._spark.read.parquet(os.path.join(self.path, POSTINGS_DIR))


def save_postings_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
    n_files: int = 32,
) -> dict:
    """Build the pruned inverted index ONCE and persist it, so every later
    search (this session or any later one) pays zero tokenize/index cost
    — the sparse twin of ``save_ivf_index`` (VERDICT r14 #4; the dense
    tier already had save/load/upsert).

    Store layout (same manifest discipline as sources/shards.py and the
    IVF store — data first, tiny meta json written ATOMICALLY LAST, so a
    complete meta implies a complete store and a crash in between reads
    as "no index", never as a torn one):

    - ``postings/``: parquet ``(term, id_col, tf, df, dl)`` clustered by
      term into ``n_files`` files (a term's posting list is co-located,
      so the search join fans out over terms).  ``df`` and ``dl``
      (document token length) are DENORMALIZED onto the rows —
      dictionary+RLE encode them to near-nothing, and BM25 search then
      needs ZERO extra joins (a separate doclens table would re-shuffle
      the corpus-sized postings on id at every search).
    - ``_postings_meta.json``: corpus constants (n_docs, the exact
      integer token-length sum + doc count behind avgdl, the pruning
      bound, id_col) — everything a search needs beyond the postings
      rows themselves.

    Stop-term pruning (``df > max_df_frac·n_docs`` dropped) is baked in
    at save time: the scale bound rides the stored index, not each
    caller's discipline.  ``dl`` counts ALL tokens of a doc (including
    pruned stop terms) — BM25's length normalization is about document
    size, not index size.  Returns the meta dict."""
    # Invalidate FIRST when overwriting: meta-written-last only means
    # "complete meta ⇒ complete store" if a crashed REWRITE cannot leave
    # yesterday's meta pointing at today's half-written postings.
    try:
        os.remove(os.path.join(path, POSTINGS_META))
    except FileNotFoundError:
        pass
    tf, dfreq, total = corpus_term_stats(docs, id_col=id_col, text_col=text_col)
    n_docs = total.first()["_n_docs"]
    # exact integer sums -> avgdl derives identically on any engine
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dl_stats = dl.agg(
        F.sum("dl").alias("_sum"), F.count(F.lit(1)).alias("_n")
    ).first()
    pruned = (
        tf.join(dfreq, "term")
        .filter(F.col("df") <= max_df_frac * F.lit(n_docs))
        .join(dl, id_col)
        .select("term", id_col, "tf", "df", "dl")
    )
    (
        pruned.repartition(n_files, F.col("term"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, POSTINGS_DIR))
    )
    meta = {
        "id_col": id_col,
        "n_docs": int(n_docs),
        "dl_sum": int(dl_stats["_sum"] or 0),
        "dl_docs": int(dl_stats["_n"]),
        "max_df_frac": max_df_frac,
        "version": 1,
    }
    tmp = os.path.join(path, POSTINGS_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, POSTINGS_META))
    return meta


def load_postings_index(spark: SparkSession, path: str) -> PostingsIndex:
    """Open a saved index: ONE tiny json read, zero data reads, zero Spark
    jobs (pinned in tests/test_retrieval.py).  Fails loud on an
    incomplete store — the meta is written last, so its absence means
    the save never finished."""
    meta_path = os.path.join(path, POSTINGS_META)
    if not os.path.isfile(meta_path):
        raise FileNotFoundError(
            f"{path} has no {POSTINGS_META} — postings index missing or its "
            "save crashed before commit; re-run save_postings_index"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    return PostingsIndex(path=path, meta=meta, _spark=spark)


def search_postings_index(
    index: PostingsIndex,
    query_pred: Column,
    *,
    k: int = 3,
    weighting: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
    max_query_docs: int = 10_000,
) -> DataFrame:
    """Top-``k`` retrieval against a SAVED index — same join shape as
    :func:`sparse_topk` (broadcast query postings, one scoring shuffle of
    matched pairs) minus the index build.

    ``query_pred`` selects the query documents over the index's id
    column (queries are corpus members, exactly the ``sparse_topk``
    contract — their stored postings ARE their tokenization, so a saved
    search is bit-identical to a fresh build, pinned in tests).

    ``weighting``:
    - ``"tfidf"``: ``wt = tf·ln(N/df)`` on both sides — hash-identical
      to ``sparse_topk`` for the same predicate.
    - ``"bm25"``: doc side ``ln((N-df+0.5)/(df+0.5)+1) ·
      tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))``, query side raw ``tf`` —
      the standard Okapi shape, fully deterministic and SQL-oracle-able
      (k1/b are plain literals; avgdl derives from the meta's exact
      integer sums, so every engine computes the same double).

    Scale: identical economics to ``sparse_topk`` — the corpus-sized
    postings never reshuffle; only matched (query, candidate, partial)
    pairs enter the one grouping exchange."""
    id_col = index.meta["id_col"]
    n_docs = index.meta["n_docs"]
    postings = index.postings()
    if weighting == "tfidf":
        wt = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
        qwt = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    elif weighting == "bm25":
        avgdl = index.meta["dl_sum"] / index.meta["dl_docs"]
        idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        wt = idf * (
            F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        )
        qwt = F.col("tf").cast("double")
    else:
        raise ValueError(f"unknown weighting {weighting!r} (tfidf|bm25)")
    queries = postings.filter(query_pred).select(
        F.col(id_col).alias("query_id"), "term", qwt.alias("qwt")
    )
    _guard_query_set(
        queries.select("query_id").distinct().count(), max_query_docs
    )
    scored = (
        postings.withColumn("wt", wt)
        .join(F.broadcast(queries), "term")
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


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankings
# ---------------------------------------------------------------------------


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    rrf_k: int = 60,
    k: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings — the standard way to compose
    retrieval modalities whose raw scores are incomparable (TF-IDF dot
    products vs cosine similarities): each list contributes
    ``1/(rrf_k + rank)`` per (query, candidate), summed and re-ranked.

    Inputs carry ``(query_id, neighbor_id, rk)`` (extra columns are
    dropped); a candidate absent from one list simply contributes
    nothing from it — no outer-join scaffolding needed, the union +
    groupBy IS the fusion.  Output ``(query_id, neighbor_id, rrf_score,
    rk)`` with ``rk`` 1..k by ``(rrf_score DESC, neighbor_id ASC)``;
    the score is rounded to 8 so cross-engine rank comparison never
    hangs on representation noise (sums of ≤N reciprocals are exact
    enough at 1e-8).

    Scale: the inputs are already top-k lists — queries × k rows each —
    so the union and the one grouping exchange are TINY regardless of
    corpus size; fusion cost is independent of the data the rankings
    were computed over.  Pure deterministic rank math: rank ties inside
    the input rankings were already broken deterministically by their
    producers (every topk operator here orders by (score, id))."""
    cols = ["query_id", "neighbor_id", "rk"]
    u = rankings[0].select(*cols)
    for r in rankings[1:]:
        u = u.unionByName(r.select(*cols))
    scored = u.groupBy("query_id", "neighbor_id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("rk"))), 8).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rrf_score", "rk")
    )
