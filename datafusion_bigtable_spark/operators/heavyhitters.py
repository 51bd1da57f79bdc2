"""Exact top-k frequent tokens via Misra-Gries candidates + recount.

The naive exact top-k (`explode → groupBy(token) → TakeOrdered`) is one
shuffle whose width is the DISTINCT VOCABULARY — fine when the vocabulary
is a few million words, hostile at 100 TB where the long tail (typos,
ids, hashes, code) pushes distinct tokens into the billions and the
map-side combine hash tables with it.  The classic fix is a two-phase
candidates-then-verify plan built on the Misra-Gries (1982) frequent
summary, which is MERGEABLE (Agarwal et al., PODS 2012):

1. **Candidates** (one Arrow pass, bounded state): each partition keeps a
   weighted MG summary of at most ``summary_size`` tokens.  The summary
   guarantee: a token absent from partition p's summary has true count
   ≤ N_p/(m+1) in p, so a token absent from EVERY summary has global
   count ≤ N/(m+1).  Candidate set ≤ partitions × m rows — tiny.
2. **Verify** (one JVM pass, one narrow shuffle): re-tokenize JVM-side,
   broadcast-join the candidate set, and count exactly — non-candidates
   collapse into a single null group per partition via map-side combine,
   which also yields the exact corpus token total N in the same pass.
3. **Proof or fallback**: if the k-th candidate count satisfies
   ``cnt·(m+1) > N`` the result is PROVABLY the exact top-k (any missed
   token is strictly smaller).  Otherwise the operator falls back to the
   full exact groupBy — correct output either way; the summary size only
   buys the cheap path, never changes the answer.

Python-side tokenization (step 1 only) uses the same ``[^a-z0-9]+`` split
of ``lower()`` as :func:`functions.text.words`; the EXACT counts all come
from the JVM pass, so candidate tokenization only needs to be a superset
oracle — any drift there costs a fallback, not a wrong answer.

No reference analogue (the engine stops at the scan); this is §7-extension
tier for corpus curation (stopword discovery, boilerplate token audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from datafusion_bigtable_spark.functions.text import words

_TOKEN_RE = "[^a-z0-9]+"


def mg_candidates(
    docs: DataFrame, summary_size: int = 4096, text_col: str = "text"
) -> DataFrame:
    """(token, part_total) candidate rows: one weighted Misra-Gries summary
    per partition plus one ``token=NULL`` meta row carrying the partition's
    exact token total (used by the caller's guarantee check)."""
    schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("part_total", T.LongType()),
            T.StructField("pruned", T.LongType()),
        ]
    )
    m = summary_size

    def run(batches):
        import re

        import pandas as pd

        splitter = re.compile(_TOKEN_RE)
        summary: dict[str, int] = {}
        n_p = 0
        pruned = 0
        for pdf in batches:
            # vectorized batch pre-count, then one weighted merge into the
            # bounded summary (mergeable-summaries composition)
            vc = (
                pdf[text_col]
                .fillna("")
                .map(lambda s: [t for t in splitter.split(s.lower()) if t])
                .explode()
                .value_counts()
            )
            n_p += int(vc.sum()) if len(vc) else 0
            for tok, c in vc.items():
                summary[tok] = summary.get(tok, 0) + int(c)
            if len(summary) > m:
                import numpy as np

                cnts = np.fromiter(summary.values(), dtype=np.int64)
                # subtract the (m+1)-th largest count from everything and
                # drop the non-positive — ≤ m survivors, and each pruned
                # unit of weight is charged against ≥ m+1 tokens, which
                # is what keeps total error ≤ N_p/(m+1)
                d = int(np.partition(cnts, len(cnts) - (m + 1))[len(cnts) - (m + 1)])
                summary = {t: c - d for t, c in summary.items() if c > d}
                pruned = 1
        out = pd.DataFrame({"token": list(summary.keys())})
        out["part_total"] = 0
        out["pruned"] = 0
        yield pd.concat(
            [out, pd.DataFrame({"token": [None], "part_total": [n_p], "pruned": [pruned]})],
            ignore_index=True,
        )

    return docs.select(text_col).mapInPandas(run, schema)


def exact_top_tokens(
    docs: DataFrame,
    k: int = 40,
    summary_size: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """EXACT (rank, token, cnt) for the k most frequent tokens, counted
    over the same ``words()`` normalization every text operator uses.
    Deterministic order: count desc, token asc.  See module docstring for
    the two-phase plan and the exactness proof / fallback."""
    cand_raw = mg_candidates(docs, summary_size, text_col)
    # tiny by construction (≤ partitions × summary_size + partitions rows):
    # collect once, reuse for the broadcast side AND the guarantee check
    cand_rows = cand_raw.collect()
    n_total = sum(r["part_total"] for r in cand_rows if r["token"] is None)
    any_pruned = any(r["pruned"] for r in cand_rows if r["token"] is None)
    cand_tokens = sorted({r["token"] for r in cand_rows if r["token"] is not None})

    spark = docs.sparkSession
    toks = docs.select(F.explode(words(F.col(text_col))).alias("token"))

    def _rank(counted: DataFrame) -> DataFrame:
        top = counted.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
        # k rows: a driver-side rank stamp avoids a single-partition window
        rows = top.collect()
        ranked = [
            (i + 1, r["token"], r["cnt"])
            for i, r in enumerate(
                sorted(rows, key=lambda r: (-r["cnt"], r["token"]))
            )
        ]
        return spark.createDataFrame(ranked, "rank long, token string, cnt long")

    if cand_tokens:
        counted = (
            toks.join(
                F.broadcast(spark.createDataFrame([(t,) for t in cand_tokens], "token string")),
                "token",
            )
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
        )
        result = _rank(counted)
        # certificate 1: no partition ever pruned, so the candidate set IS
        # the exact distinct vocabulary — nothing was missed by construction
        if not any_pruned:
            return result
        got = result.collect()
        kth = got[-1]["cnt"] if len(got) >= k else 0
        # certificate 2: every non-candidate has count ≤ N/(m+1), strictly
        # below the k-th candidate — the top-k is provably complete
        if len(got) >= k and kth * (summary_size + 1) > n_total:
            return result
    # guarantee not met (adversarially flat corpus or tiny summary):
    # fall back to the plain exact one-shuffle plan — never wrong, just wide
    counted = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return _rank(counted)
