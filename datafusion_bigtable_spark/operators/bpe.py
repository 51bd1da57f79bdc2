"""Byte-pair encoding — real BPE training + application for the
token-counting / sequence-packing tier (Sennrich et al. 2016,
arXiv:1508.07909: iteratively merge the most frequent adjacent symbol
pair; the tokenizer family GPT/Llama-style pipelines actually use,
where functions/text.py's regex token count is the cheap estimate).

No reference analogue (connector); LLM-pipeline tier.

Distributed-correct by SHAPE (the train_ivf_codebook pattern):
- TRAINING is greedy-sequential by definition, so it runs driver-side
  over a bounded, deterministic sample (md5-ordered docs, default 2048)
  — the "train small, broadcast, apply wide" split every production
  tokenizer pipeline uses;
- APPLICATION broadcasts the merge ranks (a few hundred pairs) and maps
  the corpus through one Arrow-batched ``mapInPandas`` with a per-word
  memo cache (word shapes repeat heavily; the cache turns per-token
  work into per-distinct-word work).  No shuffle at all — tokenization
  is embarrassingly parallel;
- training is order-dependent and therefore not SQL-expressible; the
  registered query reduces the guarantees to DECLARATIVE INVARIANTS
  the oracle can assert (the sim_trained_codebook_recall pattern):
  every document DETOKENIZES back to its normalized text exactly
  (lossless round trip — bit-wise, not statistical), the merged
  encoding is strictly shorter than character-level, and the vocabulary
  has exactly the requested merge count.

Word boundary convention: words from the same normalization as the
perplexity/boilerplate tier; each word ends with the ``</w>`` marker so
merges never cross word boundaries and detokenization is unambiguous.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    sample: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Greedy merge list from a deterministic md5-ordered document
    sample (bounded driver collect, like train_ivf_codebook).  Ties on
    pair frequency break lexicographically so the result is reproducible
    across partitionings and runs."""
    from datafusion_bigtable_spark.functions.text import words

    rows = (
        docs.select(
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            words(F.col(text_col)).alias("_w"),
        )
        .orderBy("_h")
        .limit(sample)
        .collect()
    )
    vocab: Counter = Counter()
    for r in rows:
        for w in r["_w"] or ():
            if w:
                vocab[_word_syms(w)] += 1
    vocab = dict(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Apply merges to one word by ascending rank (the standard BPE
    apply loop)."""
    syms = list(_word_syms(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document ``(id_col, n_words, n_tokens, n_chars, round_trip_ok)``
    for documents with ≥1 word: BPE token count under ``merges``, the
    character-level symbol count it compresses from, and the EXACT
    detokenization check (concatenating the tokens and stripping the
    word markers must reproduce the normalized text bit-for-bit)."""
    from pyspark.sql import types as T

    spark = docs.sparkSession
    b_merges = spark.sparkContext.broadcast([tuple(m) for m in merges])
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("round_trip_ok", T.BooleanType()),
        ]
    )
    src = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")).alias("_t"),
    )

    def run(batches):
        import pandas as pd

        ranks = {p: i for i, p in enumerate(b_merges.value)}
        memo: dict = {}
        for pdf in batches:
            out = {k: [] for k in ("_id", "n_words", "n_tokens", "n_chars", "round_trip_ok")}
            for did, t in zip(pdf["_id"], pdf["_t"]):
                ws = [w for w in (t or "").split(" ") if w]
                if not ws:
                    continue
                n_tokens = n_chars = 0
                rebuilt = []
                for w in ws:
                    toks = memo.get(w)
                    if toks is None:
                        toks = encode_word(w, ranks)
                        memo[w] = toks
                    n_tokens += len(toks)
                    n_chars += len(w) + 1  # the char-level symbol count incl. EOW
                    rebuilt.append("".join(toks))
                detok = " ".join(rebuilt).replace(EOW, "")
                out["_id"].append(int(did))
                out["n_words"].append(len(ws))
                out["n_tokens"].append(n_tokens)
                out["n_chars"].append(n_chars)
                out["round_trip_ok"].append(detok == t)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema).withColumnRenamed("_id", id_col)
