"""Deduplication operators for 100 TB training-data pipelines.

Five strategies, all expressed as declarative DataFrame pipelines (no
Python in any hot path) and each with an exact SQL twin for the oracle:

- **exact**: hash-groupBy on content digest.  One shuffle on the digest;
  at scale the digest is computed at scan time so the shuffle carries
  32-byte keys, not documents.
- **n-gram Jaccard**: word-shingle inverted index → candidate pairs by
  shared shingle → exact Jaccard on candidates only.  The candidate join
  is the scale knob: shingles act as the blocking key, so cost is
  Σ |bucket|² over shingles, not n².
- **MinHash + LSH**: k portable min-hashes per doc (min over
  md5(seed|shingle) — engine-independent), grouped into b bands of r
  rows; docs sharing any band signature become candidates.  This is the
  sub-quadratic path: cost is Σ |band bucket|².
- **SimHash**: 16-bit sign-of-sum fingerprint from per-word hash bits;
  identical fingerprints = near-dup bucket.  One aggregation, no joins.
- **embedding cosine**: threshold self-join on same-label blocks with
  double-precision cosine; the blocking column (label / IVF cell) bounds
  the pair count.

Hash portability note: every hash here is md5-hex (string min/compare),
because Spark's xxhash64/hash and DuckDB's hash() disagree — md5 is the
deterministic cross-engine choice, and cheap enough at 16 bytes/row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from datafusion_bigtable_spark.functions.text import words


# ---------------------------------------------------------------- exact --


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: canonical (min) id + copy count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct text (the min-id winner)."""
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ------------------------------------------------------------- shingles --


def shingles(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle)."""
    w = words(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)]),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .where(F.size(w) >= k)
    )


# -------------------------------------------------------- n-gram Jaccard --


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs by shared shingle, then exact Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4.
    """
    sh = shingles(docs, k, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------- MinHash + LSH --


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, seed, minhash): portable min over md5('<seed>|'||shingle).

    One aggregation per document over its shingles; the md5-string min is
    engine-independent (see module docstring).
    """
    sh = shingles(docs, k, text_col, id_col)
    per_seed = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*per_seed)
    # long form: (id, seed, minhash)
    pairs = F.array(
        *[F.struct(F.lit(s).alias("seed"), F.col(f"mh_{s}").alias("minhash")) for s in range(num_hashes)]
    )
    return sig.select("id", F.explode(pairs).alias("x")).select(
        "id", F.col("x.seed").alias("seed"), F.col("x.minhash").alias("minhash")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band signature → (id_a, id_b).

    The band signature join is the only pairwise step and it is bucketed
    by (band, signature) — the classic sub-quadratic near-dup shape.
    """
    num_hashes = bands * rows_per_band
    mh = minhash_signatures(docs, num_hashes, k, text_col, id_col)
    banded = (
        mh.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("minhash"))).alias("band_sig"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# --------------------------------------------------------------- SimHash --


def simhash_fingerprints(
    docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): sign-of-sum over per-word md5 bits, as a '0'/'1'
    string of length ``bits`` (bit j ← first bit of hex digit j).

    Expressed as one explode + one aggregation: each distinct word votes
    ±1 per bit position; the fingerprint is the sign vector.
    """
    w = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(words(F.col(text_col)))).alias("word"))
        .withColumn("h", F.md5("word"))
    )
    votes = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*list("89abcdef")), 1).otherwise(-1)
        ).alias(f"bit_{j}")
        for j in range(bits)
    ]
    agg = w.groupBy("id").agg(*votes)
    fp = F.concat(*[F.when(F.col(f"bit_{j}") > 0, "1").otherwise("0") for j in range(bits)])
    return agg.select("id", fp.alias("simhash"))


def simhash_buckets(docs: DataFrame, bits: int = 16, **kw) -> DataFrame:
    """Group identical fingerprints: the zero-join near-dup pass."""
    fp = simhash_fingerprints(docs, bits, **kw)
    return fp.groupBy("simhash").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("n_docs")
    )


# ---------------------------------------------------- embedding cosine --


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same-block pairs with cosine ≥ threshold (double math, rounded 6).

    ``block_col`` is the blocking key (label here; an IVF cell id at
    scale) — it turns the n² self-join into Σ|block|².
    """
    from datafusion_bigtable_spark.operators.similarity import cosine

    a = embeddings.alias("a")
    b = embeddings.alias("b")
    j = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    c = F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6)
    return (
        j.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            c.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
