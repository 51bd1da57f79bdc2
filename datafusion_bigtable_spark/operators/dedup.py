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
    """Distinct word k-gram shingles per document: (id, shingle).

    Shape note (measured at sf0.1): building the k-gram array with
    ``transform(sequence(...), i -> element_at(words, i+j))`` re-evaluates
    the regex word-split per element reference (~3k regex runs per doc) —
    13.9 s just to explode 260k shingles.  Instead: posexplode the words
    ONCE (one regex per document), then assemble k-grams with ``lead()``
    windows over (id, pos) — cheap row-neighbor access, one narrow window
    shuffle on id, then a distinct.  0.9 s for the same output.
    """
    from datafusion_bigtable_spark.operators.partitioning import widen_if_narrow

    # widen first: the regex word-split + posexplode run BEFORE this
    # plan's first exchange and would otherwise inherit the scan's split
    # count (2 at sf1) — every consumer downstream shuffles the exploded
    # rows anyway, so the one raw exchange is pure parallelism
    w = words(F.col(text_col))
    ex = widen_if_narrow(docs, id_col).select(
        F.col(id_col).alias("id"), F.posexplode(w).alias("pos", "w0")
    )
    win = W.partitionBy("id").orderBy("pos")
    parts = [F.col("w0")] + [F.lead("w0", j).over(win) for j in range(1, k)]
    return (
        ex.select("id", F.lead("w0", k - 1).over(win).alias("_tail"), F.concat_ws(" ", *parts).alias("shingle"))
        .filter(F.col("_tail").isNotNull())
        .select("id", "shingle")
        .distinct()
    )


# -------------------------------------------------------- n-gram Jaccard --


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs by shared shingle, then exact Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4.

    Pair generation uses the inverted-list form — collect the sorted doc
    ids per shingle, emit ordered pairs row-locally, count per pair —
    which shuffles the shingle table once instead of twice and measured 2×
    faster than the equivalent self-join at sf0.1 (3.1s vs 6.0s, same
    1.13M pairs).

    ``df_cap`` (the 100 TB knob, VERDICT r1 #3): a degenerate hot shingle
    (boilerplate header shared by 10⁶ docs) would concentrate a 10⁶-element
    ``collect_list`` in one task and emit ~10¹² pairs.  Shingles whose
    document frequency exceeds ``df_cap`` are dropped BEFORE the list is
    collected, bounding every bucket to ≤ df_cap ids (≤ df_cap² pairs).
    The count is a window over ``shingle``: WindowExec buffers each bucket
    in a SPILLING external buffer (unlike the collect_list array it
    guards), and its hash partitioning is exactly what the list
    aggregation needs, so the cap adds ZERO extra shuffles (measured at
    sf0.1: window-cap 2.0 s ≈ uncapped 2.3 s; a count-join-filter form
    cost an un-reused Exchange, 3.0 s).

    The default is ``df_cap=None`` — exact Jaccard, the original memory
    hazard — so the function never silently changes semantics.  With a cap
    set, BOTH per-doc shingle sizes and intersections come from the same
    capped table, so the result is the well-defined Jaccard over the
    ≤-df_cap-frequency shingle universe ("discriminative shingles"), not a
    silent underestimate mixing capped intersections with uncapped sizes.
    On corpora whose max document frequency stays under the cap (measured
    max df is 25 at sf0.1) the capped result is bit-identical to exact;
    above it, hot boilerplate shingles stop contributing to either side of
    the ratio.  Pick a cap above plausible real bucket sizes: it is a
    memory bound for hostile corpora, not a tuning dial.

    ``_shingles`` (internal): a caller that already holds a materialized
    shingle table for the same (docs, k) — :func:`lsh_quality_report`,
    which shares one across its truth and candidate branches — passes it
    here so the corpus is shingled once, not once per branch.
    """
    # The shingle subtree feeds THREE consumers (sizes joins both pair
    # sides; the lists feed pair generation), so it is lineage-cut with a
    # lazy localCheckpoint (r19, guide §5): the r18 finding that
    # PERSISTING it was slower (5.0 s vs 2.8 s — cache-manager
    # serialization + lost stage fusion) does not carry over to the
    # checkpoint, which also truncates the LOGICAL plan so the three
    # consumers analyze a LogicalRDD instead of three copies of the
    # explode+window pipeline.  The cut goes BEFORE the df-cap window,
    # never after it (measured: post-cap checkpointing is SLOWER than no
    # checkpoint at all — it un-fuses the window's exchange from the
    # list aggregation that reuses it, the exact zero-extra-shuffle
    # property the df_cap docstring above relies on).  Interleaved A/B/C
    # at sf0.1, capped: orig 2.09-2.34 s, post-cap ckpt 2.51-2.71 s,
    # THIS shape 1.80-1.90 s; identical pairs in all three.
    sh = _shingles if _shingles is not None else shingles(
        docs, k, text_col, id_col
    ).localCheckpoint(eager=False)

    if df_cap is not None:
        wsh = W.partitionBy("shingle")
        paired_sh = (
            sh.withColumn("_df", F.count("*").over(wsh))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    else:
        paired_sh = sh

    # sizes from the SAME (possibly capped) shingle universe as the
    # intersections — keeps the ratio self-consistent when the cap engages
    sizes = paired_sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    lists = (
        paired_sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = lists.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i+2, size(ids)-i-1), y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
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


# ------------------------------------------------------ shingle containment --


def containment_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
) -> DataFrame:
    """DIRECTED near-containment: ``C(src→dst) = |S(src)∩S(dst)| / |S(src)|``
    over word ``k``-gram shingle sets, keeping pairs with C ≥ ``threshold``.

    Output: (src_id, dst_id, containment) — src's shingle set is mostly
    covered by dst's.  Both directions of a candidate pair are scored
    independently, so a short quote inside a long document surfaces as
    (quote → document) even when their symmetric Jaccard is tiny — the
    asymmetric-resemblance case Broder (1997) separates from resemblance,
    and the practical "doc A is a fragment of doc B" detector a training
    pipeline needs where Jaccard dedup goes blind (Jaccard ≤ |A|/|B| for
    A ⊆ B, arbitrarily small for long B).

    Scale shape: identical to :func:`jaccard_pairs` — one shingle-table
    shuffle for the inverted-list candidate pairs (blocking key =
    shingle, Σ|bucket|² bounded by ``df_cap``), one pair-count shuffle,
    two size-table joins; the direction split is a row-local explode of
    the undirected pair (no extra shuffle, no second pass).  Same capped
    semantics: with ``df_cap`` set, numerator AND denominator come from
    the same ≤-cap shingle universe, so the ratio stays self-consistent.
    """
    # same three-consumer fan-out as jaccard_pairs — same lineage cut,
    # same placement (BEFORE the cap window; see jaccard_pairs)
    sh = shingles(docs, k, text_col, id_col).localCheckpoint(eager=False)

    if df_cap is not None:
        wsh = W.partitionBy("shingle")
        sh = sh.withColumn("_df", F.count("*").over(wsh)).filter(F.col("_df") <= df_cap).drop("_df")

    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    lists = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = lists.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i+2, size(ids)-i-1), y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    joined = inter.join(sa, "id_a").join(sb, "id_b")
    directed = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    (F.col("n_inter").cast("double") / F.col("n_a")).alias("c"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    (F.col("n_inter").cast("double") / F.col("n_b")).alias("c"),
                ),
            )
        ).alias("d")
    ).select("d.src_id", "d.dst_id", F.round("d.c", 4).alias("containment"))
    return directed.filter(F.col("containment") >= threshold)


# --------------------------------------------------------- MinHash + LSH --


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, seed, minhash): portable min over md5('<seed>|'||shingle).

    Shape note (measured at sf0.1): the tempting all-row-local form
    (``array_min(transform(grams, ...))`` per seed in one projection) is
    ~10× SLOWER because CollapseProject inlines the shingle-array
    expression into every seed column — the split/gram/distinct pipeline
    runs ``num_hashes`` times per row.  Exploding the array once and
    min-aggregating per seed evaluates shingling exactly once; the
    shuffle it costs carries only (id, shingle) pairs with map-side
    partial mins.  The md5-string min is engine-independent (module
    docstring).
    """
    return _minhash_wide(docs, num_hashes, k, text_col, id_col).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), F.col(f"mh_{s}").alias("minhash"))
                    for s in range(num_hashes)
                ]
            )
        ).alias("x"),
    ).select("id", F.col("x.seed").alias("seed"), F.col("x.minhash").alias("minhash"))


def _minhash_wide(
    docs: DataFrame,
    num_hashes: int,
    k: int,
    text_col: str,
    id_col: str,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{n-1}): shingles evaluated once via explode, then one
    partial+final min-aggregation for all seeds."""
    sh = _shingles if _shingles is not None else shingles(docs, k, text_col, id_col)
    return sh.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh_{s}")
            for s in range(num_hashes)
        ]
    )


def _band_signatures(
    docs: DataFrame,
    bands: int,
    rows_per_band: int,
    k: int,
    text_col: str,
    id_col: str,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, band, band_sig): LSH band signatures assembled row-locally
    from the per-seed minhash columns (no groupBy beyond the minhash
    aggregation itself)."""
    sig = _minhash_wide(docs, bands * rows_per_band, k, text_col, id_col, _shingles)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.array(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
                    ),
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(band_structs).alias("x")).select(
        "id", F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band signature → (id_a, id_b).

    The band signature join is the only pairwise step and it is bucketed
    by (band, signature) — the classic sub-quadratic near-dup shape.
    Band signatures are assembled row-locally from the per-seed minhash
    columns (no groupBy), so the only shuffle is the candidate join.
    (The self-join plans the signature subtree on both sides, but the
    sides' exchanges are identical so ReuseExchange computes it once —
    no materialization needed here; ``_shingles`` exists for callers
    sharing a shingle table ACROSS operators, where reuse cannot fire.)
    """
    banded = _band_signatures(
        docs, bands, rows_per_band, k, text_col, id_col, _shingles
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


def lsh_estimated_pairs(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified from the SIGNATURES ALONE: estimated
    Jaccard = fraction of agreeing minhash positions (the unbiased
    estimator E[1{mh_a=mh_b}] = J from Broder's theorem).

    This is the at-scale verify path: ``lsh_candidate_pairs`` followed by
    an EXACT Jaccard re-join touches the shingle table a second time —
    a second corpus-sized pass whose join fan-out is the candidate count.
    Here the full signature array (bands·rows_per_band md5 strings,
    ~32 B each) rides the banding explode, so every candidate pair
    already holds both signatures when the bucket join emits it and the
    estimate is a row-local zip — zero joins after candidate generation,
    and the raw text/shingles are never revisited.  The price is
    estimator variance ~ sqrt(J(1-J)/n); at scale you buy accuracy by
    raising num_hashes (linear map-side cost), never with another pass.

    Output: (id_a, id_b, n_agree, est_jaccard, est_dup).
    """
    n = bands * rows_per_band
    sig = _minhash_wide(docs, n, k, text_col, id_col)
    full_sig = F.array(*[F.col(f"mh_{s}") for s in range(n)])
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.array(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
                    ),
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", full_sig.alias("sig"), F.explode(band_structs).alias("x")).select(
        "id", "sig", F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()  # a pair can match in >1 band; sig is functionally dependent on id
    )
    n_agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")
    est = F.col("n_agree") / F.lit(float(n))
    return pairs.select("id_a", "id_b", n_agree.alias("n_agree")).select(
        "id_a",
        "id_b",
        "n_agree",
        F.round(est, 4).alias("est_jaccard"),
        (est >= F.lit(threshold)).alias("est_dup"),
    )


def lsh_dup_rate_sample(
    docs: DataFrame,
    sample_mod: int = 20,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus near-dup RATE audit from a deterministic hash sample: the
    fraction of sampled docs with at least one LSH band partner anywhere
    in the FULL corpus.

    The scale contract: the full-corpus banding pass is linear and
    unavoidable (a dup partner can be anywhere), but pair ENUMERATION is
    not — the probe side is the md5-sampled 1/sample_mod slice, the join
    is a LEFT SEMI on the band bucket (short-circuits at first partner,
    emits no pair rows), so cost is one corpus pass + a sample-sized
    probe instead of Σ|bucket|² pair fan-out + connected components.
    This is the number a curation team wants BEFORE committing to a full
    dedup run at 100 TB.

    Output: one row (n_sampled, n_with_dup, dup_rate) over the universe
    of docs that carry ≥1 shingle (k-1 fewer words ⇒ no signature, same
    universe both engines).
    """
    banded = _band_signatures(docs, bands, rows_per_band, k, text_col, id_col)
    sample_pred = (
        F.conv(F.substring(F.md5(F.concat(F.lit("s1"), F.col("id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % sample_mod
        == 0
    )
    probes = banded.filter(sample_pred)
    hit_ids = (
        probes.alias("s")
        .join(
            banded.alias("c"),
            (F.col("s.band") == F.col("c.band"))
            & (F.col("s.band_sig") == F.col("c.band_sig"))
            & (F.col("s.id") != F.col("c.id")),
            "left_semi",
        )
        .select("id")
        .distinct()
    )
    flags = probes.select("id").distinct().join(
        hit_ids.withColumn("_hit", F.lit(1)), "id", "left"
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.count("_hit").cast("long").alias("n_with_dup"),
        F.round(F.count("_hit") / F.count("*"), 4).alias("dup_rate"),
    )


def lsh_quality_report(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Precision/recall of the LSH candidate set against exact-Jaccard
    ground truth — the tuning report that justifies a (bands,
    rows_per_band) choice BEFORE a full-corpus run.

    The theoretical S-curve (P[candidate] = 1-(1-J^r)^b) predicts recall
    at the threshold; this measures it on the actual corpus, where the
    shingle distribution decides how tight the bound is.  At 100 TB you
    run this on a hash-sampled slice (compose with
    ``sampling.deterministic_hash_sample``), pick the banding, then pay
    for the full pass once.

    Output: one row (n_truth, n_candidates, n_true_positive, precision,
    recall); precision/recall are NULL when their denominator is empty.
    """
    # ONE shingle table feeds both branches (r19, guide §1.2/§5): the
    # report used to plan the explode+window shingle pipeline five times
    # (three in the truth branch, two sides of the candidate self-join);
    # a shared lazy localCheckpoint shingles the corpus once and every
    # branch reads blocks.  Interleaved A/B at sf0.1: 4.2 s → 3.0 s warm
    # (cold 11.8 → 4.3 s), identical report row.
    sh = shingles(docs, k, text_col, id_col).localCheckpoint(eager=False)
    truth = jaccard_pairs(
        docs, k=k, threshold=threshold, df_cap=df_cap, text_col=text_col,
        id_col=id_col, _shingles=sh,
    ).select("id_a", "id_b", F.lit(1).alias("_t"))
    cand = lsh_candidate_pairs(
        docs, bands, rows_per_band, k, text_col, id_col, _shingles=sh
    ).select("id_a", "id_b", F.lit(1).alias("_c"))
    both = truth.join(cand, ["id_a", "id_b"], "full")
    tp = F.sum((F.col("_t").isNotNull() & F.col("_c").isNotNull()).cast("int")).cast("long")
    return both.agg(
        F.count("_t").cast("long").alias("n_truth"),
        F.count("_c").cast("long").alias("n_candidates"),
        tp.alias("n_true_positive"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_true_positive",
        F.round(F.col("n_true_positive") / F.col("n_candidates"), 4).alias("precision"),
        F.round(F.col("n_true_positive") / F.col("n_truth"), 4).alias("recall"),
    )


def prefix_filter_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT threshold Jaccard join via prefix filtering (SSJoin /
    PPJoin, Chaudhuri et al. ICDE'06, Xiao et al. WWW'08) — the
    deterministic sub-quadratic alternative to LSH: zero false
    negatives by THEOREM, not probability.

    Under any global total order on shingles, J(A,B) ≥ t implies the
    prefixes of length |S| − ⌈t·|S|⌉ + 1 intersect, so candidates come
    from an inverted index over PREFIX shingles only.  Ordering by
    ascending document frequency puts the RAREST shingles in the
    prefix, which is the whole economics: bucket sizes over prefix
    shingles are a small fraction of the full inverted index's, and the
    hot boilerplate shingles that blow up `jaccard_pairs`' Σ|bucket|²
    land in suffixes where they are never indexed.  The df ranking
    costs one extra count-window over the same shingle-partitioned
    shuffle the index needs anyway.

    Verification (r12): candidates join each side's collected DISTINCT
    shingle array — doc-count rows, built from the id-partitioned
    shingle table — and score row-locally with ``array_intersect``.
    The previous form re-joined the FULL shingle table per candidate
    side (fan-out |cands|·avg|S| rows AND a corpus-sized (id, shingle)
    exchange for the intersection groupBy); the array form shuffles the
    shingle table once into arrays and the small candidate set
    broadcasts against it.  Measured at sf1: 27.6 → ~16 s, identical
    pairs.

    Output: (id_a, id_b, jaccard) — identical to an exact all-pairs
    Jaccard at the same threshold (the registered oracle computes the
    exact join with no prefix logic; a single dropped pair would hash-
    mismatch, so driver correctness IS the recall proof).
    """
    sh = shingles(docs, k, text_col, id_col)
    wdf = W.partitionBy("shingle")
    wid = W.partitionBy("id").orderBy("df", "shingle")
    wsz = W.partitionBy("id")
    ranked = (
        sh.withColumn("df", F.count("*").over(wdf))
        .withColumn("rank", F.row_number().over(wid))
        .withColumn("sz", F.count("*").over(wsz))
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    # NOT materialized (r18, measured): the a×b self-join does plan the
    # shingle+3-window pipeline on both sides, but the broadcast side's
    # job runs CONCURRENTLY with the probe side's (the exchanges
    # overlap, measured gap −1.4 s at sf0.1), so a localCheckpoint here
    # SERIALIZES the two computations and cost +2 s net.
    prefix = ranked.filter(F.col("rank") <= prefix_len).select("id", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    spark = docs.sparkSession
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        # pin verification parallelism (r18, guide §2.5): the candidate
        # set is tiny in BYTES, so AQE coalesces the distinct's exchange
        # to a handful of partitions — but each row's array_intersect
        # over two full shingle arrays is CPU-heavy (measured 12 s of
        # CPU squeezed through 4 tasks).  An explicit hash repartition
        # at cluster parallelism is respected by AQE and spreads the
        # compute; the exchange itself moves only the id pairs.
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("id_a"), F.col("id_b")
        )
    )
    # per-doc distinct-shingle arrays: ONE id-keyed exchange of the
    # shingle table (shingles() ends in a (id, shingle) distinct, so its
    # partitioning does not serve a groupBy(id) directly), carrying the
    # size alongside — vs the old verify's exploded candidate fan-out
    # PLUS a corpus-sized (id_b, shingle) join exchange
    arrs = sh.groupBy("id").agg(
        F.collect_list("shingle").alias("_sh"), F.count("*").alias("n_sh")
    )
    joined = cand.join(
        arrs.select(
            F.col("id").alias("id_a"), F.col("_sh").alias("_sa"), F.col("n_sh").alias("n_a")
        ),
        "id_a",
    ).join(
        arrs.select(
            F.col("id").alias("id_b"), F.col("_sh").alias("_sb"), F.col("n_sh").alias("n_b")
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    # Filter on the UNROUNDED jaccard (ADVICE r11 #1): the prefix theorem
    # guarantees a shared prefix shingle only for true J >= threshold, so
    # the final predicate must match that domain exactly — a pair with
    # true J in [t−5e−5, t) would round UP past the threshold and pass a
    # rounded filter here while (legitimately) sharing no prefix shingle,
    # breaking the identical-to-exact-all-pairs contract.  Round only for
    # output.
    raw = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter).cast("double")
    return (
        joined.filter(raw >= threshold)
        .select("id_a", "id_b", F.round(raw, 4).alias("jaccard"))
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
    block_cap: int | None = None,
) -> DataFrame:
    """Same-block pairs with cosine ≥ threshold (double math, rounded 6).

    ``block_col`` is the blocking key (label here; an IVF cell id at
    scale) — it turns the n² self-join into Σ|block|².

    ``block_cap`` bounds that sum (VERDICT r11 #2: a FIXED block count
    means blocks grow with the corpus and Σ|block|² is quadratic again —
    measured 3.0→283 s at sf0.1→sf1): each block splits into
    deterministic sub-blocks of at most ``block_cap`` members, in
    ``id_col`` order (``floor(rank/cap)`` — SQL-expressible, so the
    oracle mirrors it exactly), and pairs are generated within
    sub-blocks only.  Cost becomes ≤ n·cap, linear at any corpus size;
    the trade is the same as every blocked pass — pairs straddling a
    sub-block boundary are missed (a cap below the true duplicate-
    cluster size splits clusters).  A block no larger than the cap is a
    single sub-block, so capping is output-identical until blocks
    outgrow it.  :func:`embedding_dup_pairs_ivf` with
    ``target_block_size`` remains the prescribed corpus-scale form (its
    blocking adapts to the vectors; this cap is a guardrail for the
    metadata-label variant).
    """
    from datafusion_bigtable_spark.operators.similarity import as_double_vec, dot_raw, norm

    # Precompute per vector (not per pair): the norm AND the double-cast
    # array — each scored pair then folds cast-free exactly once.
    withn = embeddings.withColumn("_norm", norm(F.col(vec_col))).withColumn(
        "_dv", as_double_vec(F.col(vec_col))
    )
    join_keys = [block_col]
    if block_cap is not None:
        # One window shuffle on the block key (linear; the JOIN blowup is
        # the quadratic killer this bounds).  rank is dense from 0 within
        # each block in id order — deterministic for unique ids.
        w = W.partitionBy(block_col).orderBy(id_col)
        withn = withn.withColumn(
            "_sub", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(block_cap))
        )
        join_keys.append("_sub")
    a = withn.alias("a")
    b = withn.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in join_keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    j = a.join(b, cond)
    c = F.round(
        dot_raw(F.col("a._dv"), F.col("b._dv")) / (F.col("a._norm") * F.col("b._norm")), 6
    )
    return (
        j.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            c.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_ivf(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    codebook: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index=None,
    target_block_size: int | None = None,
    pair_salt: int = 1,
) -> DataFrame:
    """IVF-cell-blocked near-duplicate pairs — the corpus-scale variant
    :func:`embedding_dup_pairs` prescribes: the blocking key comes from
    the VECTORS themselves (argmax-cosine cell over a broadcast
    codebook, similarity.py build_ivf_index) instead of a metadata
    label, so it exists for any corpus and its granularity is a knob.

    Cost is Σ|cell|² with ~n/n_cells per cell — raising ``n_cells``
    shrinks every bucket, the same dial as IVF search; a label column
    fixes the block count at however many labels the data happens to
    have.  Same blind spot as every blocked pass: near-dups straddling a
    cell boundary are missed (mitigate with a trained codebook or by
    unioning a second blocking, e.g. LSH buckets).

    The pair stream shuffles (cell, id, vector) once on the cell key;
    centroids broadcast.  ``index=build_ivf_index(...)`` reuses a
    caller-owned assignment and returns a LAZY result; without one a
    throwaway index is built persisted, the (threshold-bounded) pair set
    is materialized eagerly, and the cache is dropped before returning
    (similarity.materialize_owned — VERDICT r9 #3 resolved the
    leak-vs-recompute dilemma this way after persist=False cost a 1.5×
    bench regression).

    ``target_block_size`` is the corpus-relative dial (VERDICT r8 #2): a
    FIXED ``n_cells`` keeps Σ|cell|² quadratic in corpus size — blocks
    grow with the data.  With a target, ``n_cells`` is derived as
    ⌈corpus / target⌉ (one cheap count job on the id column), so expected
    block size — and therefore per-cell pair cost — stays constant at any
    corpus size; total cost is then ~corpus × target, linear.  Explicit
    ``n_cells`` acts as a floor.  The seed codebook is the first
    ``n_cells`` vectors by id (SQL-expressible: ``vec_id < derived``), so
    the derived setting stays fully oracle-checkable.  Two contracts
    (ADVICE r9): the dial applies ONLY to the seed-codebook throwaway
    path — combining it with ``codebook=``/``index=`` raises instead of
    silently ignoring the target — and the ``id < n_cells`` seeding
    assumes ids are DENSE from 0 (true of the testdata); with sparse ids
    fewer than ``n_cells`` seeds exist and blocks run larger than the
    target (seed from a rank over ids if that matters).
    """
    from datafusion_bigtable_spark.operators.similarity import (
        build_ivf_index,
        dot_raw,
        materialize_owned,
    )

    owned = index is None
    if target_block_size is not None and (codebook is not None or index is not None):
        raise ValueError(
            "target_block_size derives the number of SEED cells and is "
            "incompatible with an explicit codebook/index — the supplied "
            "codebook fixes its own cell count, so block sizes would "
            "silently stay quadratic despite the target"
        )
    if owned:
        if target_block_size is not None:
            n = embeddings.select(id_col).count()
            n_cells = max(n_cells, -(-n // max(1, target_block_size)))
        index = build_ivf_index(
            embeddings, n_cells=n_cells, nprobe=1, codebook=codebook,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = index.assignments.filter(F.col("_rn") == 1)
    a = assigned.select(
        F.col("cell"), F.col(id_col).alias("id_a"),
        F.col("_dv").alias("av"), F.col("_n").alias("an"),
    )
    b = assigned.select(
        F.col("cell"), F.col(id_col).alias("id_b"),
        F.col("_dv").alias("bv"), F.col("_n").alias("bn"),
    )
    c = F.round(dot_raw(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    if pair_salt > 1:
        # Hot-cell salting (r19, guide §2.5): seed-codebook assignment is
        # SKEWED — measured at sf10, median cell 99 rows vs max 1606, so
        # the Σ|cell|² scoring of one hot cell owns a whole task and the
        # pair stage ran at ~1/3 of the cluster (wall 19.8 s vs 7.4 s of
        # CPU/32; AQE's skew-join split never fires because these
        # partitions sit far under its 256 MB byte threshold — the skew
        # is COMPUTE per row, not bytes).  Salt the A side by a
        # DETERMINISTIC id hash (retry-safe, guide §2.5's rand() caveat)
        # and replicate the B side pair_salt ways: every (a, b) pair
        # still meets exactly once — on the B replica carrying a's salt —
        # so the pair set is IDENTICAL while the per-task work bound
        # drops pair_salt-fold.  Callers derive pair_salt from corpus
        # size (1 = off, byte-identical plan at the oracle-tested SFs;
        # the replicated shuffle only pays where the skew lives).
        a = a.withColumn("_s", F.pmod(F.xxhash64(F.col("id_a")), F.lit(pair_salt)))
        b = b.withColumn(
            "_s", F.explode(F.array(*[F.lit(i).cast("long") for i in range(pair_salt)]))
        )
        join_keys = ["cell", "_s"]
    else:
        join_keys = ["cell"]
    pairs = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", c.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return materialize_owned(pairs, index) if owned else pairs


# -------------------------------------------------------- decontamination --


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-set decontamination: per corpus doc, the fraction of its
    word ``k``-gram shingles that appear ANYWHERE in the benchmark/eval
    set, plus a ``contaminated`` flag at ``threshold``.

    The asymmetric twin of pairwise near-dup: eval sets are tiny next to
    a training corpus, so the benchmark's distinct shingles BROADCAST and
    the corpus-side cost is one shuffle on doc id (which the shingle
    window already established — the groupBys below reuse its clustering,
    no further exchange).  Overlap-vs-benchmark (not pairwise Jaccard) is
    the standard contamination metric: a 100-token eval question fully
    contained in a 10k-token document is contamination even though the
    pair's Jaccard is tiny.

    Output: (id, n_shingles, overlap rounded 4, contaminated).  Docs with
    fewer than ``k`` words carry no shingles and are absent — they cannot
    meaningfully overlap.
    """
    c_sh = shingles(corpus, k=k, text_col=text_col, id_col=id_col)
    b_sh = (
        shingles(benchmark, k=k, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    scored = (
        c_sh.join(F.broadcast(b_sh.withColumn("_hit", F.lit(1))), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("_n_hit"),
        )
    )
    frac = F.col("_n_hit") / F.col("n_shingles")
    return scored.select(
        "id",
        "n_shingles",
        F.round(frac, 4).alias("overlap"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


# ------------------------------------------------- exact substring spans --

def substring_span_pairs(
    docs: DataFrame,
    n: int = 5,
    min_span_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
) -> DataFrame:
    """Document pairs sharing an EXACT word span of ≥ ``min_span_words`` —
    the span-level exact-match dedup of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022), re-expressed without the
    suffix array: a shared span of length L appears as a DIAGONAL run of
    L−n+1 consecutive positional n-gram matches (``pa − pb`` constant, pa
    consecutive), so runs over the gram-match stream recover exactly the
    spans a suffix array would, for spans up to the gram resolution.

    Output: (doc_a, doc_b, max_span_words, n_spans) with doc_a < doc_b —
    one row per pair, its longest shared span and how many maximal shared
    spans (distinct diagonals × runs) clear the threshold.

    Scale shape (100 TB):
    - positional grams via posexplode + lead windows, ONE regex per doc
      (the per-element recompute hazard documented at shingles());
    - inverted-list pair generation on the gram key — one shuffle, no
      self-join (jaccard_pairs' measured-2× idiom), with the same
      window-based ``df_cap`` guard: a gram occurring > df_cap times is
      dropped BEFORE collect_list, bounding every bucket to ≤ df_cap²
      pairs (hot boilerplate grams are exactly the ones that would melt a
      bucket AND carry no span signal — they match everywhere);
    - run detection is one window shuffle on (pair, diagonal) over the
      DISTINCT match stream, then two cheap aggregates.  Nothing holds
      more than a bucket or a window partition.

    Like the suffix-array method, sub-gram spans (< n words) are
    invisible; unlike it, nothing is ever globally sorted.

    ``df_cap`` semantics (pinned by
    tests/test_extensions.py::test_substring_span_hot_gram_splits_run):
    the cap drops hot GRAM POSITIONS, not documents — a gram repeated
    > df_cap times across the corpus that occurs INSIDE an otherwise-rare
    shared span removes that one diagonal position and SPLITS the run, so
    the pair reports two shorter maximal spans (each still counted when
    ≥ min_span_words) instead of one long one.  Deliberate: a
    corpus-hot gram is boilerplate with no pair-discriminating signal,
    and re-admitting it per-pair would re-create exactly the Σ|bucket|²
    blow-up the cap exists to bound.  The registered oracle implements
    the same drop-then-split, so engine and oracle agree by
    construction.
    """
    min_run = min_span_words - n + 1
    if min_run < 1:
        raise ValueError(f"min_span_words ({min_span_words}) must be >= n ({n})")
    from datafusion_bigtable_spark.operators.partitioning import widen_if_narrow

    # widen first: the regex word-split + posexplode run BEFORE this
    # plan's first exchange and would otherwise inherit the scan's split
    # count (2 at sf1) — every consumer downstream shuffles the exploded
    # rows anyway, so the one raw exchange is pure parallelism
    w = words(F.col(text_col))
    ex = widen_if_narrow(docs, id_col).select(
        F.col(id_col).alias("id"), F.posexplode(w).alias("pos", "w0")
    )
    win = W.partitionBy("id").orderBy("pos")
    parts = [F.col("w0")] + [F.lead("w0", j).over(win) for j in range(1, n)]
    grams = (
        ex.select(
            "id",
            "pos",
            F.lead("w0", n - 1).over(win).alias("_tail"),
            F.concat_ws(" ", *parts).alias("gram"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("id", "pos", "gram")
    )
    if df_cap is not None:
        wg = W.partitionBy("gram")
        grams = (
            grams.withColumn("_df", F.count("*").over(wg))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    lists = (
        grams.groupBy("gram")
        .agg(F.array_sort(F.collect_list(F.struct("id", "pos"))).alias("occ"))
        .filter(F.size("occ") >= 2)
    )
    pairs = (
        lists.select(
            F.explode(
                F.expr(
                    "flatten(transform(occ, (x, i) -> "
                    "transform(slice(occ, i+2, size(occ)-i-1), y -> "
                    "struct(x.id AS id_a, y.id AS id_b, x.pos AS pa, y.pos AS pb))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.pa", "p.pb")
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    diag = pairs.withColumn("diag", F.col("pa") - F.col("pb"))
    wr = W.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = diag.withColumn("grp", F.col("pa") - F.row_number().over(wr))
    spans = (
        runs.groupBy("id_a", "id_b", "diag", "grp")
        .agg(F.count("*").alias("run"))
        .filter(F.col("run") >= min_run)
    )
    return spans.groupBy("id_a", "id_b").agg(
        (F.max("run") + F.lit(n - 1)).cast("long").alias("max_span_words"),
        F.count("*").alias("n_spans"),
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "max_span_words",
        "n_spans",
    )


# ----------------------------------------------------- line-level dedup --


def line_dedup(
    docs: DataFrame,
    line_words: int = 4,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style repeated-line removal (Raffel et al. 2020 §2.2 drop any
    line occurring ≥3 times in the corpus; Gopher/RefinedWeb keep the
    same rule) — the REWRITE twin of the boilerplate n-gram GATE
    (boilerplate.py flags whole documents; this removes the offending
    spans and keeps the rest).

    The corpus here is newline-free synthetic text, so a "line" is a
    deterministic segmentation: consecutive ``line_words``-word windows
    of the lowercased word stream (the same :func:`words` normalization
    every text operator uses).  A line kept by < ``min_df`` documents
    survives; a corpus-frequent line is cut from EVERY document, and the
    document is rebuilt from its surviving lines in order.  Documents
    whose every line is boilerplate drop out entirely (C4 drops empty
    docs).

    Scale shape (the part that matters at 100 TB): segmentation is a
    narrow per-row fan-out fused into the scan; the corpus-wide line
    frequency is a map-side-combined groupBy (duplicate lines collapse
    BEFORE the wire — a window count would shuffle every seg row
    uncombined), and the surviving frequent-line set is naturally tiny
    (boilerplate lines), so both joins AQE-broadcast.  The REBUILD is
    array-local (r12): the doc joins only its own DROPPED indexes — a
    per-doc aggregation of the boilerplate HITS, which shuffles hit rows
    only — and filters its in-row segment array by index, so no
    corpus-sized exchange exists anywhere in the plan.  (The previous
    form exploded every surviving segment through a doc-key rebuild
    shuffle: re-serializing the whole corpus to reassemble what the
    source row already held in order.  Measured at sf1: 47.3 → ~17 s.)
    Two segmentation passes remain (discover + apply) — the no-cache
    trade; a corpus-sized persist is not a 100 TB option.
    """
    # Parallelism guard (the exchange-removal trap): with no corpus
    # shuffle left in this plan the heavy segmentation passes inherit
    # the scan's input splits (measured: 2-partition sf1 scan → both
    # passes on 2 of 32 cores, 59.6 s; widened 21.6 s).
    from datafusion_bigtable_spark.operators.partitioning import widen_if_narrow

    docs = widen_if_narrow(docs, id_col)
    # Materialize the word array in its OWN Project before segmenting:
    # inlined into the transform lambda, the regex split re-evaluates per
    # SEGMENT (the shingles() pathology — O(segments) regex runs per doc);
    # as a column reference it runs once per row.
    wdocs = docs.select(
        F.col(id_col), words(F.col(text_col)).alias("_w")
    ).filter(F.size("_w") > 0)
    nseg = F.ceil(F.size("_w") / F.lit(line_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(F.col("_w"), i * line_words + 1, line_words), " "),
    )
    d = wdocs.select(F.col(id_col), segs.alias("_segs"))
    seg_rows = d.select(id_col, F.posexplode("_segs").alias("seg_idx", "line"))
    frequent = (
        seg_rows.groupBy("line")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("line")
    )
    # hit rows (boilerplate only) shuffle; everything else stays in place
    drops = (
        seg_rows.join(frequent, "line")
        .groupBy(id_col)
        .agg(F.collect_set("seg_idx").alias("_drop"))
    )
    kept_arr = F.filter(
        F.transform(F.col("_segs"), lambda s, i: F.struct(i.alias("i"), s.alias("s"))),
        lambda x: ~F.array_contains(F.col("_drop"), x["i"]),
    )
    return (
        d.join(drops, id_col, "left")
        .withColumn("_drop", F.coalesce(F.col("_drop"), F.array().cast("array<int>")))
        .select(
            id_col,
            F.size(kept_arr).cast("long").alias("kept_lines"),
            F.size("_drop").cast("long").alias("dropped_lines"),
            F.array_join(F.transform(kept_arr, lambda x: x["s"]), " ").alias("kept_text"),
        )
        .filter(F.col("kept_lines") > 0)  # all-boilerplate docs drop (C4)
    )


# ------------------------------------------------- incremental ingestion --


def incremental_ingest_dedup(
    docs: DataFrame,
    batch_pred,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingestion-time dedup: which INCOMING documents near-duplicate the
    EXISTING corpus — the shape a continuously-fed 100 TB pipeline runs
    on every batch (dedup-within-corpus answers a different question:
    this is new-vs-index, the LSH analogue of decontaminate's exact
    anti-join).

    ``batch_pred`` splits ``docs`` into the incoming batch (pred true)
    and the index (pred false) — two DISJOINT subsets, so the shingle +
    minhash work totals ONE corpus pass split across two scans, each
    with the predicate pushed down.  Band signatures join batch→index on
    (band, band_sig) — the batch side is small by nature and AQE
    broadcasts it, so the INDEX NEVER SHUFFLES (the property that makes
    per-batch cost O(batch + collisions), not O(corpus)); candidates
    then verify with exact Jaccard computed only over candidate ids'
    shingle sets.

    Output: (new_doc_id, matched_doc_id, jaccard ≥ threshold, rounded 4)
    — the keep/drop evidence an ingest gate acts on.
    """
    newb = _band_signatures(docs.filter(batch_pred), bands, rows_per_band, k, text_col, id_col)
    idx = _band_signatures(docs.filter(~batch_pred), bands, rows_per_band, k, text_col, id_col)
    cand = (
        newb.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        .select(F.col("a.id").alias("nid"), F.col("b.id").alias("xid"))
        .distinct()
    )
    sh_new = shingles(docs.filter(batch_pred), k, text_col, id_col)
    sh_idx = shingles(docs.filter(~batch_pred), k, text_col, id_col)
    inter = (
        cand.join(sh_new.select(F.col("id").alias("nid"), "shingle"), "nid")
        .join(sh_idx.select(F.col("id").alias("xid"), "shingle"), ["xid", "shingle"])
        .groupBy("nid", "xid")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes_new = sh_new.groupBy("id").agg(F.count("*").alias("n_a"))
    sizes_idx = sh_idx.groupBy("id").agg(F.count("*").alias("n_b"))
    return (
        inter.join(sizes_new.select(F.col("id").alias("nid"), "n_a"), "nid")
        .join(sizes_idx.select(F.col("id").alias("xid"), "n_b"), "xid")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("nid").alias("new_doc_id"),
            F.col("xid").alias("matched_doc_id"),
            "jaccard",
        )
    )
