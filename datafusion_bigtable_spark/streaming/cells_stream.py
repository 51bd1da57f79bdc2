"""Structured Streaming over the event/cells model.

The reference has NO streaming (reads are one-shot gRPC,
src/execute_plan.rs:183) — this module is the §7 extension: the same
declarative surface, incrementalized.  A cells store written continuously
(Bigtable's actual write pattern) becomes a `readStream` source; windowed
aggregations with watermarks handle late cells; `session_window` gives the
stateful sessionization twin of the batch `events_sessionize` query.

Local tests drive a parquet-backed stream through a memory sink with
``processAllAvailable()`` — the same plan incrementalized over micro-
batches; on a cluster the source would be Kafka/files-on-arrival and the
sink a Delta/parquet table with checkpointing.
"""

from __future__ import annotations

import contextlib
import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# Session confs the stream-building path may override.  Structured Streaming
# CLONES the session state when a query starts (MicroBatchExecution runs on
# spark.cloneSession()), so values are snapshotted at .start() — restoring
# them afterwards cannot mis-decode a running stream, and two streams over
# stores with different ts flavors each keep the snapshot they started with.
_STREAM_CONF_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.shuffle.partitions",
    "spark.sql.streaming.checkpoint.fileChecksum.enabled",
)


@contextlib.contextmanager
def scoped_stream_confs(spark: SparkSession):
    """Restore stream-related session confs on exit (ADVICE r5: building a
    stream must not permanently change the caller's session).  Wrap the
    build-plan → .start() sequence; the started query keeps its cloned
    snapshot regardless of the restore."""
    prior = {}
    for k in _STREAM_CONF_KEYS:
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
    try:
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                with contextlib.suppress(Exception):
                    spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def _events_ts_unit(sf_dir: str, glob_pat: str = "events.parquet") -> str:
    """Read the parquet logical type of ``ts`` from one file footer.

    Driver-side, O(1): one footer, no data pages.  The streaming source
    needs a *declared* schema, so we must know up front whether the writer
    stored TIMESTAMP(MICROS) (Spark/pandas default), TIMESTAMP(NANOS)
    (pandas with ns-preserving writers), or a raw int64 — guessing wrong
    silently shifts every event time by 1000x (the r4 regression: µs read
    as ns put a month of events on 1970-01-20).
    """
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(sf_dir, glob_pat)))
    if not files:
        raise FileNotFoundError(f"no {glob_pat} under {sf_dir}")
    t = pq.ParquetFile(files[0]).schema_arrow.field("ts").type
    s = str(t)
    if s.startswith("timestamp[ns"):
        return "ns"
    if s.startswith("timestamp["):
        return "us"  # us/ms both surface as Spark TimestampType natively
    if s in ("int64", "long"):
        return "long_us"
    raise TypeError(f"unsupported events.ts parquet type: {t}")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file stream source requires a *directory*; select just the events
    # table with a glob filter.  UTC pin: window starts are formatted to
    # strings and must not shift with the caller session's timezone.
    #
    # This sets session confs the stream must see at .start() (the query
    # clones them then).  Callers composing their own stream should wrap
    # build→start in ``scoped_stream_confs(spark)`` so their session is
    # restored afterwards — ``run_events_stream_to_memory`` does.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        # Spark can't declare TIMESTAMP(NANOS); read as long + rebuild µs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema, decode = _events_schema(T.LongType()), lambda c: F.timestamp_micros(
            F.expr(f"{c} div 1000")
        )
    elif unit == "long_us":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        schema, decode = _events_schema(T.LongType()), F.timestamp_micros
    else:  # native timestamp — passthrough
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        schema, decode = _events_schema(T.TimestampType()), F.col
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", decode("ts"))


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file stream — the shape of a crawl feed
    landing in object storage.  Declared schema (file streams require
    one); no timestamp decode needed."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def streaming_curation_filter(docs: DataFrame) -> DataFrame:
    """Streaming curation gate: the scan-fused keep/drop verdict
    (functions.text.curation_reason — the SAME expression the batch
    query and the pipeline use, so the decision cannot drift) applied
    per micro-batch.  Stateless — no watermark, no state store, append
    mode — so the streamed output equals the batch gate EXACTLY and the
    operator scales as a pure map over the firehose: curation is the
    first stage a crawl pipeline wants ON the stream, dropping junk
    before it ever lands in the corpus store."""
    from datafusion_bigtable_spark.functions.text import curation_reason

    reason = curation_reason(F.col("text"))
    return docs.select(
        "doc_id", reason.alias("reason"), (reason == "keep").alias("keep")
    )


def streaming_ingest_dedup(
    new_docs: DataFrame,
    index_docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.incremental_ingest_dedup``:
    the incoming-doc STREAM matched against a STATIC corpus index — the
    production shape of ingestion dedup (the feed arrives continuously;
    the index is yesterday's corpus).

    Per-row streaming side, no stateful aggregation anywhere: the
    minhash pipeline that batch code runs as explode+groupBy is
    re-expressed as pure array expressions (shingle array → per-seed
    ``array_min`` of md5 — identical strings, identical minima), so band
    signatures are a narrow map over the stream.  Candidates come from a
    stream-static equi join on (band, band_sig) against the
    batch-computed index signatures; Jaccard verifies per row via
    ``array_intersect`` with the index doc's (distinct) shingle array —
    again stateless.  The only state is the final ``dropDuplicates`` on
    the pair key (a candidate can collide on several bands): bounded by
    matched-pair cardinality; at 100 TB/day use
    ``dropDuplicatesWithinWatermark`` keyed on arrival time, as
    streaming_distinct_pairs documents.

    Emits (new_doc_id, matched_doc_id, jaccard ≥ threshold, rounded 4) —
    byte-equal to the batch operator over the same document set, which
    is exactly what the oracle pins.
    """
    from datafusion_bigtable_spark.functions.text import words
    from datafusion_bigtable_spark.operators.dedup import shingles

    num_hashes = bands * rows_per_band
    # The file-stream source delivers one partition per input file, so the
    # per-row minhash CPU (8 HOF md5 passes over every shingle) otherwise
    # runs in ONE task per micro-batch (measured: 2.0 s of the query's
    # 5.5 s warm wall at sf0.1 in a single task).  A deterministic hash
    # repartition on doc_id (guide §2.5: never rand-derived under retries)
    # spreads it across the streaming shuffle-partition count; the moved
    # bytes are just the incoming batch's raw rows.
    new_docs = new_docs.repartition(F.col("doc_id"))
    base = new_docs.select("doc_id", words(F.col("text")).alias("_w"))
    sh_arr = F.when(
        F.size("_w") >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("_w", i + j) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_sh = base.select("doc_id", sh_arr.alias("_sh")).filter(F.size("_sh") > 0)
    mh = [
        F.array_min(
            F.transform(F.col("_sh"), lambda x: F.md5(F.concat(F.lit(f"{s}|"), x)))
        ).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    sig = with_sh.select("doc_id", "_sh", *mh)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.array(
                            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                        )
                    ),
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    stream_banded = sig.select(
        F.col("doc_id").alias("nid"), "_sh", F.explode(band_structs).alias("x")
    ).select("nid", "_sh", F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig"))

    # Static side: ONE shingle chain instead of two (r18).  The previous
    # form ran _band_signatures(index) AND shingles(index)+collect_list —
    # two full scan+explode+window chains per micro-batch — then joined
    # candidates back to the arrays on xid, which (no AQE inside a
    # micro-batch plan) shuffled every index doc's shingle array per
    # batch.  Now the shingle chain runs once, ends in collect_set (the
    # distinct folds into the aggregate, and the window's id-exchange is
    # reused — zero extra shuffles), and the per-seed minima + band sigs
    # derive from the array row-locally with the SAME md5 expressions the
    # stream side uses (identical strings over the identical distinct
    # shingle set ⇒ identical minima ⇒ identical band signatures; the
    # array order collect_set loses was never observable — consumers use
    # only size() and array_intersect()).  Carrying _xsh through the band
    # explode removes the xid join outright, and the tiny incoming batch
    # is broadcast so the index side is never shuffled — per-batch cost is
    # one index scan + one id-exchange, O(corpus) bytes moved once.
    xarr = (
        shingles(index_docs, k, "text", "doc_id")
        .groupBy("id")
        .agg(F.collect_set("shingle").alias("_xsh"))
    )
    xmh = [
        F.array_min(
            F.transform(F.col("_xsh"), lambda x: F.md5(F.concat(F.lit(f"{s}|"), x)))
        ).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    idx_banded = (
        xarr.select(F.col("id").alias("xid"), "_xsh", *xmh)
        .select("xid", "_xsh", F.explode(band_structs).alias("x"))
        .select("xid", "_xsh", F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig"))
    )
    cand = idx_banded.join(F.broadcast(stream_banded), ["band", "band_sig"])
    inter = F.size(F.array_intersect(F.col("_sh"), F.col("_xsh")))
    jac = F.round(
        inter.cast("double")
        / (F.size("_sh") + F.size("_xsh") - inter).cast("double"),
        4,
    )
    return (
        cand.select(
            F.col("nid").alias("new_doc_id"),
            F.col("xid").alias("matched_doc_id"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .dropDuplicates(["new_doc_id", "matched_doc_id"])
    )


def streaming_hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).

    ``withWatermark`` bounds state: windows more than 2 h behind the max
    event time are finalized and dropped from the state store — the knob
    that keeps state size constant at 100 TB/day event rates.
    """
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def streaming_session_window(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Stateful sessionization via session_window — the streaming twin of
    the batch lag+cumsum sessionizer (queries.events_sessionize)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sess.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def streaming_distinct_pairs(events: DataFrame) -> DataFrame:
    """Streaming exact dedup — the incremental twin of the batch
    ``dedup_exact`` surface: ``dropDuplicates`` keeps per-key state so each
    (user_id, event_type) pair is emitted exactly once across all
    micro-batches.  Projecting ONLY the key columns makes the result
    order-independent (any representative row collapses to the same
    tuple), so the streamed output equals batch SELECT DISTINCT.

    Without a watermark the dedup state grows with key cardinality — fine
    for bounded keyspaces (this one is |users|×|types|); unbounded keys at
    100 TB use ``withWatermark`` + ``dropDuplicatesWithinWatermark`` so
    state ages out with event time.
    """
    return events.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])


def streaming_distinct_pairs_watermarked(
    events: DataFrame, delay: str = "40 days"
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    ages dedup state out once the watermark passes a key's last-seen event
    time — the variant an UNBOUNDED keyspace needs at 100 TB (plain
    dropDuplicates state grows forever).  The trade: a duplicate arriving
    after its key's state expired is re-emitted, so the guarantee is
    at-least-once-distinct within the delay, not global exactness.  With
    ``delay`` covering the data span (tests), output equals SELECT
    DISTINCT exactly."""
    return (
        events.withWatermark("ts", delay)
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def streaming_enriched_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension (Spark plans it as a broadcast hash join per batch —
    no stream-side shuffle), then a global aggregate maintains running
    counts.  The canonical 100 TB/day enrichment shape: facts stream,
    dimensions broadcast."""
    joined = events.join(
        F.broadcast(dim.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")),
        "user_id",
    )
    return (
        joined.groupBy("event_type", "c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
    )


def streaming_attribution_join(
    clicks: DataFrame, purchases: DataFrame, window: str = "30 minutes"
) -> DataFrame:
    """Watermarked stream-stream join — the attribution shape: each
    purchase joins the same user's clicks from the preceding ``window``.

    The hardest streaming operator Spark offers: BOTH sides buffer state,
    and the watermark + time-range condition are what let the engine
    eventually DROP it — a click older than (watermark − window) can never
    match a future purchase, so its state evicts.  Without the time bound
    the join state grows with the stream; with it, state is
    O(events per window), independent of stream length.  Output in append
    mode equals the batch self-join exactly.
    """
    c = clicks.withWatermark("ts", "2 hours").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", "2 hours").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {window}"
        ),
        "inner",
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")


def streaming_user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    totals maintained across micro-batches.

    This is the shape for operators Spark's built-ins can't express —
    arbitrary per-key state (counters, HLL sketches, model features)
    updated incrementally.  State lives in the state store (checkpointed,
    partitioned by key); each micro-batch delivers that key's new rows as
    pandas frames.  Timeouts would evict idle keys at scale.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("value_sum", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 4)]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def run_events_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    agg: str = "hourly",
    query_name: str = "dbs_stream_out",
) -> DataFrame:
    """Drive the streaming plan over the parquet events to completion and
    return the materialized result table (synchronous; test/driver path).

    The whole build→start sequence runs under ``scoped_stream_confs``: the
    started query keeps its conf snapshot, the caller's session comes back
    exactly as it was (timezone, nanosAsLong, shuffle partitions)."""
    with scoped_stream_confs(spark):
        events = read_events_stream(spark, sf_dir)
        if agg == "hourly":
            plan, mode = streaming_hourly_agg(events), "complete"
        elif agg == "stateful":
            plan, mode = streaming_user_totals_stateful(events), "update"
        elif agg == "dedup":
            plan, mode = streaming_distinct_pairs(events), "append"
        elif agg == "dedup_watermarked":
            plan, mode = streaming_distinct_pairs_watermarked(events), "append"
        elif agg == "attribution":
            # stream-stream: each side is its OWN source (independent offsets,
            # as a real click/purchase topic pair would be)
            clicks = events.filter(F.col("event_type") == "click")
            purchases = read_events_stream(spark, sf_dir).filter(
                F.col("event_type") == "purchase"
            )
            plan, mode = streaming_attribution_join(clicks, purchases), "append"
        elif agg == "enrich":
            import os

            dim = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
            plan, mode = streaming_enriched_counts(events, dim), "complete"
        elif agg == "curation":
            # stateless map over a DOCUMENTS stream (events unused)
            docs = read_documents_stream(spark, sf_dir)
            plan, mode = streaming_curation_filter(docs), "append"
        elif agg == "ingest_dedup":
            # incoming-batch stream (doc_id % 10) vs static corpus index
            import os

            docs = read_documents_stream(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
            index = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
                F.col("doc_id") % 10 != 0
            )
            plan, mode = streaming_ingest_dedup(docs, index), "append"
        else:
            plan, mode = streaming_session_window(events), "complete"
        # Streaming state-store cost scales with the shuffle-partition count
        # fixed at query start (one store per partition per micro-batch) — for
        # a small keyspace, 8 partitions cut stateful-query wall time ~2.5×
        # vs 32.  A real deployment sizes this to key cardinality once.
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(min(int(prev_parts), 8)))
        # This harness's checkpoint is EPHEMERAL (temp location, deleted on
        # stop) — Spark 4.1's per-file checkpoint checksums (an integrity
        # layer for durable checkpoints a recovery will re-read) protect
        # nothing here and cost one extra awaited companion write per state
        # file per batch: thread dumps showed every state-store commit task
        # parked in ChecksumCancellableFSDataOutputStream.close, and the
        # stream-stream join writes 4 state files per partition per batch.
        # Interleaved A/B (streaming_attribution_join, sf0.1): 0.6-0.9×.
        # The durable foreachBatch store streams (index/postings/takedown)
        # keep the default: their checkpoint IS the replay contract.
        spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        q = (
            plan.writeStream.outputMode(mode)
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(query_name)
