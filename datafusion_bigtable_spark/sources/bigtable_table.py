"""High-level table assembly — the Spark equivalent of registering a
``BigtableDataSource`` with DataFusion (reference src/datasource.rs:195-198).

``BigtableTable(config).to_df(spark, predicates)`` produces the declared
relational view from the cells store:

    read cells parquet                     (A1 scan; parquet stats prune)
    → family filter                        (A10, composer.rs:254-256)
    → key-range filter from the composer   (A3-A8 partition pruning)
    → latest-version filter                (A11, CellsPerColumnLimitFilter)
    → cell→row pivot                       (A13, execute_plan.rs:223-271)
    → composite-key split                  (A14, execute_plan.rs:226-251)
    → typed decode                         (A15, execute_plan.rs:283-304)
    → declared column order                (schema, datasource.rs:68-79)

All steps are Catalyst expressions — the whole pipeline is one shuffle
(the pivot's hash aggregate) and stays in whole-stage codegen.

Inexact-pushdown semantics (A16, datasource.rs:163-165): the composer's
ranges only *prune*; when the caller supplies predicates we do NOT assume
they are fully applied — callers re-filter above (Spark re-applies WHERE
clauses above any source automatically, so registering the view and
querying with the same WHERE reproduces the reference's correctness net).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from datafusion_bigtable_spark.config import RESERVED_TIMESTAMP, BigtableTableConfig
from datafusion_bigtable_spark.operators.decode import decode_value
from datafusion_bigtable_spark.operators.pivot import latest_cells, pivot_cells, split_row_key
from datafusion_bigtable_spark.plans.composer import (
    KeyRange,
    Predicate,
    compose,
    key_range_predicate,
)
from datafusion_bigtable_spark.sources.cells import read_cells


def _bridge_bind_host(master: str, driver_host: str | None) -> str:
    """Bind/advertise interface for the job-lifetime mutate() wire bridge.

    A loopback bind made bridged-service mutate local-mode-only — remote
    executors cannot reach the driver's 127.0.0.1 (ADVICE r12).  Bind the
    NARROWEST interface that serves the deployment (review r13 #4 — the
    bridge is unauthenticated, so 0.0.0.0 would expose write access on
    every interface): in local mode executors are threads in this process,
    loopback suffices; on a cluster bind and advertise the resolved driver
    host.  The bind interface and the address executors dial are the SAME
    value by construction — there is no advertise-what-you-didn't-bind
    split.  Fails loud when ``spark.driver.host`` is unset in non-local
    mode (ADVICE r13) instead of falling back to an all-interfaces bind.
    """
    if master.startswith("local"):
        return "127.0.0.1"
    if not driver_host:
        raise RuntimeError(
            "mutate(): spark.driver.host is unset in non-local mode — "
            "cannot advertise the write bridge without binding every "
            "interface; set spark.driver.host or use a WireBigtableClient "
            "service"
        )
    return driver_host


class GCWatermarkWarning(UserWarning):
    """An as-of read bounded at or before the store's GC watermark — the
    requested snapshot may be missing garbage-collected versions."""


class GCWatermarkError(RuntimeError):
    """Strict-mode twin of GCWatermarkWarning (to_df(strict_as_of=True))."""


class BigtableTable:
    def __init__(self, config: BigtableTableConfig, service=None):
        #: optional live ReadRows service (real SDK client adapter or the
        #: in-process fake, sources/fake_bigtable.py).  When set, reads go
        #: through grpc_transport.fetch_cells — the reference's actual
        #: execution path (execute_plan.rs:168-212) — instead of the
        #: parquet stand-in.  The response is materialized on the driver
        #: (exactly like the reference collects the RPC response into
        #: RecordBatches); for 100 TB-scale data use cells_path parquet.
        self.config = config
        self.service = service

    # -- pruning ----------------------------------------------------------
    def key_ranges(self, predicates: Iterable[Predicate]) -> list[KeyRange]:
        from datafusion_bigtable_spark.plans.keycodec import encode_predicates

        return compose(
            encode_predicates(
                predicates, self.config.table_partition_cols, self.config.key_types
            ),
            self.config.table_partition_cols,
            self.config.table_partition_separator,
            allow_full_scan=self.config.allow_full_scan,
        )

    # -- assembly ---------------------------------------------------------
    def cells(
        self,
        spark: SparkSession,
        ranges: Sequence[KeyRange] = (),
        as_of=None,
        strict_as_of: bool = False,
        value_filters: Sequence[tuple[str, str, object]] = (),
        rows_limit: int | None = None,
    ) -> DataFrame:
        if self.service is not None:
            # Live ReadRows path: ranges + filter chain are pushed INTO the
            # request (server-side pruning), the cell stream comes back as
            # a local DataFrame.  Mirrors execute_plan.rs:168-212.
            from datafusion_bigtable_spark.sources.cells import (
                CELLS_SCHEMA,
                _naive_datetime_to_us,
                _us_to_naive_datetime,
            )
            from datafusion_bigtable_spark.sources.grpc_transport import fetch_cells

            as_of_us = _naive_datetime_to_us(as_of) if as_of is not None else None
            rows = [
                (rk, fam, q, _us_to_naive_datetime(ts), val)
                for rk, fam, q, ts, val in fetch_cells(
                    self.config,
                    ranges,
                    service=self.service,
                    as_of_us=as_of_us,
                    value_preds=tuple(value_filters),
                    rows_limit=rows_limit,
                )
            ]
            return spark.createDataFrame(rows, CELLS_SCHEMA)
        if rows_limit is not None:
            raise ValueError(
                "rows_limit is a ReadRows request field (service transport "
                "only); on the parquet path cap relationally — to_df's "
                "rows_limit does this for you"
            )
        if not self.config.cells_path:
            raise NotImplementedError(
                "no transport: set cells_path to a parquet cells store, or "
                "pass a ReadRows service (real client or the in-process "
                "fake, sources/fake_bigtable.py)"
            )
        df = read_cells(spark, self.config.cells_path)
        if as_of is not None:
            # Time travel vs GC: a version-GC compaction drops cell
            # versions and records the newest dropped ts in the store's
            # watermark sidecar.  An as-of read bounded at or before that
            # instant can no longer reconstruct the snapshot that was live
            # then (Bigtable has the same property: GC'd cells are
            # unreadable at any timestamp) — silent plausible-but-wrong
            # history is the worst outcome, so be loud: warn by default,
            # raise under strict_as_of.
            from datafusion_bigtable_spark.sources.cells import (
                _naive_datetime_to_us,
                _us_to_naive_datetime,
                read_gc_watermark_us,
            )

            wm = read_gc_watermark_us(self.config.cells_path)
            if wm is not None and _naive_datetime_to_us(as_of) <= wm:
                import warnings

                msg = (
                    f"as_of={as_of.isoformat(sep=' ')} is at or before this "
                    f"store's GC watermark "
                    f"{_us_to_naive_datetime(wm).isoformat(sep=' ')}"
                    " — versions live at that instant may have been "
                    "garbage-collected; the snapshot is best-effort, not "
                    "exact"
                )
                if strict_as_of:
                    raise GCWatermarkError(msg)
                warnings.warn(msg, GCWatermarkWarning, stacklevel=3)
        if as_of is not None:
            # bound BEFORE the latest filter — Catalyst pushes this to the
            # parquet scan (row-group ts pruning for free).  The literal
            # must be TIMESTAMP_NTZ: F.lit(datetime) builds an LTZ literal
            # through the SYSTEM timezone while the NTZ comparison coerces
            # through the SESSION timezone, silently shifting the snapshot
            # whenever the two differ (review finding, reproduced).
            ntz = F.lit(as_of.isoformat(sep=" ", timespec="microseconds")).cast(
                "timestamp_ntz"
            )
            df = df.filter(F.col("ts") <= ntz)
        return df.filter(F.col("family") == self.config.column_family)

    def to_df(
        self,
        spark: SparkSession,
        predicates: Sequence[Predicate] = (),
        as_of=None,
        strict_as_of: bool = False,
        value_filters: Sequence[tuple[str, str, object]] = (),
        rows_limit: int | None = None,
    ) -> DataFrame:
        """Assemble the relational view; ``as_of`` (naive datetime) gives a
        TIME-TRAVEL read: the latest version of each cell among versions
        with ``ts <= as_of`` — Bigtable's timestamp-bounded read.

        ``value_filters`` — ``(column, op, literal)`` triples with op in
        eq/ge/gt/le/lt (r7; the reference's unshipped value-filter roadmap,
        README.md:46-49): on the SERVICE path each pushes into the
        ReadRows request as a per-qualifier Interleave of byte ranges
        (grpc_transport.build_value_pred_filter) positioned AFTER the
        latest-version limit — latest-then-filter, never the promotion
        hazard.  The exact relational predicate is ALWAYS re-applied on
        the decoded frame (the A16 inexact contract), which also makes the
        parquet path correct with no cell-level pushdown (the format-API
        path has its own).

        ``strict_as_of=True`` raises :class:`GCWatermarkError` when the
        bound is at or before the store's GC watermark (a version-GC
        compaction may have dropped versions the snapshot needs); the
        default warns (:class:`GCWatermarkWarning`) and returns the
        best-effort snapshot.

        ``rows_limit`` (r7) — the ReadRowsRequest's real ``rows_limit``:
        the first N post-filter rows in row-key order.  Pushed into the
        request on the service path, replicated as a key-ordered
        TakeOrderedAndProject on the parquet path; latest-mode only
        (under version-unnest a Bigtable row fans out per timestamp, so
        the cap would not be the relational LIMIT — it warns and is
        ignored).

        Note the ordering contract: the bound applies BEFORE the
        latest-version filter.  This is exactly the semantics the generic
        ts-pushdown gate protects against producing by accident (a ts
        bound pushed under a latest-filtered read silently turns "latest,
        then filter" into "filter, then latest" — the as-of snapshot); the
        ``as_of`` parameter is the user ASKING for bound-then-latest, so
        here the scan-level bound is the correct plan, not a hazard.
        """
        ranges = self.key_ranges(predicates)

        # rows_limit: the ReadRowsRequest's real rows_limit field — the
        # server stops after N post-filter rows in key order.  Exactness
        # gates (mirroring the parquet DS rows_limit option's discipline):
        # - latest mode only: under version-unnest a Bigtable row pivots to
        #   one output row per timestamp, so the cap is NOT the relational
        #   LIMIT — warn and ignore rather than return a short frame.
        # - wire push additionally requires NO value_filters: the
        #   keep-rest interleave lets a row survive the wire predicate on
        #   other qualifiers and die at the relational re-application
        #   above the scan, so a server-side cap would undercount matching
        #   rows.  With value_filters the cap applies relationally below
        #   (filter-then-TakeOrdered, same result the server would give
        #   with a condition filter).
        cap = rows_limit if (rows_limit is None or self.config.only_read_latest) else None
        if rows_limit is not None and cap is None:
            import warnings

            warnings.warn(
                "bigtable: rows_limit ignored for a version-unnest read — "
                "the service caps Bigtable ROWS, which pivot to one output "
                "row per surviving timestamp; apply .limit() above instead",
                stacklevel=2,
            )
        wire_limit = cap if (self.service is not None and not value_filters) else None
        cells = self.cells(
            spark,
            ranges,
            as_of=as_of,
            strict_as_of=strict_as_of,
            value_filters=tuple(value_filters),
            rows_limit=wire_limit,
        )

        # Inexact contract: re-apply the range predicate above the scan even
        # when the service already pruned server-side (A16).
        pred = key_range_predicate(ranges, "row_key")
        if pred is not None:
            cells = cells.filter(pred)

        if self.config.only_read_latest:
            # ONE shuffle serves the whole assembly: hash-clustering the
            # cells by row_key satisfies the latest-window's
            # ClusteredDistribution(row_key, qualifier) AND the pivot's
            # (row_key, ts), so both run shuffle-free above this exchange.
            # Without it Catalyst plans two back-to-back exchanges on the
            # two different key sets (measured; the plan contract
            # test_bt_pivot_partial_final_around_one_exchange pins the
            # single-shuffle shape).  Per-partition volume follows row-key
            # cardinality — a single row key's cells are bounded by
            # #qualifiers × #versions, so no skew hazard.
            cells = cells.repartition("row_key")
            cells = latest_cells(cells)

        wide = pivot_cells(cells, self.config.qualifiers)
        wide = split_row_key(
            wide,
            self.config.table_partition_cols,
            self.config.table_partition_separator,
        )

        ktypes = self.config.key_types or ("string",) * len(self.config.table_partition_cols)
        cols = []
        for c, t in zip(self.config.table_partition_cols, ktypes):
            if t == "int64":
                from datafusion_bigtable_spark.plans.keycodec import decode_int_key_column

                cols.append(decode_int_key_column(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        cols.append(F.col("_timestamp").cast("timestamp_ntz").alias(RESERVED_TIMESTAMP))
        for spec in self.config.columns:
            cols.append(decode_value(F.col(spec.name), spec.spark_type()).alias(spec.name))
        if cap is not None and wire_limit is None:
            cols.append(F.col("row_key").alias("__rk"))
        out = wide.select(*cols)

        # A16 for value predicates: the wire pushdown (service path) is a
        # cell-level reduction; the RELATIONAL predicate on the decoded
        # column is re-applied here so the frame is exact on every
        # transport — including the parquet path, which pushes nothing at
        # this layer.  (ASCII-gated string encodings keep byte order equal
        # to Spark's string order, so pushed and re-applied semantics
        # agree; a NULL decoded value — missing cell — fails the compare
        # on both paths.)
        _OPS = {
            "eq": Column.__eq__,
            "ge": Column.__ge__,
            "gt": Column.__gt__,
            "le": Column.__le__,
            "lt": Column.__lt__,
        }
        for col, op, lit in value_filters:
            out = out.filter(_OPS[op](F.col(col), F.lit(lit)))

        if cap is not None and wire_limit is None:
            # Relational replication of the service's rows_limit: the
            # first N rows in ROW-KEY byte order, applied after every
            # filter exactly like the server would.  Ordering by the raw
            # joined key (not the split components — a component char
            # below the separator would invert tuple vs joined order)
            # plans as TakeOrderedAndProject: per-partition top-N + driver
            # merge of N, bounded at any store size.  Used on the parquet
            # transport always, and on the service transport when
            # value_filters make a wire cap inexact (see above).
            out = out.orderBy(F.col("__rk")).limit(cap)
        return out.drop("__rk") if "__rk" in out.columns else out

    def mutate(self, df: DataFrame, max_mutations: int = 100_000) -> int:
        """Write a relational DataFrame through the MutateRows transport —
        the live-service counterpart of ``df.write.format("bigtable")``
        (the reference's unshipped "writes to Bigtable", README.md:46-49).

        EXECUTOR-SIDE, never a driver funnel (VERDICT r11 #1 retired the
        ``toLocalIterator`` loop that encoded every cell on the driver):
        each task encodes its partition with the SAME row→cells encoder as
        the parquet staging writer (sources/cells.py::encode_relational_row,
        so wire mutations and staged files cannot drift) and pushes it
        through its OWN connection, one Arrow batch at a time — per-task
        memory stays O(arrow batch), and at 1000 executors the write
        fans out exactly like the DS sink's endpoint mode
        (datasource.py::BigtableWriter.write).

        Executors need a network address, not a driver-resident Python
        object: a :class:`WireBigtableClient` service carries one already;
        any other service (the in-process fake, a real-SDK adapter) gets a
        job-lifetime wire bridge served from the driver process.  Requests
        batch at most ``max_mutations`` SetCell mutations, split on row
        boundaries (per-row atomicity, the service's actual unit).  Task
        retries are idempotent: SetCell carries the row's explicit
        ``_timestamp``, so a replayed batch version-replaces itself.
        Returns the number of MutateRows entries applied (== input rows
        when row keys are unique, the relational frame's normal shape).
        """
        if self.service is None:
            raise NotImplementedError(
                "no transport: MutateRows needs a service (real client or "
                "the in-process fake); for parquet stores use "
                "df.write.format('bigtable')"
            )
        from datafusion_bigtable_spark.sources.wire import (
            WireBigtableClient,
            WireBigtableServer,
        )

        if isinstance(self.service, WireBigtableClient):
            host, port = self.service.address
            bridge = None
        else:
            spark = df.sparkSession
            host = _bridge_bind_host(
                spark.sparkContext.master,
                spark.conf.get("spark.driver.host", None),
            )
            bridge = WireBigtableServer(self.service, host=host).start()
            port = bridge.address[1]

        cfg = self.config
        mm = max_mutations

        def _push(batches):
            from datetime import timezone

            import pyarrow as pa

            from datafusion_bigtable_spark.sources.cells import (
                _naive_datetime_to_us,
                encode_relational_row,
            )
            from datafusion_bigtable_spark.sources.grpc_transport import push_cells
            from datafusion_bigtable_spark.sources.wire import (
                WireBigtableClient as _Client,
            )

            def _us(ts):
                # Arrow hands TIMESTAMP as tz-aware (session tz is UTC,
                # session.py:28) where Row.asDict() gave UTC-naive —
                # normalize so both write paths pin identical micros.
                if ts.tzinfo is not None:
                    ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
                return _naive_datetime_to_us(ts)

            client = _Client(host, port)
            applied = 0
            try:
                for batch in batches:
                    applied += push_cells(
                        cfg,
                        (
                            (k, f, q, _us(ts), v)
                            for row in batch.to_pylist()
                            for k, f, q, ts, v in encode_relational_row(cfg, row)
                        ),
                        service=client,
                        max_mutations=mm,
                    )
            finally:
                client.close()
            yield pa.record_batch([pa.array([applied], type=pa.int64())], names=["applied"])

        try:
            counts = df.mapInArrow(_push, "applied bigint").collect()
        finally:
            if bridge is not None:
                bridge.stop()
        return sum(r.applied for r in counts)

    def register(self, spark: SparkSession, name: str | None = None, **kw) -> DataFrame:
        """``ctx.register_table`` equivalent (reference src/datasource.rs:196-197)."""
        df = self.to_df(spark, **kw)
        df.createOrReplaceTempView(name or self.config.table)
        return df
