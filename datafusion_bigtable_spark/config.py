"""Table configuration — the Spark equivalent of ``BigtableDataSource::new``.

Reference: ``/root/reference/src/datasource.rs:57-103`` builds a *declared*
(not inferred) schema: one non-null Utf8 field per row-key component, a
reserved ``_timestamp`` Timestamp(µs, no tz) field, then the user-declared
qualifier columns.  Field order is load-bearing (the ``SELECT *`` golden test
at src/datasource.rs:208-216 depends on it).

Deliberate deviation (documented, SURVEY §1.3): qualifier columns are
nullable here.  The reference materializes a missing qualifier cell as an
empty byte vector (src/execute_plan.rs:264-267) which renders as ``""`` for
Utf8 and would *panic* for Int64; we produce SQL ``NULL`` instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

RESERVED_ROWKEY = "_row_key"  # reference src/datasource.rs:21
RESERVED_TIMESTAMP = "_timestamp"  # reference src/datasource.rs:22
DEFAULT_SEPARATOR = "#"  # reference src/datasource.rs:20

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "utf8": T.StringType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "binary": T.BinaryType(),
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    """One declared qualifier column: name + logical type.

    Cell encodings (reference src/execute_plan.rs:283-304 + README.md:32-33):
    ``int64`` = 8-byte big-endian signed; everything else = UTF-8 bytes
    (the reference's catch-all ``_`` arm).  ``binary`` passes raw bytes
    through — an extension for multimodal payloads the reference's type
    system (Utf8/Int64 only) cannot carry.
    """

    name: str
    type: str = "string"

    def spark_type(self) -> T.DataType:
        try:
            return _TYPE_MAP[self.type.lower()]
        except KeyError:
            raise ValueError(f"unsupported column type {self.type!r} for {self.name!r}") from None


@dataclass(frozen=True)
class BigtableTableConfig:
    """Equivalent of the ``BigtableDataSource::new`` argument list
    (reference src/datasource.rs:57-66): project/instance/table identify the
    Bigtable table; ``cells_path`` points at the parquet-backed cells store
    that stands in for the gRPC connection in this environment.
    """

    table: str
    column_family: str
    columns: tuple[ColumnSpec, ...]
    table_partition_cols: tuple[str, ...] = (RESERVED_ROWKEY,)
    table_partition_separator: str = DEFAULT_SEPARATOR
    only_read_latest: bool = True
    project: str = "local"
    instance: str = "local"
    cells_path: str | None = None
    #: Reference posture (composer.rs:72-77): an unfiltered scan of a
    #: 100 TB store is refused by DEFAULT; pass allow_full_scan=True as a
    #: loud opt-in for genuinely-small tables or offline batch sweeps.
    allow_full_scan: bool = False
    #: Planning posture for big stores (VERDICT r11 #6 / SCALE.md:18-21):
    #: file-stat pruning reads the store's manifest when present and
    #: silently falls back to a driver-side parquet-footer loop otherwise
    #: — fine to ~10⁵ files, O(files) per plan beyond.  With
    #: require_manifest=True a manifest miss (absent OR stale vs the
    #: current file set) is an ERROR naming write_manifest as the fix,
    #: so a 100 TB deployment can pin away the footer-loop cliff.
    require_manifest: bool = False
    #: optional logical type per key component ("string" | "int64").  The
    #: reference deliberately restricts key literals to strings
    #: (composer.rs:175); "int64" is the extension: the component is stored
    #: inside the row key as the ORDER-PRESERVING fixed-width encoding
    #: (plans/keycodec.py — offset-to-unsigned, 20 decimal digits), so the
    #: lexicographic composer/pruning machinery works unchanged, while the
    #: relational schema exposes a BIGINT and predicates take ints.
    key_types: tuple[str, ...] | None = None

    # Physical columns of the cells store (sources/cells.py CELLS_SCHEMA):
    # a qualifier with one of these names would collide inside the pivot.
    _PHYSICAL = frozenset({"row_key", "family", "qualifier", "ts", "value"})

    def __post_init__(self) -> None:
        if not self.table_partition_cols:
            raise ValueError("table_partition_cols must be non-empty")
        if self.key_types is not None:
            if len(self.key_types) != len(self.table_partition_cols):
                raise ValueError(
                    "key_types must match table_partition_cols length "
                    f"({len(self.key_types)} != {len(self.table_partition_cols)})"
                )
            bad = [t for t in self.key_types if t not in ("string", "int64")]
            if bad:
                raise ValueError(f"unsupported key component type(s) {bad!r}")
        for c in self.columns:
            if not self.is_qualifier(c.name):
                raise ValueError(f"qualifier column {c.name!r} collides with a reserved/key column")
            if c.name in self._PHYSICAL:
                raise ValueError(
                    f"qualifier column {c.name!r} collides with a cells-store physical "
                    f"column {sorted(self._PHYSICAL)}; rename the qualifier"
                )

    @property
    def qualifiers(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.columns)

    def is_qualifier(self, name: str) -> bool:
        """Membership test, reference src/datasource.rs:105-116 — also the
        single validation predicate used by __post_init__.  ``_row_key`` is
        reserved only when it is not itself the (single) partition column."""
        if name == RESERVED_TIMESTAMP or name in self.table_partition_cols:
            return False
        if name == RESERVED_ROWKEY and len(self.table_partition_cols) > 1:
            return False
        return True

    def schema(self) -> T.StructType:
        """Declared output schema — field order mirrors the reference:
        partition cols, then ``_timestamp``, then qualifiers
        (reference src/datasource.rs:68-79)."""
        # Tail key components are nullable: a stored row key with fewer
        # separator-delimited parts than table_partition_cols yields NULL for
        # the missing components (both scan paths), and a non-null declaration
        # would let Catalyst prune IsNotNull filters incorrectly.  The first
        # component is always present (split of a non-null key has >= 1 part).
        # int64 components are nullable even in FIRST position: the split
        # part is always present, but a malformed encoding decodes to NULL
        # (the documented NULL-for-malformed stance, plans/keycodec.py).
        ktypes = self.key_types or ("string",) * len(self.table_partition_cols)
        fields = [
            T.StructField(
                c,
                T.LongType() if t == "int64" else T.StringType(),
                i > 0 or t == "int64",
            )
            for i, (c, t) in enumerate(zip(self.table_partition_cols, ktypes))
        ]
        fields.append(T.StructField(RESERVED_TIMESTAMP, T.TimestampNTZType(), False))
        fields.extend(T.StructField(c.name, c.spark_type(), True) for c in self.columns)
        return T.StructType(fields)
