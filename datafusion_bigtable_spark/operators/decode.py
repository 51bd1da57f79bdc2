"""Cell-value decoders — JVM-side expressions, no Python UDFs in the hot path.

The reference decodes exactly two encodings (src/execute_plan.rs:283-304,
README.md:32-33): Int64 as 8-byte big-endian signed (via byteorder's
``BigEndian::read_i64``) and everything else as UTF-8 text.  We reproduce
both as Catalyst expressions so they stay inside whole-stage codegen:

- big-endian signed int64: hex() the bytes, conv() base-16→10 into an
  unsigned decimal(20,0), then a two's-complement fix-up (subtract 2^64 when
  the sign bit is set).  All built-in functions — at 100 TB this runs
  vectorized in the JVM instead of round-tripping every value through
  Python.
- UTF-8: a plain binary→string cast.

Deviation (SURVEY §1.3): empty/malformed byte values decode to NULL.  The
reference materializes a missing qualifier as an empty byte vector, which
renders as ``""`` for Utf8 and would *panic* in ``read_i64`` for Int64
(src/execute_plan.rs:264-267, 287-293).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

def decode_int64_be(col: Column) -> Column:
    """8-byte big-endian signed int64 → LongType (NULL unless exactly 8 bytes)."""
    # 2**63 / 2**64 exceed Java long — pass them as DECIMAL literals.
    two_pow_63 = F.expr("CAST(9223372036854775808 AS DECIMAL(20,0))")
    two_pow_64 = F.expr("CAST(18446744073709551616 AS DECIMAL(21,0))")
    unsigned = F.conv(F.hex(col), 16, 10).cast(T.DecimalType(20, 0))
    signed = F.when(
        unsigned >= two_pow_63,
        (unsigned - two_pow_64).cast("long"),
    ).otherwise(unsigned.cast("long"))
    return F.when(F.length(col) == 8, signed)


def decode_utf8(col: Column) -> Column:
    """UTF-8 bytes → StringType (NULL for NULL input; empty bytes → '')."""
    return col.cast("string")


def encode_int64_be(col: Column) -> Column:
    """LongType → 8-byte big-endian binary (inverse of decode_int64_be;
    used to build cells stores from relational data).  unhex(lpad(hex(x)))
    is exact for the full signed range because hex() of a negative long is
    its 16-digit two's-complement form."""
    return F.unhex(F.lpad(F.hex(col), 16, "0"))


DECODERS = {
    T.LongType(): decode_int64_be,
    T.StringType(): decode_utf8,
}


def decode_value(col: Column, dtype: T.DataType) -> Column:
    """Dispatch on the declared type — Int64 is special-cased, BinaryType
    passes raw bytes through (multimodal extension), everything else follows
    the reference's catch-all: decode as UTF-8 then cast."""
    if isinstance(dtype, T.LongType):
        return decode_int64_be(col)
    if isinstance(dtype, T.BinaryType):
        return col
    if isinstance(dtype, T.StringType):
        return decode_utf8(col)
    return decode_utf8(col).cast(dtype)
