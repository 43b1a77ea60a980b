"""NUMERIC(p,s) field-type semantics.

Reference mapping (pg_search/src/schema/mod.rs:298-319):

- ``NUMERIC(p,s)`` with a defined scale and ``0 < p <= 18`` becomes
  **Numeric64** — an i64 fixed-point fast field holding
  ``value * 10^scale`` (the 18-digit bound is
  decimal_bytes::MAX_DECIMAL64_NO_SCALE_PRECISION: the widest decimal
  that fits an i64 with headroom).  Term/range pushdown compares the
  scaled integers, so ``12.3`` matches ``12.30`` but never ``1.23``
  (numeric_pushdown.out test 8.5).
- ``NUMERIC`` with ``p > 18`` or no typmod becomes **NumericBytes** — a
  lexicographically-sortable byte string (decimal_bytes crate): byte
  order == numeric order, so equality/range pushdown still work, but
  aggregates are NOT pushed down (mod.rs:503-511
  ``field_supports_aggregate`` returns false for numeric fields — the
  engine computes them over the row store instead; results are
  identical, only the execution path differs).

Spark mapping: ``DecimalType(p,s)`` is the native exact storage for
p <= 38 and Catalyst compares decimals exactly, so attribute
filters/ranges on decimal columns are pushed to the parquet scan
unchanged.  This module supplies the two storage twins — the scaled-i64
fast-field expression and the sortable-bytes encoding — so indexes can
materialize the same physical layouts the reference builds, plus the
``field_supports_aggregate`` policy surface.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, functions as F

# decimal_bytes::MAX_DECIMAL64_NO_SCALE_PRECISION (mod.rs:303-309)
MAX_DECIMAL64_NO_SCALE_PRECISION = 18
# Spark's DecimalType hard bound; the sortable encoding pads to it
_MAX_DIGITS = 38


def numeric_storage(precision: int | None, scale: int | None) -> str:
    """Route a NUMERIC typmod to its storage strategy — the exact
    condition of mod.rs:310-319: Numeric64 needs a DEFINED scale and
    0 < precision <= 18; everything else (p > 18, unlimited) is
    NumericBytes."""
    if (scale is not None and precision is not None
            and 0 < precision <= MAX_DECIMAL64_NO_SCALE_PRECISION):
        return "Numeric64"
    return "NumericBytes"


def numeric64_expr(col: Column, scale: int) -> Column:
    """Numeric64 fast-field twin: the i64 fixed-point representation
    ``value * 10^scale`` (numeric_pushdown.out test 8.5: 12.34 @ scale 2
    -> 1234, 1.23 -> 123).  Exact for DecimalType inputs — decimal
    multiply then integral cast, no float round-trip."""
    return (col.cast(f"decimal(38,{scale})") * F.lit(10 ** scale)) \
        .cast("decimal(38,0)").cast("long")


def numeric_bytes_expr(col: Column, scale: int = 10) -> Column:
    """NumericBytes twin: an order-preserving string encoding of a
    decimal column (analog of the reference's hex-encoded sortable bytes,
    numeric_pushdown.out part 6.2).  Layout: one sign char ('0' negative,
    '2' otherwise) + the absolute unscaled value left-padded to 38
    digits, nines-complemented for negatives — lexicographic order over
    the fixed-width string equals numeric order.  Pure JVM codegen
    (lpad/translate), no UDF."""
    # The unscaled digit string comes from the fixed-scale decimal's
    # canonical string form (BigDecimal toPlainString prints all
    # ``scale`` fractional digits), NOT a ``* 10^scale`` decimal
    # multiply — Spark caps multiply results at precision 38 by
    # dropping scale, which would round the last digits of wide values.
    dec = col.cast(f"decimal(38,{scale})")
    digits = F.lpad(F.translate(dec.cast("string"), "-.", ""),
                    _MAX_DIGITS, "0")
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.when(dec < 0,
               F.concat(F.lit("0"),
                        F.translate(digits, "0123456789", "9876543210")))
        .otherwise(F.concat(F.lit("2"), digits)))


def encode_numeric_bytes(value, scale: int = 10,
                         width: int = _MAX_DIGITS) -> str | None:
    """Python twin of :func:`numeric_bytes_expr` (differential tests and
    truly-unlimited NUMERIC ingest: python Decimal has no 38-digit bound,
    so ``width`` can exceed what DecimalType spans)."""
    if value is None:
        return None
    import decimal
    with decimal.localcontext() as ctx:
        # default context precision (28) would silently round wide
        # values during scaleb — widen to the encoding width
        ctx.prec = width + scale + 4
        unscaled = int(Decimal(str(value)).scaleb(scale)
                       .to_integral_value())
    digits = str(abs(unscaled)).rjust(width, "0")
    if unscaled < 0:
        comp = digits.translate(str.maketrans("0123456789", "9876543210"))
        return "0" + comp
    return "2" + digits


def is_numeric_type(dtype) -> bool:
    """True for Spark DecimalType — the NUMERIC analog (both Numeric64
    and NumericBytes storage routes; mod.rs:156-161 is_numeric)."""
    from pyspark.sql.types import DecimalType
    return isinstance(dtype, DecimalType)


def field_supports_aggregate(index, name: str) -> bool:
    """``SearchIndexSchema::field_supports_aggregate`` analog
    (mod.rs:503-511): False for NUMERIC (decimal) fields — the reference
    never pushes aggregates into the index for them (NaN/Infinity and
    bytes-column handling) and computes over the heap instead; False for
    unknown fields; True otherwise.  On Spark "no aggregate pushdown"
    is likewise a plan statement, not a capability gap: aggregates over
    decimal columns run in the (exact, codegen'd) hash aggregate over
    the docs scan rather than a fast-field-only columnar path."""
    for f in index.docs.schema.fields:
        if f.name == name:
            return not is_numeric_type(f.dataType)
    return False
