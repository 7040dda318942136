"""Z-order (Morton) interleave — the multi-dimensional data-layout key
(Delta/Iceberg ``OPTIMIZE ZORDER BY`` equivalent, expressed as a plain
column so ANY writer can sort by it).

Writing a 100 TB fact table sorted by ``zorder2(dim_a, dim_b)`` makes
parquet row-group min/max stats selective on BOTH dimensions at once, so a
2-D range predicate prunes most files — a single-column sort layout can
only prune on its leading column.  The key is pure integer bit-math
(generated shift/mask expression, whole-stage-codegen'd, exact on every
engine), so the SAME expression string serves the Spark plan and the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BITS = 21  # 2×21 interleaved bits < 2^63: safe in BIGINT on both engines


def _interleave_expr(a: str, b: str, bits: int = _BITS) -> str:
    """SQL expression interleaving the low ``bits`` of ``a`` (even positions)
    and ``b`` (odd positions) — valid in both Spark SQL and DuckDB."""
    # every term fully parenthesized: DuckDB (Postgres-style) gives &, |, <<
    # EQUAL precedence with left associativity, so an unparenthesized
    # ``x | y << n`` parses as ``(x | y) << n`` and overflows
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder2(a: str, b: str, bits: int = _BITS) -> Column:
    """Morton key column for two non-negative integer expressions.

    NOTE: interleaving RAW values only works when both dims have similar
    magnitude — a 19-bit timestamp interleaved with a 4-bit user id sorts
    ~like the timestamp alone.  For layout keys, normalize first
    (``norm_expr``), which is what production Z-ORDER implementations do."""
    return F.expr(_interleave_expr(a, b, bits))


def norm_expr(col: str, lo: str, hi: str, bits: int) -> str:
    """Min-max normalize ``col`` onto [0, 2^bits) with exact integer
    arithmetic — identical in Spark SQL and DuckDB (both DIV/​// truncate;
    zero-span columns collapse to 0).  ``lo``/``hi`` are SQL expressions
    (typically scalar-subquery/broadcast min & max)."""
    span = f"nullif(({hi}) - ({lo}), 0)"
    # the offset is cast to DOUBLE BEFORE the scale multiply: the integer
    # product (col-lo)·(2^bits-1) overflows BIGINT for wide ranges (a
    # year of epoch-µs at bits=21 — DuckDB errors, Spark silently wraps).
    # In double the product is EXACT for spans < 2^32 (operands < 2^53)
    # and beyond that merely double-rounded — identically in both engines
    # (same IEEE multiply/divide), so keys stay engine-identical at every
    # range; the result of the division is < 2^bits, safe to cast.
    scaled = f"CAST((({col}) - ({lo})) AS DOUBLE) * {(1 << bits) - 1}"
    return f"coalesce(CAST(floor(({scaled}) / ({span})) AS BIGINT), 0)"
