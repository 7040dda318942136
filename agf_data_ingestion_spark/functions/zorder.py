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


# -- Hilbert curve (r8) -------------------------------------------------------
# Morton keys are cheap but cross-quadrant jumps leave some file groups
# spanning half a dimension; the Hilbert curve visits every cell of the
# 2^bits × 2^bits grid through ADJACENT cells only, so contiguous key
# ranges are tighter rectangles — the better OPTIMIZE layout key
# (public reference: the canonical xy2d loop on the Hilbert-curve
# Wikipedia page; databases: Amazon Ion/Redshift AQUA, DataBricks
# liquid clustering both moved Z-order → Hilbert for this reason).
# Both implementations below are EXACT INTEGER twins of the same rounds:
# the numpy form computes per-distinct-cell values Arrow-batched in Spark
# (8 unrolled SQL rounds would CollapseProject into a ~3^8-node
# expression — the janino-blowup rule), the SQL generator emits the same
# rounds as chained MATERIALIZED CTEs for the DuckDB oracle.

_H_BITS = 8  # 256×256 grid → hkey ∈ [0, 65536): plenty for file layout


def hilbert_np(xs, ys, bits: int = _H_BITS):
    """Hilbert index for int arrays ``xs``, ``ys`` in [0, 2^bits) —
    all-int64 numpy, per-row independent (order-free, the integer rule)."""
    import numpy as np

    x = np.asarray(xs, dtype=np.int64).copy()
    y = np.asarray(ys, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    n = 1 << bits
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        fx = np.where(flip, n - 1 - x, x)
        fy = np.where(flip, n - 1 - y, y)
        x = np.where(swap, fy, fx)
        y = np.where(swap, fx, fy)
        s >>= 1
    return d


def hilbert_sql_cte(cells: str, bits: int = _H_BITS) -> str:
    """The SAME rounds as ``hilbert_np`` unrolled as chained MATERIALIZED
    CTEs over ``cells(cx, cy)`` for the DuckDB oracle (materialization
    stops DuckDB re-inlining the chain into an exponential expression —
    the iterative-oracle rule).  Final CTE is ``hsig(cx, cy, hkey)``.
    Every bit term fully parenthesized (equal-precedence trap); XOR is
    DuckDB's ``xor()``."""
    n = 1 << bits
    parts = [
        f"h0 AS MATERIALIZED (SELECT cx, cy, cx AS x, cy AS y,"
        f" CAST(0 AS BIGINT) AS d FROM {cells})"
    ]
    r = 0
    s = n >> 1
    while s > 0:
        rx = f"(CASE WHEN ((x) & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ((y) & {s}) > 0 THEN 1 ELSE 0 END)"
        nd = f"((d) + ({s * s} * xor((3 * {rx}), {ry})))"
        nx = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN"
            f" ({n - 1} - (y)) ELSE (y) END) ELSE (x) END)"
        )
        ny = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN"
            f" ({n - 1} - (x)) ELSE (x) END) ELSE (y) END)"
        )
        parts.append(
            f"h{r + 1} AS MATERIALIZED (SELECT cx, cy, {nx} AS x,"
            f" {ny} AS y, {nd} AS d FROM h{r})"
        )
        r += 1
        s >>= 1
    parts.append(f"hsig AS (SELECT cx, cy, d AS hkey FROM h{r})")
    return ",\n".join(parts)
