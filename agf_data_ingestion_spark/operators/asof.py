"""As-of (time-travel) join — an operator Spark's DataFrame API lacks,
composed from built-ins (SURVEY.md §2.9 custom-operator policy (a)).

``asof_join(left, right, ...)`` attaches to each left row the most recent
right row at-or-before its timestamp, per key.  Implementation: tag and
union both sides, sort within each key partition, carry the latest right
row forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding window, then keep the left rows.  This is the sort-based
formulation that scales: one shuffle on the key (same cost as any
windowed op), no range-explosion, no per-row lookups — at 100 TB the
window sort is the optimal plan short of a bespoke merge-join physical
operator.

Cross-checked in the catalog against DuckDB's *native* ``ASOF JOIN``
(plans/windows.py), which pins the semantics including ties
(right.ts == left.ts matches) and no-match rows (NULL columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: nearest right row at-or-before (``direction=
    'backward'``, default) or at-or-after (``'forward'``) its timestamp,
    equi-matched on ``on``.  Right payload columns arrive as
    ``<col><suffix>`` (None when no match).

    ``tolerance`` (same units as the time columns) bounds the match
    distance, like pandas ``merge_asof``: a carried right row further than
    ``tolerance`` from the left timestamp is nulled out.  The forward
    variant is the same one-shuffle window plan with the sort reversed —
    direction changes ORDER BY, never the join strategy.

    ``tiebreak`` names a right column that totally orders right rows
    sharing a timestamp (without it the winner among equal timestamps is
    partition-order-dependent): the max of it wins going backward, the min
    going forward — i.e. always the row nearest the left one in the scan
    direction."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    l_tag = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r_tag = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_time).alias(f"{right_time}{suffix}"),
    )
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{right_time}{suffix}"]
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort "before" coincident left rows (side order flips with
    # direction) so an exactly-equal timestamp is visible to the left row —
    # the ASOF tie rule in both directions
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc()]
        if tiebreak is not None:
            order.append(F.col(f"{tiebreak}{suffix}").asc_nulls_last())
    else:
        order = [F.col("_t").desc(), F.col("_side").asc()]
        if tiebreak is not None:
            order.append(F.col(f"{tiebreak}{suffix}").desc_nulls_last())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    )
    matched_t = F.col(f"_f_{right_time}{suffix}")
    # a left row with NULL time has no defined as-of position: under the
    # forward sort (desc, nulls last) it would otherwise absorb the
    # earliest right row as a phantom match — null times match NOTHING in
    # either direction, symmetrically
    has_time = F.col("_t").isNotNull()
    if tolerance is not None:
        dist = (
            (F.col("_t") - matched_t)
            if direction == "backward"
            else (matched_t - F.col("_t"))
        )
        within = has_time & matched_t.isNotNull() & (dist <= F.lit(tolerance))
        out_cols = [F.col(c) for c in left.columns] + [
            F.when(within, F.col(f"_f_{c}")).alias(c) for c in carried
        ]
    else:
        out_cols = [F.col(c) for c in left.columns] + [
            F.when(has_time, F.col(f"_f_{c}")).alias(c) for c in carried
        ]
    return filled.filter(F.col("_side") == 1).select(*out_cols)
