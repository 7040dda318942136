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
) -> DataFrame:
    """For each left row: latest right row with right_time <= left_time,
    equi-matched on ``on``.  Right payload columns arrive as
    ``<col><suffix>`` (None when nothing precedes the left row).
    """
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
    # right rows sort before coincident left rows (_side 0 < 1) so an
    # exactly-equal timestamp is visible to the left row — ASOF tie rule
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_f_{c}").alias(c) for c in carried
    ]
    return filled.filter(F.col("_side") == 1).select(*out_cols)
