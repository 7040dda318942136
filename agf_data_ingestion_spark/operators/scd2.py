"""Type-2 slowly-changing-dimension builder — shared by the batch catalog
query (plans/windows.py `events_scd2_intervals`) and the streaming
maintainer (streaming/scd2.py).

Change capture is the lag/sum/lead composition: lag() marks change points,
a running sum of change flags assigns versions, lead() closes each
interval.  All three windows share ONE (key) exchange — EXPLAIN.md shows a
single Exchange for the catalog query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    *,
    key: str = "user_id",
    attr: str = "event_type",
    time_col: str = "ts_us",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Collapse an event stream into Type-2 validity intervals: one row per
    *change* of ``attr`` per ``key`` — (key, attr, valid_from, valid_to,
    version, is_current), current row open-ended (valid_to NULL).

    ``tiebreak`` totally orders simultaneous events so the result is
    deterministic under any partitioning."""
    w = Window.partitionBy(key).orderBy(time_col, tiebreak)
    changed = (
        F.lag(attr).over(w).isNull() | (F.col(attr) != F.lag(attr).over(w))
    ).cast("int")
    d = df.select(key, attr, time_col, tiebreak).withColumn("chg", changed)
    d = d.withColumn(
        "version",
        F.sum("chg").over(
            Window.partitionBy(key)
            .orderBy(time_col, tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = d.filter(F.col("chg") == 1).select(
        key, attr, F.col(time_col).alias("valid_from"), "version"
    )
    w2 = Window.partitionBy(key).orderBy("version")
    return runs.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("version").cast("long").alias("version"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
