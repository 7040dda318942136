"""Threshold-alarm evaluation over a metrics table (OP-SINK-METRICS → alert).

The reference monitors its pipeline with five CloudWatch alarms
(``cloudformation/agf-monitoring-alarms.yaml:52-155``): each is a
(metric, statistic, period, evaluation-periods, threshold, comparison)
tuple, breaching when the per-period statistic crosses the threshold for
ALL of the last N periods, with missing data treated as not-breaching.
This module evaluates the identical semantics over any metrics DataFrame
``(ts: timestamp, metric: string, value: double)`` — e.g. the rows the
streaming metrics sink (streaming/windowed.py ``observed``) accumulates.

Scale shape: one filtered windowed aggregation per spec — the metrics
table is time-filtered to ``periods × period`` seconds before the shuffle,
and the result is ≤ evaluation_periods rows per alarm, so evaluation cost
is independent of metrics-table history size.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATS = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}
_CMPS = {
    "gt": lambda v, t: v > t,
    "ge": lambda v, t: v >= t,
    "lt": lambda v, t: v < t,
    "le": lambda v, t: v <= t,
}


@dataclass(frozen=True)
class AlarmSpec:
    """One alarm rule (CloudWatch alarm field-for-field analog)."""

    name: str
    metric: str
    statistic: str  # sum | max | min | avg
    period_s: int
    threshold: float
    comparison: str = "gt"  # gt | ge | lt | le
    evaluation_periods: int = 1
    treat_missing: str = "notBreaching"  # notBreaching | breaching


#: the reference's five alarms, thresholds verbatim
#: (agf-monitoring-alarms.yaml:52-155), metric names mapped to this
#: engine's counters
REFERENCE_ALARMS = (
    AlarmSpec("ingest-errors", "errors", "sum", 300, 0.0),
    AlarmSpec("batch-duration-ms", "duration_ms", "max", 300, 270_000.0),
    AlarmSpec("sink-throttles", "sink_throttles", "sum", 300, 0.0),
    AlarmSpec("task-throttles", "task_throttles", "sum", 300, 0.0),
    AlarmSpec(
        "concurrency",
        "concurrent_batches",
        "max",
        60,
        10.0,
        evaluation_periods=5,
    ),
)


@dataclass(frozen=True)
class AlarmState:
    name: str
    state: str  # "ALARM" | "OK"
    period_values: tuple[float | None, ...]  # oldest → newest, None = missing


def evaluate_alarm(
    metrics: DataFrame, spec: AlarmSpec, *, now: dt.datetime
) -> AlarmState:
    """Evaluate one alarm over the last ``evaluation_periods`` COMPLETE
    periods ending at ``now`` (aligned down to a period boundary)."""
    if spec.statistic not in _STATS:
        raise ValueError(f"unknown statistic {spec.statistic!r}")
    if spec.comparison not in _CMPS:
        raise ValueError(f"unknown comparison {spec.comparison!r}")
    # naive datetimes are UTC wall-clock repo-wide (functions/timestamps
    # now_column convention); bare .timestamp() would interpret them in
    # the OS-LOCAL zone and shift the evaluated window by the offset
    if now.tzinfo is None:
        now = now.replace(tzinfo=dt.timezone.utc)
    epoch = int(now.timestamp()) // spec.period_s * spec.period_s
    start = epoch - spec.period_s * spec.evaluation_periods
    agg = (
        metrics.filter(F.col("metric") == spec.metric)
        .filter(
            (F.col("ts") >= F.timestamp_seconds(F.lit(start)))
            & (F.col("ts") < F.timestamp_seconds(F.lit(epoch)))
        )
        .groupBy(F.window("ts", f"{spec.period_s} seconds").alias("w"))
        .agg(_STATS[spec.statistic]("value").alias("v"))
        .select(F.unix_timestamp("w.start").alias("ws"), "v")
        .collect()  # ≤ evaluation_periods rows by construction
    )
    by_start = {r["ws"]: r["v"] for r in agg}
    cmp = _CMPS[spec.comparison]
    values: list[float | None] = []
    breaching: list[bool] = []
    for i in range(spec.evaluation_periods):
        ws = start + i * spec.period_s
        v = by_start.get(ws)
        values.append(v)
        if v is None:
            breaching.append(spec.treat_missing == "breaching")
        else:
            breaching.append(bool(cmp(v, spec.threshold)))
    state = "ALARM" if breaching and all(breaching) else "OK"
    return AlarmState(spec.name, state, tuple(values))


def evaluate_alarms(
    metrics: DataFrame,
    specs: tuple[AlarmSpec, ...] = REFERENCE_ALARMS,
    *,
    now: dt.datetime,
) -> list[AlarmState]:
    return [evaluate_alarm(metrics, s, now=now) for s in specs]
