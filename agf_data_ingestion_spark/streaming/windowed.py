"""Watermarked event-time processing + observable metrics.

Reference mapping (SURVEY.md §2.8):
* OP-STRM-LATE — the reference has no watermarks; its 8-day reconciliation
  window is the de-facto lateness bound.  Here that bound is explicit:
  ``windowed_counts(..., watermark="8 days")`` finalizes windows once the
  event-time high-water mark passes, dropping later stragglers instead of
  silently double-counting them.
* OP-STRM-STATE — the reference gets exactly-once via conditional writes;
  the streaming-native equivalent is ``dropDuplicatesWithinWatermark`` —
  state is bounded by the lateness horizon instead of growing forever.
* OP-SINK-METRICS — the reference returns {processed, errors} per batch and
  emits CloudWatch metrics; Spark's ``observe`` attaches the same counters
  to the query itself (no second pass over the data).

Scale: a watermarked window agg keeps state only for open windows per key —
the knob that makes stateful streaming viable at 100 TB/day; unbounded
``dropDuplicates`` would OOM, the watermarked variant cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    *,
    time_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "8 days",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window counts with a lateness watermark.

    Works identically on a batch or streaming DataFrame (unified model);
    under streaming append mode a window emits exactly once, when the
    watermark passes its end.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("win"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    *,
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "8 days",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Native ``session_window`` aggregation — the streaming twin of the
    batch catalog query ``events_session_window_native``
    (plans/windows.py): events of a key whose [ts, ts+gap) windows overlap
    merge into one session; a successor exactly ``gap`` later starts a new
    one (strict boundary, pinned by that query's gap-islands oracle).

    Works identically on batch and streaming frames (unified model).
    Under streaming append mode a session emits exactly once, when the
    watermark passes its end; merging-session state is evicted then too,
    so state is O(open sessions), not O(stream).
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(*group_cols, F.session_window(time_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            *group_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    *,
    keys: list[str],
    time_col: str = "ts",
    watermark: str = "8 days",
) -> DataFrame:
    """Streaming-stateful dedup with bounded state (OP-STRM-STATE).

    Duplicates arriving within the lateness horizon are dropped; state for
    keys older than the watermark is evicted — the exactly-once effect the
    reference builds from DynamoDB conditional writes, without unbounded
    memory."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    max_delay: str = "15 minutes",
    watermark: str = "8 days",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event pairs with
    right events of the same key that happen in ``[left_time, left_time +
    max_delay]``.  The classic attribution join (view → click within N
    minutes).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store evicts rows once the watermark passes
    their join horizon — state is O(events inside the horizon), not O(the
    stream).  On batch inputs the same function is a plain range join
    (unified model; the batch twin is the oracle-checked catalog query).

    ``how="left_outer"`` adds the unconverted-left rows (the funnel-drop
    side of attribution): a left event with no match emits ONCE with null
    right columns, only after the watermark passes its join horizon —
    before that the engine cannot know no match is coming.  Outer
    stream-stream joins REQUIRE the time-bound condition for exactly this
    reason (unbounded state could never emit a definitive null).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type for interval_join: {how!r}")
    l = left.withWatermark(left_time, watermark).alias("l")
    # both sides are event-stream-sized: in BATCH mode (the unified-model
    # twin) small-sf statistics would statically broadcast the right side,
    # which cannot exist at production event volumes — pin the shuffle
    # join (streaming mode always shuffles on the key anyway)
    r = right.withWatermark(right_time, watermark).hint("shuffle_hash").alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how)


def observed(df: DataFrame, name: str = "ingest") -> tuple[DataFrame, Observation | str]:
    """Attach the reference's per-batch counters ({processed, errors}) as an
    observation — metrics are collected during the action itself.

    Batch frames return an ``Observation`` object (read ``obs.get`` after
    the action).  STREAMING frames return the observation NAME instead:
    pyspark's Observation class does not support streaming datasets
    (``df.observe`` accepts only a string name there), and the metrics
    arrive per micro-batch through ``StreamingQueryProgress
    .observedMetrics[name]`` / a StreamingQueryListener."""
    metrics = (
        F.count(F.lit(1)).alias("processed"),
        F.sum(F.when(F.col("_valid") == False, 1).otherwise(0)).alias("errors")  # noqa: E712
        if "_valid" in df.columns
        else F.lit(0).alias("errors"),
    )
    if df.isStreaming:
        return df.observe(name, *metrics), name
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
