"""Temporal/analytic extensions: as-of join, range join, sessionization,
rollup/cube grouping sets, and approximate aggregates.

These are the operators a time-series / training-data workload needs that
the reference never had (SURVEY.md §2.9 spirit); each is expressed as a
composition of Spark built-ins with the shuffle story called out, and
oracle-checked where ANSI SQL (or a DuckDB-native operator, for ASOF)
expresses the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.asof import asof_join
from agf_data_ingestion_spark.plans.base import QuerySpec, dsum, o_dsum, t

# ---------------------------------------------------------------------------
# As-of join (OP-X-ASOF): purchase → most recent prior click, per user
# ---------------------------------------------------------------------------


def events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_ts")
    )
    # tiebreak pins the winner among equal-timestamp clicks (CLAUDE.md:
    # every windowed pick needs a unique total order; the forward variant
    # already does this) — without it a regenerated corpus with duplicate
    # (user, ts) clicks would be engine- and run-nondeterministic
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="p_ts",
        right_time="c_ts",
        tiebreak="click_id",
    )
    return out.select(
        "user_id",
        "purchase_id",
        "p_ts",
        F.col("click_id_asof").alias("prior_click_id"),
        F.col("c_ts_asof").alias("prior_click_ts"),
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_ts
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, p.p_ts,
       c.click_id AS prior_click_id, c.c_ts AS prior_click_ts
FROM purch p LEFT JOIN LATERAL (
  SELECT click_id, c_ts FROM clicks c
  WHERE c.user_id = p.user_id AND c.c_ts <= p.p_ts
  ORDER BY c.c_ts DESC, click_id DESC LIMIT 1
) c ON TRUE
"""


# ---------------------------------------------------------------------------
# Range join (OP-X-RANGE): bucket events by value bands (broadcast interval dim)
# ---------------------------------------------------------------------------

_BANDS = [(0.0, 5.0, "low"), (5.0, 20.0, "mid"), (20.0, 1e9, "high")]


def events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, ["lo", "hi", "band"])
    # interval dimension is tiny → broadcast nested-loop join; the fact side
    # streams through without a shuffle (the scalable range-join shape when
    # one side is small; for two big sides you bucket both by range first)
    return (
        e.join(F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
    )


_RANGE_SQL = f"""
SELECT band, COUNT(*) AS n, {o_dsum('value')} AS total_value
FROM events
JOIN (VALUES (0.0, 5.0, 'low'), (5.0, 20.0, 'mid'), (20.0, 1e9, 'high')) AS bands(lo, hi, band)
  ON value >= lo AND value < hi
GROUP BY band
"""


# ---------------------------------------------------------------------------
# Sessionization (OP-X-SESSION): 30-minute-gap sessions per user
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_session = (
        (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US)
        | F.lag("ts_us").over(w).isNull()
    ).cast("int")
    sess = e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_no"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start"),
        ((F.max("ts_us") - F.min("ts_us")) / 1_000_000.0).alias("duration_s"),
    )


_SESSION_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start,
       (MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS duration_s
FROM sess GROUP BY user_id, session_no
"""


# ---------------------------------------------------------------------------
# Grouping sets (OP-X-ROLLUP / OP-X-CUBE)
# ---------------------------------------------------------------------------


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("sum_qty"))
    )


_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {o_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("sum_price"))
    )


_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {o_dsum('o_totalprice')} AS sum_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution interval join (view → click within 4 h, per user) via
    the streaming ``interval_join`` operator run on bounded input — the
    unified-model batch twin of the watermarked stream-stream join.  All
    comparisons and outputs in epoch-µs (the cross-engine-faithful events
    precision)."""
    from agf_data_ingestion_spark.streaming.windowed import interval_join

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    clicks = e.filter(F.col("event_type") == "click")
    j = interval_join(views, clicks, key="user_id", max_delay="4 hours")
    return j.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.ts_us").alias("view_ts_us"),
        (F.col("r.ts_us") - F.col("l.ts_us")).alias("delay_us"),
    )


_INTERVAL_JOIN_SQL = """
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       epoch_us(v.ts) AS view_ts_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(v.ts)
 AND epoch_us(c.ts) <= epoch_us(v.ts) + 14400000000
"""


def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not a rollup/cube prefix family): totals by
    (returnflag, linestatus), by (returnflag, ship-year), and the grand
    total, with per-column grouping flags to disambiguate aggregated-away
    nulls.  One shuffle: Spark expands the sets map-side and aggregates all
    of them in a single Expand + HashAggregate pass."""
    l = t(spark, sf_dir, "lineitem").withColumn(
        "l_year", F.year("l_shipdate").cast("int")
    )
    return l.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag", "l_year"], []],
        "l_returnflag",
        "l_linestatus",
        "l_year",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.grouping("l_year").cast("int").alias("g_yr"),
        F.count("*").alias("n"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


_GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       CAST(GROUPING(CAST(year(l_shipdate) AS INT)) AS INT) AS g_yr,
       COUNT(*) AS n, {o_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag, CAST(year(l_shipdate) AS INT)),
                        ())
"""


# ---------------------------------------------------------------------------
# Approximate aggregates (OP-X-APPROX) — sketch outputs are engine-specific,
# so the check is rows-only here; tests/test_windows.py bounds the error
# against exact values.
# ---------------------------------------------------------------------------


def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed-counts operator (streaming/windowed.py) run
    over a bounded input — Structured Streaming's unified model means the
    identical function serves both; the oracle re-derives the tumbling
    bucket arithmetic (OP-STRM-LATE's aggregation shape, batch-checked)."""
    from agf_data_ingestion_spark.streaming.windowed import windowed_counts

    e = t(spark, sf_dir, "events")
    out = windowed_counts(e, time_col="ts", window="10 minutes")
    return out.select(
        F.unix_timestamp("window_start").alias("win_start_s"),
        "event_type",
        "n_events",
    )


_TUMBLING_SQL = """
SELECT (epoch_us(ts) // 1000000) // 600 * 600 AS win_start_s,
       event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def events_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface in one pass: lag/lead, frame-bounded
    moving sum (exact decimal), rank/dense_rank/ntile over a unique total
    order (OP-X-WINFRAME)."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    wt = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wv = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.lag("value").over(wt).alias("prev_value"),
        F.lead("value").over(wt).alias("next_value"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(wt.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("moving_sum3"),
        F.rank().over(wv).cast("long").alias("value_rank"),
        F.dense_rank().over(wv).cast("long").alias("value_dense_rank"),
        F.ntile(4).over(wv).cast("long").alias("value_quartile"),
    )


_WINDOW_FUNCS_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       lag(value) OVER wt AS prev_value,
       lead(value) OVER wt AS next_value,
       CAST(SUM(CAST(value AS DECIMAL(25,6)))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
       CAST(rank() OVER wv AS BIGINT) AS value_rank,
       CAST(dense_rank() OVER wv AS BIGINT) AS value_dense_rank,
       CAST(ntile(4) OVER wv AS BIGINT) AS value_quartile
FROM events
WHERE user_id < 20
WINDOW wt AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
       wv AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
"""


def events_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe grouped aggregation (OP-X-SKEW): the salted two-phase
    plan must produce exactly the plain GROUP BY result — the oracle IS the
    unsalted query."""
    from agf_data_ingestion_spark.operators.skew import salted_sum_count

    e = t(spark, sf_dir, "events")
    return salted_sum_count(
        e, ["event_type"], F.col("value"), salt_from=["event_id"], n_salt=16
    )


_SALTED_SQL = f"""
SELECT event_type, COUNT(*) AS n, {o_dsum('value')} AS total
FROM events GROUP BY event_type
"""


def events_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (the one frame type rows-frames can't fake):
    per user, the trailing-10-minute value sum and event count at every
    event.  RANGE BETWEEN includes *peers* (equal timestamps), so both
    engines aggregate the identical row set even with ts collisions; the
    sum is decimal-exact, so within-frame accumulation order can't matter.

    Scale: one shuffle on user_id, then a sorted streaming frame per
    partition — state is the open 10-minute window, not the history.
    """
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("trail_10m_value"),
        F.count("*").over(w).cast("long").alias("trail_10m_n"),
    )


_TIME_RANGE_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER wr AS DOUBLE) AS trail_10m_value,
       CAST(COUNT(*) OVER wr AS BIGINT) AS trail_10m_n
FROM events
WHERE user_id < 30
WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""


_TYPES = ("click", "error", "purchase", "signup", "view")


def events_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip (OP-X-UNPIVOT): per-day counts pivoted
    wide over a FIXED type list (determinism: never let pivot infer its
    columns from data), then melted back to long form with zero-fill — the
    densified (day × type) matrix, including combinations absent from the
    input."""
    e = t(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.to_date("ts").cast("string").alias("day"))
        .pivot("event_type", list(_TYPES))
        .count()
    )
    long = wide.unpivot("day", list(_TYPES), "event_type", "n")
    return long.select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))


_UNPIVOT_SQL = """
WITH days AS (SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events),
types AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
counts AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
FROM days d CROSS JOIN types t
LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
"""


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` (the streaming-capable session
    operator — dynamic-gap merging inside the aggregation, no explicit lag
    chain), checked against a gap-islands oracle.  Boundary semantics
    differ from events_sessionize by design: session_window merges events
    whose [ts, ts+gap) windows OVERLAP, so a successor exactly ``gap``
    later starts a NEW session (strict <), while the lag formulation keeps
    it (<=) — the oracle encodes the strict rule.  Scale shape: one
    shuffle on user_id; in streaming the same expression runs with a
    watermark and merging session state."""
    e = t(spark, sf_dir, "events")
    gap_s = _GAP_US // 1_000_000
    return (
        e.groupBy("user_id", F.session_window("ts", f"{gap_s} seconds").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start"),
            F.unix_micros("w.end").alias("session_end"),
            "n_events",
        )
    )


_SESSION_NATIVE_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, MIN(ts_us) AS session_start,
       MAX(ts_us) + {_GAP_US} AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_no
"""


# ---------------------------------------------------------------------------
# Forward as-of with tolerance (OP-X-ASOF): click → next purchase ≤ 1 h away
# ---------------------------------------------------------------------------

_ASOF_TOL_US = 3_600_000_000  # 1 hour


def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a tolerance: each click's NEXT purchase by
    the same user within one hour (attribution-window semantics).  Same
    one-shuffle window plan as the backward as-of — direction only flips
    the sort; ``tiebreak`` pins equal-timestamp winners so the result is
    deterministic under any partitioning.  Oracle: LATERAL nearest-row
    lookup (DuckDB's ASOF JOIN has no tolerance)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_ts")
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="c_ts",
        right_time="p_ts",
        direction="forward",
        tolerance=_ASOF_TOL_US,
        tiebreak="purchase_id",
    )
    return out.select(
        "user_id",
        "click_id",
        "c_ts",
        F.col("purchase_id_asof").alias("next_purchase_id"),
        F.col("p_ts_asof").alias("next_purchase_ts"),
    )


_ASOF_FWD_SQL = f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_ts
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, c.c_ts,
       p.purchase_id AS next_purchase_id, p.p_ts AS next_purchase_ts
FROM clicks c LEFT JOIN LATERAL (
  SELECT purchase_id, p_ts FROM purch p
  WHERE p.user_id = c.user_id AND p.p_ts >= c.c_ts
    AND p.p_ts - c.c_ts <= {_ASOF_TOL_US}
  ORDER BY p.p_ts ASC, purchase_id ASC LIMIT 1
) p ON TRUE
"""


# ---------------------------------------------------------------------------
# Z-order layout keys (OP-X-ZORDER): 2-D clustering for file-level pruning
# ---------------------------------------------------------------------------

_Z_TS_BUCKET_US = 3_600_000_000  # 1-hour time buckets


_Z_NORM_BITS = 16


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (user_id, hour-bucket): the write-side layout key
    that makes parquet min/max stats selective on user AND time at once
    (functions/zorder.py).  Both dimensions are min-max normalized onto 16
    bits BEFORE interleaving — interleaving raw values lets the
    wider-magnitude column dominate the sort (a 19-bit hour bucket against
    a 4-bit user id degrades to a plain time sort), which is why every
    production Z-ORDER normalizes first.  Emits each event's zkey plus its
    256-way layout bucket — the file-group it would land in if the table
    were written sorted by zkey.  tests/test_zorder.py measures the
    locality win vs single-column sorts.  Scale shape: the min/max bounds
    are one scalar aggregate (broadcast), the key itself is pure
    whole-stage-codegen bit math — map-only at any corpus size."""
    from agf_data_ingestion_spark.functions.zorder import (
        _interleave_expr,
        norm_expr,
    )

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(f"ts_us div {_Z_TS_BUCKET_US}").alias("hour_bucket"),
    )
    bounds = e.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("hour_bucket").alias("hlo"),
        F.max("hour_bucket").alias("hhi"),
    )
    na = norm_expr("user_id", "ulo", "uhi", _Z_NORM_BITS)
    nb = norm_expr("hour_bucket", "hlo", "hhi", _Z_NORM_BITS)
    z = e.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        "hour_bucket",
        F.expr(_interleave_expr(f"({na})", f"({nb})", _Z_NORM_BITS)).alias("zkey"),
    )
    return z.select(
        "event_id",
        "user_id",
        "hour_bucket",
        "zkey",
        F.expr(f"zkey >> {2 * _Z_NORM_BITS - 8}").cast("int").alias("z_bucket"),
    )


def _zorder_sql() -> str:
    from agf_data_ingestion_spark.functions.zorder import (
        _interleave_expr,
        norm_expr,
    )

    na = norm_expr("user_id", "ulo", "uhi", _Z_NORM_BITS)
    nb = norm_expr("hour_bucket", "hlo", "hhi", _Z_NORM_BITS)
    z = _interleave_expr(f"({na})", f"({nb})", _Z_NORM_BITS)
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) // {_Z_TS_BUCKET_US} AS hour_bucket
  FROM events
),
b AS (
  SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
         MIN(hour_bucket) AS hlo, MAX(hour_bucket) AS hhi
  FROM e
),
z AS (
  SELECT event_id, user_id, hour_bucket, {z} AS zkey
  FROM e CROSS JOIN b
)
SELECT event_id, user_id, hour_bucket, zkey,
       CAST(zkey >> {2 * _Z_NORM_BITS - 8} AS INT) AS z_bucket
FROM z
"""


# ---------------------------------------------------------------------------
# Hilbert-curve layout key (OP-X-HILBERT): the locality upgrade over Morton
# ---------------------------------------------------------------------------


def events_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert keys over the same (user_id, hour-bucket) grid as
    ``events_zorder_layout`` — the curve visits every cell of the
    256×256 grid through ADJACENT cells only, so a contiguous key range
    (one file group under ``OPTIMIZE``) covers a tighter rectangle than
    Morton's cross-quadrant jumps (tests/test_hilbert.py measures the
    span win; Delta's liquid clustering made the same move).

    Scale shape: the corpus pass is map-only (normalize to 8-bit cells);
    the curve transform runs on the DISTINCT CELL table (≤ 65 536 rows
    regardless of corpus size) as an Arrow-batched exact-int64 numpy UDF
    — 8 unrolled SQL rounds would CollapseProject into a ~3^8-node
    expression (the janino-blowup rule) — and joins back broadcast, so
    Python cost is grid-bounded, never corpus-bounded.  The DuckDB twin
    runs the SAME integer rounds as chained MATERIALIZED CTEs
    (functions/zorder.py ``hilbert_sql_cte``), so hkey hash-matches
    bit-for-bit."""
    import pandas as pd

    from agf_data_ingestion_spark.functions.zorder import (
        _H_BITS,
        hilbert_np,
        norm_expr,
    )

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(f"ts_us div {_Z_TS_BUCKET_US}").alias("hour_bucket"),
    )
    bounds = e.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("hour_bucket").alias("hlo"),
        F.max("hour_bucket").alias("hhi"),
    )
    na = norm_expr("user_id", "ulo", "uhi", _H_BITS)
    nb = norm_expr("hour_bucket", "hlo", "hhi", _H_BITS)
    g = e.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        "hour_bucket",
        F.expr(na).alias("cx"),
        F.expr(nb).alias("cy"),
    )
    h_udf = F.pandas_udf(
        lambda x, y: pd.Series(hilbert_np(x, y, _H_BITS)), "bigint"
    )
    sig = (
        g.select("cx", "cy")
        .distinct()
        .select("cx", "cy", h_udf("cx", "cy").alias("hkey"))
    )
    return g.join(F.broadcast(sig), ["cx", "cy"]).select(
        "event_id",
        "user_id",
        "hour_bucket",
        "cx",
        "cy",
        "hkey",
        F.expr(f"hkey >> {2 * _H_BITS - 8}").cast("int").alias("h_bucket"),
    )


def _hilbert_sql() -> str:
    from agf_data_ingestion_spark.functions.zorder import (
        _H_BITS,
        hilbert_sql_cte,
        norm_expr,
    )

    na = norm_expr("user_id", "ulo", "uhi", _H_BITS)
    nb = norm_expr("hour_bucket", "hlo", "hhi", _H_BITS)
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) // {_Z_TS_BUCKET_US} AS hour_bucket
  FROM events
),
b AS (
  SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
         MIN(hour_bucket) AS hlo, MAX(hour_bucket) AS hhi
  FROM e
),
g AS MATERIALIZED (
  SELECT event_id, user_id, hour_bucket, {na} AS cx, {nb} AS cy
  FROM e CROSS JOIN b
),
cells AS MATERIALIZED (SELECT DISTINCT cx, cy FROM g),
{hilbert_sql_cte("cells", _H_BITS)}
SELECT g.event_id, g.user_id, g.hour_bucket, g.cx, g.cy, hsig.hkey,
       CAST((hsig.hkey >> {2 * _H_BITS - 8}) AS INT) AS h_bucket
FROM g JOIN hsig ON g.cx = hsig.cx AND g.cy = hsig.cy
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build (OP-X-SCD2): change events → validity intervals
# ---------------------------------------------------------------------------


def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each user's event
    stream into (attribute, valid_from, valid_to, version) rows — one row
    per *change* of event_type, open-ended current row (valid_to NULL).

    The warehouse-standard change-capture pattern: lag() detects change
    points, a running count assigns versions, lead() closes each interval
    (shared builder: operators/scd2.py; the streaming maintainer in
    streaming/scd2.py derives the same table incrementally).  Timestamps
    are epoch-µs BIGINTs (cross-engine faithful, see plans/base.py).
    Scale shape: everything is ONE hash partition by user_id — the three
    window functions share a single (user_id, ts_us) sort, no extra
    shuffle (check: one Exchange in the plan)."""
    from agf_data_ingestion_spark.operators.scd2 import scd2_intervals

    return scd2_intervals(t(spark, sf_dir, "events"))


_SCD2_SQL = """
WITH d AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type <> lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
v AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS version
  FROM d
),
runs AS (
  SELECT user_id, event_type, ts_us AS valid_from, version
  FROM v WHERE chg = 1
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       CAST(version AS BIGINT) AS version,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM runs
WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


def events_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal-validity) join — the feature-store
    correctness primitive: each 'click' fact is enriched with the
    dimension state that was valid AT its event time, never a later one
    (no feature leakage).  The dimension is a Type-2 history of each
    user's spending band (low/mid/high by event value) built with the
    shared SCD2 builder; the join predicate is the half-open interval
    ``valid_from ≤ ts < valid_to`` (open current row ⇒ no upper bound),
    which matches EXACTLY ONE version per fact because consecutive
    intervals tile the user's timeline.

    Scale shape: both sides key on user_id — one co-keyed shuffle join
    with the interval test as a residual; the dimension side is rows per
    user per CHANGE (≪ events).  As-of joins (events_asof_click) answer
    "latest before"; this answers "valid during" — the SCD2 twin."""
    from agf_data_ingestion_spark.operators.scd2 import scd2_intervals

    e = t(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 100.0, F.lit("low"))
        .when(F.col("value") < 300.0, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    dim = scd2_intervals(e.withColumn("event_type", band)).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("band"),
        "valid_from",
        "valid_to",
        "version",
    )
    facts = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    cond = (
        (facts.user_id == dim.d_user)
        & (dim.valid_from <= facts.ts_us)
        & (dim.valid_to.isNull() | (facts.ts_us < dim.valid_to))
    )
    return (
        facts.join(dim.hint("shuffle_hash"), cond)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "band",
            F.col("version").alias("band_version"),
            F.col("valid_from").alias("band_since_us"),
        )
    )


_PIT_SQL = """
WITH banded AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN value < 100.0 THEN 'low'
              WHEN value < 300.0 THEN 'mid'
              ELSE 'high' END AS band
  FROM events
),
d AS (
  SELECT user_id, band, ts_us, event_id,
         CASE WHEN lag(band) OVER w IS NULL
                OR band <> lag(band) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM banded
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
v AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS version
  FROM d
),
runs AS (
  SELECT user_id, band, ts_us AS valid_from, version
  FROM v WHERE chg = 1
),
dim AS (
  SELECT user_id, band, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
         CAST(version AS BIGINT) AS version
  FROM runs
)
SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us, m.band,
       m.version AS band_version, m.valid_from AS band_since_us
FROM events f
JOIN dim m ON f.user_id = m.user_id
          AND m.valid_from <= epoch_us(f.ts)
          AND (m.valid_to IS NULL OR epoch_us(f.ts) < m.valid_to)
WHERE f.event_type = 'click'
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + forward fill — the densification pass
    feature pipelines run before windowed models: each user's daily
    activity series is made DENSE from their first to their last active
    day (``sequence`` + explode — no calendar table, no driver loop),
    missing days get additive identities (0 events, 0.0 value), and the
    day's closing event_type is carried forward across gaps with
    ``last(..., ignorenulls=True)`` over the per-user day order.

    Determinism: "closing" event per day = max (ts_us, event_id) via a
    row_number window (unique tiebreak); value sums are decimal-cast;
    days render as strings (DATE comparison domains differ across
    engines).  Scale shape: one (user_id, day) aggregation, one
    per-user sequence explode (output rows bounded by user lifespan),
    one (user_id) window — every stage keys on user_id so a single
    partitioning serves the chain."""
    e = t(spark, sf_dir, "events")
    day = F.to_date(F.col("ts"))
    w_last = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    daily = (
        e.select("user_id", day.alias("day"), "ts_us", "event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w_last))
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("value_sum"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("closing_type"),
        )
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    dense = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    # daily is one row per (user, active day) — corpus-sized, never
    # broadcast (small-sf statistics would statically plan one)
    joined = dense.join(daily.hint("shuffle_hash"), ["user_id", "day"], "left")
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        F.last("closing_type", ignorenulls=True).over(w_ff).alias("carried_type"),
        F.col("n_events").isNull().alias("is_gap"),
    )


_GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS closing_type
  FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id, CAST(ts AS DATE)
          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events)
  GROUP BY user_id, CAST(ts AS DATE)
),
span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
),
dense AS (
  SELECT s.user_id, CAST(g.day AS DATE) AS day
  FROM span s, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS g(day)
)
SELECT d.user_id, CAST(d.day AS VARCHAR) AS day,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(a.value_sum, 0.0) AS value_sum,
       last_value(a.closing_type IGNORE NULLS) OVER (
         PARTITION BY d.user_id ORDER BY d.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_type,
       a.n_events IS NULL AS is_gap
FROM dense d LEFT JOIN daily a ON d.user_id = a.user_id AND d.day = a.day
"""


def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-aggregate stats, de-Expanded and oracle-pinned (r4).

    The r3 shape mixed ``count_distinct`` with sketch aggregates in ONE
    agg — Catalyst plans N-ary distinct aggregates as an (N+1)-way Expand
    into a single un-keyed reducer, the exact 5×-slower shape the
    operators/profile.py rewrite measured.  Now three Expand-free
    branches joined on the (tiny) group key:

    * exact_users from the distinct-value table (groupBy → count);
    * the HLL / KLL sketches in a plain agg (no distinct → no Expand);
    * exact percentile bounds for the quantile-sketch check.

    Sketch internals are engine-specific, so the sketch OUTPUTS can never
    hash-match DuckDB; instead the query returns exact columns plus
    BOUNDS-VERIFIED booleans — ``approx_users_ok`` (HLL estimate within
    4×rsd = 20% of the exact count) and ``approx_median_ok``
    (percentile_approx(0.5) lands between the exact 45th and 55th
    percentiles; with accuracy 10000 the rank error is ≤ n/10000, far
    inside that band).  The oracle recomputes the exact columns and
    asserts the claims TRUE — a dishonest or out-of-bounds sketch fails
    the hash match, so the entry is a real correctness row, not
    ``no_oracle``.
    """
    e = t(spark, sf_dir, "events")
    exact = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("user_id").alias("exact_users"))
    )
    approx = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id").alias("_approx_users"),
        F.percentile_approx("value", 0.5).alias("_approx_median"),
        F.percentile("value", 0.45).alias("_p45"),
        F.percentile("value", 0.55).alias("_p55"),
    )
    # 4×rsd(0.05) = 20%: the driver REGENERATES testdata between rounds,
    # so the bound must hold for any draw — at 4σ a per-group failure is
    # ~6e-5, negligible across rounds; a genuinely broken sketch (or a
    # dishonest claim) still fails the oracle hash
    users_ok = (
        F.abs(F.col("_approx_users") - F.col("exact_users"))
        <= F.ceil(F.col("exact_users") * 0.20)
    )
    median_ok = F.when(
        F.col("_approx_median").isNull(), F.col("_p45").isNull()
    ).otherwise(
        F.col("_approx_median").between(F.col("_p45"), F.col("_p55"))
    )
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "n_events",
            "exact_users",
            F.coalesce(users_ok, F.lit(False)).alias("approx_users_ok"),
            F.coalesce(median_ok, F.lit(False)).alias("approx_median_ok"),
        )
    )


_APPROX_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_users_ok,
       TRUE AS approx_median_ok
FROM events GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "events_asof_click": QuerySpec(events_asof_click, _ASOF_SQL, ("OP-X-ASOF",)),
    "events_value_bands": QuerySpec(events_value_bands, _RANGE_SQL, ("OP-X-RANGE",)),
    "events_sessionize": QuerySpec(events_sessionize, _SESSION_SQL, ("OP-X-SESSION", "OP-STRM-LATE")),
    "lineitem_rollup": QuerySpec(lineitem_rollup, _ROLLUP_SQL, ("OP-X-ROLLUP",)),
    "orders_cube": QuerySpec(orders_cube, _CUBE_SQL, ("OP-X-CUBE",)),
    "lineitem_grouping_sets": QuerySpec(
        lineitem_grouping_sets, _GROUPING_SETS_SQL, ("OP-X-ROLLUP", "OP-X-CUBE")
    ),
    "events_interval_join": QuerySpec(
        events_interval_join, _INTERVAL_JOIN_SQL, ("OP-X-RANGE", "OP-STRM-LATE")
    ),
    "events_tumbling_windows": QuerySpec(
        events_tumbling_windows, _TUMBLING_SQL, ("OP-STRM-LATE", "OP-STRM-TRIGGER")
    ),
    "events_window_funcs": QuerySpec(
        events_window_funcs, _WINDOW_FUNCS_SQL, ("OP-X-WINFRAME", "OP-WIN-DEDUPNAME")
    ),
    "events_salted_type_counts": QuerySpec(
        events_salted_type_counts, _SALTED_SQL, ("OP-X-SKEW", "OP-AGG-SUM")
    ),
    "events_approx_stats": QuerySpec(
        events_approx_stats, _APPROX_STATS_SQL, ("OP-X-APPROX",)
    ),
    "events_scd2_intervals": QuerySpec(
        events_scd2_intervals, _SCD2_SQL, ("OP-X-SCD2", "OP-X-WINFRAME")
    ),
    "events_pit_enrich": QuerySpec(
        events_pit_enrich, _PIT_SQL, ("OP-X-PIT", "OP-X-SCD2", "OP-X-RANGE")
    ),
    "events_gap_fill": QuerySpec(
        events_gap_fill, _GAP_FILL_SQL, ("OP-X-GAPFILL", "OP-X-WINFRAME", "OP-DATE-FMT")
    ),
    "events_asof_next_purchase": QuerySpec(
        events_asof_next_purchase, _ASOF_FWD_SQL, ("OP-X-ASOF",)
    ),
    "events_zorder_layout": QuerySpec(
        events_zorder_layout, _zorder_sql(), ("OP-X-ZORDER",)
    ),
    "events_hilbert_layout": QuerySpec(
        events_hilbert_layout, _hilbert_sql(), ("OP-X-HILBERT",)
    ),
    "events_session_window_native": QuerySpec(
        events_session_window_native, _SESSION_NATIVE_SQL, ("OP-X-SESSION", "OP-STRM-LATE")
    ),
    "events_time_range_sum": QuerySpec(
        events_time_range_sum, _TIME_RANGE_SQL, ("OP-X-WINFRAME",)
    ),
    "events_unpivot_long": QuerySpec(
        events_unpivot_long, _UNPIVOT_SQL, ("OP-X-UNPIVOT", "OP-AGG-CONDCOUNT")
    ),
}
