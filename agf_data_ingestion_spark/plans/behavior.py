"""User-behavior analytics over the event stream: ordered funnels, cohort
retention, and threshold-alarm state machines.

The alarm query is reference parity: the reference's CloudWatch alarms
(`cloudformation/agf-monitoring-alarms.yaml:52-155`) evaluate an error
metric per fixed period and enter ALARM only after N consecutive breaching
periods (`EvaluationPeriods`); `operators/alarms.py` implements the
evaluator over arbitrary counters, and ``events_alarm_transitions`` is the
same semantics as a declarative plan with a DuckDB oracle.  Funnel and
retention have no reference counterpart (§2.9 extension surface — the
queries any event-stream engine is expected to answer).

Scale shapes:
* funnel — each stage is filter → per-user min (map-side partial) → join on
  ``user_id``; every join is co-keyed on the same column so one hash
  partitioning serves the whole chain, and stage tables shrink
  monotonically.  No broadcast of anything corpus-sized, no windows over
  the raw stream.
* retention — one distinct on (user, day) (map-side reduced), one per-user
  min, one co-keyed join, then a tiny (cohort × offset) aggregate.
* alarm — one tumbling-bucket aggregate (map-side partial) leaves ≤ one row
  per period; the lag window over periods is metadata-scale by construction.

Cross-engine: timestamps flow as ``ts_us`` BIGINTs (plans/base.py), dates
are emitted as strings, rates are BIGINT/BIGINT → DOUBLE (identical IEEE
division both engines), and stage counts use CASE-sum not boolean casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, dsum, o_dsum, t

# ---------------------------------------------------------------------------
# Ordered funnel (OP-X-FUNNEL): signup → view → click → purchase
# ---------------------------------------------------------------------------

_STAGES = ("signup", "view", "click", "purchase")


def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user strictly-ordered funnel: the first ``signup``, then the
    first ``view`` after it, the first ``click`` after that view, and the
    first ``purchase`` after that click; ``stages_reached`` counts the
    prefix completed.  Users with no signup are not in the funnel.

    Single-pass shape (r4 — the r3 plan built one filtered scan + one
    shuffle join PER STAGE: 8 events FileScans, 7 user_id exchanges,
    EXPLAIN.md): ONE scan filtered to the four stage types, ONE groupBy
    shuffle collecting each later stage's timestamps into a per-user
    array alongside min(signup), then the chained strictly-after mins
    are per-row array expressions — ``array_min(filter(stage_ts, x >
    t_prev))``.  min over a filtered set is order-free, so
    ``collect_list``'s nondeterministic order cannot affect the result
    (bit-identical to the join formulation and the chained-CTE oracle).
    Per-user arrays hold only that user's view/click/purchase timestamps
    — bounded by per-user activity, never corpus-sized.  A no-signup
    user contributes ``x > NULL`` → NULL → dropped by ``filter``, so the
    downstream mins are NULL exactly as the join chain produced."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    agg = (
        e.filter(F.col("event_type").isin(*_STAGES))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == _STAGES[0], F.col("ts_us"))
            ).alias(f"t_{_STAGES[0]}"),
            *[
                F.collect_list(
                    F.when(F.col("event_type") == s, F.col("ts_us"))
                ).alias(f"_a_{s}")
                for s in _STAGES[1:]
            ],
        )
    )
    out = agg.filter(F.col(f"t_{_STAGES[0]}").isNotNull())
    prev = f"t_{_STAGES[0]}"
    for stage in _STAGES[1:]:
        out = out.withColumn(
            f"t_{stage}",
            F.array_min(
                F.filter(F.col(f"_a_{stage}"), lambda x: x > F.col(prev))
            ),
        )
        prev = f"t_{stage}"
    reached = F.lit(1)
    for stage in _STAGES[1:]:
        reached = reached + F.when(F.col(f"t_{stage}").isNotNull(), 1).otherwise(0)
    return out.select(
        "user_id",
        *[f"t_{s}" for s in _STAGES],
        reached.cast("long").alias("stages_reached"),
    )


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_view
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t_signup GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t_view GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s3.t_click GROUP BY e.user_id
)
SELECT s1.user_id, t_signup, t_view, t_click, t_purchase,
       CAST(1 + (CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS stages_reached
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
LEFT JOIN s4 USING (user_id)
"""


# ---------------------------------------------------------------------------
# Cohort retention (OP-X-RETENTION)
# ---------------------------------------------------------------------------


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by first-activity date;
    ``n_users`` = how many of that cohort were active ``day_offset`` days
    later (offset 0 = the cohort's size on day one)."""
    e = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    active = e.distinct()
    first = active.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    # first-touch table is one row per user — corpus-sized, shuffle join
    return (
        active.join(first.hint("shuffle_hash"), "user_id")
        .groupBy(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            F.datediff("d", "cohort_date").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


_RETENTION_SQL = """
WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, MIN(d) AS cohort_date FROM active GROUP BY user_id)
SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
       CAST(date_diff('day', cohort_date, d) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Threshold-alarm state machine (OP-X-ALARM; reference alarm semantics)
# ---------------------------------------------------------------------------

_ALARM_WIN_S = 21600  # 6-hour evaluation period
_ALARM_RATE = 0.25  # error-rate threshold
_ALARM_MIN_N = 20  # ignore starved periods (CloudWatch "treat missing data")
_EVAL_PERIODS = 2  # consecutive breaching periods before ALARM


def events_alarm_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-rate alarm over tumbling evaluation periods with CloudWatch
    EvaluationPeriods=2 semantics: a period *breaches* when its error rate
    exceeds the threshold (given enough traffic); the state is ALARM only
    when the current AND previous recorded periods breach; ``transition``
    marks state changes ('ALARM'/'OK'/'STEADY').

    Docstring parity: threshold + consecutive-period evaluation per
    `cloudformation/agf-monitoring-alarms.yaml:52-155`; the generic counter
    evaluator is operators/alarms.py.
    """
    e = t(spark, sf_dir, "events")
    per = (
        e.groupBy(
            F.expr(f"ts_us div 1000000 div {_ALARM_WIN_S} * {_ALARM_WIN_S}").alias(
                "win_start_s"
            )
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
        .select(
            "win_start_s",
            "n_events",
            "n_errors",
            (F.col("n_errors").cast("double") / F.col("n_events")).alias("error_rate"),
        )
    )
    breach = (F.col("error_rate") > _ALARM_RATE) & (F.col("n_events") >= _ALARM_MIN_N)
    w = Window.orderBy("win_start_s")  # one row per period: metadata-scale
    # ALL of the trailing _EVAL_PERIODS periods must breach (CloudWatch
    # EvaluationPeriods semantics, operators/alarms.py parity).  A
    # breach-AND-lag(N-1) shortcut equals this only for N ≤ 2 — pattern
    # [T, F, T] would falsely alarm at N = 3 — so count breaches over the
    # explicit trailing frame; rows earlier than a full window (rn < N)
    # cannot alarm, mirroring the lag-NULL coalesce.
    w_frame = w.rowsBetween(-(_EVAL_PERIODS - 1), Window.currentRow)
    st = per.select("*", breach.alias("breach")).select(
        "*",
        (
            (F.count_if(F.col("breach")).over(w_frame) == _EVAL_PERIODS)
            & (F.row_number().over(w) >= _EVAL_PERIODS)
        ).alias("in_alarm"),
    )
    prev_alarm = F.coalesce(F.lag("in_alarm").over(w), F.lit(False))
    return st.select(
        "*",
        F.when(F.col("in_alarm") & ~prev_alarm, "ALARM")
        .when(~F.col("in_alarm") & prev_alarm, "OK")
        .otherwise("STEADY")
        .alias("transition"),
    )


_ALARM_SQL = f"""
WITH per AS (
  SELECT (epoch_us(ts) // 1000000) // {_ALARM_WIN_S} * {_ALARM_WIN_S} AS win_start_s,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
b AS (
  SELECT *, CAST(n_errors AS DOUBLE) / n_events AS error_rate,
         (CAST(n_errors AS DOUBLE) / n_events > {_ALARM_RATE} AND n_events >= {_ALARM_MIN_N})
           AS breach
  FROM per
),
st AS (
  SELECT win_start_s, n_events, n_errors, error_rate, breach,
         (COUNT(*) FILTER (WHERE breach)
            OVER (ORDER BY win_start_s
                  ROWS BETWEEN {_EVAL_PERIODS - 1} PRECEDING AND CURRENT ROW)
            = {_EVAL_PERIODS}
          AND row_number() OVER (ORDER BY win_start_s) >= {_EVAL_PERIODS})
           AS in_alarm
  FROM b
)
SELECT *,
       CASE WHEN in_alarm AND NOT COALESCE(lag(in_alarm) OVER (ORDER BY win_start_s), FALSE)
              THEN 'ALARM'
            WHEN NOT in_alarm AND COALESCE(lag(in_alarm) OVER (ORDER BY win_start_s), FALSE)
              THEN 'OK'
            ELSE 'STEADY' END AS transition
FROM st
"""


# ---------------------------------------------------------------------------
# Full-outer daily comparison (OP-X-FULLOUTER): two series, neither dominant
# ---------------------------------------------------------------------------


def events_daily_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click vs purchase volume as a FULL OUTER join on day — days
    present in only one series survive zero-filled (the reconciliation
    report generalized from key sets to measures).  The join key is
    re-derived with an explicit ``coalesce`` on both engines because
    USING-key semantics in outer joins are an established cross-engine trap
    (CLAUDE.md): the surviving key column must be the coalesced value, not
    one side's.

    Scale shape: both sides pre-aggregate to one row per day before the
    join, so the full-outer shuffle is calendar-sized, not event-sized.
    """
    e = t(spark, sf_dir, "events")

    def daily(ev_type: str, n_name: str, v_name: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == ev_type)
            .groupBy(F.to_date("ts").alias("d"))
            .agg(F.count("*").alias(n_name), dsum(F.col("value")).alias(v_name))
        )

    c = daily("click", "n_clicks", "click_value")
    p = daily("purchase", "n_purchases", "purchase_value")
    return (
        c.join(p, c["d"] == p["d"], "full_outer")
        .select(
            F.coalesce(c["d"], p["d"]).cast("string").alias("day"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
    )


_FULL_OUTER_SQL = f"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_clicks,
         {o_dsum('value')} AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1
),
p AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         {o_dsum('value')} AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(COALESCE(c.d, p.d) AS VARCHAR) AS day,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(click_value, 0.0) AS click_value,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(purchase_value, 0.0) AS purchase_value
FROM c FULL OUTER JOIN p ON c.d = p.d
"""


def events_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between the stream's first and second
    halves (split at the midpoint timestamp): per event type, the total-
    variation distance between the two windows' value histograms in ppm —
    the observability signal a 100 TB ingest pipeline alarms on when an
    upstream schema/unit change silently shifts a measure (the
    data-drift/PSI monitoring shape, expressed with the repo's
    exact-integer discipline: PSI needs ln(), which is not IEEE-exact
    cross-engine, while TVD = Σ|share₁ − share₂|/2 is pure integer ppm
    arithmetic).

    Scale shape: ONE corpus pass into a map-combined (type, bin)
    aggregate; totals and the TVD fold run on the tiny histogram table
    (K_types × bins rows) with the totals side broadcast.  Bins are
    `floor(value/10)` — IEEE divide + floor are engine-identical; window
    membership compares exact `ts_us` integers against the broadcast
    midpoint.  A type absent from one window degrades to TVD ≈ 1e6/2
    via the GREATEST(total, 1) guard instead of a divide-by-zero."""
    e = t(spark, sf_dir, "events")
    mid = e.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid"))
    g = e.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.expr("CASE WHEN ts_us >= mid THEN 1 ELSE 0 END").alias("w"),
        F.expr("CAST(floor(value / 10.0) AS BIGINT)").alias("bin"),
    )
    binned = g.groupBy("event_type", "bin").agg(
        F.expr("CAST(SUM(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("n1"),
        F.expr("CAST(SUM(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("n2"),
    )
    totals = binned.groupBy("event_type").agg(
        F.expr("CAST(SUM(n1) AS BIGINT)").alias("t1"),
        F.expr("CAST(SUM(n2) AS BIGINT)").alias("t2"),
    )
    return (
        binned.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("t1").alias("n_first"),
            F.min("t2").alias("n_second"),
            F.expr(
                "CAST(SUM(ABS((n1 * 1000000) div GREATEST(t1, 1)"
                " - (n2 * 1000000) div GREATEST(t2, 1))) div 2 AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


_DRIFT_SQL = """
WITH m AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
g AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END AS w,
         CAST(floor(value / 10.0) AS BIGINT) AS bin
  FROM events CROSS JOIN m
),
binned AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM g GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(n1) AS BIGINT) AS t1,
         CAST(SUM(n2) AS BIGINT) AS t2
  FROM binned GROUP BY 1
)
SELECT b.event_type,
       MIN(t.t1) AS n_first,
       MIN(t.t2) AS n_second,
       CAST(SUM(ABS((n1 * 1000000) // GREATEST(t1, 1)
                    - (n2 * 1000000) // GREATEST(t2, 1))) // 2 AS BIGINT)
         AS tvd_ppm
FROM binned b JOIN tot t ON b.event_type = t.event_type
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "events_funnel_stages": QuerySpec(
        events_funnel_stages, _FUNNEL_SQL, ("OP-X-FUNNEL", "OP-JOIN-ENRICH")
    ),
    "events_retention_cohorts": QuerySpec(
        events_retention_cohorts, _RETENTION_SQL, ("OP-X-RETENTION", "OP-AGG-SETUNION")
    ),
    "events_alarm_transitions": QuerySpec(
        events_alarm_transitions, _ALARM_SQL, ("OP-X-ALARM", "OP-SINK-METRICS")
    ),
    "events_daily_full_outer": QuerySpec(
        events_daily_full_outer, _FULL_OUTER_SQL, ("OP-X-FULLOUTER", "OP-SET-UNION")
    ),
    "events_drift_tvd": QuerySpec(
        events_drift_tvd, _DRIFT_SQL, ("OP-X-DRIFT", "OP-X-STATS")
    ),
}
