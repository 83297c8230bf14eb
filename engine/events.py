"""Event-stream operators for pipeline telemetry (beyond the reference,
which is batch IR only — SURVEY.md section 2.8).

A training-data pipeline monitors its ingest with event analytics; the
two canonical patterns missing from plain aggregation are:

  sessionize   gap-based session assignment: a new session starts when
               a user's inter-event gap exceeds the timeout. One
               window pass: lag(ts) -> gap flag -> running sum. No
               self-joins, scales as a single shuffle on user_id.
  asof_join    each event of one type matched to the most recent prior
               event of another type for the same user (the classic
               as-of/point-in-time join). Expressed as a union + one
               window (last value, ignoring nulls, over preceding
               rows) — again one shuffle, no range join explosion.

Both are pure JVM window algebra with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """(event_id, user_id, ts, session_id): session_id is
    user_id || '#' || running count of gap breaks (first session = 1).
    Deterministic tie order: (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new", is_new)
        .withColumn("session_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(
            "event_id", "user_id", "ts",
            F.concat_ws("#", F.col("user_id").cast("string"),
                        F.col("session_seq").cast("string")).alias("session_id"),
        )
    )


def sessionize_sql(table: str = "events",
                   gap_minutes: int = SESSION_GAP_MIN) -> str:
    return f"""
        WITH g AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w)
                                > {gap_minutes * 60}
                        THEN 1 ELSE 0 END AS is_new
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ts,
               user_id::VARCHAR || '#' ||
               (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING))::VARCHAR
                   AS session_id
        FROM g
    """


def asof_join(events: DataFrame, left_type: str = "purchase",
              right_type: str = "view") -> DataFrame:
    """For each left_type event: the event_id/ts of the same user's most
    recent right_type event at-or-before it (NULL if none). Single
    window over the union — no range join."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = events.where(F.col("event_type").isin(left_type, right_type))
    matched = tagged.withColumn(
        "asof_event_id",
        F.last(F.when(F.col("event_type") == right_type, F.col("event_id")),
               ignorenulls=True).over(w),
    ).withColumn(
        "asof_ts",
        F.last(F.when(F.col("event_type") == right_type, F.col("ts")),
               ignorenulls=True).over(w),
    )
    return matched.where(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts", "asof_event_id", "asof_ts"
    )


def asof_join_sql(table: str = "events", left_type: str = "purchase",
                  right_type: str = "view") -> str:
    return f"""
        WITH tagged AS (
            SELECT * FROM {table}
            WHERE event_type IN ('{left_type}', '{right_type}')
        ), m AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = '{right_type}'
                                   THEN event_id END IGNORE NULLS) OVER w
                       AS asof_event_id,
                   last_value(CASE WHEN event_type = '{right_type}'
                                   THEN ts END IGNORE NULLS) OVER w AS asof_ts
            FROM tagged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT event_id, user_id, ts, asof_event_id, asof_ts
        FROM m WHERE event_type = '{left_type}'
    """
