"""Session-window aggregation over the event stream (E27).

The reference batches its progress reporting on a wall-clock cadence
(duplicate_gui.py:335-362 drains a queue on a 100 ms ``after`` timer);
the distributed analog a training-data pipeline needs is *sessionization*
of crawl/interaction events: group each user's events into sessions
separated by an inactivity gap, then aggregate per session.

Spark-first shape: the native ``F.session_window`` aggregate — a single
hash exchange on ``user_id`` followed by the built-in session-merge
aggregation (no window-function sort-per-user task, no Python).  At
100 TB the exchange is keyed by user (billions of small groups — no
skew beyond any one user's own event count), and partial aggregation
merges adjacent sessions map-side.

Semantics (pinned by tests/test_sessions.py): an event at ``ts`` joins
the current session iff ``ts <= prev_max_ts + gap`` (Spark's session
merge is boundary-inclusive — verified empirically, exact-boundary
event merges); the emitted window is ``[min_ts, max_ts + gap)``.  The
DuckDB oracle re-derives the same
grouping with the classic gaps-and-islands pattern (lag + cumulative
new-session flags) — their agreement is the cross-check that the two
formulations coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "6 hours"
DEFAULT_GAP_SECONDS = 6 * 3600


def sessionize(events: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """events(user_id, ts, value) -> one row per (user, session).

    Output columns (epoch seconds for cross-engine stability):
      session_start  = floor(epoch(min ts))
      session_end    = floor(epoch(max ts + gap))
      n_events, sum_value (decimal-exact accumulation surfaced as double)
    """
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal accumulation: partial-agg merge order cannot drift
            # vs the oracle; 2-dec decimal -> double is exact both ways
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_windows_sql(gap_seconds: int = DEFAULT_GAP_SECONDS) -> str:
    """DuckDB gaps-and-islands twin of :func:`sessionize`.

    New session iff the gap to the previous event is strictly greater
    than gap_seconds (Spark's session merge is boundary-inclusive:
    ts <= prev + gap extends the session).
    """
    return f"""
WITH ordered AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
tagged AS (
  SELECT *, sum(new_session)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT user_id,
       floor(epoch(min(ts)))::BIGINT AS session_start,
       floor(epoch(max(ts)) + {gap_seconds})::BIGINT AS session_end,
       count(*) AS n_events,
       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
FROM tagged
GROUP BY user_id, session_no
"""
