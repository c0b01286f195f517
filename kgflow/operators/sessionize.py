"""Event sessionization — the batch expression of stateful streaming.

Gap-based sessions (new session when the intra-user gap exceeds a
timeout) as a pure window program: lag → gap flag → running sum. The
same semantics run incrementally via Structured Streaming
``session_window`` (see kgflow.streaming); this batch form is the
backfill / oracle-checkable path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Adds ``session_id`` (0-based per user) to each event."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # parquet timestamps may be TIMESTAMP_NTZ, which ANSI mode refuses to
    # cast straight to long — hop through TIMESTAMP (session tz is UTC)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id", (F.sum(new_sess).over(w) - 1).cast("int")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """(user_id, n_sessions, n_events, max_session_events)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    per_sess = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_sess.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )
