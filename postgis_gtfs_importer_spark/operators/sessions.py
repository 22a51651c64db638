"""Sessionization — gap-based event sessions (batch + streaming-ready).

The batch form is the classic gaps-and-islands plan: one shuffle on the
user key, a lag() to flag gap starts, a running sum to number sessions,
then a per-session aggregate — every operator whole-stage-codegen'd, fully
deterministic (and therefore DuckDB-oracle-replayable, unlike
``F.session_window`` whose struct output is engine-specific).

The streaming twin (streaming.sessionize_stream) keeps per-user state with
``applyInPandasWithState`` — same session definition, incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per session: (user, session_start ts of first event,
    n_events, duration_sec, session_idx).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_sec``. Ordering ties broken on the event id so the
    numbering is total and deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.when(
            epoch - F.lag(epoch).over(w) > gap_sec, F.lit(1)
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    # lag()==NULL on the first event: when() -> otherwise(0) keeps it 0,
    # so cumulative sum numbers the first session 0
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_sec"),
    )
