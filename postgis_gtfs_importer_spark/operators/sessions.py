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


def path_mining(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k most frequent n-step paths WITHIN sessions — the sequence
    question behind every product-analytics "path analysis" view
    (event_transitions answers the one-step Markov version; this mines
    the literal n-grams of the session event stream).

    Sessions are tagged inline with the sessionize recipe (gap >
    ``gap_sec`` starts a new one; ordering ties broken on the event id,
    so the numbering is total). Each session's ordered event-type
    sequence is assembled ONCE per session (collect_list of
    (epoch, id, type) structs + array_sort — struct ordering gives the
    same total order as the window), and the n-grams are emitted
    MAP-SIDE from the array (the shingle_rows slice recipe — no
    positional self-join). Per-session arrays are bounded by session
    length, which the gap rule bounds by construction — a pathological
    never-idle user is a data-quality signal, not a plan hazard.

    Plan: the session window's one user-keyed sort, one grouped
    collect per session, one map-side n-gram explode, one
    map-side-combined path count, then a distributed TakeOrdered for
    the top-k (count DESC, path ASC — deterministic at the boundary).
    Rows with a NULL user, timestamp, type, or id are EXCLUDED up
    front (the sessions-family policy pinned in r7: an unattributable
    event belongs to no session).
    """
    if int(n) < 2:
        raise ValueError(f"path_mining needs n >= 2, got {n}")
    keep = (
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(id_col).isNotNull()
    )
    epoch = F.unix_timestamp(F.col(ts_col))
    # the gap flags MUST be computed under the SAME total order they
    # are later cumulated and sequenced in — (whole-second epoch, id),
    # the w_run/array_sort/oracle order. Ordering the lag by the raw
    # microsecond ts would let two same-second events whose sub-second
    # order disagrees with their id order sum flags computed in one
    # order under another, mis-assigning sessions (r8 ADVICE).
    w = Window.partitionBy(user_col).orderBy(epoch, F.col(id_col))
    flagged = events.filter(keep).select(
        F.col(user_col).alias("_u"),
        epoch.alias("_te"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_ty"),
        F.when(epoch - F.lag(epoch).over(w) > gap_sec, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    w_run = (
        Window.partitionBy("_u")
        .orderBy("_te", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = flagged.withColumn("_sid", F.sum("_new").over(w_run))
    seqs = (
        sid.groupBy("_u", "_sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_te", "_id", "_ty"))
            ).alias("_seq")
        )
        .select(F.expr("transform(_seq, x -> x._ty)").alias("_t"))
    )
    gram = F.expr(
        f"transform(slice(_t, 1, greatest(size(_t) - {int(n) - 1}, 0)),"
        " (x, i) -> concat_ws(' > ', "
        + ", ".join(f"_t[i + {j}]" for j in range(int(n)))
        + "))"
    )
    return (
        seqs.select(F.explode(gram).alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(int(k))
    )
