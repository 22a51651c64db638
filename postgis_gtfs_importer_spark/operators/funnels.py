"""Event-sequence analytics: conversion funnels and retention cohorts.

The behavioral-analytics complement of the sessionization family
(operators/sessions.py): where a session groups events by temporal
proximity, a funnel asserts an ORDER over typed steps and a cohort
matrix tracks populations over calendar offsets. Both are core queries
of any event warehouse and, like everything here, are pure DataFrame
compositions — exact, oracle-replayable, no UDFs.

Scale shape:
  * funnel_steps — one filtered per-user MIN aggregate per step, chained
    by an equi-join on the user key. Each intermediate is user-count-
    sized (NOT event-count-sized): the fact table is scanned once per
    step with the step predicate pushed into the scan, and every join
    key is the user id, so all shuffles are bounded by the distinct-user
    cardinality. No window over the full event stream, no theta join.
  * retention_cohorts — two per-user aggregates ((user) and
    (user, week)) then one count-distinct per (cohort, offset) cell;
    shuffle keys are user and the small cell grid.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: seconds per epoch-week bucket (ISO weeks would drag in calendars;
#: epoch-week arithmetic is exact, mergeable, and engine-identical)
WEEK_SEC = 7 * 24 * 3600


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    window_sec: int = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step conversion funnel with a completion window.

    A user reaches step i when an event of type ``steps[i]`` occurs
    STRICTLY AFTER their step i-1 instant and no later than
    ``window_sec`` after their step-0 anchor (the classic
    fixed-window-from-entry funnel). Each user's step instant is the
    earliest qualifying event — deterministic, replay-independent.

    Returns (step, step_type, n_users) — EXACTLY one row per step,
    monotonically non-increasing in n_users; a step no user reaches
    reports 0 (global aggregates, not group-by — an empty funnel tail is
    a result, not an absence).

    NULL user ids are EXCLUDED up front: without the filter a NULL
    "user" counts at step 0 but can never reach step 1 (equi-joins drop
    NULL keys) — a phantom that deflates every conversion rate while
    never being a trackable user. Mirrored in funnel_oracle_sql.
    """
    assert len(steps) >= 2, "a funnel needs at least 2 steps"
    ep = F.unix_timestamp(F.col(ts_col))
    ev = events.filter(F.col(user_col).isNotNull()).select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), ep.alias("t")
    )

    cur = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_prev"))
        .withColumn("t_anchor", F.col("t_prev"))
    )

    def count_row(df: DataFrame, i: int, st: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(st).alias("step_type"),
            "n_users",
        )

    step_counts = [count_row(cur, 0, steps[0])]
    for i, st in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("et") == st)
            .join(cur, "u")
            .filter(
                (F.col("t") > F.col("t_prev"))
                & (F.col("t") <= F.col("t_anchor") + F.lit(window_sec))
            )
            .groupBy("u")
            .agg(
                F.min("t").alias("t_prev"),
                F.min("t_anchor").alias("t_anchor"),  # 1:1 per user
            )
        )
        step_counts.append(count_row(nxt, i, st))
        cur = nxt

    return reduce(DataFrame.unionByName, step_counts)


def funnel_oracle_sql(
    steps: list[str], window_sec: int = 3600, table: str = "events"
) -> str:
    """DuckDB twin of funnel_steps — generated for any step list so both
    engines share one definition of the funnel. Step/table names are
    embedded in SQL literals, so single quotes are doubled — a step
    like "o'clock" previously produced a syntax error (or, crafted, a
    wrong predicate), while funnel_steps handled it fine via Column
    literals."""

    def _q(name: str) -> str:
        return name.replace("'", "''")

    # The step fix above closed the literal-injection class; the table
    # name is interpolated as an IDENTIFIER and gets the matching
    # treatment: a strict allowlist (same class of fix as
    # profile_columns / segment_lines). Dotted schema qualification is
    # fine; quoting games are not.
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*",
                        table):
        raise ValueError(f"invalid table identifier: {table!r}")

    steps = [_q(st) for st in steps]
    ctes = [
        f"s0 AS (SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,"
        f" CAST(floor(epoch(min(ts))) AS BIGINT) AS tp"
        f" FROM {table} WHERE event_type = '{steps[0]}'"
        f" AND user_id IS NOT NULL GROUP BY user_id)"
    ]
    for i, st in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id,"
            f" min(s{i-1}.t0) AS t0,"
            f" CAST(floor(epoch(min(e.ts))) AS BIGINT) AS tp"
            f" FROM {table} e JOIN s{i-1} ON s{i-1}.user_id = e.user_id"
            f" WHERE e.event_type = '{st}'"
            f" AND CAST(floor(epoch(e.ts)) AS BIGINT) > s{i-1}.tp"
            f" AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s{i-1}.t0 + {window_sec}"
            f" GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS step, '{st}' AS step_type,"
        f" CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i, st in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix over epoch-weeks.

    cohort_week = the epoch-week of a user's first event; each
    (user, active week) pair then lands in cell
    (cohort_week, week_offset = active - cohort). n_users at offset 0 is
    the cohort size; later offsets are its retained population.

    Returns (cohort_week, week_offset, n_users).
    """
    ep = F.unix_timestamp(F.col(ts_col))
    wk = F.floor(ep / F.lit(WEEK_SEC)).cast("long")
    uw = (
        events.select(F.col(user_col).alias("u"), wk.alias("week"))
        .distinct()
    )
    first = uw.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first, "u")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )
