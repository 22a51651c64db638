"""Funnel/cohort operator semantics on hand-built fixtures — order
enforcement, window enforcement, zero-reached steps, cohort offsets.
(Value parity vs DuckDB at sf0.01 is tests/test_oracle_parity.py's job.)"""

from __future__ import annotations

import datetime as dt

import pytest

from postgis_gtfs_importer_spark.operators.funnels import (
    funnel_steps,
    retention_cohorts,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _steps(df):
    return {r.step: (r.step_type, r.n_users) for r in df.collect()}


def test_funnel_order_and_window(spark):
    rows = [
        # u1: perfect funnel inside the window
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # u2: click BEFORE view — step order violated, stops at view
        (2, "click", 0), (2, "view", 10), (2, "purchase", 20),
        # u3: purchase outside the anchor window
        (3, "view", 0), (3, "click", 10), (3, "purchase", 4000),
        # u4: never views — not even in step 0
        (4, "click", 0), (4, "purchase", 10),
    ]
    out = _steps(funnel_steps(_ev(spark, rows), ["view", "click", "purchase"],
                              window_sec=3600))
    assert out[0] == ("view", 3)       # u1, u2, u3
    assert out[1] == ("click", 2)      # u1, u3 (u2's click precedes its view)
    assert out[2] == ("purchase", 1)   # u1 only


def test_funnel_reports_empty_steps_as_zero(spark):
    rows = [(1, "view", 0), (2, "view", 5)]
    out = _steps(funnel_steps(_ev(spark, rows), ["view", "click", "purchase"]))
    assert out == {0: ("view", 2), 1: ("click", 0), 2: ("purchase", 0)}


def test_funnel_uses_earliest_qualifying_event(spark):
    # u1's SECOND click is in-window of nothing; the first click anchors
    # the purchase check — purchase 30s after first click qualifies
    rows = [
        (1, "view", 0), (1, "click", 100), (1, "click", 3500),
        (1, "purchase", 130),
    ]
    out = _steps(funnel_steps(_ev(spark, rows), ["view", "click", "purchase"],
                              window_sec=3600))
    assert out[2] == ("purchase", 1)


def test_retention_cohorts_offsets(spark):
    wk = 7 * 24 * 3600
    rows = [
        (1, "view", 0), (1, "view", wk + 5), (1, "view", 3 * wk),
        (2, "view", wk), (2, "view", 2 * wk),
        (3, "view", 0),
    ]
    out = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // wk
    # u1+u3 in cohort `base`; u1 retained at offsets 1 and 3
    assert out[(base, 0)] == 2
    assert out[(base, 1)] == 1
    assert out[(base, 3)] == 1
    # u2's own cohort one week later
    assert out[(base + 1, 0)] == 1
    assert out[(base + 1, 1)] == 1


def test_funnel_monotone_on_real_testdata(spark):
    from postgis_gtfs_importer_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = [
        r.n_users
        for r in funnel_steps(ev, ["view", "click", "purchase"], 86400)
        .orderBy("step")
        .collect()
    ]
    assert len(out) == 3
    assert out[0] >= out[1] >= out[2] >= 0
