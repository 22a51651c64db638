"""Round-9 ADVICE regression pins (all four r8 ADVICE items).

1. half_life_decay shifts a BIGINT: the old ``shiftleft(1, ...)`` took
   an INT literal, so Spark wrapped the shift count mod 32 — at
   max_buckets >= 31 the newest event's weight came out NEGATIVE
   (1 << 31 = -2147483648 as INT) and every sum was silently corrupt,
   while the validation explicitly permits max_buckets up to 62.
2. path_mining computes its gap flags under the SAME total order they
   are cumulated and sequenced in — (whole-second epoch, event id).
   The old lag window ordered by the raw microsecond ts, so two
   same-second events whose sub-second order disagreed with their id
   order summed flags computed in one order under another, assigning
   events to the wrong session.
3. poisson_bootstrap_ci separates every seed component: with no
   salt/r separator, (salt='pb', r=1, id='5:x') and (salt='pb', r=15,
   id='x') hashed identically, aliasing weights across resamples.
4. priority_sample rejects inputs carrying its scratch name ``_pri``
   or output name ``rank`` loudly — the guard its exact sibling
   weighted_sample_aes already had.
"""

from __future__ import annotations

import datetime as dt

import pytest

from postgis_gtfs_importer_spark.operators.curation import priority_sample
from postgis_gtfs_importer_spark.operators.scoring import poisson_bootstrap_ci
from postgis_gtfs_importer_spark.operators.sessions import path_mining
from postgis_gtfs_importer_spark.operators.temporal import half_life_decay


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- item 1


def test_half_life_decay_exact_above_31_buckets(spark):
    """max_buckets=40: newest event must weigh 2^40, an event 1 unit
    old 2^39, an event >= 40 units old exactly 1 — all positive, all
    exact BIGINTs. Under the INT-wrap bug the newest weight was
    1 << (40 mod 32) = 256 at best and NEGATIVE at shift 31."""
    unit = 3600
    rows = [
        ("k", _ts("2024-01-10T12:00:00")),          # age 0  -> 2^40
        ("k", _ts("2024-01-10T11:00:00")),          # age 1  -> 2^39
        ("k", _ts("2024-01-05T12:00:00")),          # age 120 -> saturates at 1
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = half_life_decay(
        df, key_cols=["g"], ts_col="ts", unit_seconds=unit, max_buckets=40
    ).collect()
    assert len(out) == 1
    got = out[0]
    assert got["n_events"] == 3
    assert got["decayed_count_s"] == (1 << 40) + (1 << 39) + 1


def test_half_life_decay_weight_never_negative_at_any_legal_bucket(spark):
    """Boundary sweep: the scaled weight of the newest event is exactly
    2^max_buckets for every legal max_buckets (0, 30, 31, 32, 62)."""
    df = spark.createDataFrame(
        [("k", _ts("2024-01-10T12:00:00"))], "g string, ts timestamp"
    )
    for mb in (0, 30, 31, 32, 62):
        out = half_life_decay(df, key_cols=["g"], max_buckets=mb).collect()
        assert out[0]["decayed_count_s"] == 1 << mb, f"max_buckets={mb}"


# ---------------------------------------------------------------- item 2


def test_path_mining_same_second_ties_sequence_by_id(spark):
    """Two events in the SAME whole second whose microsecond order
    disagrees with their id order: the session sequence (and the gap
    flags) must both follow (epoch, id). User u's stream is
    a(…00.900000, id=z9), b(…00.100000, id=a1) at 12:00:00 then
    c at 12:00:30 — one session; the path must read 'b > a > c'
    (id order a1 < z9 inside the tied second), and under the old
    mixed-order windows the flag/cumsum mismatch could split sessions
    when the tie straddled a gap boundary."""
    rows = [
        ("u", dt.datetime(2024, 1, 1, 12, 0, 0, 900000), "z9", "a"),
        ("u", dt.datetime(2024, 1, 1, 12, 0, 0, 100000), "a1", "b"),
        ("u", dt.datetime(2024, 1, 1, 12, 0, 30), "m5", "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id string, event_type string"
    )
    out = path_mining(df, n=3, k=5, gap_sec=1800).collect()
    assert [(r["path"], r["n"]) for r in out] == [("b > a > c", 1)]


def test_path_mining_gap_flag_and_cumsum_share_one_order(spark):
    """Adversarial case the r8 ADVICE describes: a same-second tie
    EXACTLY at a session boundary. d's predecessor under (epoch, id)
    is c (gap 0 -> same session), but under microsecond order d's
    predecessor was the far-earlier a (gap > gap_sec -> spurious new
    session). With both windows on (epoch, id) the stream is ONE
    session a,b,c,d -> paths 'a > b', 'b > c', 'c > d'."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u", base, "e1", "a"),
        ("u", base + dt.timedelta(seconds=100, microseconds=700000), "e3", "b"),
        ("u", base + dt.timedelta(seconds=100, microseconds=200000), "e4", "c"),
        ("u", base + dt.timedelta(seconds=200), "e5", "d"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id string, event_type string"
    )
    out = path_mining(df, n=2, k=10, gap_sec=1800).collect()
    got = sorted((r["path"], r["n"]) for r in out)
    assert got == [("a > b", 1), ("b > c", 1), ("c > d", 1)]


# ---------------------------------------------------------------- item 3


def test_poisson_seed_components_cannot_alias(spark):
    """The old construction f"{salt}{r}:" glued salt and r: two
    DIFFERENT calls (salt='pb1', r=5) and (salt='pb', r=15) produced
    the identical seed prefix 'pb15:', so their resamples were
    perfectly correlated instead of independent. The fixed form
    f"{salt}:{r}:" keeps every component separated, so the two calls'
    resample-weight VECTORS must now differ for some id."""
    import hashlib

    from postgis_gtfs_importer_spark.operators.scoring import POISSON1_CDF
    from postgis_gtfs_importer_spark.operators.sketches import KEY_SPACE

    def k_of(seed: str) -> int:
        h = int(hashlib.md5(seed.encode()).hexdigest()[:15], 16)
        u = (h + 1) / KEY_SPACE
        for i, c in enumerate(POISSON1_CDF):
            if u < c:
                return i
        return len(POISSON1_CDF)

    old_a = "pb1" + "5" + ":"      # old form, salt='pb1', r=5
    old_b = "pb" + "15" + ":"      # old form, salt='pb',  r=15
    assert old_a == old_b          # the aliasing the fix removes
    assert "pb1" + ":" + "5" + ":" != "pb" + ":" + "15" + ":"  # fixed form

    # and the aliasing is OBSERVABLE: across many ids, the weight drawn
    # from the two fixed-form seeds must disagree somewhere (identical
    # everywhere would mean the streams are still correlated)
    ids = [f"id{i}" for i in range(64)]
    va = [k_of(f"pb1:5:{i}") for i in ids]
    vb = [k_of(f"pb:15:{i}") for i in ids]
    assert va != vb

    # end-to-end determinism of the fixed path (weights are pure
    # functions of the seed; cents-exact means)
    rows = [("ga", "5:x", 10.0), ("gb", "x", 10.0)]
    df = spark.createDataFrame(rows, "g string, id string, value double")
    out = poisson_bootstrap_ci(
        df, group_cols=["g"], value_col="value", id_col="id", b=16
    ).collect()
    assert {r["g"] for r in out} <= {"ga", "gb"}
    for r in out:
        assert r["mean_c"] == 1000


def test_poisson_oracle_mirrors_seed_separator():
    """The DuckDB twin must replay the identical seed construction."""
    from postgis_gtfs_importer_spark.plans.queries import _poisson_ci_oracle

    sql = _poisson_ci_oracle(b=2, salt="pb")
    assert "md5('pb:0:'" in sql and "md5('pb:1:'" in sql
    assert "md5('pb0:'" not in sql


# ---------------------------------------------------------------- item 4


@pytest.mark.parametrize("bad", ["_pri", "rank"])
def test_priority_sample_rejects_reserved_names(spark, bad):
    df = spark.createDataFrame(
        [("a", 1.0, 0)], f"id string, w double, {bad} long"
    )
    with pytest.raises(ValueError, match="reserved column names"):
        priority_sample(df, key_col="id", weight_col="w", k=1)


def test_priority_sample_still_samples_clean_input(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "id string, w double"
    )
    out = priority_sample(df, key_col="id", weight_col="w", k=2).collect()
    assert len(out) == 2
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
