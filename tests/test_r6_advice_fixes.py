"""Regression tests for the round-6 ADVICE findings.

Each test pins one of the five reviewed defects:
  1. bpe_encode NULL text -> exact zeros (oracle LEFT JOIN + coalesce
     semantics), not NULL counts.
  2. skyline _local_front prior-group running max in exact integer
     arithmetic — float64 sentinel rounding above 2^53 dropped genuine
     front rows.
  3. Spark `div` (truncate) vs DuckDB `//` (floor) on epoch-derived
     day/dow buckets: pre-1970 timestamps must agree between engines.
  4. neardup_incremental cache lifecycle is documented (no leaked
     handle contract) — behavioral part: repeated calls don't error and
     return batch-bounded frames (smoke, the doc is the fix).
  5. funnel_oracle_sql rejects non-identifier table names (the step
     literal escaping fix left the identifier hole open).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.bpe import (
    PINNED_MERGES_12,
    bpe_encode,
)
from postgis_gtfs_importer_spark.operators.funnels import funnel_oracle_sql
from postgis_gtfs_importer_spark.operators.skyline import skyline_2d


def test_bpe_encode_null_and_empty_text_zero_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, "   ")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bpe_encode(df, PINNED_MERGES_12).collect()
    }
    assert len(out) == 4
    for doc_id in (2, 3, 4):
        r = out[doc_id]
        assert (r["n_words"], r["n_symbols_char"], r["n_tokens_bpe"]) == (
            0,
            0,
            0,
        ), f"doc {doc_id}: NULL/empty text must report exact zeros"
    assert out[1]["n_words"] == 2 and out[1]["n_tokens_bpe"] >= 2


def test_skyline_prefilter_exact_above_2_53(spark):
    """A front row whose y is one past a 2^53-scale prior must survive
    the per-partition prefilter: float64 rounds 2^60 and 2^60 + 1 to
    the same value, so the old NaN-sentinel arithmetic dropped it."""
    big = 2**60
    rows = [
        (2, big),       # front: highest x
        (1, big + 1),   # front: lower x, strictly better y (by 1 ulp-ish)
        (1, 5),         # dominated
        (0, big),       # dominated by (2, big) and (1, big+1)
    ]
    # single partition so the PREFILTER (not the exact global pass)
    # is what decides the (1, big+1) row's fate
    df = spark.createDataFrame(rows, "x long, y long").repartition(1)
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(1, big + 1), (2, big)]


def test_skyline_small_ints_unchanged(spark):
    rows = [(1, 10), (2, 8), (3, 5), (2, 9), (1, 1), (3, 4)]
    df = spark.createDataFrame(rows, "x int, y int").repartition(2)
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(1, 10), (2, 9), (3, 5)]


#: the exact day/dow expressions peak_concurrency / weekday_seasonality
#: use, engine side and oracle side (duplicated here on purpose — the
#: test pins their SEMANTICS, so a drive-by rewrite back to `div`/`//`
#: — BOTH of which truncate toward zero, probed: DuckDB -7 // 2 = -3 —
#: fails here even at SFs whose epochs are all positive)
_DAY_EXPR = (
    "CAST(floor(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1e6)"
    " / 86400.0) AS BIGINT)"
)
_DOW_EXPR = f"(((({_DAY_EXPR}) + 3) % 7) + 7) % 7"
_ORACLE_DAY = "CAST(floor(CAST(floor(epoch(TIMESTAMP '{s}')) AS BIGINT) / 86400.0) AS BIGINT)"
_ORACLE_DOW = f"(((({_ORACLE_DAY}) + 3) % 7) + 7) % 7"


def test_epoch_day_floor_matches_duckdb_pre_1970(spark):
    stamps = [
        "1969-12-30 06:00:00",  # floor(-151200/86400) = -2; truncation gives -1
        "1969-12-31 23:59:59",
        "1969-01-05 00:00:01",  # deep enough negative for raw % to go negative
        "1970-01-01 00:00:00",
        "1970-01-02 13:00:00",
        "2024-02-29 12:34:56",
    ]
    df = spark.createDataFrame(
        [(s,) for s in stamps], "s string"
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    got = {
        r["s"]: (r["day"], r["dow"])
        for r in df.select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"),
            F.expr(_DAY_EXPR).alias("day"),
            F.expr(_DOW_EXPR).alias("dow"),
        ).collect()
    }
    con = duckdb.connect()
    for s in stamps:
        day, dow = con.execute(
            f"SELECT {_ORACLE_DAY.format(s=s)}, {_ORACLE_DOW.format(s=s)}"
        ).fetchone()
        assert got[s] == (day, dow), f"{s}: spark {got[s]} vs duckdb {(day, dow)}"
        assert 0 <= dow <= 6
    # spot-pin the motivating case numerically, not just cross-engine
    assert got["1969-12-30 06:00:00"] == (-2, 1)  # a Tuesday, Monday=0


def test_funnel_oracle_sql_rejects_bad_table_identifier():
    with pytest.raises(ValueError):
        funnel_oracle_sql(["a", "b"], table="events; DROP TABLE x--")
    with pytest.raises(ValueError):
        funnel_oracle_sql(["a"], table='ev"ents')
    # legitimate forms still pass
    assert "FROM events" in funnel_oracle_sql(["a", "b"])
    assert "FROM main.events" in funnel_oracle_sql(["a"], table="main.events")


def test_sketches_null_policy_cross_engine(spark):
    """Round-6 self-review finding (same in-domain NULL class as the
    bpe_encode ADVICE item): NULL values used to flow into the sketch
    builders, where they diverge ACROSS ENGINES — Spark ranks NULL keys
    FIRST in the KMV ascending window (consuming a top-k slot) while
    DuckDB ranks them LAST; an HLL NULL forms a phantom register row
    corrupting the m - n_buckets term; CMS/Bloom preimages differ
    because Spark concat() nulls out while DuckDB concat() skips NULLs.
    All four families now EXCLUDE NULLs explicitly (the fixed_histogram
    contract), mirrored in their oracles. This test feeds NULL-bearing
    frames through each builder and asserts the NULL contributes
    nothing — i.e. results equal the NULL-free input's."""
    from postgis_gtfs_importer_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
        cms_counters,
        hll_distinct,
        kmv_distinct,
    )

    vals = [("a", f"u{i}") for i in range(40)] + [("a", None), ("b", None)]
    df = spark.createDataFrame(vals, "g string, v string")
    clean = df.filter(df.v.isNotNull())

    for fn in (
        lambda d: kmv_distinct(d, ["g"], "v", k=16),
        lambda d: hll_distinct(d, ["g"], "v", p=6),
    ):
        got = sorted(map(tuple, fn(df).collect()))
        want = sorted(map(tuple, fn(clean).collect()))
        assert got == want
        assert all(r[0] == "a" for r in got), "NULL-only group must vanish"

    got = sorted(map(tuple, cms_counters(df, "v").collect()))
    want = sorted(map(tuple, cms_counters(clean, "v").collect()))
    assert got == want

    bits_df = bloom_bits(df, "v")
    assert sorted(map(tuple, bits_df.collect())) == sorted(
        map(tuple, bloom_bits(clean, "v").collect())
    )
    # NULL probes are dropped, not reported as absent-with-0-hits
    probes = spark.createDataFrame([("u1",), (None,)], "p string")
    out = bloom_probe(bits_df, probes, "p").collect()
    assert len(out) == 1 and out[0]["maybe_present"] == 1


def test_asof_join_null_right_values_match_duckdb_asof(spark):
    """Round-6 self-review: a matched right row whose VALUE is NULL must
    yield NULL (DuckDB native ASOF JOIN semantics) — the per-column
    ignorenulls fill used to return the PREVIOUS non-null value while
    asof_ts pointed at the newer row, an inconsistent pair. The packed-
    struct fill ties ts + values to one row."""
    from postgis_gtfs_importer_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    right = spark.createDataFrame(
        [("k", 10, 100), ("k", 20, None), ("k", 30, 300)],
        "key string, ts long, v long",
    )
    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25), ("k", 35)], "key string, ts long"
    )
    got = {
        r["ts"]: (r["v"], r["asof_ts"])
        for r in asof_join(left, right, ["key"], "ts", ["v"]).collect()
    }
    assert got == {
        5: (None, None),     # no earlier right row at all
        15: (100, 10),
        25: (None, 20),      # matched row EXISTS, its value is NULL
        35: (300, 30),
    }
    # cross-engine: DuckDB's native ASOF JOIN agrees
    con = duckdb.connect()
    con.execute("CREATE TABLE r(key VARCHAR, ts BIGINT, v BIGINT)")
    con.execute("INSERT INTO r VALUES ('k',10,100),('k',20,NULL),('k',30,300)")
    con.execute("CREATE TABLE l(key VARCHAR, ts BIGINT)")
    con.execute("INSERT INTO l VALUES ('k',5),('k',15),('k',25),('k',35)")
    oracle = {
        ts: (v, ats)
        for ts, v, ats in con.execute(
            "SELECT l.ts, r.v, r.ts FROM l ASOF LEFT JOIN r"
            " ON l.key = r.key AND l.ts >= r.ts ORDER BY l.ts"
        ).fetchall()
    }
    assert got == oracle

    fwd = {
        r["ts"]: (r["v"], r["asof_ts"])
        for r in asof_join_forward(left, right, ["key"], "ts", ["v"]).collect()
    }
    assert fwd == {
        5: (100, 10),
        15: (None, 20),      # next right row exists, value NULL
        25: (300, 30),
        35: (None, None),    # nothing at-or-after
    }


def test_range_join_bucketed_degenerate_intervals_guarded(spark):
    """hi <= lo intervals match nothing — and must not explode reversed
    bucket sequences (Spark sequence() DESCENDS when stop < start)."""
    from postgis_gtfs_importer_spark.operators.temporal import (
        range_join_bucketed,
    )

    pts = spark.createDataFrame([(i,) for i in (5, 50, 500)], "p long")
    iv = spark.createDataFrame(
        [(0, 10, "ok"), (600, 100, "reversed"), (7, 7, "empty")],
        "lo long, hi long, tag string",
    )
    out = range_join_bucketed(pts, iv, "p", "lo", "hi", bucket_width=16)
    rows = [(r["p"], r["tag"]) for r in out.collect()]
    assert rows == [(5, "ok")]


def test_probe_cells_rejects_degenerate_wrap_ring(spark):
    """cell_deg >= 120 deg leaves < 3 longitude cells, so the 3x3 probe
    offsets alias and pairs would duplicate — must fail loudly."""
    from postgis_gtfs_importer_spark.operators.spatial import radius_pairs

    pts = spark.createDataFrame(
        [("a", 0.0, 0.0), ("b", 0.1, 0.1)], "stop_id string, lat double, lon double"
    )
    with pytest.raises(ValueError, match="wrap ring"):
        radius_pairs(pts, radius_m=100.0, cell_deg=180.0).collect()


def test_locf_null_observation_documented_semantics(spark):
    """Pins the documented contract: a NULL-valued observation is
    treated as ABSENT — the fill carries the last USABLE value through
    it and is_observed reports false for that step."""
    from postgis_gtfs_importer_spark.operators.temporal import locf_resample

    rows = [
        ("k", "2024-01-01 00:00:00", 10, 1),
        ("k", "2024-01-01 01:00:00", None, 2),   # observed row, NULL value
        ("k", "2024-01-01 03:00:00", 40, 3),
    ]
    df = spark.createDataFrame(
        rows, "key string, s string, v int, id int"
    ).select("key", F.col("s").cast("timestamp").alias("ts"), "v", "id")
    got = {
        r["step"]: (r["value"], r["is_observed"])
        for r in locf_resample(df, "key", "ts", "v", "id").collect()
    }
    steps = sorted(got)
    assert len(steps) == 4  # 00..03 inclusive grid
    assert got[steps[0]] == (10, True)
    assert got[steps[1]] == (10, False)  # NULL observation: filled through
    assert got[steps[2]] == (10, False)  # true gap
    assert got[steps[3]] == (40, True)
