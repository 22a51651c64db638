"""Unit tests for snapshot_diff / merge_upsert on crafted snapshots;
the oracle-parity tests cover the orders-fixture path."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators.diff import (
    merge_upsert,
    snapshot_diff,
)

_SCHEMA = "id long, name string, qty long"


def test_snapshot_diff_classifies_all_states(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)], _SCHEMA
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 31), (4, None, 40), (5, "e", 50)], _SCHEMA
    )
    out = {
        r.id: r.status
        for r in snapshot_diff(old, new, ["id"], ["name", "qty"]).collect()
    }
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # null name fingerprints equal via sentinel
        5: "added",
    }


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None, 0)], _SCHEMA)
    new = spark.createDataFrame([(1, "", 0)], _SCHEMA)
    out = snapshot_diff(old, new, ["id"], ["name", "qty"]).collect()
    assert out[0].status == "changed"


def test_merge_upsert_source_wins_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], _SCHEMA
    )
    source = spark.createDataFrame([(2, "B", 99), (9, "i", 90)], _SCHEMA)
    out = {r.id: (r.name, r.qty) for r in
           merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 9: ("i", 90)}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], _SCHEMA)
    source = spark.createDataFrame([(2, "B", 99)], _SCHEMA)
    once = merge_upsert(target, source, ["id"])
    twice = merge_upsert(once, source, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_diff_then_merge_roundtrip(spark):
    """Applying the diff's added+changed rows (from new) onto old, then
    dropping removed ids, reconstructs new exactly."""
    old = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(20)], _SCHEMA
    )
    new = spark.createDataFrame(
        [(i, ("X" if i % 5 == 0 else f"n{i}"), i * 10)
         for i in range(2, 23)], _SCHEMA
    )
    d = snapshot_diff(old, new, ["id"], ["name", "qty"])
    upserts = new.join(
        d.filter(F.col("status").isin("added", "changed")), ["id"], "semi"
    )
    removed = d.filter(F.col("status") == "removed")
    rebuilt = merge_upsert(old, upserts, ["id"]).join(
        removed, ["id"], "anti"
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_scd2_apply_lifecycle_and_idempotence(spark):
    from postgis_gtfs_importer_spark.operators.diff import scd2_apply

    hist = spark.createDataFrame(
        [
            (1, "a", 1, None),      # current, will be unchanged
            (2, "b", 1, None),      # current, will change
            (3, "c", 1, None),      # current, will be deleted
            (2, "b0", 0, 1),        # already-closed version: passthrough
        ],
        "pk long, val string, valid_from long, valid_to long",
    )
    src = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (9, "new")], "pk long, val string"
    )
    out = scd2_apply(hist, src, ["pk"], ["val"], batch_id=2)
    rows = {(r.pk, r.val, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (2, "b0", 0, 1),    # closed history untouched
        (1, "a", 1, None),  # unchanged stays open with original stamp
        (2, "b", 1, 2),     # changed: closed at batch 2...
        (2, "B2", 2, None), # ...new version opened
        (3, "c", 1, 2),     # deleted: closed
        (9, "new", 2, None) # inserted: opened
    }
    # exactly one open version per live pk
    open_counts = (
        out.filter(F.col("valid_to").isNull()).groupBy("pk").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)
    # idempotence: re-applying the same source at the same batch is a no-op
    again = scd2_apply(out, src, ["pk"], ["val"], batch_id=2)
    rows2 = {(r.pk, r.val, r.valid_from, r.valid_to) for r in again.collect()}
    assert rows2 == rows
