"""Round-7 ADVICE regression pins.

1. ledger v2 re-export under-pull: a name reached via ``alias.attr``
   that resolves to a RE-EXPORTED symbol (``from .x import foo`` in the
   target module) must hash foo's DEFINING source, not just mark the
   re-exporting module touched.
2. ledger multi-statement bindings: a name bound by several top-level
   statements (``X = 1`` then ``X += 2``) must keep EVERY segment in
   dependent digests.
3. asof_join/_forward representation constraints fail loudly: value
   columns named ``_r_ts`` / containing dots, and reserved internal
   scratch names on either input, are rejected up front.
4. locf_resample first-grid-step semantics under a NULL-valued earliest
   observation (the docstring qualification made real).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import postgis_gtfs_importer_spark.plans.ledger as L

_FAKE_A = "postgis_gtfs_importer_spark.operators._fake_r7_a"
_FAKE_B = "postgis_gtfs_importer_spark.operators._fake_r7_b"


def _patch_fakes(monkeypatch, sources: dict[str, str]) -> None:
    real_path, real_src = L._module_path, L._module_source
    monkeypatch.setattr(
        L, "_module_path",
        lambda m: "/fake.py" if m in sources else real_path(m),
    )
    monkeypatch.setattr(
        L, "_module_source",
        lambda m: sources[m] if m in sources else real_src(m),
    )


def _collect_parts(entry_mod: str, seg: str) -> tuple[str, "L._V2Collector"]:
    col = L._V2Collector()
    col.resolve_segment(entry_mod, seg)
    col.finish()
    parts = []
    for mod in sorted(col.partial):
        idx = L._mod_index(mod)
        for b in sorted(col.partial[mod]):
            parts.append(f"{mod}:{b}:{idx.bindings[b]}")
    return "\n".join(parts), col


def test_ledger_re_export_fallthrough(monkeypatch):
    """alias.attr to a re-exported symbol pulls the DEFINING source."""
    seg = (
        f"from {_FAKE_A.rsplit('.', 1)[0]} import _fake_r7_a as A\n"
        "\n"
        "def q(df):\n"
        "    return A.foo(df)\n"
    )

    def sources(foo_body: str) -> dict[str, str]:
        return {
            _FAKE_A: "from ._fake_r7_b import foo\n",
            _FAKE_B: f"def foo(df):\n{foo_body}",
        }

    _patch_fakes(monkeypatch, sources("    return df\n"))
    d1, col = _collect_parts(_FAKE_A, seg)
    assert "foo" in col.partial.get(_FAKE_B, set()), (
        "re-exported symbol must resolve through the import map to its"
        " defining module"
    )
    monkeypatch.undo()

    _patch_fakes(monkeypatch, sources("    return df.distinct()\n"))
    d2, _ = _collect_parts(_FAKE_A, seg)
    assert d1 != d2, "editing the re-exported def must change the digest"


def test_ledger_multi_statement_binding_accumulates(monkeypatch):
    """Every top-level statement binding a name stays in the digest."""
    src_v1 = (
        "X = 1\n"
        "X += 2\n"
        "\n"
        "def use():\n"
        "    return X\n"
    )
    _patch_fakes(monkeypatch, {_FAKE_A: src_v1})
    idx = L._mod_index(_FAKE_A)
    assert "X = 1" in idx.bindings["X"] and "X += 2" in idx.bindings["X"]
    d1, _ = _collect_parts(_FAKE_A, idx.bindings["use"])
    monkeypatch.undo()

    # edit only the EARLIER statement — the one the old overwrite dropped
    _patch_fakes(monkeypatch, {_FAKE_A: src_v1.replace("X = 1", "X = 99")})
    idx2 = L._mod_index(_FAKE_A)
    d2, _ = _collect_parts(_FAKE_A, idx2.bindings["use"])
    assert d1 != d2, "editing the first of two bindings must stale dependents"


def test_asof_reserved_and_dotted_value_cols_rejected(spark):
    from postgis_gtfs_importer_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    left = spark.createDataFrame([("k", 10)], "k string, ts long")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, ts long, v double")

    for fn in (asof_join, asof_join_forward):
        with pytest.raises(ValueError, match="_r_ts"):
            fn(left, right.withColumnRenamed("v", "_r_ts"),
               ["k"], "ts", ["_r_ts"])
        with pytest.raises(ValueError, match="dots"):
            fn(left, right.select("k", "ts", F.col("v").alias("a.b")),
               ["k"], "ts", ["a.b"])
        with pytest.raises(ValueError, match="reserved"):
            fn(left.withColumn("_side", F.lit(1)), right, ["k"], "ts", ["v"])
        with pytest.raises(ValueError, match="reserved"):
            fn(left, right.withColumn("_pack", F.lit(1)), ["k"], "ts", ["v"])
        # the valid shape still works
        assert fn(left, right, ["k"], "ts", ["v"]).count() == 1


def test_locf_first_step_null_observation(spark):
    """A key whose min-ts observation carries a NULL value starts its
    grid with (NULL, is_observed=false) — nothing earlier to carry."""
    from postgis_gtfs_importer_spark.operators.temporal import locf_resample

    rows = [
        ("k", "2024-01-01 00:00:00", None, 1),  # earliest: NULL value
        ("k", "2024-01-01 02:00:00", 30, 2),
    ]
    df = spark.createDataFrame(
        rows, "key string, s string, v int, id int"
    ).select("key", F.col("s").cast("timestamp").alias("ts"), "v", "id")
    got = {
        r["step"]: (r["value"], r["is_observed"])
        for r in locf_resample(df, "key", "ts", "v", "id").collect()
    }
    steps = sorted(got)
    assert len(steps) == 3
    assert got[steps[0]] == (None, False)
    assert got[steps[1]] == (None, False)
    assert got[steps[2]] == (30, True)
