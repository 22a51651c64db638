"""Mechanized window-drift enforcement (VERDICT r4 item 2).

plans/ledger.py records (last-green-driver-round, implementation
digest) per registry entry; these tests make the standing rule — any
entry whose implementation changed since its last green driver row MUST
sit inside the 50-entry driver window — a test failure instead of a
hand-maintained comment. The e33fced drift class (rewire an entry, keep
the 'impl unchanged' prose) now fails test_stale_entries_inside_window
the moment the rewire lands, because the recorded digest no longer
matches.
"""

from __future__ import annotations

from postgis_gtfs_importer_spark.plans import ledger as L
from postgis_gtfs_importer_spark.plans import queries as Q

WINDOW = 50


def _window() -> set[str]:
    return set(list(Q.queries())[:WINDOW])


def test_stale_entries_inside_window():
    """Every never-verified or changed-since-verification entry must be
    in the driver's 50-slot prefix window this round — with ONE
    principled exception (the SURVEY §8 freeze policy): when the stale
    set exceeds the window, the overflow must (a) leave the window
    entirely filled with stale entries (no slot wasted on a verified
    one), (b) consist only of changed-since entries — ones with a PRIOR
    green driver row (never-verified entries always take precedence),
    and (c) be queued at the tail of _FRONT so the next round drains it
    mechanically."""
    stale = L.stale_entries()
    window = _window()
    outside = sorted(set(stale) - window)
    if len(stale) <= WINDOW:
        assert not outside, (
            f"stale registry entries OUTSIDE the driver window: "
            f"{ {n: stale[n] for n in outside} } — either move them into "
            f"_FRONT or (only at round start, pre-edit) refresh the ledger"
        )
    else:
        wasted = sorted(window - set(stale))
        assert not wasted, (
            f"stale set overflows the window ({len(stale)} > {WINDOW}) "
            f"yet these window slots hold VERIFIED entries: {wasted}"
        )
        never_outside = sorted(
            n for n in outside if stale[n] == "never-verified"
        )
        assert not never_outside, (
            f"never-verified entries may not overflow (they have no "
            f"driver row at all): {never_outside}"
        )
        front = [n for n in Q._FRONT if n in Q._REGISTRY]
        tail = set(front[WINDOW:])
        not_queued = sorted(set(outside) - tail)
        assert not not_queued, (
            f"overflow entries not queued at the _FRONT tail for the "
            f"next round: {not_queued}"
        )


def test_ledger_rows_reference_live_entries():
    orphans = sorted(set(L.load_ledger()) - set(Q._REGISTRY))
    assert not orphans, f"ledger rows for deleted/renamed entries: {orphans}"


def test_must_verify_consistent_with_ledger():
    """_MUST_VERIFY is the human-readable changed-impl subset: it must
    contain every ledger-detected changed-since entry and name only
    entries the ledger agrees are stale."""
    stale = L.stale_entries()
    changed = {n for n, why in stale.items() if why.startswith("changed-since")}
    missing = sorted(changed - set(Q._MUST_VERIFY))
    assert not missing, (
        f"ledger-detected changed entries absent from _MUST_VERIFY: {missing}"
    )
    not_stale = sorted(set(Q._MUST_VERIFY) - set(stale))
    assert not not_stale, (
        f"_MUST_VERIFY names entries the ledger considers verified: "
        f"{not_stale} — rotate them out (their fresh row landed)"
    )


def test_digest_is_deterministic_and_sensitive():
    name = next(iter(Q._REGISTRY))
    d1, d2 = L.entry_digest(name), L.entry_digest(name)
    assert d1 == d2 and len(d1) == 64
    # two different entries should not collide
    other = [n for n in Q._REGISTRY if n != name][0]
    assert L.entry_digest(other) != d1


def test_digest_covers_operator_module_closure():
    """pareto_customers imports operators.skyline inside its body; the
    digest must include that module's source (whole-module granularity:
    ANY skyline edit flags the entry)."""
    import inspect

    fn, _ = Q._REGISTRY["pareto_customers"]
    deps = L._entry_deps(inspect.getsource(fn))
    closure = L._module_closure(deps)
    assert "postgis_gtfs_importer_spark.operators.skyline" in closure
    # dedup-family entry pulls the dedup module transitively
    fn2, _ = Q._REGISTRY["minhash_lsh_pairs"]
    deps2 = L._module_closure(L._entry_deps(inspect.getsource(fn2)))
    assert "postgis_gtfs_importer_spark.operators.dedup" in deps2


# --------------------------------------------------------------------------
# v2 per-definition granularity (VERDICT r5 item 2)
# --------------------------------------------------------------------------

_GRAPH = "postgis_gtfs_importer_spark.operators.graph"


def _patched_source(target_mod: str, mutate):
    """Context-style helper: L._module_source with one module's text
    transformed."""
    orig = L._module_source

    def patched(m):
        s = orig(m)
        return mutate(s) if m == target_mod else s

    return orig, patched


def test_append_does_not_stale():
    """The verdict-prescribed done-criterion for the v2 migration:
    appending a NEW top-level function to a shared operator module
    stales ZERO existing entries (the v1 whole-module digest staled
    every dependent — one graph.py append re-staled the entire
    iterative-graph family)."""
    before = L.entry_digest("pagerank_trade")
    orig, patched = _patched_source(
        _GRAPH, lambda s: s + "\n\ndef _appended_for_test():\n    return 1\n"
    )
    L._module_source = patched
    try:
        after = L.entry_digest("pagerank_trade")
    finally:
        L._module_source = orig
    assert before == after, "append to graph.py must not stale pagerank_trade"


def test_edit_of_reached_definition_stales():
    before = L.entry_digest("pagerank_trade")
    orig, patched = _patched_source(
        _GRAPH, lambda s: s.replace("def pagerank(", "def pagerank(  # e")
    )
    L._module_source = patched
    try:
        after = L.entry_digest("pagerank_trade")
    finally:
        L._module_source = orig
    assert before != after, "editing the reached def must stale the entry"


def test_edit_of_unreached_definition_does_not_stale():
    """pagerank_trade reaches pagerank/trade_graph_edges but NOT sssp —
    editing sssp must not stale it (the blast-radius reduction)."""
    before = L.entry_digest("pagerank_trade")
    orig, patched = _patched_source(
        _GRAPH, lambda s: s.replace("def sssp(", "def sssp(  # e")
    )
    L._module_source = patched
    try:
        after = L.entry_digest("pagerank_trade")
    finally:
        L._module_source = orig
    assert before == after


def test_module_constant_edit_stales_dependents():
    """Top-level assignments are bindings: editing one a reached def
    references (graph.py SCALE) must stale the dependent."""
    assert "SCALE" in L._mod_index(_GRAPH).bindings
    before = L.entry_digest("pagerank_trade")
    orig, patched = _patched_source(
        _GRAPH,
        lambda s: s.replace(
            "SCALE = 1_000_000_000_000", "SCALE = int(1_000_000_000_000)", 1
        ),
    )
    L._module_source = patched
    try:
        after = L.entry_digest("pagerank_trade")
    finally:
        L._module_source = orig
    assert before != after


def test_v2_closes_fn_alias_hole():
    """funnel_conversion uses the FN module alias, which v1's
    _ALIAS_MODULES never resolved — its digest silently excluded
    operators/funnels.py. v2 resolves through queries.py's real import
    map, so funnels.py is visible."""
    mods = L.v2_visible_modules("funnel_conversion")
    assert "postgis_gtfs_importer_spark.operators.funnels" in mods


def test_v2_locally_imported_symbol_chain():
    """triangle_count locally imports materialize from dedup inside the
    graph def — the per-definition walk must follow the nested import
    chain into operators.dedup."""
    mods = L.v2_visible_modules("triangle_count")
    assert "postgis_gtfs_importer_spark.operators.dedup" in mods
    # ...but pagerank does NOT use materialize; dedup must not leak in
    assert (
        "postgis_gtfs_importer_spark.operators.dedup"
        not in L.v2_visible_modules("pagerank_trade")
    )


def test_v2_handler_dict_indirection(monkeypatch):
    """Dynamic dispatch through a module-level table must stay covered:
    if a reached def looks up HANDLERS and HANDLERS maps to another def,
    editing THAT def must change the digest even though no reached code
    names it directly. This is the conservativeness the per-definition
    walk must not lose relative to whole-module v1."""
    fake = "postgis_gtfs_importer_spark.operators._fake_r6"
    base_src = (
        "HANDLERS = {'a': handle_a}\n"
        "\n"
        "def handle_a(df):\n"
        "    return df\n"
        "\n"
        "def dispatch(df, kind):\n"
        "    return HANDLERS[kind](df)\n"
    )

    def make_sources(handle_a_body):
        src = base_src.replace("    return df\n", handle_a_body, 1)
        real_path, real_src = L._module_path, L._module_source
        monkeypatch.setattr(
            L, "_module_path",
            lambda m: "/fake.py" if m == fake else real_path(m),
        )
        monkeypatch.setattr(
            L, "_module_source",
            lambda m: src if m == fake else real_src(m),
        )

    def digest_of_dispatch():
        col = L._V2Collector()
        col.resolve_segment(fake, L._mod_index(fake).bindings["dispatch"])
        col.finish()
        parts = []
        for mod in sorted(col.partial):
            idx = L._mod_index(mod)
            for b in sorted(col.partial[mod]):
                parts.append(f"{mod}:{b}:{idx.bindings[b]}")
        return "\n".join(parts), col

    make_sources("    return df\n")
    d1, col = digest_of_dispatch()
    assert "handle_a" in col.partial[fake], (
        "HANDLERS value must pull handle_a into the reachable set"
    )
    monkeypatch.undo()

    make_sources("    return df.distinct()\n")
    d2, _ = digest_of_dispatch()
    assert d1 != d2, "editing the dispatched-to def must change the digest"


def test_refresh_incremental_preserves_stale_rows(monkeypatch, tmp_path):
    """The round-start refresh must be un-staling-proof: entries WITHOUT
    a new green driver row keep their recorded row verbatim (stale
    sentinel included); only new green rows get fresh digests."""
    name_new, name_old = list(Q._REGISTRY)[:2]
    ledger_path = tmp_path / "ledger.json"
    import json

    json.dump(
        {
            name_new: {"round": 5, "digest": L.STALE_SENTINEL},
            name_old: {"round": 2, "digest": L.STALE_SENTINEL},
        },
        open(ledger_path, "w"),
    )
    monkeypatch.setattr(L, "LEDGER_PATH", str(ledger_path))
    # driver round 6 re-verified name_new only
    monkeypatch.setattr(
        L, "_green_rounds", lambda: {name_new: 6, name_old: 2}
    )
    led, updated = L.refresh_incremental()
    assert updated == [name_new]
    assert led[name_new]["round"] == 6
    assert led[name_new]["digest"] == L.entry_digest(name_new)
    # the queued entry's sentinel row survives VERBATIM
    assert led[name_old] == {"round": 2, "digest": L.STALE_SENTINEL}


def test_front_list_is_duplicate_free_and_fills_window():
    """VERDICT r7 'what's wrong' item 3: _WINDOW_R7 listed
    funnel_conversion twice, so the '50-slot' list held 49 unique names
    and the slot arithmetic in the surrounding comments silently
    drifted (dict dedup self-healed the effective window, hiding it).
    Pin both invariants: the composed _FRONT list names no entry twice,
    and its registry-resident prefix fills the driver window exactly."""
    dupes = sorted({n for n in Q._FRONT if Q._FRONT.count(n) > 1})
    assert not dupes, f"_FRONT lists entries more than once: {dupes}"
    front = [n for n in Q._FRONT if n in Q._REGISTRY]
    assert len(front) == len(Q._FRONT), (
        f"_FRONT names unregistered entries: "
        f"{sorted(set(Q._FRONT) - set(Q._REGISTRY))}"
    )
    assert len(front) >= WINDOW, (
        f"_FRONT holds {len(front)} entries — the {WINDOW}-slot driver "
        f"window would backfill from registration order, untracked"
    )
