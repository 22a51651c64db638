"""Mechanized driver-verification ledger (VERDICT r4 item 2).

The external correctness gate checks a 50-entry prefix window of the
registry each round. The standing rule is: any entry whose
implementation changed since its last green driver row MUST sit inside
that window. Through round 4 the rule was enforced by hand-maintained
prose comments around ``_FRONT`` — and it drifted (commit e33fced
rewired four entries onto the staged C11 fact while the comments said
"impl unchanged"). This module replaces the prose with a RECORDED
ledger plus a content digest, so drift is a test failure instead of a
judge finding. Reference analog: the composite feed digest hashes the
postprocessing hooks precisely so changed inputs can never reuse a
stale verdict (/root/reference/import.js:200-227).

Design
------
- ``verification_ledger.json`` (next to this module) records, per
  registry entry: the last round with a fully-green driver row
  (rows+schema+hash all true in ``CORRECTNESS_r{N}.json``) and the
  entry's **implementation digest** at the time that row was recorded.
- ``entry_digest(name)`` hashes everything the entry's result can
  depend on: the registry function's source (which includes its inline
  oracle SQL via the decorator call), the resolved oracle string, the
  sources of queries.py-level helpers it references, and — since round
  6 (v2, see the per-definition section below) — the REACHED top-level
  bindings plus anonymous residue of each module the entry touches,
  with whole-module fallbacks where resolution can't be precise.
  Rounds 4-5 hashed the FULL module source of the transitive import
  closure instead; that conservatism meant one appended function
  staled every dependent entry (~20 re-stales/round from appends
  alone) and is what built the 70-entry drain backlog.
- ``stale_entries()`` = entries with no ledger row (never
  driver-verified) or a digest mismatch (implementation changed after
  the recorded row). ``tests/test_registry_ledger.py`` asserts every
  stale entry sits inside the driver window.

Round discipline
----------------
Run ``python -m postgis_gtfs_importer_spark.plans.ledger refresh`` at
ROUND START, immediately after the driver's ``CORRECTNESS_r{N}.json``
lands and BEFORE any code edit — the working tree then still equals the
code the driver ran, so recording current digests is exact. Any edit
made after refresh changes digests and mechanically forces the touched
entries back into the window. Since round 6 ``refresh`` is INCREMENTAL:
it updates only entries with a NEW green driver row and preserves every
other row verbatim (sentinels included), so a queued-backlog entry can
never be silently un-staled by forgetting to enumerate it; the full
rewrite survives as ``refresh-full [mark_stale names...]`` for
backfills.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys
import types

_PKG = "postgis_gtfs_importer_spark"
LEDGER_PATH = os.path.join(os.path.dirname(__file__), "verification_ledger.json")
REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: Module aliases used inside queries.py entry bodies.
_ALIAS_MODULES = {
    "DD": f"{_PKG}.operators.dedup",
    "SIM": f"{_PKG}.operators.similarity",
    "TX": f"{_PKG}.functions.text",
    "MM": f"{_PKG}.operators.multimodal",
    "SS": f"{_PKG}.operators.sessions",
}

#: Any relative import (``from .x import`` / ``from ..x import`` / …)
#: or absolute intra-package import. Dots are resolved against the
#: IMPORTING module's package — ``from .dedup import`` inside
#: operators/setjoin.py means operators.dedup. The original release of
#: this module only matched TWO-dot forms, silently dropping sibling
#: imports from the closure (operators modules importing each other via
#: ``from .x import``) — defeating exactly the stale-entry detection
#: this file exists for; see ``migrate`` below for how the recorded
#: digests were re-keyed when the hole was closed.
_REL_IMPORT_RE = re.compile(r"from\s+(\.+)([a-z_][a-z0-9_.]*)?\s+import")
_ABS_IMPORT_RE = re.compile(
    r"from\s+" + _PKG + r"\.([a-z_][a-z0-9_.]*)\s+import"
)

#: The pre-fix regex, kept ONLY so ``migrate`` can recompute the digests
#: the ledger was recorded under and re-key them provably (stored ==
#: legacy digest => the tracked sources are unchanged; anything else
#: stays stale).
_LEGACY_IMPORT_RE = re.compile(
    r"from\s+\.\.([a-z_]+(?:\.[a-z_]+)*)\s+import|"
    r"from\s+" + _PKG + r"\.([a-z_]+(?:\.[a-z_]+)*)\s+import"
)


def _queries_module():
    from . import queries as Q  # late import: avoid cycles at module load

    return Q


def _imports_of(mod_name: str, src: str) -> set[str]:
    """Intra-package modules ``src`` imports, with relative dots resolved
    against ``mod_name``'s package (1 dot = same package, 2 = parent)."""
    parts = mod_name.split(".")
    out: set[str] = set()
    for m in _REL_IMPORT_RE.finditer(src):
        dots, rel = m.group(1), m.group(2)
        base = parts[: len(parts) - len(dots)]
        child = ".".join(base + (rel.split(".") if rel else []))
        if child.startswith(_PKG) and _module_path(child):
            out.add(child)
    for m in _ABS_IMPORT_RE.finditer(src):
        child = f"{_PKG}.{m.group(1)}"
        if _module_path(child):
            out.add(child)
    return out


def _module_closure(mod_names: set[str]) -> set[str]:
    """Transitive closure over intra-package imports, computed from each
    module's SOURCE (regex over relative/absolute package imports) so
    the closure doesn't depend on import-time side effects."""
    seen: set[str] = set()
    todo = list(mod_names)
    while todo:
        name = todo.pop()
        if name in seen:
            continue
        seen.add(name)
        for child in _imports_of(name, _module_source(name)):
            if child not in seen:
                todo.append(child)
    return seen


def _module_path(mod_name: str) -> str | None:
    rel = mod_name.replace(".", "/") + ".py"
    p = os.path.join(REPO_ROOT, rel)
    if os.path.exists(p):
        return p
    # package __init__
    p = os.path.join(REPO_ROOT, mod_name.replace(".", "/"), "__init__.py")
    return p if os.path.exists(p) else None


def _module_source(mod_name: str) -> str:
    p = _module_path(mod_name)
    if p is None:
        return ""
    with open(p, encoding="utf-8") as f:
        return f.read()


def _entry_deps(fn_src: str) -> set[str]:
    """Intra-package modules an entry body references: alias-qualified
    calls (DD./SIM./...) plus any local relative/absolute import lines
    (resolved as if written in plans/queries.py, where entries live)."""
    mods: set[str] = set()
    for alias, mod in _ALIAS_MODULES.items():
        if re.search(rf"\b{alias}\.", fn_src):
            mods.add(mod)
    mods |= _imports_of(f"{_PKG}.plans.queries", fn_src)
    # every entry loads tables through _t/spread -> sources.tables
    mods.add(f"{_PKG}.sources.tables")
    mods.add(f"{_PKG}.session")
    return mods


def _helper_sources(fn_src: str) -> list[str]:
    """Sources/reprs of queries.py module-level names the entry body
    references (oracle-builder helpers, SQL string constants, shared
    CTE fragments, fixed_point, ...)."""
    Q = _queries_module()
    idents = set(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\b", fn_src))
    out: list[str] = []
    for name in sorted(idents):
        obj = getattr(Q, name, None)
        if obj is None:
            continue
        if isinstance(obj, str):
            out.append(f"{name}={obj}")
        elif isinstance(obj, types.FunctionType) and obj.__module__ == Q.__name__:
            try:
                out.append(inspect.getsource(obj))
            except OSError:
                pass
    return out


def _digest_with(name: str, closure: set[str]) -> str:
    Q = _queries_module()
    fn, oracle = Q._REGISTRY[name]
    fn_src = inspect.getsource(fn)
    parts = [fn_src, oracle if oracle is not None else "\x00NO_ORACLE"]
    parts += _helper_sources(fn_src)
    for mod in sorted(closure):
        parts.append(f"=== {mod} ===\n" + _module_source(mod))
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode("utf-8", "replace"))
        h.update(b"\x00")
    return h.hexdigest()


def entry_digest_v1(name: str) -> str:
    """ROUND-5 whole-module digest, kept verbatim for ``migrate_v2``
    (re-keying requires recomputing exactly what the ledger stored).
    Do NOT change this or _entry_deps/_ALIAS_MODULES/_digest_with —
    they are frozen recording formats, not live policy."""
    Q = _queries_module()
    fn, _ = Q._REGISTRY[name]
    fn_src = inspect.getsource(fn)
    return _digest_with(name, _module_closure(_entry_deps(fn_src)))


def _legacy_closure(name: str) -> set[str]:
    """The closure as the PRE-FIX regex computed it (two-dot relative +
    absolute imports only; single-dot sibling imports dropped). Used
    only by ``migrate`` to prove a stored digest's sources unchanged."""
    Q = _queries_module()
    fn, _ = Q._REGISTRY[name]
    fn_src = inspect.getsource(fn)
    mods: set[str] = set()
    for alias, mod in _ALIAS_MODULES.items():
        if re.search(rf"\b{alias}\.", fn_src):
            mods.add(mod)
    for m in _LEGACY_IMPORT_RE.finditer(fn_src):
        rel = m.group(1) or m.group(2)
        full = f"{_PKG}.{rel}"
        if _module_path(full):
            mods.add(full)
    mods.add(f"{_PKG}.sources.tables")
    mods.add(f"{_PKG}.session")
    seen: set[str] = set()
    todo = list(mods)
    while todo:
        nm = todo.pop()
        if nm in seen:
            continue
        seen.add(nm)
        src = _module_source(nm)
        for m in _LEGACY_IMPORT_RE.finditer(src):
            rel = m.group(1) or m.group(2)
            child = f"{_PKG}.{rel}"
            if _module_path(child) and child not in seen:
                todo.append(child)
    return seen


def load_ledger() -> dict[str, dict]:
    if not os.path.exists(LEDGER_PATH):
        return {}
    with open(LEDGER_PATH, encoding="utf-8") as f:
        return json.load(f)


def stale_entries() -> dict[str, str]:
    """Registry entries requiring a fresh driver row: name -> reason
    (``never-verified`` or ``changed-since-r{N}``)."""
    Q = _queries_module()
    ledger = load_ledger()
    out: dict[str, str] = {}
    for name in Q._REGISTRY:
        row = ledger.get(name)
        if row is None:
            out[name] = "never-verified"
        elif row["digest"] != entry_digest(name):
            out[name] = f"changed-since-r{row['round']}"
    return out


def _green_rounds() -> dict[str, int]:
    """entry -> latest round with a fully-green driver row, from every
    CORRECTNESS_r{N}.json in the repo root."""
    best: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("rows_match") and r.get("schema_match") and r.get("hash_match"):
                best[name] = max(best.get(name, 0), rnd)
    return best


#: Sentinel digest for entries KNOWN to have changed after their last
#: green row (backfill use only — a normal refresh records real digests).
STALE_SENTINEL = "0" * 64


def refresh(mark_stale: set[str] | None = None) -> dict[str, dict]:
    """Rewrite the ledger from the CORRECTNESS artifacts + CURRENT
    digests. Only valid at round start, before any edit (the working
    tree must equal what the driver ran). ``mark_stale`` entries keep
    their last green round but get the sentinel digest, recording that
    their implementation is already known to post-date that row (used
    once, for the initial r4 backfill — the digests the driver actually
    ran were never recorded for rounds 1-4)."""
    Q = _queries_module()
    mark_stale = mark_stale or set()
    green = _green_rounds()
    ledger = {}
    for name in Q._REGISTRY:
        if name not in green:
            continue
        digest = (
            STALE_SENTINEL if name in mark_stale else entry_digest(name)
        )
        ledger[name] = {"round": green[name], "digest": digest}
    with open(LEDGER_PATH, "w", encoding="utf-8") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    return ledger


def refresh_incremental() -> tuple[dict[str, dict], list[str]]:
    """Round-start refresh with NO un-staling foot-gun: update ONLY the
    entries whose latest green driver round is newer than their recorded
    row (or that have no row), recording the current digest for those;
    every other row — stale sentinel or old digest alike — is preserved
    VERBATIM, so queued-backlog entries stay stale without anyone having
    to enumerate them as ``mark_stale`` arguments (the round-6 refresh
    required passing 70 names by hand; forgetting one would silently
    un-stale it). Same precondition as ``refresh``: run at round start,
    BEFORE any edit, while the tree equals what the driver verified.

    Returns (ledger, updated_names)."""
    Q = _queries_module()
    green = _green_rounds()
    ledger = load_ledger()
    updated: list[str] = []
    for name in Q._REGISTRY:
        if name not in green:
            continue
        row = ledger.get(name)
        if row is None or green[name] > row["round"]:
            ledger[name] = {"round": green[name], "digest": entry_digest(name)}
            updated.append(name)
    with open(LEDGER_PATH, "w", encoding="utf-8") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    return ledger, updated


def _round_commit(rnd: int) -> str | None:
    """Commit that ADDED CORRECTNESS_r{rnd}.json — the tree the driver
    verified that round (the artifact lands with the round-close
    commit)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--",
             f"CORRECTNESS_r{rnd:02d}.json"],
            cwd=REPO_ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()
        return out[0] if out else None
    except Exception:
        return None


def _changed_since(commit: str, mod_names: set[str]) -> bool:
    import subprocess

    paths = [p for p in (_module_path(m) for m in mod_names) if p]
    if not paths:
        return False
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", commit, "HEAD", "--", *paths],
            cwd=REPO_ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return bool(out)
    except Exception:
        return True  # cannot prove unchanged -> treat as changed


def migrate(dry_run: bool = False) -> dict[str, str]:
    """One-time re-key after the import-resolver fix (single-dot sibling
    imports were missing from the closure, so legacy digests under-
    covered). For each recorded row:

    - stored == legacy digest: the legacy-tracked sources are unchanged
      since recording. The closure DELTA (modules only the fixed
      resolver sees) is then checked against git history since the
      entry's green-round commit: unchanged -> re-key to the new
      digest (pure re-hash, verified state preserved); changed -> the
      legacy hole masked a real change, record STALE_SENTINEL so the
      entry is forced back into the window.
    - anything else: already stale; left untouched.

    Returns name -> action for reporting."""
    Q = _queries_module()
    ledger = load_ledger()
    actions: dict[str, str] = {}
    commits: dict[int, str | None] = {}
    for name, row in ledger.items():
        if name not in Q._REGISTRY:
            continue
        if row["digest"] == STALE_SENTINEL:
            actions[name] = "sentinel-kept"
            continue
        legacy = _digest_with(name, _legacy_closure(name))
        if row["digest"] != legacy:
            actions[name] = "stale-kept"
            continue
        fn, _ = Q._REGISTRY[name]
        new_closure = _module_closure(_entry_deps(inspect.getsource(fn)))
        delta = new_closure - _legacy_closure(name)
        rnd = row["round"]
        if rnd not in commits:
            commits[rnd] = _round_commit(rnd)
        commit = commits[rnd]
        if delta and (commit is None or _changed_since(commit, delta)):
            actions[name] = f"delta-changed-since-r{rnd} -> sentinel"
            if not dry_run:
                row["digest"] = STALE_SENTINEL
        else:
            actions[name] = "re-keyed"
            if not dry_run:
                row["digest"] = entry_digest(name)
    if not dry_run:
        with open(LEDGER_PATH, "w", encoding="utf-8") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")
    return actions


# ===========================================================================
# v2 digests — per-DEFINITION granularity (VERDICT r5 item 2)
# ===========================================================================
#
# The whole-module v1 digest made every append to a shared operator
# module (graph.py, dedup.py, temporal.py, ...) stale EVERY dependent
# entry — ~20 re-stales per round from appends alone, which is what
# manufactured the 70-entry drain backlog. v2 hashes, per module the
# entry touches, only:
#
#   * the top-level BINDINGS (defs, classes, assignments) the entry
#     transitively reaches — resolved by walking referenced names from
#     the entry body through each module's real import map (which also
#     closes v1's alias hole: FN./DV. aliases were invisible to
#     _ALIAS_MODULES, so the funnel entries' digests never covered
#     funnels.py), and
#   * the module's ANONYMOUS top-level statements (docstring,
#     if-blocks, expression statements) — always included, so
#     module-level side effects can't hide,
#
# so appending a new function (or a new registry entry's helper) to a
# module stales ZERO existing entries — proven by
# tests/test_registry_ledger.py::test_append_does_not_stale.
#
# Conservative choices, deliberately kept:
#   * same-module binding reachability is a REGEX word match over the
#     visited segment text (not just AST names) — a binding referenced
#     from inside an SQL string or a docstring is still pulled in
#     (over-pull is safe; under-pull defeats the ledger);
#   * a module alias used as a BARE value (not `alias.attr`) pulls the
#     whole module transitively (v1 behavior for that module);
#   * `import pkg...` statements and `from x import *` pull the whole
#     target module;
#   * ``sources.tables`` and ``session`` are always included whole —
#     every entry reads through them.

import ast

#: modules every entry depends on regardless of its body (loaders /
#: session config); included WHOLE + transitively, as in v1.
_ALWAYS_WHOLE = (f"{_PKG}.sources.tables", f"{_PKG}.session")

_INDEX_MEMO: dict[tuple[str, int], "types.SimpleNamespace"] = {}


def _resolve_from_import(importing_mod: str, level: int, module: str | None) -> str | None:
    """Absolute intra-package module a ``from``-import targets, or None
    for external imports. ``level`` dots resolve against the IMPORTING
    module's package (1 = same package, 2 = parent, ...)."""
    if level == 0:
        full = module or ""
    else:
        parts = importing_mod.split(".")
        base = parts[: len(parts) - level]
        full = ".".join(base + (module.split(".") if module else []))
    return full if full.startswith(_PKG) else None


def _binding_targets(node: ast.stmt) -> list[str]:
    """Names a top-level assignment statement binds."""
    out: list[str] = []
    if isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
    elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
        if isinstance(node.target, ast.Name):
            out.append(node.target.id)
    return out


def _segment(src_lines: list[str], node: ast.stmt) -> str:
    """Source segment of a top-level statement INCLUDING decorators."""
    start = min(
        [node.lineno]
        + [d.lineno for d in getattr(node, "decorator_list", [])]
    )
    return "\n".join(src_lines[start - 1 : node.end_lineno])


def _mod_index(mod_name: str, src: str | None = None) -> types.SimpleNamespace:
    """Per-module AST index: bindings (defs/classes/assignments) by
    name, the import map, whole-module fallbacks, and the anonymous
    residue. Memoized on source identity so monkeypatched sources (unit
    tests) and historical blobs (migration) re-index."""
    if src is None:
        src = _module_source(mod_name)
    key = (mod_name, hash(src))
    hit = _INDEX_MEMO.get(key)
    if hit is not None:
        return hit
    lines = src.splitlines()
    bindings: dict[str, str] = {}
    imports: dict[str, tuple] = {}
    whole: set[str] = set()
    anonymous: list[str] = []

    def _bind(name: str, seg: str) -> None:
        # A name bound by SEVERAL top-level statements (``X = ...`` then
        # ``X += ...``, or a rebind after an if-block) keeps EVERY
        # segment — overwriting would drop the earlier assignment's text
        # from dependent digests (ADVICE r6 under-pull).
        prev = bindings.get(name)
        bindings[name] = seg if prev is None else f"{prev}\n{seg}"

    tree = ast.parse(src) if src else ast.parse("")
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            _bind(node.name, _segment(lines, node))
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(_PKG):
                    whole.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            full = _resolve_from_import(mod_name, node.level, node.module)
            if full is None:
                continue
            for a in node.names:
                if a.name == "*":
                    whole.add(full)
                    continue
                sub = f"{full}.{a.name}"
                if _module_path(sub):
                    imports[a.asname or a.name] = ("mod", sub)
                elif _module_path(full):
                    imports[a.asname or a.name] = ("sym", full, a.name)
                else:
                    whole.add(full)
        else:
            targets = _binding_targets(node)
            seg = _segment(lines, node)
            if targets:
                for t in targets:
                    _bind(t, seg)
            else:
                anonymous.append(seg)
    idx = types.SimpleNamespace(
        mod=mod_name,
        bindings=bindings,
        imports=imports,
        whole=whole,
        anonymous=anonymous,
    )
    _INDEX_MEMO[key] = idx
    return idx


class _RefVisitor(ast.NodeVisitor):
    """Collects bare names, (root, attr) attribute pairs, and nested
    import statements from a definition body. Attribute ROOT names are
    reported only as pairs (so a module alias used exclusively as
    ``alias.attr`` is distinguishable from the alias passed bare)."""

    def __init__(self) -> None:
        self.names: set[str] = set()
        self.attrs: set[tuple[str, str]] = set()
        self.import_froms: list[ast.ImportFrom] = []
        self.import_whole: set[str] = set()

    def visit_Attribute(self, node: ast.Attribute) -> None:
        if isinstance(node.value, ast.Name):
            self.attrs.add((node.value.id, node.attr))
            for child in ast.iter_child_nodes(node):
                if child is not node.value:
                    self.visit(child)
        else:
            self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        self.names.add(node.id)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        self.import_froms.append(node)

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            if a.name.startswith(_PKG):
                self.import_whole.add(a.name)


_IDENT_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\b")


class _V2Collector:
    """Reachability walk: (module, binding) items + whole-module
    fallbacks, starting from an entry body in plans/queries.py."""

    def __init__(self) -> None:
        self.partial: dict[str, set[str]] = {}
        self.whole: set[str] = set()
        self._seen: set[tuple[str, str]] = set()

    def visit_binding(self, mod: str, name: str) -> None:
        if (name == "*") or ((mod, name) in self._seen):
            return
        self._seen.add((mod, name))
        idx = _mod_index(mod)
        seg = idx.bindings.get(name)
        if seg is None:
            self.partial.setdefault(mod, set())
            # RE-EXPORT: the name may be bound by an import statement in
            # this module (``from .x import foo``). Follow it so editing
            # foo's DEFINING source still stales dependents (ADVICE r6
            # under-pull) — without this, only the re-exporting module's
            # residue was hashed, never foo itself.
            tgt = idx.imports.get(name)
            if tgt is not None:
                if tgt[0] == "mod":
                    self.whole.add(tgt[1])
                else:
                    self.visit_binding(tgt[1], tgt[2])
            # otherwise runtime-created: the residue covers it
            return
        self.partial.setdefault(mod, set()).add(name)
        self.resolve_segment(mod, seg)

    def resolve_segment(self, mod: str, seg: str) -> None:
        """Resolve everything a source segment references, in module
        ``mod``'s namespace."""
        idx = _mod_index(mod)
        try:
            tree = ast.parse(_dedent(seg))
        except SyntaxError:
            # unparseable fragment: conservative whole-module
            self.whole.add(mod)
            return
        v = _RefVisitor()
        v.visit(tree)
        self.whole |= v.import_whole
        local_imports: dict[str, tuple] = {}
        for node in v.import_froms:
            full = _resolve_from_import(mod, node.level, node.module)
            if full is None:
                continue
            for a in node.names:
                if a.name == "*":
                    self.whole.add(full)
                    continue
                sub = f"{full}.{a.name}"
                if _module_path(sub):
                    local_imports[a.asname or a.name] = ("mod", sub)
                elif _module_path(full):
                    local_imports[a.asname or a.name] = ("sym", full, a.name)
                else:
                    self.whole.add(full)
        imap = {**idx.imports, **local_imports}
        # regex word-match against same-module bindings: catches names
        # referenced from inside strings/docstrings that AST can't see
        for ident in set(_IDENT_RE.findall(seg)):
            if ident in idx.bindings:
                self.visit_binding(mod, ident)
        # import-map resolution (AST-level)
        for nm in v.names:
            tgt = imap.get(nm)
            if tgt is None:
                continue
            if tgt[0] == "mod":
                # module alias passed around bare -> whole module
                self.whole.add(tgt[1])
            else:
                self.visit_binding(tgt[1], tgt[2])
        for root, attr in v.attrs:
            tgt = imap.get(root)
            if tgt is None:
                continue
            if tgt[0] == "mod":
                self.visit_binding(tgt[1], attr)
            else:
                self.visit_binding(tgt[1], tgt[2])

    def finish(self) -> None:
        """Anonymous residue of every touched module joins the walk
        (module-level side effects can't hide), then whole-module
        fallbacks expand transitively (v1 closure semantics) and
        subsume their partial views."""
        done: set[str] = set()
        while True:
            todo = [m for m in self.partial if m not in done]
            if not todo:
                break
            for mod in todo:
                done.add(mod)
                for seg in _mod_index(mod).anonymous:
                    self.resolve_segment(mod, seg)
        self.whole = _module_closure(set(self.whole) | set(_ALWAYS_WHOLE))
        for mod in self.whole:
            self.partial.pop(mod, None)


def _dedent(seg: str) -> str:
    import textwrap

    return textwrap.dedent(seg)


def entry_digest(name: str) -> str:
    """Per-definition content digest (v2) of everything the registry
    entry's RESULT can depend on: the entry source + resolved oracle +
    queries.py helper sources (regex-matched, as in v1), the REACHED
    top-level bindings of every module the entry touches, those
    modules' anonymous residue, and the full source of whole-module
    fallbacks (bare module use / star imports / sources.tables /
    session)."""
    Q = _queries_module()
    fn, oracle = Q._REGISTRY[name]
    fn_src = inspect.getsource(fn)
    col = _V2Collector()
    col.resolve_segment(f"{_PKG}.plans.queries", fn_src)
    col.finish()
    h = hashlib.sha256()

    def eat(part: str) -> None:
        h.update(part.encode("utf-8", "replace"))
        h.update(b"\x00")

    eat(fn_src)
    eat(oracle if oracle is not None else "\x00NO_ORACLE")
    for hs in _helper_sources(fn_src):
        eat(hs)
    for mod in sorted(col.whole):
        eat(f"=== {mod} (whole) ===")
        eat(_module_source(mod))
    for mod in sorted(col.partial):
        idx = _mod_index(mod)
        eat(f"=== {mod} (partial) ===")
        for seg in idx.anonymous:
            eat(seg)
        for bname in sorted(col.partial[mod]):
            eat(f"--- {mod}:{bname} ---")
            eat(idx.bindings[bname])
    return h.hexdigest()


def _v2_components(name: str) -> "_V2Collector":
    Q = _queries_module()
    fn, _ = Q._REGISTRY[name]
    col = _V2Collector()
    col.resolve_segment(f"{_PKG}.plans.queries", inspect.getsource(fn))
    col.finish()
    return col


def v2_visible_modules(name: str) -> set[str]:
    """Modules the v2 digest reads (whole or partial) — migration uses
    this to check the delta v2 sees that v1 never covered."""
    col = _v2_components(name)
    return col.whole | set(col.partial)


def _git_show(commit: str, mod_name: str) -> str | None:
    """File content of ``mod_name`` at ``commit``, or None."""
    import subprocess

    p = _module_path(mod_name)
    if p is None:
        return None
    rel = os.path.relpath(p, REPO_ROOT)
    try:
        return subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=REPO_ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except Exception:
        return None


def _v2_inputs_unchanged(col: "_V2Collector", delta: set[str], commit: str) -> bool:
    """True iff, for every delta module, the exact v2 digest inputs —
    full text for whole modules, anonymous residue + the REACHED
    binding segments for partial ones — are byte-identical between
    ``commit`` and the current tree. File-level git diff is too blunt
    here: plans/queries.py changes every round, but an entry's reached
    bindings in it (register/_t/...) almost never do."""
    for mod in delta:
        old_src = _git_show(commit, mod)
        if old_src is None:
            return False
        if mod in col.whole:
            if old_src != _module_source(mod):
                return False
            continue
        new_idx = _mod_index(mod)
        old_idx = _mod_index(mod, old_src)
        if old_idx.anonymous != new_idx.anonymous:
            return False
        for bname in col.partial.get(mod, set()):
            if old_idx.bindings.get(bname) != new_idx.bindings.get(bname):
                return False
    return True


def migrate_v2(dry_run: bool = False) -> dict[str, str]:
    """One-time re-key from v1 (whole-module) to v2 (per-definition)
    digests. Must run on the tree the stored digests were recorded at
    (the round-start refresh tree). For each recorded row:

    - stored == v1 digest recomputed NOW: every v1-tracked source is
      unchanged since recording, so the v2 digest of the same tree is a
      pure re-hash — EXCEPT for modules v2 sees that v1 never covered
      (the FN./DV. alias hole). That delta is checked against git
      history since the entry's green-round commit: unchanged -> re-key;
      changed -> the v1 hole masked a real change, record the stale
      sentinel so the entry is forced back into the window.
    - sentinel or mismatched rows: already stale; left untouched.
    """
    Q = _queries_module()
    ledger = load_ledger()
    actions: dict[str, str] = {}
    commits: dict[int, str | None] = {}
    for name, row in ledger.items():
        if name not in Q._REGISTRY:
            continue
        if row["digest"] == STALE_SENTINEL:
            actions[name] = "sentinel-kept"
            continue
        if row["digest"] != entry_digest_v1(name):
            actions[name] = "stale-kept"
            continue
        fn, _ = Q._REGISTRY[name]
        v1_closure = _module_closure(_entry_deps(inspect.getsource(fn)))
        col = _v2_components(name)
        delta = (col.whole | set(col.partial)) - v1_closure
        rnd = row["round"]
        if rnd not in commits:
            commits[rnd] = _round_commit(rnd)
        commit = commits[rnd]
        if delta and (
            commit is None or not _v2_inputs_unchanged(col, delta, commit)
        ):
            actions[name] = f"v2-delta-changed-since-r{rnd} -> sentinel"
            if not dry_run:
                row["digest"] = STALE_SENTINEL
        else:
            actions[name] = "re-keyed"
            if not dry_run:
                row["digest"] = entry_digest(name)
    if not dry_run:
        with open(LEDGER_PATH, "w", encoding="utf-8") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")
    return actions


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "refresh":
        # round-start default: incremental (fold in ONLY the new green
        # rows; everything else — sentinels included — is preserved, so
        # no stale entry can be silently un-staled). The full rewrite
        # remains available as `refresh-full [mark_stale names...]` for
        # backfills.
        led, updated = refresh_incremental()
        print(
            f"ledger: {len(led)} rows; {len(updated)} updated from new"
            f" green driver rows: {sorted(updated)}"
        )
    elif len(sys.argv) > 1 and sys.argv[1] == "refresh-full":
        led = refresh(mark_stale=set(sys.argv[2:]))
        print(f"ledger: {len(led)} entries recorded")
    elif len(sys.argv) > 1 and sys.argv[1] == "migrate-v2":
        acts = migrate_v2(dry_run="--dry-run" in sys.argv)
        for n, a in sorted(acts.items()):
            if a != "re-keyed":
                print(f"{n}: {a}")
        from collections import Counter

        print(dict(Counter(acts.values())))
    elif len(sys.argv) > 1 and sys.argv[1] == "migrate":
        acts = migrate(dry_run="--dry-run" in sys.argv)
        for n, a in sorted(acts.items()):
            if a != "re-keyed":
                print(f"{n}: {a}")
        from collections import Counter

        print(dict(Counter(acts.values())))
    else:
        st = stale_entries()
        for n, why in sorted(st.items()):
            print(f"{n}: {why}")
        print(f"-- {len(st)} stale entries")
