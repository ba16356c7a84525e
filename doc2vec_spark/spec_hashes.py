"""Spec-version stamps for the driver correctness rotation (ADVICE r02).

The driver's correctness gate checks the FIRST 50 entries of ``queries()``
each round and stamps results into ``CORRECTNESS_r{N}.json``. The registry
rotates prior-round greens to the back so the 50-slot window covers the
least-recently-verified queries — but a green row keyed by NAME alone
persists forever, so a query whose *implementation or oracle changed* after
its stamp would never be re-checked by the external gate.

Fix: ``SPEC_HASHES.json`` (repo root) records, per query, a content hash of
its spec — the oracle SQL plus the comment-stripped token stream of the
defining module and its transitive first-party import closure (so comment
edits don't churn the rotation, and the hash is stable across Python minor
versions, unlike ``ast.dump``) — and the first round whose driver run
reflects that spec version (``since``). The registry counts a name as
driver-verified only if

  * the stored hash equals the hash computed from the live code, AND
  * a fully-green CORRECTNESS row exists in some round >= ``since``.

Any mismatch (edited module, edited oracle, missing entry) makes the query
"fresh" again and rotates it into the next driver window. ``python -m
doc2vec_spark.spec_hashes`` refreshes the file after intentional changes;
``tests/test_spec_hashes.py`` fails when the file is stale so the refresh
can't be forgotten.
"""

from __future__ import annotations

import ast
import hashlib
import io
import json
import tokenize
from functools import lru_cache
from pathlib import Path

PKG_ROOT = Path(__file__).resolve().parent
REPO_ROOT = PKG_ROOT.parent
STAMPS_FILE = REPO_ROOT / "SPEC_HASHES.json"
_PKG = "doc2vec_spark"


def _module_path(dotted: str) -> Path | None:
    """doc2vec_spark.operators.dedup -> <repo>/doc2vec_spark/operators/dedup.py
    (or the package __init__.py). None for modules that don't resolve to a
    first-party file."""
    if dotted != _PKG and not dotted.startswith(_PKG + "."):
        return None
    rel = dotted.split(".")[1:]
    base = PKG_ROOT.joinpath(*rel)
    if base.with_suffix(".py").is_file():
        return base.with_suffix(".py")
    if (base / "__init__.py").is_file():
        return base / "__init__.py"
    return None


def _first_party_imports(tree: ast.AST) -> set[str]:
    """Every doc2vec_spark.* module imported ANYWHERE in the tree (this
    codebase defers imports into function bodies, so walk the whole AST)."""
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == _PKG or a.name.startswith(_PKG + "."):
                    mods.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            m = node.module or ""
            if m == _PKG or m.startswith(_PKG + "."):
                mods.add(m)
                # `from doc2vec_spark import multimodal` style: the imported
                # names may themselves be submodules
                for a in node.names:
                    if _module_path(f"{m}.{a.name}") is not None:
                        mods.add(f"{m}.{a.name}")
    return mods


def _normalized_source(text: str) -> str:
    """Comment-insensitive normal form of a module's source: the token
    stream minus COMMENT/NL tokens, keyed by token NAME (not number).
    Unlike ast.dump — whose node/field format changes between Python minor
    versions and would spuriously invalidate every stored hash on an
    interpreter upgrade — the token stream of unchanged source is stable."""
    out = []
    for tok in tokenize.generate_tokens(io.StringIO(text).readline):
        if tok.type in (tokenize.COMMENT, tokenize.NL):
            continue
        out.append((tokenize.tok_name[tok.type], tok.string))
    return repr(out)


@lru_cache(maxsize=1)
def module_closures() -> tuple[dict[str, str], dict[str, list[str]]]:
    """(normalized source per module, transitive first-party import closure
    per module) for every module file under the package. Cached per process
    (~40 files of tokenize + ast.parse otherwise re-run on every
    all_queries() call)."""
    dumps: dict[str, str] = {}
    imports: dict[str, set[str]] = {}
    for py in sorted(PKG_ROOT.rglob("*.py")):
        rel = py.relative_to(PKG_ROOT)
        parts = list(rel.parts)
        if parts[-1] == "__init__.py":
            dotted = ".".join([_PKG] + parts[:-1])
        else:
            dotted = ".".join([_PKG] + parts[:-1] + [rel.stem])
        src = py.read_text()
        dumps[dotted] = _normalized_source(src)
        imports[dotted] = {m for m in _first_party_imports(ast.parse(src)) if _module_path(m)}

    closures: dict[str, list[str]] = {}

    def closure(mod: str) -> list[str]:
        seen: set[str] = set()
        stack = [mod]
        while stack:
            m = stack.pop()
            if m in seen or m not in dumps:
                continue
            seen.add(m)
            stack.extend(imports.get(m, ()))
        return sorted(seen)

    for mod in dumps:
        closures[mod] = closure(mod)
    return dumps, closures


# Universal plumbing in EVERY query's import closure. Excluded from
# per-query spec digests (VERDICT r04 #2): an edit to one of these — the
# round-4 lesson was a tables.py loader tweak — used to invalidate all ~110
# stamps at once and churn every per-query hash. ADVICE r5 closed the
# soundness hole that exclusion opened: modules that CAN change query
# results (tables.py — the loader shapes every input) are covered by a
# single GLOBAL stamp below instead. A change to one of them invalidates
# ALL driver verification at once (which is the only sound answer — it may
# have changed every result) without touching the per-query hashes, and the
# refresh records it as one explicit global event. Only genuinely
# result-neutral plumbing (session conf, the QuerySpec dataclass, cache
# lifecycle) stays outside both digests; those are still covered by the
# local parity suite, which always runs against live code.
UNIVERSAL_MODULES = frozenset(
    {
        f"{_PKG}.tables",
        f"{_PKG}.session",
        f"{_PKG}.spec",
        f"{_PKG}.caching",
    }
)

# Result-affecting universal modules: digested into the single global stamp
# stored as the "universal" key of SPEC_HASHES.json. verified_names()
# requires a green driver row at/after max(per-query since, universal
# since), so editing one of these forces a full re-verification rotation.
GLOBAL_STAMP_MODULES = (f"{_PKG}.tables",)


def universal_hash() -> str:
    dumps, _ = module_closures()
    h = hashlib.sha256()
    for m in GLOBAL_STAMP_MODULES:
        h.update(m.encode())
        h.update(dumps.get(m, "<missing>").encode())
    return h.hexdigest()[:16]


def _closure_digests() -> dict[str, str]:
    dumps, closures = module_closures()
    out: dict[str, str] = {}
    for mod, members in closures.items():
        h = hashlib.sha256()
        for m in members:
            if m in UNIVERSAL_MODULES:
                continue
            h.update(m.encode())
            h.update(dumps[m].encode())
        out[mod] = h.hexdigest()
    return out


def current_spec_hashes(merged=None) -> dict[str, str]:
    """name -> 16-hex spec hash for every registered query. ``merged`` (an
    unrotated name->QuerySpec dict) avoids re-entering the registry when the
    registry itself is the caller."""
    if merged is None:
        from doc2vec_spark.registry import merged_queries

        merged = merged_queries()
    mod_digest = _closure_digests()
    out: dict[str, str] = {}
    for name, spec in merged.items():
        h = hashlib.sha256()
        h.update((spec.oracle or "<rows-only>").encode())
        h.update(mod_digest.get(spec.fn.__module__, spec.fn.__module__).encode())
        out[name] = h.hexdigest()[:16]
    return out


def load_stamps() -> dict[str, dict]:
    try:
        return json.loads(STAMPS_FILE.read_text())["entries"]
    except (OSError, ValueError, KeyError):
        return {}


def load_universal_stamp() -> dict | None:
    try:
        return json.loads(STAMPS_FILE.read_text())["universal"]
    except (OSError, ValueError, KeyError):
        return None


@lru_cache(maxsize=1)
def _green_rounds() -> dict[str, list[int]]:
    """name -> rounds with a fully-green driver row."""
    greens: dict[str, list[int]] = {}
    for f in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.split("_r")[1])
            data = json.loads(f.read_text())
        except (ValueError, OSError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                greens.setdefault(name, []).append(rnd)
    return greens


def next_round() -> int:
    rounds = [0]
    for f in REPO_ROOT.glob("CORRECTNESS_r*.json"):
        try:
            rounds.append(int(f.stem.split("_r")[1]))
        except ValueError:
            pass
    return max(rounds) + 1


def verified_names(merged=None) -> frozenset[str]:
    """Names whose driver stamp is still valid for the CURRENT spec version:
    stored hash matches live code, the GLOBAL stamp (result-affecting
    universal modules, e.g. the table loader) matches live code, AND a green
    row exists at/after max(per-query since, universal since)."""
    stamps = load_stamps()
    if not stamps:
        return frozenset()
    uni = load_universal_stamp()
    if uni is None or uni.get("hash") != universal_hash():
        # a missing/stale global stamp means the table loader may have
        # changed since every stored stamp: nothing is currently verified
        return frozenset()
    uni_since = int(uni.get("since", 10**9))
    greens = _green_rounds()
    current = current_spec_hashes(merged)
    ok: set[str] = set()
    for name, entry in stamps.items():
        if current.get(name) != entry.get("hash"):
            continue
        since = max(int(entry.get("since", 10**9)), uni_since)
        if any(r >= since for r in greens.get(name, ())):
            ok.add(name)
    return frozenset(ok)


def refresh(
    since_overrides: dict[str, int] | None = None,
    universal_since_override: int | None = None,
) -> dict[str, dict]:
    """Rewrite SPEC_HASHES.json: unchanged hashes keep their ``since``;
    changed/new hashes get since=next_round() (their next possible stamp).
    The global stamp over GLOBAL_STAMP_MODULES follows the same rule.
    ``since_overrides`` / ``universal_since_override`` let a one-time
    bootstrap backdate entries whose spec provably predates older stamps
    (git-verified)."""
    old = load_stamps()
    old_uni = load_universal_stamp()
    current = current_spec_hashes()
    nxt = next_round()
    entries: dict[str, dict] = {}
    for name, h in sorted(current.items()):
        prev = old.get(name)
        if prev is not None and prev.get("hash") == h:
            since = int(prev["since"])
        else:
            since = nxt
        if since_overrides and name in since_overrides:
            since = since_overrides[name]
        entries[name] = {"hash": h, "since": since}
    uh = universal_hash()
    if old_uni is not None and old_uni.get("hash") == uh:
        uni_since = int(old_uni["since"])
    else:
        uni_since = nxt
    if universal_since_override is not None:
        uni_since = universal_since_override
    STAMPS_FILE.write_text(
        json.dumps(
            {"entries": entries, "universal": {"hash": uh, "since": uni_since}},
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )
    return entries


if __name__ == "__main__":
    entries = refresh()
    fresh = [n for n, e in sorted(entries.items()) if e["since"] >= next_round()]
    print(f"wrote {STAMPS_FILE.name}: {len(entries)} entries, "
          f"{len(fresh)} pending next driver stamp: {fresh}")
