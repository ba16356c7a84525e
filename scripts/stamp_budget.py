"""Stamp-window budget planner for the driver's 50-slot correctness gate.

Every round, edits to first-party modules reopen the driver stamps of all
registry queries whose spec (oracle SQL + defining-module import closure)
contains them — and the driver re-verifies at most 50 queries per round.
Rounds 14-16 did this arithmetic by hand before choosing the edit set;
this tool makes it a one-command report:

    python scripts/stamp_budget.py                     # per-module reopen costs
    python scripts/stamp_budget.py operators/domain.py operators/lm.py
                                                       # union cost of an edit set

Output: currently-pending count, per-module dependent-query counts
(descending), and — when module args are given — the union of queries the
proposed edit set would reopen, merged with the already-pending set, vs
the 50-slot window. Paths and dotted names are both accepted.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WINDOW = 50  # driver correctness slots per round


def _dotted(arg: str) -> str:
    a = arg.replace("\\", "/").removeprefix("doc2vec_spark/").removesuffix(".py")
    a = a.strip("/").replace("/", ".")
    return a if a.startswith("doc2vec_spark") else f"doc2vec_spark.{a}"


def main() -> int:
    from doc2vec_spark import spec_hashes
    from doc2vec_spark.registry import merged_queries

    merged = merged_queries()
    _, closures = spec_hashes.module_closures()
    dep: dict[str, set[str]] = defaultdict(set)
    for name, spec in merged.items():
        mod = spec.fn.__module__
        dep[mod].add(name)
        for m in closures.get(mod, []):
            dep[m].add(name)

    # pending = not driver-verified at the CURRENT spec (the registry
    # rotation's own criterion): the stored hash may already equal the live
    # one right after a regen, but the query still needs a green driver row
    # in a round >= its stamp's `since` to count as verified
    pending = set(merged) - set(spec_hashes.verified_names(merged))
    print(f"pending now: {len(pending)} / window {WINDOW}")

    targets = [_dotted(a) for a in sys.argv[1:]]
    if targets:
        union: set[str] = set()
        for t in targets:
            qs = dep.get(t, set())
            print(f"  {t}: {len(qs)} dependent queries")
            if not qs and t not in closures:
                print(f"    WARNING: unknown module {t}")
            union |= qs
        after = pending | union
        print(f"edit-set union: {len(union)}; pending after edits: {len(after)}")
        over = len(after) - WINDOW
        print(
            f"window: {'OK' if over <= 0 else f'OVER by {over}'} "
            f"({len(after)}/{WINDOW})"
        )
        return 0 if over <= 0 else 1

    ranked = sorted(dep.items(), key=lambda kv: -len(kv[1]))
    print("per-module reopen cost (top 25, universal modules excluded by design):")
    for mod, qs in ranked[:25]:
        if mod in spec_hashes.UNIVERSAL_MODULES:
            continue
        marker = " *global*" if mod in spec_hashes.GLOBAL_STAMP_MODULES else ""
        print(f"  {len(qs):4d}  {mod}{marker}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
