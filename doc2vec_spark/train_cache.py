"""Cross-session disk tier for the deterministic trained-quantizer memos
(VERDICT r15 #3: BENCH_r15 recorded an 8.6 s first-rep stall on
ann_ivf_pq_search_trained because every fresh session re-paid coarse +
PQ training).

The in-process memos in operators/kmeans.py (_TRAIN_MEMO) and
operators/serving.py (_PQ_TRAIN_MEMO) already make training
once-per-session; this module makes it once-per-DATASET-per-ALGORITHM
across sessions, the way a deployment persists its trained index between
syncs (the reference stores the whole index structure in the store,
database.ts:36-52 — index_store.py is the ChunkStore-plane sibling of
this file, keyed by commit version; registry queries have no ChunkStore,
so their key is the dataset fingerprint).

Staleness has exactly two sources, and the key carries both:

- the DATA changed: the memo key already embeds the dataset fingerprint
  (mtime+size — operators/coreset.dataset_fingerprint), so a rewritten
  parquet never hits.
- the ALGORITHM changed: the key embeds the trainer module's spec digest
  (spec_hashes._closure_digests — the comment-stripped token stream of
  the module and its transitive first-party imports), so any code edit
  that could change the trained artifact retrains. This is the guard an
  in-process memo gets for free and a disk tier must add explicitly.

Training is deterministic (md5-ordered bounded sample, integer fixed-point
arithmetic), so a hit is bitwise the retrain result. JSON float round-trips
are exact (repr-based). Corrupt or unreadable cache reads as absent; writes
are atomic-replace (tmp + os.replace) and never raise into the query path.

Layout (r17, VERDICT r16 #4): ONE FILE PER ENTRY under
<repo>/.train_cache/ — the r16 single-JSON layout did read-merge-write of
the whole store, so two concurrent writers could silently drop each
other's entry (lost update, never corruption; a miss only costs a
retrain). Per-entry files make every put an independent atomic
os.replace: concurrent writers of different keys never interact, and
same-key writers race only between bitwise-identical payloads (training
is deterministic). Each file records its full logical key and is
verified on read, so a hash-prefix collision reads as absent rather than
serving the wrong artifact. Eviction unlinks oldest-mtime files beyond
MAX_ENTRIES and swallows the already-deleted race. The directory is
gitignored (host-local artifact, not a deliverable);
SPARK_GRAFT_TRAIN_CACHE overrides the path, empty value disables the
tier entirely.

This module also owns the shared VALUE validators for disk-tier hit paths
(ADVICE r16 #1/#2): the r16 consumers coerced with bare int()/float(),
which accepted numeric strings, bools, and JSON ``Infinity`` (whose int()
raises OverflowError — a corrupt entry crashed the query path the
contract says must fall through to retrain). index_store.py reuses
``finite_components``/``CELL_ID_CAP`` so both persistence planes enforce
one discipline.
"""

from __future__ import annotations

import hashlib
import json
import os
from functools import lru_cache
from pathlib import Path

CACHE_ENV = "SPARK_GRAFT_TRAIN_CACHE"
_DEFAULT = Path(__file__).resolve().parent.parent / ".train_cache"
MAX_ENTRIES = 32  # bounded: oldest-mtime evicted first

# cell ids are packed into the assignment fold as (d6 * 100 + cell) % 100
# (serving.cell_assignment_col / _d6_int callers), so any id outside
# [0, CELL_ID_CAP) would silently COLLIDE with another cell after the mod —
# a persisted payload carrying one must read as absent, never load.
# index_store.py imports this constant (single source of truth).
CELL_ID_CAP = 100


def finite_components(v) -> list[float] | None:
    """v as a non-empty list of finite numbers, else None. Rejects bools
    (int subclass, never a legitimate component) and numeric STRINGS
    (float("1e999") would otherwise smuggle non-finite values past JSON).
    The value-level guard the r14 shape checks missed: {"0": "abc"} passes
    list("abc") and only crashes later inside cell_assignment_col."""
    import math

    if not isinstance(v, (list, tuple)) or not v:
        return None
    out = []
    for x in v:
        if isinstance(x, bool) or not isinstance(x, (int, float)):
            return None
        fx = float(x)
        if not math.isfinite(fx):
            return None
        out.append(fx)
    return out


def integer_components(v) -> list[int] | None:
    """v as a non-empty list of true ints (the kmeans fixed-point payload
    shape), else None. Stricter than finite_components: a float component
    means the entry was not written by train_kmeans — read as absent
    rather than truncating (JSON Infinity/NaN arrive as floats and are
    rejected here by TYPE, closing the r16 OverflowError crash)."""
    if not isinstance(v, (list, tuple)) or not v:
        return None
    out = []
    for x in v:
        if isinstance(x, bool) or not isinstance(x, int):
            return None
        out.append(x)
    return out


def cell_id(c) -> int | None:
    """c as a valid packed-assignment cell id in [0, CELL_ID_CAP), else
    None. Accepts ints and the ASCII-digit strings JSON object keys arrive
    as; rejects bools, signs, whitespace/underscore int() extensions, and
    out-of-range ids (which would silently collide under the %100
    packing). ASCII check matters twice over (r17 review): str.isdigit()
    alone accepts unicode digits where int() either RAISES ('\\u00b2' —
    a ValueError escaping into the query path breaks the reads-as-absent
    contract) or silently normalizes ('\\u0667' -> 7, aliasing a key we
    never wrote)."""
    if isinstance(c, bool):
        return None
    if isinstance(c, str):
        if not (c.isascii() and c.isdigit()):
            return None
        c = int(c)
    if not isinstance(c, int) or not (0 <= c < CELL_ID_CAP):
        return None
    return c


def _cache_dir() -> Path | None:
    v = os.environ.get(CACHE_ENV)
    if v is not None:
        return Path(v) if v else None
    return _DEFAULT


@lru_cache(maxsize=1)
def _digests() -> tuple[dict[str, str], str]:
    """(closure digests, universal stamp), computed ONCE per process —
    _closure_digests itself re-hashes every module's closure per call."""
    from doc2vec_spark import spec_hashes

    return spec_hashes._closure_digests(), spec_hashes.universal_hash()


@lru_cache(maxsize=None)
def module_digest(dotted: str) -> str:
    """Spec digest of a first-party module + its transitive import closure,
    FOLDED WITH the universal-module stamp. Closure digests deliberately
    exclude UNIVERSAL_MODULES (tables/session/spec/caching) so a loader
    edit doesn't reopen all 200 driver stamps — the registry compensates
    with the separate global stamp. A disk cache has no such second
    channel, and tables.py shapes every training input, so the key must
    carry both or a loader edit would serve stale artifacts (round-16
    review finding)."""
    closures, universal = _digests()
    return closures.get(dotted, dotted) + ":" + universal


def _entry_path(root: Path, logical: str) -> Path:
    return root / (hashlib.sha256(logical.encode()).hexdigest()[:32] + ".json")


def get(kind: str, key: tuple):
    """The cached artifact for (kind, key), or None. ``key`` must already
    carry the dataset fingerprint and module digest — this tier only
    stores/retrieves under its repr. Any unreadable/corrupt/mismatched
    entry reads as absent."""
    root = _cache_dir()
    if root is None:
        return None
    logical = f"{kind}:{key!r}"
    try:
        payload = json.loads(_entry_path(root, logical).read_text())
    except (OSError, ValueError):
        return None
    if not isinstance(payload, dict) or payload.get("k") != logical:
        return None  # hand edit / hash-prefix collision: absent, never wrong
    return payload.get("v")


def put(kind: str, key: tuple, value) -> None:
    """Persist atomically: per-entry tmp file (pid-suffixed, so concurrent
    writers never share a tmp) + os.replace. No read-merge-write of any
    shared state, so a concurrent writer of another key can never be lost
    (VERDICT r16 #4). Any I/O failure is swallowed — the cache is an
    optimization, never a correctness dependency."""
    root = _cache_dir()
    if root is None:
        return
    logical = f"{kind}:{key!r}"
    try:
        root.mkdir(parents=True, exist_ok=True)
        dst = _entry_path(root, logical)
        tmp = dst.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_text(json.dumps({"k": logical, "v": value}))
        os.replace(tmp, dst)
        _evict(root)
    except (OSError, TypeError, ValueError):
        # ADVICE r17 #2: json.dumps raises TypeError (and ValueError for
        # circular refs) on a non-serializable value — the 'never raise
        # into the query path' contract covers serialization, not just I/O.
        pass


def _evict(root: Path) -> None:
    """Unlink oldest-mtime entries beyond MAX_ENTRIES. Races with other
    evictors/writers are benign: a vanished file is skipped; worst case a
    concurrent toucher loses a just-written entry, costing one retrain.

    ADVICE r17 #1: only files THIS module wrote (32-hex-char entry names
    from _entry_path) are eviction candidates — SPARK_GRAFT_TRAIN_CACHE may
    point at a directory containing unrelated JSON files, and a bare
    *.json glob would delete them."""
    import re

    def mtime(p: Path) -> float:
        try:
            return p.stat().st_mtime
        except OSError:  # vanished between glob and stat
            return 0.0

    entries = sorted(
        (p for p in root.glob("*.json") if re.fullmatch(r"[0-9a-f]{32}\.json", p.name)),
        key=lambda p: (mtime(p), p.name),
    )
    for p in entries[: max(0, len(entries) - MAX_ENTRIES)]:
        try:
            p.unlink()
        except OSError:
            pass
    # a writer that died between write_text and os.replace leaves a tmp
    # file; reap stale ones (an ACTIVE writer's tmp is seconds old)
    import time

    for p in root.glob("*.tmp.*"):
        if not re.fullmatch(r"[0-9a-f]{32}\.tmp\.\d+", p.name):
            continue  # same ownership discipline as the entry glob above
        if time.time() - mtime(p) > 3600.0:
            try:
                p.unlink()
            except OSError:
                pass
