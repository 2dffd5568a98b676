"""Derived driver-sample ordering (round-6 VERDICT item 3).

The driver hash-checks the FIRST 50 registered queries per round, so
the registration order IS the evidence budget. Through round 6 that
order was a hand-maintained list (`_SAMPLE_FIRST`), with the known
failure mode the VERDICT called out: a forgotten changed-code query
ships without re-verification, and never-verified queries age.

This module derives the order from the evidence itself:

1. **Red rows first** — any query whose LATEST driver CORRECTNESS row
   is not green must re-earn one before anything else.
2. **Never-verified** — queries with no driver row in ANY
   ``CORRECTNESS_r*.json``, oldest-registered first.
3. **Changed since last green** — queries whose current source hash
   differs from the hash recorded when their newest green row was
   earned (``verified_hashes.json``). ROUND-START RITUAL (run once,
   right after a new CORRECTNESS_r{N}.json lands, BEFORE changing any
   code): regenerate the snapshot against the exact tree that driver
   round executed —
   ``git worktree add /tmp/prevtree <last-round-final-commit> &&
   cp video_streamer_spark/queries/sample_order.py
   /tmp/prevtree/video_streamer_spark/queries/ && (cd /tmp/prevtree &&
   python -m video_streamer_spark.queries.sample_order --write) &&
   cp /tmp/prevtree/video_streamer_spark/queries/verified_hashes.json
   video_streamer_spark/queries/ && git worktree remove --force
   /tmp/prevtree``. Regenerating against a LATER tree would stamp
   code the driver never ran as verified.
   The hash covers the query function's own source, its oracle SQL,
   and every in-package module in the TRANSITIVE import closure of the
   query's module — module-level granularity deliberately over-flags
   (touching ``operators/text.py`` re-queues every text query), which
   errs toward re-verification, never away from it.
4. **Everything else**, oldest green evidence first, so long-stale
   rows rotate back through the sample.

**Changed-band quota (round-12 VERDICT item 1):** the changed band is
capped at ``_CHANGED_CAP`` rows inside the driver's
``_SAMPLE_SIZE``-row sample. Module-level closure hashing over-flags
(touching ``operators/table_format.py`` re-queues its whole ~30-query
family every round it's edited), and changed rows already get
same-session external-cwd pre-verification by the builder — so letting
the full changed band occupy the sample spends driver slots re-buying
evidence that exists while the oldest-evidence tail starves (in r12 the
r2–r5 tail was 105 queries and shrank by ~11). The sample is therefore
interleaved: red + never-verified first (uncapped — those rows have NO
current evidence), then at most ``_CHANGED_CAP`` changed rows (highest
module-touch-count first, i.e. the likeliest real behavior changes),
then oldest-evidence rows fill the remaining sample slots; changed-band
overflow lands immediately after the sample boundary, ahead of the
remaining (younger-evidence) tail. ``_TAIL_MIN`` slots are reserved
for the oldest-evidence tail: when a round mints many never-verified
queries, the CHANGED quota (never the red/never band) gives up slots.
The floor is BEST-EFFORT, not guaranteed — red/never rows always
outrank it (a round with > ``_SAMPLE_SIZE − _TAIL_MIN`` red rows eats
into the reservation, as it must: rows with NO current evidence come
first by definition), and when nearly the whole registry is flagged
changed the rest band itself may hold fewer than ``_TAIL_MIN`` rows,
in which case changed overflow fills the remainder.

The derivation reads the correctness artifacts at the repo root via
``__file__``-relative paths, so it works from any cwd (the driver's
included). If no artifact exists (a fresh clone), every query is
"never verified" and the order degenerates to registration order —
safe by construction.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import pathlib
import re

_PKG = "video_streamer_spark"


def _repo_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[2]


def _pkg_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[1]


def latest_driver_evidence() -> dict[str, tuple[int, bool]]:
    """name -> (round, green) from the newest CORRECTNESS row per query.

    Green = rows+schema matched, hash matched where the driver computed
    one (``hash_match`` is None for rows-only checks), and no error.
    """
    out: dict[str, tuple[int, bool]] = {}
    for p in sorted(_repo_root().glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            prev = out.get(name)
            if prev is None or rnd >= prev[0]:
                out[name] = (rnd, green)
    return out


def _module_file(mod_name: str) -> pathlib.Path | None:
    """Best-effort source path for an in-package module name."""
    if not mod_name.startswith(_PKG):
        return None
    rel = mod_name.split(".")[1:]
    base = _pkg_root().joinpath(*rel) if rel else _pkg_root()
    if base.with_suffix(".py").is_file():
        return base.with_suffix(".py")
    if (base / "__init__.py").is_file():
        return base / "__init__.py"
    return None


def _direct_imports(path: pathlib.Path) -> set[str]:
    """In-package module names imported by the file (static AST walk)."""
    try:
        tree = ast.parse(path.read_text())
    except (OSError, SyntaxError):
        return set()
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(_PKG):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith(_PKG):
                found.add(node.module)
                # `from pkg.mod import name` where name is a submodule
                for a in node.names:
                    sub = f"{node.module}.{a.name}"
                    if _module_file(sub) is not None:
                        found.add(sub)
    return found


_closure_cache: dict[str, frozenset[str]] = {}


def _import_closure(mod_name: str) -> frozenset[str]:
    """Transitive in-package import closure, by module name. Excluded
    modules (the registry machinery) are neither hashed nor TRAVERSED:
    ``queries/__init__`` imports every query module for registration,
    so descending through it would weld all closures into one."""
    if mod_name in _closure_cache:
        return _closure_cache[mod_name]
    seen: set[str] = set()
    stack = [mod_name]
    while stack:
        cur = stack.pop()
        if cur in seen or cur in _CLOSURE_EXCLUDE:
            continue
        seen.add(cur)
        f = _module_file(cur)
        if f is None:
            continue
        stack.extend(_direct_imports(f) - seen)
    out = frozenset(seen)
    _closure_cache[mod_name] = out
    return out


_file_hash_cache: dict[pathlib.Path, str] = {}


def _file_hash(path: pathlib.Path) -> str:
    if path not in _file_hash_cache:
        _file_hash_cache[path] = hashlib.sha256(path.read_bytes()).hexdigest()
    return _file_hash_cache[path]


# The registry machinery itself sits in EVERY query's import closure
# (each query module does `from video_streamer_spark.queries import
# query`), so including it would flag all 220 queries "changed" on any
# registry edit — which the 50-row sample cannot absorb, degenerating
# the ordering to registration order. Registry-level changes apply
# uniformly to all queries and are guarded by the unconditional
# in-suite parity run over all 220 instead.
_CLOSURE_EXCLUDE = frozenset(
    {f"{_PKG}.queries", f"{_PKG}.queries.sample_order"}
)


def query_source_hash(name: str, fn, oracle: str | None) -> str:
    """Stable hash of everything that could change a query's output:
    its own function source, its oracle SQL, and the content of every
    in-package module its module transitively imports (minus the
    registry machinery — see ``_CLOSURE_EXCLUDE``)."""
    target = getattr(fn, "__wrapped__", fn)
    try:
        src = inspect.getsource(target)
    except (OSError, TypeError):
        src = repr(target)
    parts = [name, src, oracle or ""]
    for mod in sorted(_import_closure(target.__module__) - _CLOSURE_EXCLUDE):
        f = _module_file(mod)
        if f is not None:
            parts.append(f"{mod}={_file_hash(f)}")
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


_VERIFIED = pathlib.Path(__file__).resolve().parent / "verified_hashes.json"


def _read_snapshot() -> dict:
    if not _VERIFIED.is_file():
        return {}
    try:
        return json.loads(_VERIFIED.read_text())
    except (OSError, ValueError):
        return {}


def load_verified_hashes() -> dict[str, str]:
    """Query-name -> source hash, excluding ``__``-prefixed metadata."""
    return {
        k: v for k, v in _read_snapshot().items() if not k.startswith("__")
    }


def load_snapshot_round() -> int:
    """The driver round the snapshot was regenerated against (0 if the
    snapshot predates round stamping or is absent). Green rows from
    rounds NEWER than this can only add evidence the snapshot can't
    know about yet — consumers tolerate them instead of flagging the
    round boundary as red (round-7 VERDICT, What's wrong 4)."""
    v = _read_snapshot().get("__snapshot_round__", 0)
    return v if isinstance(v, int) else 0


def load_snapshot_modules() -> dict[str, str]:
    """module name -> file hash at snapshot time (empty for snapshots
    that predate module stamping)."""
    v = _read_snapshot().get("__modules__", {})
    return v if isinstance(v, dict) else {}


def _changed_modules() -> set[str]:
    """In-package modules whose file hash differs from the snapshot's
    recorded hash (new modules count as changed)."""
    snap = load_snapshot_modules()
    if not snap:
        return set()
    out: set[str] = set()
    for mod, f in _iter_package_modules():
        if snap.get(mod) != _file_hash(f):
            out.add(mod)
    return out


def _iter_package_modules():
    """(module name, source path) for every .py in the package."""
    root = _pkg_root()
    for f in sorted(root.rglob("*.py")):
        rel = f.relative_to(root).with_suffix("")
        parts = [_PKG, *rel.parts]
        if parts[-1] == "__init__":
            parts = parts[:-1]
        yield ".".join(parts), f


# The driver hash-checks the FIRST _SAMPLE_SIZE registered queries per
# round; _CHANGED_CAP bounds how many changed-band rows may occupy that
# sample, and _TAIL_MIN slots are RESERVED for oldest-evidence tail
# rows — the effective changed quota shrinks when red/never rows (which
# always go first) would otherwise squeeze the tail below its floor
# (round-12 VERDICT item 1's done-criterion: each round's sample must
# rotate >20 stale-evidence rows — 22 reserved for margin — whatever
# else the round minted).
_SAMPLE_SIZE = 50
_CHANGED_CAP = 25
_TAIL_MIN = 22


def derived_sample_order(
    queries: dict, oracles: dict[str, str]
) -> list[str]:
    """The four-band order documented in the module docstring, with the
    changed band quota'd to ``_CHANGED_CAP`` rows inside the first
    ``_SAMPLE_SIZE`` positions. Ties break by registration order (dict
    insertion order), so the result is deterministic for a given repo
    state.

    Within the CHANGED band, queries sort by how many of their closure
    modules actually changed since the snapshot, DESCENDING: the
    module-level closure hash deliberately over-flags (one edited
    shared module re-queues every importer), and since at most
    ``_CHANGED_CAP`` changed rows fit the sample the queries most
    likely to have genuinely changed behavior — those sitting on
    several edited modules, e.g. the table-format family after a
    table_format + cdf_source + log_store round — must land INSIDE the
    sample, not behind a hundred importers of a one-line shared edit."""
    ev = latest_driver_evidence()
    verified = load_verified_hashes()
    reg = list(queries)
    red = [n for n in reg if n in ev and not ev[n][1]]
    never = [n for n in reg if n not in ev]
    changed = [
        n
        for n in reg
        if n in ev
        and ev[n][1]
        and query_source_hash(n, queries[n], oracles.get(n))
        != verified.get(n)
    ]
    mods_changed = _changed_modules()

    def _touch_count(n: str) -> int:
        target = getattr(queries[n], "__wrapped__", queries[n])
        closure = _import_closure(target.__module__) - _CLOSURE_EXCLUDE
        return len(closure & mods_changed)

    # Oldest driver evidence FIRST within the changed band, module
    # touch count as the tiebreak (round 13): when a shared-module
    # edit over-flags most of the registry (238/268 this round), the
    # quota'd changed slots must maximize information gain — a changed
    # row whose last driver row is r2 is both least-recently-checked
    # AND changed, so re-verifying it shrinks the stale-evidence band
    # at the same time. Rows the round genuinely churned hardest
    # (highest touch count) win ties, and every changed row still gets
    # same-session in-suite parity + the builder's external pre-verify
    # regardless of sample membership.
    changed.sort(
        key=lambda n: (ev[n][0], -_touch_count(n), reg.index(n))
    )
    head_set = set(red) | set(never) | set(changed)
    rest = sorted(
        (n for n in reg if n not in head_set),
        key=lambda n: (ev[n][0], reg.index(n)),
    )
    # Interleave: red/never uncapped, changed quota'd (and further
    # squeezed so _TAIL_MIN oldest-evidence rows always make the
    # sample), tail rows fill the remaining slots; changed overflow
    # sits just past the sample boundary (it still holds green
    # evidence and gets same-session pre-verification, so it outranks
    # nothing that lacks evidence — only younger-evidence tail rows).
    cap = min(
        _CHANGED_CAP,
        max(0, _SAMPLE_SIZE - len(red) - len(never) - _TAIL_MIN),
    )
    head = red + never + changed[:cap]
    fill_n = max(0, _SAMPLE_SIZE - len(head))
    return head + rest[:fill_n] + changed[cap:] + rest[fill_n:]


def write_verified_hashes(queries: dict, oracles: dict[str, str]) -> int:
    """Record the CURRENT source hash for every query whose latest
    driver row is green — run this against the exact tree the driver
    round executed, immediately after a round's artifact lands."""
    ev = latest_driver_evidence()
    out: dict = {
        n: query_source_hash(n, fn, oracles.get(n))
        for n, fn in queries.items()
        if n in ev and ev[n][1]
    }
    n_hashes = len(out)
    # Stamp the newest round seen so consumers can tolerate green rows
    # from artifacts that land AFTER this snapshot (round boundaries).
    out["__snapshot_round__"] = max(
        (rnd for rnd, _ in ev.values()), default=0
    )
    # Per-module file hashes: lets the derived order rank over-flagged
    # "changed" queries by how many of their closure modules actually
    # changed (see derived_sample_order).
    out["__modules__"] = {
        mod: _file_hash(f) for mod, f in _iter_package_modules()
    }
    _VERIFIED.write_text(json.dumps(out, indent=0, sort_keys=True))
    return n_hashes


def evidence_age_table(queries) -> str:
    """Markdown table: round -> count of registered queries whose
    LATEST driver CORRECTNESS row is that round (round-11 VERDICT item
    9 — the staleness dashboard). Regenerate alongside the round-start
    ``--write`` ritual and paste into COVERAGE.md; 'never' counts
    queries with no driver row in any round yet."""
    ev = latest_driver_evidence()
    counts: dict[str, int] = {}
    for name in queries:
        rnd = ev.get(name)
        key = f"r{rnd[0]}" if rnd else "never"
        counts[key] = counts.get(key, 0) + 1
    lines = ["| latest driver evidence | queries |", "|---|---|"]
    for key in sorted(
        counts, key=lambda k: -1 if k == "never" else int(k[1:])
    ):
        lines.append(f"| {key} | {counts[key]} |")
    lines.append(f"| **total** | **{len(queries)}** |")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    from video_streamer_spark.queries import ORACLES, QUERIES

    if "--write" in sys.argv:
        n = write_verified_hashes(QUERIES, ORACLES)
        print(f"recorded {n} verified hashes -> {_VERIFIED}")
    elif "--evidence" in sys.argv:
        print(evidence_age_table(QUERIES))
    else:
        order = derived_sample_order(QUERIES, ORACLES)
        for name in order[:60]:
            print(name)
