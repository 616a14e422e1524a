"""Transitive-change detection for the driver verification window
(VERDICT r7 "What's missing" #3 / "Next round" #3).

The external driver hash-verifies only the FIRST 50 registry entries
per round. Rotation has always re-windowed queries whose own code or
oracle changed, but a query whose TRANSITIVE operator helpers changed
(e.g. a relational.py edit that silently affects 30 queries last
verified in r1-r3) could stay green-on-paper forever. This module maps
every registry query to the big_data_analysis_spark modules it
(transitively) imports, reads each query's LAST externally-green round
from the committed CORRECTNESS_r*.json files, and diffs the operator
modules against each round's boundary commit (``round N: ...``) — a
query is STALE when a module it depends on changed after the round
that last verified it.

Scope rules (deliberate, documented):
- Module-to-module edges come from TOP-LEVEL imports only. Function-
  local imports express optional/feature-specific coupling (e.g.
  relational's bloom helpers importing dedup) — counting them collapses
  the graph into "everything depends on everything" and the staleness
  signal dies. Core shared state (dedup/similarity -> index_store,
  dedup -> text.fingerprint) is imported top-level for exactly this
  reason.
- Query-to-module references DO include the query function's local
  imports plus the queries.py global aliases (dd/rel/tx/ts/mining/
  similarity) — a query knows exactly what it calls.
- queries.py itself is excluded from the changed-file set: it changes
  every round, and per-query body changes are the hand-curated
  category (b) of the window composition.

The enforcement test (test_semantics.py) pins: every stale query whose
modules changed since the LAST round boundary is in the window
(mandatory re-verification), all remaining window slots are spent on
stale queries, and no stale query outside the window is staler (older
last-green round) than the rotation picks inside. ``AUDIT_ROUND`` must
be bumped as part of each round's rotation — a stale constant makes
the test fail loudly, which is the point: rotation cannot be skipped.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess

PKG = "big_data_analysis_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The round currently being built. Rotation procedure per round N:
#: rewrite _DRIVER_PRIORITY, update the critical set and
#: _DRIVER_VERIFIED_PAST_ROUNDS in test_semantics.py, bump this to N.
AUDIT_ROUND = 12


def _module_files() -> dict[str, str]:
    out = {}
    for p in glob.glob(os.path.join(REPO, PKG, "**", "*.py"), recursive=True):
        rel = os.path.relpath(p, REPO)
        out[rel[:-3].replace(os.sep, ".")] = p
    return out


_FROM_RE = re.compile(rf"from ({PKG}[\w.]*) import ([\w, ]+)")
# parenthesized (multi-line) from-imports: the names sit on later
# lines, so fall back to the base module as the dependency
_FROM_PAREN_RE = re.compile(rf"from ({PKG}[\w.]*) import \(")
_IMP_RE = re.compile(rf"import ({PKG}[\w.]+)")
_REL_RE = re.compile(r"from \.(\w+) import")


def _parse_deps(src: str, mod_files: dict, toplevel_only: bool, rel_base: str = "") -> set:
    deps = set()
    for line in src.splitlines():
        if toplevel_only and line[:1] in (" ", "\t"):
            continue
        m = _FROM_RE.search(line)
        if m:
            base, names = m.group(1), m.group(2)
            for nm in names.split(","):
                nm = nm.strip().split(" as ")[0].strip()
                if not nm:
                    continue
                cand = f"{base}.{nm}"
                deps.add(cand if cand in mod_files else base)
        m = _FROM_PAREN_RE.search(line)
        if m:
            deps.add(m.group(1))
        m = _IMP_RE.search(line)
        if m:
            deps.add(m.group(1))
        m = _REL_RE.search(line)
        if m and rel_base:
            deps.add(f"{rel_base}.{m.group(1)}")
    return {d for d in deps if d in mod_files}


def module_graph() -> dict[str, set]:
    """module -> set of package modules it imports at TOP LEVEL."""
    mod_files = _module_files()
    graph = {}
    for mod, p in mod_files.items():
        rel_base = mod.rsplit(".", 1)[0]
        with open(p, encoding="utf-8") as fh:
            src = fh.read()
        graph[mod] = _parse_deps(src, mod_files, True, rel_base) - {mod}
    return graph


_ALIASES = {
    "dd": f"{PKG}.operators.dedup",
    "rel": f"{PKG}.operators.relational",
    "tx": f"{PKG}.operators.text",
    "ts": f"{PKG}.operators.timeseries",
    "mining": f"{PKG}.operators.mining",
    "similarity": f"{PKG}.operators.similarity",
}


def query_modules() -> dict[str, set]:
    """query name -> transitive set of package modules it depends on."""
    from big_data_analysis_spark.queries import QUERIES

    mod_files = _module_files()
    graph = module_graph()

    def closure(mods: set) -> set:
        out, todo = set(), list(mods)
        while todo:
            m = todo.pop()
            if m in out:
                continue
            out.add(m)
            todo.extend(graph.get(m, ()))
        return out

    out = {}
    for name, fn in QUERIES.items():
        src = inspect.getsource(fn)
        mods = {f"{PKG}.io"}  # every query loads tables through io
        for alias, mod in _ALIASES.items():
            if re.search(rf"\b{alias}\.", src):
                mods.add(mod)
        mods |= _parse_deps(src, mod_files, False)
        out[name] = closure(mods)
    return out


def last_green_rounds(max_round: int) -> dict[str, int]:
    """query -> latest round <= max_round with a full driver match
    (rows_match AND schema_match true, err null). Rows-only registry
    entries (no oracle: the driver records rows_match null, err
    'no_oracle') deliberately do NOT count as green — they carry no
    hash verification, are terminal (multimodal_decode,
    ward_linkage_docs), and never compete for window slots."""
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if n > max_round:
            continue
        with open(f, encoding="utf-8") as fh:
            data = json.load(fh)
        for name, row in data.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                out[name] = max(out.get(name, 0), n)
    return out


def round_commit(n: int) -> str | None:
    """The driver's round-N boundary commit ('round N: ...'), or None."""
    got = subprocess.run(
        ["git", "log", "--format=%H", "-1", "--grep", f"^round {n}:"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    return got or None


def changed_modules_since(n: int) -> set:
    """Package modules changed between the round-N boundary commit and
    the working tree (committed + uncommitted), excluding queries.py."""
    c = round_commit(n)
    if c is None:
        return set()
    files = subprocess.run(
        ["git", "diff", "--name-only", c], capture_output=True, text=True,
        cwd=REPO,
    ).stdout.split()
    return {
        f[: -len(".py")].replace("/", ".")
        for f in files
        if f.startswith(f"{PKG}/")
        and f.endswith(".py")
        and f != f"{PKG}/queries.py"
    }


def stale_queries(max_round: int) -> dict[str, int]:
    """query -> last green round, for every externally-green query
    whose (transitive) modules changed after that round."""
    qmods = query_modules()
    greens = last_green_rounds(max_round)
    changed = {n: changed_modules_since(n) for n in set(greens.values())}
    return {
        name: n
        for name, n in greens.items()
        if name in qmods and (qmods[name] & changed[n])
    }
