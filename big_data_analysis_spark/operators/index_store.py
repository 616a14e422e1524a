"""Shared versioned-artifact store for persisted serving indexes.

One discipline, two users (the IVFPQ ANN index in ``similarity`` and
the MinHash signature index in ``dedup``): every mutation writes NEW
uuid-versioned artifact files/dirs, then atomically repoints a single
``_INDEX.json`` manifest (tmp-write + ``os.replace``). Readers that
find no manifest see no index — a torn save never publishes. Artifacts
superseded by a commit are retained for ONE more commit (grace for
lazy DataFrames loaded just before the re-save — ADVICE r6: immediate
deletion broke a pre-compaction frame executed post-compaction, even
single-process) and best-effort deleted on the commit after next;
correctness never depends on the cleanup, because unreferenced
artifacts are invisible to the loader.

This is the same commit protocol as the exactly-once manifest sink in
``sources.py`` (atomic rename as the only visibility point), applied
to index lifecycle instead of query output.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable


def commit_manifest(
    path: str,
    manifest: dict,
    prefixes: Iterable[str],
    artifacts_fn: Callable[[dict], set],
) -> None:
    """Atomically publish ``manifest`` as ``path/_INDEX.json`` with
    one-generation retention. ``artifacts_fn`` maps a manifest to the
    set of artifact names it references directly; ``prefixes`` are the
    artifact filename prefixes this store owns (nothing else under
    ``path`` is ever touched). The superseded manifest's artifacts are
    recorded under ``retained`` and kept until the next commit.

    Concurrency contract (ADVICE r7): ONE committer per index path at
    a time. The read-modify-write of the previous manifest takes no
    lock, so two simultaneous commits to the same path can lose one
    append's dirs from the final manifest, and each commit's
    post-publish cleanup deletes artifacts absent from ITS keep set —
    including the other writer's freshly written generation. Torn
    single-writer saves stay safe (the uuid tmp name below means even
    an abandoned tmp from a killed process can never be half-renamed
    by a later commit); concurrent writers must be serialized
    externally — which is why every query/bench call site uses a
    pid-scoped path."""
    import shutil
    import uuid

    mpath = os.path.join(path, "_INDEX.json")
    prev_live: set = set()
    if os.path.exists(mpath):
        try:
            with open(mpath, encoding="utf-8") as fh:
                prev_live = artifacts_fn(json.load(fh))
        except (OSError, ValueError, KeyError):
            pass  # unreadable predecessor: no grace set
    live = artifacts_fn(manifest)
    manifest = dict(manifest)
    manifest["retained"] = sorted(prev_live - live)
    tmp = os.path.join(path, f"._INDEX.json.{uuid.uuid4().hex[:12]}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)  # commit point
    keep = live | prev_live
    # uuid-named tmp files from a killed writer are dead the moment a
    # commit lands (ours was just renamed away) — sweep them with the
    # superseded artifacts
    pref = (*prefixes, "._INDEX.json.")
    for entry in os.listdir(path):
        if entry.startswith(pref) and entry not in keep:
            target = os.path.join(path, entry)
            try:
                shutil.rmtree(target) if os.path.isdir(target) else os.remove(target)
            except OSError:
                pass


def read_manifest(path: str, op: str) -> dict:
    """Read a committed manifest, raising the shared error shape:
    FileNotFoundError when no commit ever landed (torn save or wrong
    path). ``op`` names the caller in the error text."""
    mpath = os.path.join(path, "_INDEX.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{op}: no _INDEX.json under {path} — not a committed index "
            "(torn save, or wrong path)"
        )
    with open(mpath, encoding="utf-8") as fh:
        return json.load(fh)
