"""Overlap independent driver-submitted Spark jobs (optimization guide
§2.6: "Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because your driver code calls
them sequentially").

The certificate/lifecycle operators (mixed-modality cascade, the policy-
comparison audits, multi-store seeding) chain many SMALL driver actions —
index loads, prechecks, localCheckpoints, parquet writes, manifest
commits — over bounded fixtures. Each action costs scheduling latency
while the cluster sits mostly idle, so a sequence of k independent
branches pays k × latency for ~1 × compute. Where branches are provably
independent (disjoint store paths, read-only shared inputs that are
already localCheckpointed), running them from a small driver thread pool
collapses the wall clock to ~max(branch) without changing any result:
every branch computes exactly what it computed before, on the same
snapshots, against the same stores.

Thread-safety inventory for the call sites in this repo (audited):
SparkSession action submission is thread-safe; the increments touch no
temp views and no shared mutable Python state; every pair of concurrent
branches mutates DISJOINT store directories (or none). Failure-path
semantics (ADVICE r12): every branch runs to COMPLETION — when one
branch fails, its siblings still finish and commit whatever they
commit (e.g. store appends), unlike the sequential order where later
branches would never have started. Only after all branches settle is
the FIRST failure in input order re-raised (deterministic). Callers
therefore only overlap branches whose commits are independently valid
— each store's version_tag ledger makes a retry after a sibling's
partial commit replay-idempotent per store. Errors a branch raises
before submitting any job (contract prechecks) behave identically to
the sequential order for that branch itself; siblings still complete.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

#: Guide §2.6: "2-3 jobs in flight is plenty: enough to fill the tail,
#: not so many that they fight for executors." 4 covers the widest
#: truly-parallel fan-out here (the 4-store seeds) without letting the
#: 7-thunk call sites oversubscribe the scheduler.
MAX_WORKERS = 4


def run_jobs(thunks):
    """Run independent job-submitting callables concurrently on driver
    threads (at most MAX_WORKERS in flight); return their results in
    input order. With 0 or 1 thunks this degenerates to plain calls
    (no pool overhead)."""
    thunks = list(thunks)
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(MAX_WORKERS, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        # Await everything first so a failure cannot leave half-
        # submitted sibling jobs running unobserved, then surface the
        # first error in deterministic input order.
        results = []
        first_exc = None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                results.append(None)
                if first_exc is None:
                    first_exc = exc
        if first_exc is not None:
            raise first_exc
        return results
