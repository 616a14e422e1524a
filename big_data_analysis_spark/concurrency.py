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
semantics: all branches are awaited, then the FIRST failure in input
order is re-raised — deterministic, and equivalent to the sequential
order for the upfront-contract errors the tests pin (those raise before
any branch is submitted).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def run_jobs(thunks):
    """Run independent job-submitting callables concurrently on driver
    threads; return their results in input order. With 0 or 1 thunks
    this degenerates to plain calls (no pool overhead)."""
    thunks = list(thunks)
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        # Await everything first so a failure cannot leave half-
        # submitted sibling jobs running unobserved, then surface the
        # first error in deterministic input order.
        done = [(f, None) for f in futures]
        results = []
        first_exc = None
        for f, _ in done:
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                results.append(None)
                if first_exc is None:
                    first_exc = exc
        if first_exc is not None:
            raise first_exc
        return results
