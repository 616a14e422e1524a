"""run_jobs contract tests (VERDICT r12 #5/#8): result order, first-error
propagation, sibling completion, worker cap. Pure driver-thread logic —
no SparkSession needed."""

from __future__ import annotations

import threading
import time

import pytest

from big_data_analysis_spark.concurrency import MAX_WORKERS, run_jobs


def test_results_in_input_order_regardless_of_finish_order():
    def slow(v, delay):
        def thunk():
            time.sleep(delay)
            return v
        return thunk

    # later thunks finish first; results must still come back in input order
    assert run_jobs([slow(1, 0.15), slow(2, 0.05), slow(3, 0.0)]) == [1, 2, 3]


def test_empty_and_single_degenerate_paths():
    assert run_jobs([]) == []
    assert run_jobs([lambda: 42]) == [42]


def test_first_error_in_input_order_wins():
    def boom(msg, delay=0.0):
        def thunk():
            time.sleep(delay)
            raise ValueError(msg)
        return thunk

    # the SECOND input fails fastest, but the FIRST input's error is the
    # one raised: deterministic input-order selection, not finish order
    with pytest.raises(ValueError, match="first"):
        run_jobs([boom("first", 0.1), boom("second", 0.0), lambda: 1])


def test_siblings_run_to_completion_when_one_fails():
    done = []

    def ok(v):
        def thunk():
            time.sleep(0.05)
            done.append(v)
            return v
        return thunk

    def boom():
        raise RuntimeError("early failure")

    with pytest.raises(RuntimeError, match="early failure"):
        run_jobs([boom, ok("a"), ok("b"), ok("c")])
    # documented failure-path semantics (ADVICE r12): siblings complete
    assert sorted(done) == ["a", "b", "c"]


def test_worker_cap_bounds_concurrency():
    assert MAX_WORKERS == 4
    active = 0
    peak = 0
    lock = threading.Lock()

    def thunk():
        nonlocal active, peak
        with lock:
            active += 1
            peak = max(peak, active)
        time.sleep(0.05)
        with lock:
            active -= 1
        return True

    assert run_jobs([thunk] * 10) == [True] * 10
    assert peak <= MAX_WORKERS
