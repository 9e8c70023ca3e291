"""MicroBatcher: cross-request dynamic batching for the explanation server.

Pure packing-logic tests (the device function is injected), plus a
service-level coalescing test lives in tests/test_serve.py."""

import threading
import time

import numpy as np
import pytest

from autognothi_tpu.pipeline.batching import MicroBatcher, run_concurrent


def _echo_slab(xs):
    """Deterministic per-row 'model': (row sums, rows * 2)."""
    return (xs.reshape(xs.shape[0], -1).sum(axis=1), xs * 2.0)


def _expected(xs):
    return _echo_slab(np.asarray(xs))


def make(batch=4, window=0.05, run=_echo_slab):
    return MicroBatcher(run, batch_size=batch, window_s=window)


def test_single_request_exact_batch():
    b = make(batch=3, window=0.0)
    xs = np.arange(12.0).reshape(3, 4)
    sums, dbl = b.submit(xs)
    es, ed = _expected(xs)
    np.testing.assert_allclose(sums, es)
    np.testing.assert_allclose(dbl, ed)
    assert b.slab_count == 1
    b.close()


def test_partial_batch_padding_trimmed():
    b = make(batch=8, window=0.0)
    xs = np.random.RandomState(0).randn(3, 4)
    sums, dbl = b.submit(xs)
    assert sums.shape == (3,) and dbl.shape == (3, 4)
    np.testing.assert_allclose(dbl, xs * 2.0)
    b.close()


def test_oversized_request_spans_slabs():
    b = make(batch=4, window=0.0)
    xs = np.random.RandomState(1).randn(11, 2)
    sums, dbl = b.submit(xs)
    np.testing.assert_allclose(sums, xs.sum(axis=1))
    np.testing.assert_allclose(dbl, xs * 2.0)
    assert b.slab_count == 3  # 4 + 4 + 3(padded)
    b.close()


def test_concurrent_requests_coalesce():
    calls = []

    def counting(xs):
        calls.append(xs.shape[0])
        time.sleep(0.01)  # let the queue build
        return _echo_slab(xs)

    b = make(batch=8, window=0.2, run=counting)
    reqs = [np.full((2, 3), float(i)) for i in range(8)]  # 16 rows
    results = run_concurrent(b, reqs)
    for xs, (sums, dbl) in zip(reqs, results):
        np.testing.assert_allclose(sums, xs.sum(axis=1))
        np.testing.assert_allclose(dbl, xs * 2.0)
    # 16 rows / slab 8 -> 2 full slabs if coalescing worked (8 without)
    assert b.slab_count <= 4
    b.close()


def test_mixed_row_shapes_split_into_separate_slabs():
    b = make(batch=8, window=0.05)
    small = np.ones((2, 3))
    big = np.ones((2, 5))
    r_small, r_big = run_concurrent(b, [small, big])
    assert r_small[1].shape == (2, 3)
    assert r_big[1].shape == (2, 5)
    b.close()


def test_mixed_dtypes_split_into_separate_slabs():
    """f32 and u8 rows of the same shape never share a slab (each dtype has
    its own compiled executable — serve.py's images vs images_u8)."""
    dtypes = []

    def record(xs):
        dtypes.append(xs.dtype)
        assert xs.dtype in (np.float32, np.uint8)  # no silent upcast
        return _echo_slab(xs.astype(np.float64))

    b = MicroBatcher(record, batch_size=8, window_s=0.1)
    f32 = np.ones((2, 3), np.float32)
    u8 = np.full((2, 3), 128, np.uint8)
    r_f, r_u = run_concurrent(b, [f32, u8])
    np.testing.assert_allclose(r_f[0], [3.0, 3.0])
    np.testing.assert_allclose(r_u[0], [384.0, 384.0])
    assert set(dtypes) == {np.dtype(np.float32), np.dtype(np.uint8)}
    b.close()


def test_error_propagates_to_submitter_and_batcher_survives():
    state = {"fail": True}

    def flaky(xs):
        if state["fail"]:
            raise RuntimeError("boom")
        return _echo_slab(xs)

    b = make(batch=4, window=0.0, run=flaky)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(np.ones((6, 2)))  # spans 2 slabs; fails on the first
    state["fail"] = False
    sums, dbl = b.submit(np.ones((2, 2)))  # the batcher still serves
    np.testing.assert_allclose(sums, [2.0, 2.0])
    b.close()


def test_window_zero_runs_immediately():
    b = make(batch=64, window=0.0)
    t0 = time.monotonic()
    b.submit(np.ones((1, 2)))
    assert time.monotonic() - t0 < 1.0
    b.close()


def test_close_rejects_new_requests():
    b = make()
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(np.ones((1, 2)))


def test_pipelined_depth2_matches_inline():
    """depth=2 (completer thread pays the fetch) returns identical results,
    including a request that spans multiple slabs."""
    b = MicroBatcher(_echo_slab, batch_size=4, window_s=0.0, depth=2)
    xs = np.random.RandomState(3).randn(11, 2)
    sums, dbl = b.submit(xs)
    np.testing.assert_allclose(sums, xs.sum(axis=1))
    np.testing.assert_allclose(dbl, xs * 2.0)
    assert b.slab_count == 3
    b.close()


def test_pipelined_lazy_finalize():
    """run_slab may return lazy handles; finalize materializes them on the
    completer side (the serve.py contract for device arrays)."""
    fetched = []

    def lazy_slab(xs):
        return (lambda: xs.sum(axis=1),)  # a "future"

    def finalize(outs):
        fetched.append(True)
        return tuple(np.asarray(o()) for o in outs)

    b = MicroBatcher(lazy_slab, batch_size=2, window_s=0.0, depth=3,
                     finalize=finalize)
    (sums,) = b.submit(np.ones((5, 4)))
    np.testing.assert_allclose(sums, np.full(5, 4.0))
    assert len(fetched) == b.slab_count == 3
    b.close()


def test_pipelined_fetch_error_propagates():
    """An error surfacing at finalize (how device errors appear on the
    tunnel) reaches the submitter; the batcher keeps serving."""
    state = {"fail": True}

    def finalize(outs):
        if state["fail"]:
            raise RuntimeError("fetch-boom")
        return tuple(np.asarray(o) for o in outs)

    b = MicroBatcher(_echo_slab, batch_size=4, window_s=0.0, depth=2,
                     finalize=finalize)
    with pytest.raises(RuntimeError, match="fetch-boom"):
        b.submit(np.ones((2, 2)))
    state["fail"] = False
    sums, _ = b.submit(np.ones((2, 2)))
    np.testing.assert_allclose(sums, [2.0, 2.0])
    b.close()


def test_pipelined_concurrent_correctness():
    """Concurrent distinct-valued requests through depth=2 each get exactly
    their own rows back (no cross-request mixups under pipelining)."""
    b = MicroBatcher(_echo_slab, batch_size=8, window_s=0.05, depth=2)
    reqs = [np.full((3, 2), float(i)) for i in range(10)]
    results = run_concurrent(b, reqs)
    for xs, (sums, dbl) in zip(reqs, results):
        np.testing.assert_allclose(sums, xs.sum(axis=1))
        np.testing.assert_allclose(dbl, xs * 2.0)
    b.close()


def test_fifo_order_preserved_within_slab():
    seen = []

    def record(xs):
        seen.append(xs.copy())
        return _echo_slab(xs)

    b = MicroBatcher(record, batch_size=4, window_s=0.3)
    # hold the dispatcher busy so both requests queue together
    ev = threading.Event()

    def submit(v):
        ev.wait()
        return b.submit(np.full((2, 2), v))

    t1 = threading.Thread(target=submit, args=(1.0,))
    t2 = threading.Thread(target=submit, args=(2.0,))
    t1.start()
    ev.set()
    t1.join(timeout=5)
    t2.start()
    t2.join(timeout=5)
    b.close()
    # every slab's rows are request-contiguous (no interleaving)
    for slab in seen:
        vals = slab[:, 0]
        # changes of value along the slab happen at most batch-1 times and
        # each value appears in one contiguous run
        runs = [v for i, v in enumerate(vals) if i == 0 or vals[i - 1] != v]
        assert len(runs) == len(set(runs))
