"""MicroBatcher: transport-agnostic request coalescing for serving.

Covers the batching contract (single dispatch per coalesced batch,
row-faithful fan-out, per-request mse), the concurrency/shutdown
semantics, and the pairing with BucketedPredictor on a real model.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models.base import PredictOutput
from cbfssm_tpu.serving import BucketedPredictor, MicroBatcher
from tests.test_cbfssm_model import make_model

SEQ, DU, DY = 8, 2, 1


class StubModel:
    dtype = np.float64
    dim_u = DU
    dim_y = DY


class StubPredictor:
    """Deterministic predictor recording every dispatched batch shape."""

    def __init__(self, fail=False, block_event=None):
        self.model = StubModel()
        self.seq_len = SEQ
        self.calls = []
        self.keys = []
        self.fail = fail
        self.block_event = block_event
        self.entered = threading.Event()  # set when a dispatch reaches us

    def __call__(self, u, y, key=None):
        self.entered.set()
        if self.block_event is not None:
            self.block_event.wait()
        if self.fail:
            raise RuntimeError("device on fire")
        self.calls.append(u.shape)
        self.keys.append(np.asarray(key))
        n = u.shape[0]
        mean = u[..., :DY] + 1.0  # row-identifiable deterministic output
        var = np.ones_like(mean)
        return PredictOutput(
            pred_mean=jnp.asarray(mean), pred_var=jnp.asarray(var),
            internal_mean=jnp.asarray(u), internal_var=jnp.asarray(u),
            mse=jnp.mean((jnp.asarray(mean) - y) ** 2),
            sde=jnp.asarray(var),
        )


def req(rng):
    return (rng.normal(size=(SEQ, DU)), rng.normal(size=(SEQ, DY)))


def test_single_request_roundtrip(rng):
    pred = StubPredictor()
    with MicroBatcher(pred, max_batch=4, max_wait_ms=1.0) as mb:
        u, y = req(rng)
        out = mb(u, y)
    assert out.pred_mean.shape == (1, SEQ, DY)
    np.testing.assert_allclose(
        np.asarray(out.pred_mean)[0], u[..., :DY] + 1.0
    )
    # per-request mse recomputed over this row alone
    np.testing.assert_allclose(
        float(out.mse), np.mean((u[..., :DY] + 1.0 - y) ** 2)
    )
    s = mb.stats()
    assert s["requests"] == s["batches"] == 1 and s["errors"] == 0


def test_coalescing_one_dispatch(rng):
    """max_batch requests submitted while the dispatcher is held on an
    in-flight batch coalesce into ONE predictor call, rows in submit
    order."""
    gate = threading.Event()
    pred = StubPredictor(block_event=gate)
    mb = MicroBatcher(pred, max_batch=3, max_wait_ms=50.0)
    try:
        # occupy the dispatcher with a first request so the next three
        # queue up behind it deterministically
        first = mb.submit(*req(rng))
        assert pred.entered.wait(timeout=30)  # dispatcher now held in-call
        reqs = [req(rng) for _ in range(3)]
        futs = [mb.submit(u, y) for u, y in reqs]
        gate.set()
        outs = [f.result(timeout=30) for f in futs]
        first.result(timeout=30)
    finally:
        gate.set()
        mb.close()
    assert pred.calls == [(1, SEQ, DU), (3, SEQ, DU)]
    for (u, y), out in zip(reqs, outs):
        np.testing.assert_allclose(
            np.asarray(out.pred_mean)[0], u[..., :DY] + 1.0
        )
        np.testing.assert_allclose(
            float(out.mse), np.mean((u[..., :DY] + 1.0 - y) ** 2)
        )
    # distinct batches get distinct fold keys
    assert not np.array_equal(pred.keys[0], pred.keys[1])
    s = mb.stats()
    assert s["requests"] == 4 and s["batches"] == 2
    assert s["max_batch_seen"] == 3 and s["mean_batch_size"] == 2.0


def test_max_wait_flushes_partial_batch(rng):
    pred = StubPredictor()
    with MicroBatcher(pred, max_batch=64, max_wait_ms=5.0) as mb:
        out = mb.submit(*req(rng)).result(timeout=30)
    assert out.pred_mean.shape == (1, SEQ, DY)
    assert pred.calls == [(1, SEQ, DU)]


def test_submit_validates_shapes(rng):
    pred = StubPredictor()
    with MicroBatcher(pred) as mb:
        with pytest.raises(ValueError, match="one sequence"):
            mb.submit(rng.normal(size=(1, SEQ, DU)), rng.normal(size=(SEQ, DY)))
        with pytest.raises(ValueError, match="match u"):
            mb.submit(rng.normal(size=(SEQ, DU)), rng.normal(size=(SEQ, DY + 1)))


def test_predictor_error_propagates_and_recovers(rng):
    pred = StubPredictor(fail=True)
    with MicroBatcher(pred, max_wait_ms=0.0) as mb:
        fut = mb.submit(*req(rng))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=30)
        # the dispatcher survives the failed batch and keeps serving
        pred.fail = False
        out = mb.submit(*req(rng)).result(timeout=30)
        assert out.pred_mean.shape == (1, SEQ, DY)
    assert mb.stats()["errors"] == 1


def test_close_drains_pending(rng):
    gate = threading.Event()
    pred = StubPredictor(block_event=gate)
    mb = MicroBatcher(pred, max_batch=1, max_wait_ms=0.0)
    futs = [mb.submit(*req(rng)) for _ in range(3)]
    gate.set()
    mb.close()  # drain=True: everything already queued gets served
    for f in futs:
        assert f.result(timeout=1).pred_mean.shape == (1, SEQ, DY)
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(*req(rng))


def test_close_nodrain_fails_pending(rng):
    """Deterministic ordering: close(drain=False) runs while the
    dispatcher is still HELD at the gate with request #1 in flight
    (max_batch=1), so the 3 queued requests are failed by close's queue
    drain before the dispatcher could ever serve them. Opening the gate
    only afterwards lets the in-flight request and close's join finish."""
    gate = threading.Event()
    pred = StubPredictor(block_event=gate)
    mb = MicroBatcher(pred, max_batch=1, max_wait_ms=0.0)
    first = mb.submit(*req(rng))  # in-flight: held at the gate
    time.sleep(0.05)
    pending = [mb.submit(*req(rng)) for _ in range(3)]
    closer = threading.Thread(target=lambda: mb.close(drain=False))
    closer.start()
    # close fails the queued futures BEFORE joining the gated dispatcher
    failed = sum(
        1 for f in pending
        if isinstance(f.exception(timeout=5), RuntimeError)
    )
    gate.set()
    closer.join(timeout=5)
    assert not closer.is_alive()
    assert failed == 3
    assert first.result(timeout=5).pred_mean.shape == (1, SEQ, DY)


def test_concurrent_submitters_all_served(rng):
    pred = StubPredictor()
    results = {}

    def client(mb, i, u, y):
        results[i] = mb(u, y, timeout=60)

    with MicroBatcher(pred, max_batch=8, max_wait_ms=2.0) as mb:
        reqs = [req(rng) for _ in range(12)]
        threads = [
            threading.Thread(target=client, args=(mb, i, u, y))
            for i, (u, y) in enumerate(reqs)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert len(results) == 12
    for i, (u, y) in enumerate(reqs):
        np.testing.assert_allclose(
            np.asarray(results[i].pred_mean)[0], u[..., :DY] + 1.0
        )
    s = mb.stats()
    assert s["requests"] == 12 and s["errors"] == 0
    # coalescing happened at least once (12 requests, <=8 per batch,
    # but more than one per dispatch on average is load-dependent; the
    # hard guarantee is conservation)
    assert s["batches"] <= 12


def test_real_model_rows_match_direct_batch_call(rng):
    """Against a real CBFSSM + BucketedPredictor: a coalesced batch's
    fan-out rows equal the rows of one direct predictor call with the
    same key and stacking order."""
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    bp = BucketedPredictor(model, params, seq_len=SEQ, buckets=(1, 4))
    gate = threading.Event()
    calls = []

    entered = threading.Event()

    class RecordingBP:
        model = bp.model
        seq_len = bp.seq_len

        def __call__(self, u, y, key=None):
            entered.set()
            gate.wait()
            calls.append((np.asarray(u), np.asarray(y), key))
            return bp(u, y, key)

    mb = MicroBatcher(RecordingBP(), max_batch=4, max_wait_ms=100.0)
    try:
        warm = mb.submit(*req(rng))  # holds the dispatcher at the gate
        assert entered.wait(timeout=120)
        reqs = [req(rng) for _ in range(3)]
        futs = [mb.submit(u, y) for u, y in reqs]
        gate.set()
        outs = [f.result(timeout=120) for f in futs]
        warm.result(timeout=120)
    finally:
        gate.set()
        mb.close()
    # second dispatch carried the 3 coalesced requests
    u_b, y_b, key_b = calls[1]
    assert u_b.shape == (3, SEQ, DU)
    direct = bp(u_b, y_b, key_b)
    for i, out in enumerate(outs):
        np.testing.assert_allclose(
            np.asarray(out.pred_mean)[0],
            np.asarray(direct.pred_mean)[i],
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(out.mse),
            np.mean(
                (np.asarray(direct.pred_mean)[i] - reqs[i][1][..., :DY]) ** 2
            ),
            rtol=1e-10,
        )


def test_submit_close_race_strands_no_future(rng):
    """Hammer submit() from several threads while close() fires
    mid-stream. The submit lock guarantees every request either gets a
    future that RESOLVES (result or 'closed' error) or submit itself
    raises 'closed' — after close() returns, no future may still be
    pending. (Regression: an unlocked submit could enqueue behind the
    shutdown sentinel and hang forever.)"""
    for trial in range(10):
        pred = StubPredictor()
        mb = MicroBatcher(pred, max_batch=4, max_wait_ms=0.0)
        futs = []
        futs_lock = threading.Lock()
        rejected = []
        start = threading.Barrier(5)
        u, y = req(rng)

        def client():
            start.wait()
            for _ in range(20):
                try:
                    f = mb.submit(u, y)
                except RuntimeError:
                    rejected.append(1)
                    return
                with futs_lock:
                    futs.append(f)

        threads = [threading.Thread(target=client) for _ in range(4)]
        for t in threads:
            t.start()
        start.wait()
        mb.close()  # races the in-flight submits
        for t in threads:
            t.join()
        # every future obtained before/while closing is resolved:
        # either served (drain=True) or failed with the close error
        for f in futs:
            assert f.done(), "stranded future: submit landed behind sentinel"
            exc = f.exception(timeout=0)
            assert exc is None or "closed" in str(exc)


def test_partial_fanout_failure_keeps_dispatcher_alive(rng, monkeypatch):
    """A failure mid fan-out — after earlier rows of the batch already
    resolved — must propagate only to the still-pending futures
    (set_exception on a done future raises InvalidStateError and would
    kill the dispatcher) and leave the batcher serving."""
    from cbfssm_tpu.models.base import PredictOutput

    calls = {"n": 0}
    real_replace = PredictOutput.replace

    def flaky_replace(self, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # 2nd row of the coalesced batch below
            raise RuntimeError("row explode")
        return real_replace(self, **kw)

    monkeypatch.setattr(PredictOutput, "replace", flaky_replace)
    gate = threading.Event()
    pred = StubPredictor(block_event=gate)
    mb = MicroBatcher(pred, max_batch=2, max_wait_ms=50.0)
    try:
        warm = mb.submit(*req(rng))  # replace #1: ok
        assert pred.entered.wait(timeout=30)
        futs = [mb.submit(*req(rng)) for _ in range(2)]  # one 2-row batch
        gate.set()
        warm.result(timeout=30)
        # row 0 resolved (replace #2), row 1 failed (replace #3)
        assert futs[0].result(timeout=30).pred_mean.shape == (1, SEQ, DY)
        with pytest.raises(RuntimeError, match="row explode"):
            futs[1].result(timeout=30)
        # dispatcher survived; keeps serving
        out = mb(*req(rng), timeout=30)
        assert out.pred_mean.shape == (1, SEQ, DY)
        # only the actually-failed row counts as an error
        assert mb.stats()["errors"] == 1
    finally:
        gate.set()
        mb.close()
