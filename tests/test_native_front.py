"""C++ serving core (native/src/serving_core.cc) + NativePredictFront."""

import json
import threading

import numpy as np
import pytest

pytest.importorskip("ctypes")

from the_algorithm_tpu.serving.native_front import (
    NativeClient,
    NativeFrontConfig,
    NativePredictFront,
)

F, O = 16, 3


def _model(batch: np.ndarray) -> np.ndarray:
    # deterministic per-row function so responses can be checked row-wise
    s = batch.sum(axis=1, keepdims=True)
    return np.concatenate([s, s * 2.0, -s], axis=1)


@pytest.fixture()
def front():
    cfg = NativeFrontConfig(
        feature_width=F, out_width=O, max_batch_rows=64, max_delay_ms=3.0
    )
    with NativePredictFront(_model, cfg) as f:
        yield f


def test_single_request_roundtrip(front):
    c = NativeClient(front.port, F, O)
    rows = np.random.default_rng(0).random((5, F)).astype(np.float32)
    out = c.predict(rows)
    np.testing.assert_allclose(out, _model(rows), rtol=1e-6)
    c.close()


def test_keep_alive_multiple_requests(front):
    c = NativeClient(front.port, F, O)
    rng = np.random.default_rng(1)
    for _ in range(4):
        rows = rng.random((3, F)).astype(np.float32)
        np.testing.assert_allclose(c.predict(rows), _model(rows), rtol=1e-6)
    c.close()


def test_concurrent_clients_are_batched(front):
    rng = np.random.default_rng(2)
    inputs = [rng.random((2, F)).astype(np.float32) for _ in range(16)]
    outputs = [None] * 16

    def worker(i):
        c = NativeClient(front.port, F, O)
        outputs[i] = c.predict(inputs[i])
        c.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(16):
        np.testing.assert_allclose(outputs[i], _model(inputs[i]), rtol=1e-6)

    st = front.stats()
    assert st["requests"] == 16
    assert st["rows"] == 32
    # deadline batching must have coalesced at least some requests
    assert st["batches"] < 16
    assert st["avg_batch_rows"] > 2.0


def test_health_stats_and_errors(front):
    c = NativeClient(front.port, F, O)
    assert c.get("/healthz") == b"ok"
    # drive one real request then read stats
    c.predict(np.zeros((1, F), np.float32))
    st = json.loads(c.get("/stats"))
    assert st["requests"] >= 1
    c.close()

    # bad row count -> 400, connection stays usable for the error response
    c2 = NativeClient(front.port, F, O)
    with pytest.raises(RuntimeError):
        c2.predict(np.zeros((1000, F), np.float32))  # > max_batch_rows
    c2.close()
