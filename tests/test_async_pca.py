"""AsyncPCAUpdater: deterministic lag-2 semantics, drains, error propagation.

The updater is the TPU-native equivalent of the reference's PCA threads
(reference train/train.py:312-357) with deterministic feed versions; these
tests pin the exact-version contract the trainer's step-exact resume relies
on (see pca/async_updater.py docstring).
"""

import time

import numpy as np
import pytest

from soft_contrastive_learning_tpu.pca.async_updater import AsyncPCAUpdater
from soft_contrastive_learning_tpu.pca.incremental import StreamingPCA


def _pca(dim=6, rng=None):
    rng = rng or np.random.default_rng(0)
    p = StreamingPCA(out_dim=4, forgetting=0.9)
    p.init(rng.standard_normal((10, dim)).astype(np.float32))
    return p


def _sync_reference(inputs, dim=6):
    """States after k updates, computed synchronously."""
    p = _pca(dim)
    states = [p.state_dict()]
    for x in inputs:
        p.update(x)
        states.append(p.state_dict())
    return states


def test_lag2_feed_versions():
    rng = np.random.default_rng(1)
    inputs = [rng.standard_normal((5, 6)).astype(np.float32) for _ in range(8)]
    ref = _sync_reference(inputs)

    pca = _pca()
    up = AsyncPCAUpdater(pca, None)
    try:
        for i, x in enumerate(inputs):
            snap, _ = up.feed_states()
            # feed before submitting step i sees updates <= i-2
            want = ref[max(i - 1, 0)]  # ref[k] = state after k updates
            np.testing.assert_array_equal(snap["m"], want["m"])
            up.submit(x, None)
        final, _ = up.drain()
        np.testing.assert_array_equal(final["m"], ref[-1]["m"])
    finally:
        up.close()


def test_drain_floors_future_feeds():
    rng = np.random.default_rng(2)
    inputs = [rng.standard_normal((5, 6)).astype(np.float32) for _ in range(6)]
    ref = _sync_reference(inputs)

    up = AsyncPCAUpdater(_pca(), None)
    try:
        for x in inputs[:4]:
            up.feed_states()
            up.submit(x, None)
        drained, _ = up.drain()  # all 4 applied; floor at version 3
        np.testing.assert_array_equal(drained["m"], ref[4]["m"])
        # next two feeds stay at the floor (the checkpoint-resume invariant:
        # a resumed run starts from exactly this state)
        for _ in range(2):
            snap, _ = up.feed_states()
            np.testing.assert_array_equal(snap["m"], ref[4]["m"])
            up.submit(inputs[4], None)
        # afterwards normal lag-2 resumes relative to post-drain submissions
        snap, _ = up.feed_states()
        assert not np.array_equal(snap["m"], ref[4]["m"])
    finally:
        up.close()


def test_updates_applied_in_order_and_close_drains():
    rng = np.random.default_rng(3)
    inputs = [rng.standard_normal((5, 6)).astype(np.float32) for _ in range(10)]
    ref = _sync_reference(inputs)
    pca = _pca()
    up = AsyncPCAUpdater(pca, None)
    for x in inputs:
        up.submit(x, None)
    up.close()
    np.testing.assert_array_equal(pca.m, ref[-1]["m"])
    np.testing.assert_allclose(pca.seen, ref[-1]["seen"])


def test_worker_error_propagates():
    up = AsyncPCAUpdater(_pca(), None)
    up.submit(np.array([["bad"]], dtype=object), None)  # update will raise
    with pytest.raises(RuntimeError, match="streaming-PCA worker failed"):
        deadline = time.time() + 10
        while time.time() < deadline:
            up.feed_states()
            up.submit(np.zeros((5, 6), np.float32), None)
    # Failure is terminal: every later call keeps raising (a one-shot error
    # would let a subsequent drain KeyError on the never-applied version),
    # and close() still stops the worker thread.
    with pytest.raises(RuntimeError, match="streaming-PCA worker failed"):
        up.drain()
    with pytest.raises(RuntimeError, match="streaming-PCA worker failed"):
        up.close()
    assert not up._thread.is_alive()


def test_both_pcas_updated_together():
    rng = np.random.default_rng(4)
    pca, loss_pca = _pca(), _pca(rng=np.random.default_rng(9))
    up = AsyncPCAUpdater(pca, loss_pca)
    a = rng.standard_normal((5, 6)).astype(np.float32)
    b = rng.standard_normal((5, 6)).astype(np.float32)
    up.submit(a, b)
    p_sd, l_sd = up.drain()
    up.close()
    assert p_sd is not None and l_sd is not None
    assert p_sd["true_seen"] == 15.0  # 10 init + 5
    assert l_sd["true_seen"] == 15.0
