"""The hard-example mining subsystem: window refresh (sync), the async
refresh worker, and cooperative cancellation.

Replaces the reference's mining-barrier thread tangle
(reference train/train.py:131-357 caching threads + :1012-1068 refresh
loop) with one manager owning the cache, the refresh computation, and at
most ONE in-flight worker. Extracted from the trainer in round 4
(VERDICT #6): mining grew three concerns (sync refresh, async spawn with
params pinning, cancellation on unwind) that deserve their own module.

The manager reads a narrow surface of its host trainer AT CALL TIME
(several of these are replaced mid-run — bench_train swaps ``timer``,
resume swaps ``pca``/``loss_pca``/``rng``):

* ``cfg`` — TrainConfig (mining cadence/window geometry),
* ``extract_features`` — batched on-device embedding,
* ``pca`` / ``loss_pca`` — streaming-PCA objects (or None),
* ``rng`` — the main-thread numpy Generator (residual-loss pair draws),
* ``state`` — train state (live params for the async snapshot),
* ``_neighbor_order`` — the jitted device neighbor-order (kept on the
  trainer so an instance-level override stubs the device path),
* ``timer`` / ``log`` — StepTimer spans + run logging.
"""

from __future__ import annotations

import threading
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.sampling.mining import MiningCache


class MiningCancelled(Exception):
    """Async mining refresh aborted cooperatively (unwind/close): not an
    error — the cache simply keeps its previous window."""


def rand_pairs(rng: np.random.Generator, n: int, m: int) -> List[Tuple[int, int]]:
    """m distinct unordered index pairs out of n items
    (reference rand_pairs/decode, train/train.py:41-51)."""
    total = n * (n - 1) // 2
    picks = rng.choice(total, size=min(m, total), replace=False)
    out = []
    for i in picks:
        k = int((1 + np.sqrt(1 + 8 * i)) // 2)
        out.append((k, int(i - k * (k - 1) // 2)))
    return out


class MiningManager:
    def __init__(self, trainer):
        self.t = trainer
        self.cache = MiningCache()
        self._thread = None  # in-flight refresh worker (async_mining)
        self._error = None
        self._cancel = None  # cooperative-abort event for the worker
        self._params_copy = None  # jitted params snapshot (donation-safe)
        self.refresh_count = 0  # completed (non-cancelled) window swaps

    # ------------------------------------------------------------ refresh
    def refresh(
        self, epoch: int, step: int, mining_count: int, meta, anchor_indices,
        update_pca: bool = True, params=None, cancel=None,
    ) -> None:
        """Reference train/train.py:1012-1068. ``update_pca=False`` rebuilds
        only the mining cache — used on mid-segment resume, where the restored
        streaming-PCA state already contains this window's update.
        ``params`` pins the embedding params (async mining passes the
        boundary-time snapshot); default = the live trainer params.
        ``cancel``: optional threading.Event checked between embed chunks
        (cooperative abort for an unwinding async refresh)."""
        t = self.t
        cfg = t.cfg
        n_meta = len(meta["t"])
        window = np.arange(
            mining_count * cfg.mining_cache_size,
            (mining_count + 1) * cfg.mining_cache_size,
        ) % n_meta
        upcoming = np.asarray(
            anchor_indices[step : min(step + cfg.mining_step, len(anchor_indices))]
        )
        # Static shapes, the XLA way: at an epoch tail ``upcoming`` shrinks
        # (anchors % mining_step), which would give the (C, C) neighbor-order
        # jit a fresh shape — a full remote recompile per distinct tail.
        # Extend the rolling window to keep len(mine_idx) fixed at
        # cache_size + mining_step (deviation from the reference, which
        # caches whatever remains, train/train.py:1021-1030: a few extra
        # rolling-window members are semantically neutral — the window is an
        # arbitrary rolling subset already).
        deficit = cfg.mining_step - len(upcoming)
        if deficit > 0:
            extension = np.arange(
                (mining_count + 1) * cfg.mining_cache_size,
                (mining_count + 1) * cfg.mining_cache_size + deficit,
            ) % n_meta
            window = np.concatenate([window, extension])
        mine_idx = np.concatenate([window, upcoming])

        full_feats = cfg.model.reduction == "pca"
        # Order-only fast path: the sampler consumes nothing but
        # sorted_neighbors, so when no host-side state needs the features
        # (no streaming PCA, loss-PCA already initialized) the window never
        # crosses to the host at all — the embed chunks stay in HBM, the
        # neighbor order is computed on device, and only the (C, C) int32
        # order is fetched (~30x fewer bytes than the f32 features at
        # flagship width; through the relay this removes the dominant
        # per-boundary cost, docs/TRAINBENCH.md "Async mining refresh").
        order_only = (
            not full_feats
            and t.pca is None
            and (t.loss_pca is None or t.loss_pca.initialized)
        )
        if order_only:
            feats = None
            dev_feats = t.extract_features(
                meta, mine_idx, device_only=True, params=params,
                cancel=cancel,
            )
        else:
            feats, dev_chunks = t.extract_features(
                meta, mine_idx, full_feats=full_feats, keep_device=True,
                params=params, cancel=cancel,
            )
        # The tail below (neighbor-order matmul + fetch + cache swap) also
        # honors cancellation: a cancelled refresh must neither block on
        # another device fetch nor swap a half-trusted window in.
        if cancel is not None and cancel.is_set():
            raise MiningCancelled()

        if t.pca is not None:
            if not t.pca.initialized:
                t.pca.init(feats)
            elif update_pca:
                t.pca.update_multi(feats, cfg.images_per_batch)
            feats = t.pca.whiten(feats).astype(np.float32)

        if t.loss_pca is not None and not t.loss_pca.initialized:
            if "residual" in cfg.loss.name:
                pairs = rand_pairs(t.rng, len(mine_idx), cfg.loss.loss_dim + 1)
                residuals = np.stack([feats[i] - feats[j] for i, j in pairs])
                t.loss_pca.init(residuals)
            else:
                t.loss_pca.init(feats)

        # Sorted-neighbor order ON DEVICE (sampling/mining.py::neighbor_order):
        # one Gram matmul + argsort at refresh time replaces a C x D host
        # matvec per anchor in the hot loop. The whitened (pca) path uploads
        # the small whitened matrix; otherwise the embed chunks are still
        # resident on device and nothing re-crosses the relay.
        try:
            if t.pca is not None and t.pca.initialized:
                dev_feats = jnp.asarray(feats)
            elif not order_only:
                dev_feats = (
                    jnp.concatenate(dev_chunks)[: len(mine_idx)]
                    .astype(jnp.float32)
                )
            order = np.asarray(t._neighbor_order(dev_feats))
        except Exception as e:  # fall back to host matvec queries
            t.log(f"device neighbor-order failed ({e}); host fallback")
            order = None
            if feats is None:
                # order-only path has no host copy yet: the cache must be
                # able to answer queries, so fetch the window after all
                # (one transfer — the array is already concatenated)
                feats = np.asarray(dev_feats)

        if cancel is not None and cancel.is_set():
            raise MiningCancelled()  # keep the previous window
        self.cache.refresh(feats, mine_idx, order=order)
        self.refresh_count += 1

    # ------------------------------------------------------------- async
    def spawn(
        self, refresh_fn, epoch: int, step0: int, mining_count: int, meta,
        anchor_indices,
    ) -> None:
        """Dispatch a mining refresh on a worker thread (cfg.async_mining).

        ``refresh_fn`` is the trainer's ``_mining_refresh`` — looked up by
        the CALLER so an instance-level override (tests, subclasses) is what
        the worker runs. The embed is pinned to a snapshot of the
        boundary-time params — the same params a synchronous refresh would
        use — while the main loop keeps dispatching train steps against the
        live state. The worker's device work serializes into the same device
        stream; only its blocking host fetches move off the training thread.
        The sampler keeps answering from the previous window until
        ``MiningCache.refresh`` swaps the new one in under the cache lock.

        The snapshot must be a real on-device COPY: the jitted train step
        donates its state, so the live params' buffers are invalidated the
        moment the main loop dispatches the next step. One HBM-to-HBM copy
        of the params (sub-ms at flagship scale, dispatched async, nothing
        crosses the host) per boundary buys the pinning."""
        if self._params_copy is None:
            self._params_copy = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t)
            )
        params = self._params_copy(self.t.state.params)
        cancel = threading.Event()
        self._cancel = cancel

        def work():
            try:
                with self.t.timer.span("mining_refresh_async"):
                    refresh_fn(
                        epoch, step0, mining_count, meta, anchor_indices,
                        params=params, cancel=cancel,
                    )
            except MiningCancelled:
                pass  # deliberate abort: keep the previous window
            except BaseException as e:  # surfaced by the next join()
                self._error = e

        t = threading.Thread(target=work, name="mining-refresh", daemon=True)
        self._thread = t
        t.start()

    def join(self, raise_error: bool = True, cancel: bool = False) -> None:
        """Wait for an in-flight async refresh (no-op without one) and
        surface any error it captured.

        ``cancel=True`` aborts the refresh cooperatively instead of waiting
        it out — used on unwind/close (a worker failure must not mask the
        original exception, hence also ``raise_error=False`` there) and at
        epoch end (the landed window would be discarded anyway: the next
        epoch's first boundary rebuilds synchronously on the reshuffled
        meta). The cancel event is checked between embed chunks and before
        the neighbor-order fetch / cache swap. The wait bound depends on the
        feed path: on host feed it is ~one in-flight chunk (each chunk's
        image IO + upload sits between checks); on the device-pool
        order-only path the dispatches are near-instant, so a cancel that
        lands after the last chunk waits out the already-enqueued window
        embed + order fetch (device work that was committed at spawn; an
        already-issued blocking call cannot be interrupted)."""
        t, self._thread = self._thread, None
        if t is not None:
            if (cancel or not raise_error) and self._cancel is not None:
                self._cancel.set()
            t.join()
        self._cancel = None
        err, self._error = self._error, None
        if err is not None:
            if raise_error:
                raise RuntimeError("async mining refresh failed") from err
            self.t.log(f"async mining refresh error during unwind: {err}")
