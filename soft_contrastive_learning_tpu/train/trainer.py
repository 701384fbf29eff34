"""The training orchestrator.

Capability parity with the reference's train()/train_one_epoch()
(reference train/train.py:917-1109) rebuilt around one jitted step:

* per-epoch shuffled metadata + presampled anchors (filesystem or ToyCity
  source; reference :1002-1009),
* hard-example mining refresh every ``mining_step`` steps: re-embed a rolling
  window + upcoming anchors on-device, rebuild the MiningCache, init/update
  the streaming PCAs (reference :1012-1068),
* eval every ``eval_step``: rolling checkpoint, held-out-region loss, and
  localization AUC/%-within-radius on both regions (reference :1070-1092),
* unbounded 'part' checkpoints every ``save_step`` and an 'epoch' checkpoint
  per epoch (reference :1094-1102, :984),
* host batch assembly (sampler + image decode) prefetched on a producer thread
  while the device runs the previous step (the P1 pipeline, SURVEY.md §2),
* full state checkpointing via orbax — params, optimizer, step, rng, PCA
  states, sampler RNG, epoch — so runs resume with exact weights/optimizer
  state and an epoch-granular data stream (the reference cannot resume at
  all, SURVEY.md §5).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import TrainConfig
from soft_contrastive_learning_tpu.core.logging import (
    AsyncScalarLogger, MetricsWriter, RunLogger, StepTimer,
)
from soft_contrastive_learning_tpu.checkpoints.manager import (
    RunCheckpoints,
    numpy_rng_from_array,
    numpy_rng_to_array,
    warm_start_params,
)
from soft_contrastive_learning_tpu.data.pipeline import (
    assemble_batch,
    load_images_standard,
)
from soft_contrastive_learning_tpu.losses.registry import build_loss
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.parallel.mesh import (
    pad_to_multiple, replicated_sharding, shard_batch,
)
from soft_contrastive_learning_tpu.pca.async_updater import AsyncPCAUpdater
from soft_contrastive_learning_tpu.pca.incremental import StreamingPCA
from soft_contrastive_learning_tpu.sampling.mining import neighbor_order
from soft_contrastive_learning_tpu.sampling.tuples import TupleSampler
from soft_contrastive_learning_tpu.train.eval_hooks import EvalHooks
from soft_contrastive_learning_tpu.train.mining_manager import (
    MiningCancelled as _MiningCancelled,  # re-export: tests import from here
    MiningManager,
)
from soft_contrastive_learning_tpu.train.segment import (
    EVAL_SAVE_SPANS,  # re-export: bench_train keys its metrics off this
    run_segment,
)
from soft_contrastive_learning_tpu.train.step import (
    build_embed_pool_step,
    build_embed_step,
    build_eval_loss_step,
    build_train_step,
    build_train_step_scan,
    init_train_state,
)
from soft_contrastive_learning_tpu.launch.multihost import is_primary
from soft_contrastive_learning_tpu.utils.meta import get_xy, get_yaw


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        source,
        out_dir: Optional[str] = None,
        mesh=None,
        save_plots: bool = False,
        warm_start_donor=None,
        profile_steps: int = 0,
    ):
        self.cfg = cfg
        self.source = source
        self.mesh = mesh
        self.save_plots = save_plots
        self.out_dir = out_dir or cfg.out_dir or "."
        os.makedirs(self.out_dir, exist_ok=True)
        # Writer election: in a multi-host run only process 0 writes
        # checkpoints/metrics/config — state is replicated (batch-only
        # sharding), so the primary's copy is complete (launch/multihost.py).
        self.primary = is_primary()
        self.save_plots = save_plots and self.primary
        if self.primary:
            cfg.save(os.path.join(self.out_dir, "config.json"))

        self.log = RunLogger(self.out_dir if self.primary else None)
        self.writers = {
            "local": MetricsWriter(self.out_dir, "local", enabled=self.primary),
            "other": MetricsWriter(self.out_dir, "other", enabled=self.primary),
        }
        self.timer = StepTimer()
        self.ckpts = RunCheckpoints(
            self.out_dir, max_to_keep=cfg.max_to_keep, enabled=self.primary
        )

        self.model = create_model(cfg.model)
        params = init_params(cfg.model, jax.random.key(cfg.seed), batch=1)
        if warm_start_donor is not None:
            params, copied = warm_start_params(params, warm_start_donor)
            self.log(f"Warm-started scopes: {copied}")
        self.state = init_train_state(cfg, params)

        loss_fn = build_loss(cfg.loss, cfg.tuples, cfg.tuples_per_batch)
        self.train_step = build_train_step(cfg, self.model, loss_fn)
        self.train_step_pooled = build_train_step(
            cfg, self.model, loss_fn, image_pool=True
        )
        # K-step fused dispatch (cfg.steps_per_dispatch > 1): only for loops
        # with no per-step host state feedback; boundaries fall back to the
        # single-step executables above.
        self.train_step_scan = None
        self.train_step_scan_pooled = None
        if (
            cfg.steps_per_dispatch > 1
            and not cfg.loss.incremental
            and cfg.model.reduction != "pca"
        ):
            self.train_step_scan = build_train_step_scan(
                cfg, self.model, loss_fn, image_pool=False
            )
            self.train_step_scan_pooled = build_train_step_scan(
                cfg, self.model, loss_fn, image_pool=True
            )
        self.eval_loss_step = build_eval_loss_step(cfg, self.model, loss_fn)
        self.embed_step = build_embed_step(cfg, self.model)
        self.embed_pool_step = build_embed_pool_step(cfg, self.model)
        # Device-resident image pool (data/device_pool.py): built lazily at
        # the first epoch, reused across epochs (the set is epoch-invariant;
        # only row order changes). None until built; False = permanently
        # unavailable (over budget / keys missing).
        self._image_pool = None
        self._pool_rows = None  # meta-row -> pool-row map for current epoch

        # Mining + eval subsystems (train/mining_manager.py,
        # train/eval_hooks.py): the trainer keeps thin delegates so the
        # subsystem seams stay overridable per-instance (tests, subclasses).
        self.mining = MiningManager(self)
        self.mining_cache = self.mining.cache
        self.evals = EvalHooks(self)
        self._neighbor_order = jax.jit(neighbor_order)
        self.pca = StreamingPCA(cfg.model.out_dim, cfg.forgetting_factor) \
            if cfg.model.reduction == "pca" else None
        self.loss_pca = StreamingPCA(cfg.loss.loss_dim, cfg.forgetting_factor) \
            if cfg.loss.incremental else None

        self.rng = np.random.default_rng(cfg.seed)
        # Separate stream for the eval paths: they run on the main thread
        # while the Prefetcher producer is concurrently drawing from self.rng
        # (numpy Generators are not thread-safe).
        self.eval_rng = np.random.default_rng(cfg.seed + 1)
        self._pool = ThreadPoolExecutor(max_workers=8)
        self.global_step = 0
        self.start_epoch = 0
        self._current_epoch = 0
        self._seg_ctx = None  # live segment position for mid-epoch checkpoints
        self._updater = None  # per-segment AsyncPCAUpdater (async_pca mode)
        self._resume_ctx = None  # set by resume_latest for the first epoch
        self.used_images: set = set()
        # Per-step loss/LR logging without blocking the dispatch loop: the
        # device scalars are fetched (chunk-stacked, one transfer per key) on
        # a worker thread. See core/logging.py::AsyncScalarLogger.
        self.metrics_logger = AsyncScalarLogger(self._write_train_metrics)
        # jax.profiler trace of the first N steps (SURVEY.md §5 tracing:
        # replaces the reference's ad-hoc stage prints with a real profile).
        self._profile_steps = profile_steps
        self._profiling = False

    # ------------------------------------------------------------ helpers
    def _sampler_for(self, meta, rng=None) -> TupleSampler:
        return TupleSampler(
            self.cfg.tuples, self.cfg.loss, self.cfg.tuple_shape,
            get_xy(meta), get_yaw(meta), rng=rng if rng is not None else self.rng,
        )

    def _augment_batch(
        self, batch: Dict[str, np.ndarray], snaps=None
    ) -> Dict[str, np.ndarray]:
        """Attach the streaming-PCA states (the reference's v/m/var and
        l_s/l_v/l_m/l_seen placeholder feeds, train/train.py:277-283).

        ``snaps`` is an (pca_sd, loss_pca_sd) snapshot pair from the async
        updater (deterministic lag-2 view); without it the live objects are
        read (synchronous mode / eval paths after a drain)."""
        if snaps is not None:
            pca_sd, loss_sd = snaps
        else:
            pca_sd = (
                self.pca.state_dict()
                if self.pca is not None and self.pca.initialized
                else None
            )
            loss_sd = (
                self.loss_pca.state_dict()
                if self.loss_pca is not None and self.loss_pca.initialized
                else None
            )
        if pca_sd is not None:
            batch["pca_components"] = pca_sd["v"]
            batch["pca_mean"] = pca_sd["m"]
            batch["pca_variance"] = pca_sd["var"]
        if loss_sd is not None:
            batch["loss_pca_s"] = loss_sd["s"]
            batch["loss_pca_v"] = loss_sd["v"]
            batch["loss_pca_m"] = loss_sd["m"]
            batch["loss_pca_seen"] = np.float32(loss_sd["seen"])
        return batch

    def extract_features(
        self, meta, indices: Sequence[int], full_feats: bool = False,
        keep_device: bool = False, params=None, cancel=None,
        device_only: bool = False,
    ):
        """Batched on-device embedding of ``meta`` rows ``indices``
        (reference extract_features, train/train.py:1196-1213).

        ``keep_device=True`` additionally returns the per-chunk DEVICE
        arrays (pre-whitening), so callers can run follow-up device compute
        (e.g. the mining neighbor-order matmul) without re-uploading the
        features through the host. ``device_only=True`` instead returns ONE
        device array — concatenated, truncated to ``len(indices)`` and cast
        to float32 (bf16 embeddings from spp / flattened-map configs must
        not reach sum-of-squares distance math) — and never fetches the
        features to host; every chunk is an async dispatch (the order-only
        mining fast path; through the relay the host fetch is the dominant
        refresh cost, docs/TRAINBENCH.md). ``params`` pins the embedding
        params (async mining embeds with a boundary-time snapshot while the
        live ``self.state`` keeps training); default = the live params."""
        params = self.state.params if params is None else params
        b = self.cfg.images_per_batch
        idx = pad_to_multiple(np.asarray(indices, dtype=int), b)
        keep_device = keep_device or device_only
        feats = []
        dev_chunks = []
        pool = self._image_pool if self._image_pool not in (None, False) else None
        for start in range(0, len(idx), b):
            # Cooperative cancellation between chunks (each ~one embed
            # dispatch + fetch) bounds how long an unwinding caller waits on
            # an in-flight async mining refresh.
            if cancel is not None and cancel.is_set():
                raise _MiningCancelled()
            chunk = idx[start : start + b]
            keys = [(meta["date"][i], meta["folder"][i], meta["t"][i]) for i in chunk]
            rows = pool.rows_for_keys(keys) if pool is not None else None
            if rows is not None:
                # device-pool path: ship (b,) indices, gather in HBM
                output, full = self.embed_pool_step(
                    params, shard_batch(rows, self.mesh), pool.array
                )
            else:
                images = load_images_standard(self.source, keys, self.cfg, self._pool)
                images = shard_batch(images, self.mesh)
                output, full = self.embed_step(params, images)
            sel = full if full_feats else output
            if keep_device:
                dev_chunks.append(sel)
            if not device_only:
                feats.append(np.asarray(sel))
            elif rows is None and len(dev_chunks) > 4:
                # Host-feed backpressure: without the per-chunk host fetch,
                # nothing bounds how many chunks' image uploads sit queued in
                # HBM. Waiting on the chunk 4 dispatches back keeps ~4 input
                # buffers in flight (the pool path ships only (b,) indices —
                # no bound needed there).
                dev_chunks[-5].block_until_ready()
        if device_only:
            return jnp.concatenate(dev_chunks)[: len(indices)].astype(
                jnp.float32
            )
        feats = np.concatenate(feats)[: len(indices)]
        if (
            not full_feats
            and self.pca is not None
            and self.pca.initialized
            and self.cfg.model.reduction == "pca"
        ):
            feats = self.pca.whiten(feats)
        feats = feats.astype(np.float32)
        if keep_device:
            return feats, dev_chunks
        return feats

    # ------------------------------------------------------------ mining
    # Thin delegates into MiningManager (train/mining_manager.py). They stay
    # methods on the trainer so tests/subclasses can override any one seam
    # per-instance (e.g. stub _mining_refresh and still exercise the spawn/
    # join machinery); the spawn delegate passes self._mining_refresh so the
    # worker runs exactly the (possibly overridden) instance attribute.
    def _mining_refresh(self, *args, **kwargs) -> None:
        return self.mining.refresh(*args, **kwargs)

    def _spawn_mining_refresh(
        self, epoch: int, step0: int, mining_count: int, meta, anchor_indices
    ) -> None:
        self.mining.spawn(
            self._mining_refresh, epoch, step0, mining_count, meta,
            anchor_indices,
        )

    def _join_mining(self, raise_error: bool = True,
                     cancel: bool = False) -> None:
        self.mining.join(raise_error=raise_error, cancel=cancel)

    @property
    def _mining_thread(self):
        return self.mining._thread

    @property
    def _mining_error(self):
        return self.mining._error

    # ------------------------------------------------------------ eval
    # ------------------------------------------------------------ training
    def train(self) -> None:
        for epoch in range(self.start_epoch, self.cfg.max_epoch):
            self.log(f"**** EPOCH {epoch} ****")
            self.used_images.clear()
            self.train_one_epoch(epoch, resume_ctx=self._resume_ctx)
            self._resume_ctx = None
            self._current_epoch = epoch + 1  # epoch checkpoints resume AFTER it
            self.ckpts.save(
                "epoch", epoch, self.state, self._pca_sd(), self._loss_pca_sd(),
                self._extras(),
            )
        self.metrics_logger.drain()
        self.ckpts.wait()

    def _pca_sd(self):
        return self.pca.state_dict() if self.pca is not None and self.pca.initialized else None

    def _loss_pca_sd(self):
        return (
            self.loss_pca.state_dict()
            if self.loss_pca is not None and self.loss_pca.initialized
            else None
        )

    def _extras(self):
        """Host-side sampler RNG states + position. Each segment draws from a
        child Generator spawned off self.rng on the main thread, so snapshots
        are race-free; inside a segment the PRE-SPAWN state is saved together
        with the segment step and the number of consumed batches, which lets
        resume re-spawn the identical child and fast-forward the sample
        stream to the exact step. Exactness scope: the replayed RNG stream is
        bitwise-identical, so resumed == uninterrupted whenever the
        hard-example picks are unchanged by the cache rebuild — always true
        with hard mining off, and true in practice when embeddings move
        slowly between refreshes. The rebuilt mining cache necessarily uses
        the restored (slightly later) params; if its embedding ORDER differs
        from the original cache's, hard picks (and then the rejection
        sampler's draw count) can diverge from the uninterrupted run. Making
        that case bitwise too would mean checkpointing the cache features
        (~mining_cache_size x descriptor_dim, 131 MB at flagship scale) —
        deliberately not done."""
        ctx = self._seg_ctx
        return {
            "sampler_rng": (
                ctx["pre_spawn"] if ctx is not None
                else numpy_rng_to_array(self.rng)
            ),
            "eval_rng": numpy_rng_to_array(self.eval_rng),
            "epoch": np.asarray(self._current_epoch, np.int32),
            "seg_step0": np.asarray(
                ctx["seg_step0"] if ctx is not None else -1, np.int32
            ),
            "consumed": np.asarray(
                ctx["consumed"] if ctx is not None else 0, np.int32
            ),
            "mining_count": np.asarray(
                ctx["mining_count"] if ctx is not None else 0, np.int32
            ),
        }

    def _ensure_image_pool(self, meta) -> None:
        """Build (once) / remap (per epoch) the device-resident image pool.
        Leaves ``self._pool_rows`` None when unavailable — every consumer
        falls back to the host feed path."""
        cfg = self.cfg
        self._pool_rows = None
        if not cfg.device_image_pool or self._image_pool is False:
            return
        if self._image_pool is None:
            from soft_contrastive_learning_tpu.data.device_pool import build_pool

            with self.timer.span("pool_build"):
                pool = build_pool(
                    self.source, meta, cfg, mesh=self.mesh,
                    max_bytes=cfg.device_pool_max_bytes, log=self.log,
                )
            self._image_pool = pool if pool is not None else False
            if self._image_pool is False:
                return
        rows = self._image_pool.rows_for_meta(meta)
        if rows is None:
            # set contents changed under us (custom source) — rebuild once
            self.log("image pool stale (unknown keys); rebuilding")
            self._image_pool = None
            self._ensure_image_pool(meta)
            return
        self._pool_rows = rows

    def train_one_epoch(self, epoch: int, resume_ctx: Optional[dict] = None) -> None:
        cfg = self.cfg
        self._current_epoch = epoch
        meta = self.source.epoch_meta(cfg.local_ref_set, epoch)
        self._ensure_image_pool(meta)
        anchor_indices = np.asarray(
            self.source.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, epoch),
            dtype=int,
        )

        steps = np.arange(0, len(anchor_indices), cfg.tuples_per_batch)
        mining_count = 0

        # Segment the epoch at mining boundaries; within a segment, host batch
        # assembly runs ahead of the device on a producer thread. Boundaries
        # are the steps divisible by mining_step — exactly the reference's
        # refresh condition (train/train.py:1014) — NOT fixed-length segments,
        # which would drift whenever tuples_per_batch doesn't divide
        # mining_step and silently disable later refreshes. Caveat shared
        # with the reference: steps stride by tuples_per_batch, so when tpb
        # does not divide mining_step/eval_step/save_step, events fire at
        # multiples of lcm(tpb, K) (e.g. tpb=3, mining_step=250 -> every
        # 750). The defaults (2 | 100/250/500) divide; pick cadences that
        # are multiples of tuples_per_batch.
        boundary_mask = steps % cfg.mining_step == 0
        # Mid-epoch resume: fast-forward to the checkpointed segment without
        # spawning children for the skipped segments (self.rng was restored to
        # the pre-spawn state OF the target segment).
        resume_step0 = int(resume_ctx["seg_step0"]) if resume_ctx else -1
        skip_items = int(resume_ctx["consumed"]) if resume_ctx else 0
        suppress_side_effects_once = resume_ctx is not None
        seg_start = 0
        if resume_ctx is not None and resume_step0 >= 0:
            mining_count = int(resume_ctx["mining_count"])
            # the segment containing resume_step0 starts at the last boundary
            # at or before it
            starts = np.flatnonzero(boundary_mask & (steps <= resume_step0))
            seg_start = int(starts[-1]) if len(starts) else 0
            self.log(
                f"Resuming epoch {epoch} at segment step {int(steps[seg_start])}, "
                f"skipping {skip_items} consumed batches"
            )
        while seg_start < len(steps):
            step0 = int(steps[seg_start])
            spawn_args = None  # deferred async-refresh spawn (see boundary)
            if boundary_mask[seg_start]:
                # At most one refresh in flight: land the previous segment's
                # async refresh (long done in steady state) and surface its
                # errors before starting this one.
                self._join_mining()
                # On mid-segment resume, the restored streaming-PCA state
                # was saved AFTER this boundary's update — rebuild the
                # cache but don't re-apply the PCA update.
                is_resume_segment = (
                    resume_ctx is not None and step0 <= resume_step0
                )
                can_async = (
                    cfg.async_mining
                    # the first refresh of an epoch defines the cache window
                    # for THIS epoch's meta (indices into a reshuffled set);
                    # training on the previous epoch's window would map
                    # indices to the wrong images — run it synchronously
                    and mining_count > 0
                    and not is_resume_segment
                    # streaming-PCA update order is part of the training
                    # semantics (reduction=pca / incremental losses): those
                    # paths keep the reference's barrier. (mining_count > 0
                    # plus the _join_mining above implies the cache is
                    # populated: a sync refresh completed, or an async one
                    # was just joined — the join is load-bearing for this
                    # gate; don't move it without re-deriving the invariant.)
                    and self.pca is None
                    and self.loss_pca is None
                    # Multi-host: collective programs must be enqueued in the
                    # SAME order on every process; a worker thread racing the
                    # main loop's dispatches makes that order scheduler-
                    # dependent (deadlock hazard), so async requires a
                    # single-process run.
                    and jax.process_count() == 1
                )
                if can_async:
                    self.log(
                        "Caching features for hard negative mining "
                        "(async; training continues on the previous cache)."
                    )
                    # Spawn DEFERRED to just before the dispatch loop: an
                    # exception during segment setup (sampler KDTree build,
                    # producer-thread spawn) would otherwise leak a live
                    # worker with no join in its unwind path.
                    spawn_args = (epoch, step0, mining_count, meta,
                                  anchor_indices)
                else:
                    with self.timer.span("mining_refresh"):
                        self.log("Caching features for hard negative mining.")
                        self._mining_refresh(
                            epoch, step0, mining_count, meta, anchor_indices,
                            update_pca=not is_resume_segment,
                        )
                mining_count += 1
            later = np.flatnonzero(boundary_mask[seg_start + 1 :])
            seg_end = seg_start + 1 + (int(later[0]) if len(later) else len(steps))
            seg_steps = steps[seg_start:seg_end]
            # The producer thread owns a child Generator derived here (on the
            # main thread) by DRAWING a seed — not Generator.spawn, whose
            # SeedSequence child counter is not part of bit_generator.state
            # and therefore would not survive checkpoint restore. A restored
            # pre-draw state re-derives the identical child on resume.
            pre_spawn = numpy_rng_to_array(self.rng)
            seg_seed = int(self.rng.integers(np.iinfo(np.int64).max))
            seg_rng = np.random.default_rng(seg_seed)
            sampler = self._sampler_for(meta, rng=seg_rng)
            self._seg_ctx = {
                "pre_spawn": pre_spawn,
                "seg_step0": step0,
                "consumed": 0,
                "mining_count": mining_count - 1 if boundary_mask[seg_start] else mining_count,
            }

            def sample_for(i: int, _steps=seg_steps, sampler=sampler):
                s = int(_steps[i])
                anchors = anchor_indices[s : s + cfg.tuples_per_batch]
                if len(anchors) < cfg.tuples_per_batch:
                    anchors = pad_to_multiple(anchors, cfg.tuples_per_batch)
                return sampler.sample(anchors, use_hard=True, cache=self.mining_cache)

            updater = None
            if cfg.async_pca and (self.pca is not None or self.loss_pca is not None):
                updater = AsyncPCAUpdater(self.pca, self.loss_pca)
            self._updater = updater

            offset = 0
            if skip_items > 0:
                # replay the sampler draws of already-trained batches (no
                # image IO) so the child rng advances identically
                for i in range(min(skip_items, len(seg_steps))):
                    sample_for(i)
                offset = min(skip_items, len(seg_steps))
                self._seg_ctx["consumed"] = offset
                skip_items = 0

            pool_rows = self._pool_rows

            def build(i: int, _offset=offset, _sample_for=sample_for,
                      _pool_rows=pool_rows):
                with self.timer.span("host_build"):
                    sample = _sample_for(i + _offset)
                    if sample is None:
                        return None
                    if _pool_rows is not None:
                        # device-pool path: batch is indices + payload only
                        batch = {
                            "image_idx": _pool_rows[
                                sample.indices.reshape(-1)
                            ].astype(np.int32),
                            "epoch": np.float32(epoch),
                        }
                        batch.update(sample.payload)
                    else:
                        batch = assemble_batch(
                            cfg, self.source, meta, sample.indices,
                            sample.payload, epoch, self._pool,
                        )
                return batch, sample.used_indices

            suppress_side_effects_once = run_segment(
                self, epoch=epoch, seg_steps=seg_steps, offset=offset,
                build=build, updater=updater, pool_rows=pool_rows,
                spawn_args=spawn_args,
                suppress_first=suppress_side_effects_once,
            )
            seg_start = seg_end
        # Settle any refresh still in flight from the last segment before
        # epoch-end eval/checkpointing — cancelled rather than waited out,
        # since the next epoch's first boundary rebuilds the cache
        # synchronously on the reshuffled meta regardless; real worker
        # errors still surface.
        self._join_mining(cancel=True)
        self._seg_ctx = None

    def _span_total(self, *names) -> float:
        s = self.timer.summary()
        return sum(s.get(n, {}).get("total_s", 0.0) for n in names)

    def _write_train_metrics(self, step: int, vals: Dict[str, float]) -> None:
        """AsyncScalarLogger sink (worker thread): per-step loss prints +
        JSONL scalars, same records as the previous synchronous path."""
        if "loss_pos" in vals:
            self.log(
                f"Train batch loss pos: {vals['loss_pos']} "
                f"neg: {vals['loss_neg']}"
            )
        else:
            self.log(f"Train batch loss: {vals['loss']}")
        self.writers["local"].scalars(
            {"loss": vals["loss"], "learning_rate": vals["learning_rate"]}, step
        )

    def _run_eval(self, epoch: int, eval_ordinal: int) -> None:
        """``eval_ordinal`` indexes the rolling eval-query windows. It counts
        eval FIRINGS (abs_step // eval_step): the reference divides its
        batch-count GLOBAL_STEP by EVAL_STEP while triggering on the
        anchor-count step (train/train.py:1070,1124) — mixed units that
        replay each query window tuples_per_batch times; fixed like the
        other latent reference bugs (PARITY.md). Fires only on the in-loop
        eval_step cadence — like the reference, there is no epoch-end eval
        (train/train.py:1108-1110 just drains the queues)."""
        self.log("EVALUATING")
        # flush per-step logging first: keeps the JSONL stream ordered ahead
        # of the eval scalars and surfaces any pending worker error here
        self.metrics_logger.drain()
        if self._updater is not None:
            # Checkpoint/eval reads of the live PCA objects need every
            # submitted update applied (this also floors subsequent feeds,
            # keeping resumed and uninterrupted feed sequences identical).
            self._updater.drain()
        gs = self.global_step
        with self.timer.span("ckpt_save"):
            self.ckpts.save(
                "rolling", gs, self.state, self._pca_sd(), self._loss_pca_sd(),
                self._extras(),
            )
        with self.timer.span("eval_loss"):
            self.evals.loss_other(epoch, gs, eval_ordinal)
        with self.timer.span("eval_localization"):
            self.evals.localization(
                epoch, gs, self.cfg.other_ref_set, self.cfg.other_query_set,
                "other", eval_ordinal,
            )
            self.evals.localization(
                epoch, gs, self.cfg.local_ref_set, self.cfg.local_query_set,
                "local", eval_ordinal,
            )

    # ------------------------------------------------------------ resume
    def _pca_template(self, pca: Optional[StreamingPCA], dim: int):
        """Restore template for a StreamingPCA state: the live state when
        initialized, otherwise zero arrays of the right shapes."""
        if pca is None:
            return None
        if pca.initialized:
            return pca.state_dict()
        k = pca.out_dim
        return {
            "s": np.zeros(k, np.float32),
            "v": np.zeros((k, dim), np.float32),
            "m": np.zeros(dim, np.float32),
            "seen": 0.0,
            "true_seen": 0.0,
            "var": np.zeros(k, np.float32),
            "out_dim": k,
            "forgetting": pca.forgetting,
        }

    def resume_latest(self, role: str = "rolling") -> bool:
        step = self.ckpts.latest(role)
        if step is None:
            return False
        pca_t = self._pca_template(self.pca, self.cfg.model.descriptor_dim)
        loss_pca_t = self._pca_template(self.loss_pca, self.cfg.model.output_dim)
        # Checkpoints may predate PCA initialization and/or lack the RNG
        # extras; try templates from most to least complete.
        last_err = None
        for pt, lt, et in (
            (pca_t, loss_pca_t, self._extras()),
            (pca_t, loss_pca_t, None),
            (None, None, self._extras()),
            (None, None, None),
        ):
            try:
                self.state, pca_sd, loss_pca_sd, extras = self.ckpts.restore(
                    role, step, self.state, pt, lt, et
                )
                break
            except ValueError as e:
                last_err = e
        else:
            raise last_err
        if self.mesh is not None:
            # Orbax restores arrays COMMITTED to the default device; fresh
            # init leaves them uncommitted, which is why sharded training
            # works from scratch but crashed on resume (mixed device sets
            # in the first post-resume embed/step dispatch). Re-place the
            # whole train state replicated over the mesh, as the jitted
            # step would have laid it out.
            self.state = jax.device_put(
                self.state, replicated_sharding(self.mesh)
            )
        if extras is not None:
            self.rng = numpy_rng_from_array(extras["sampler_rng"])
            self.eval_rng = numpy_rng_from_array(extras["eval_rng"])
            if "epoch" in extras:
                self.start_epoch = int(extras["epoch"])
                self._current_epoch = self.start_epoch
            if int(extras.get("seg_step0", -1)) >= 0:
                self._resume_ctx = {
                    "seg_step0": int(extras["seg_step0"]),
                    "consumed": int(extras["consumed"]),
                    "mining_count": int(extras["mining_count"]),
                }
        if pca_sd is not None:
            self.pca = StreamingPCA.from_state_dict(pca_sd)
        if loss_pca_sd is not None:
            self.loss_pca = StreamingPCA.from_state_dict(loss_pca_sd)
        self.global_step = int(self.state.step)
        self.log(f"Resumed from {role}@{step}")
        return True

    def close(self) -> None:
        self._join_mining(raise_error=False)
        if self._profiling:  # training ended before the trace window closed
            import jax.profiler

            jax.profiler.stop_trace()
            self._profiling = False
        self.ckpts.wait()
        self.ckpts.close()
        try:
            self.metrics_logger.close(drain=False)
        except Exception as e:
            self.log(f"metrics logger error at close: {e}")
        self._pool.shutdown(wait=False)
        self.log.close()
