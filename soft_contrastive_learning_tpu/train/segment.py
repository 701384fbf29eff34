"""The per-segment dispatch loop: prefetched host assembly feeding the
jitted train step (singly or K-step fused), with in-loop eval/save events
and steady-state throughput accounting.

A "segment" is the span between two mining boundaries
(reference train/train.py:1012-1068 refresh condition; the loop body it
feeds is :1070-1105). Extracted from the trainer in round 4 (VERDICT #6):
the dispatch machinery — grouping, profiling hooks, metric submission,
steady-window timing — is one concern, and the trainer keeps epoch/
boundary orchestration.

``run_segment`` reads its host trainer's live attributes at call time
(``state``, ``global_step``, ``timer``, ``metrics_logger``, ``ckpts``,
``mining_cache`` via the sampler, the jitted step executables, profiling
flags) and mutates ``t.state`` / ``t.global_step`` / ``t._seg_ctx`` /
``t.used_images`` exactly as the inline loop did.
"""

from __future__ import annotations

import os
import time

import numpy as np

from soft_contrastive_learning_tpu.data.pipeline import Prefetcher
from soft_contrastive_learning_tpu.parallel.mesh import (
    shard_batch,
    shard_batch_stacked,
)

# StepTimer spans subtracted from steady-state throughput windows (in-segment
# eval/save events). bench_train.py keys its with_mining metric off the same
# tuple — keep them from drifting by sharing this constant (re-exported by
# train.trainer for compatibility).
EVAL_SAVE_SPANS = ("eval_loss", "eval_localization", "ckpt_save")


def run_segment(
    t, *, epoch: int, seg_steps, offset: int, build, updater,
    pool_rows, spawn_args, suppress_first: bool,
) -> bool:
    """Run one segment's dispatch loop on host trainer ``t``.

    ``build(i)`` assembles the host batch for segment item ``i`` (a trainer
    closure — batch assembly is the trainer's concern, and tests patch its
    assemble_batch seam on the trainer module); ``updater`` is the
    segment's AsyncPCAUpdater or None; ``pool_rows`` the device-pool row
    map or None; ``spawn_args`` a deferred async-mining spawn tuple or
    None; ``suppress_first`` suppresses the first item's eval/save side
    effects (mid-segment resume re-trains that item). Returns the updated
    suppress flag (False once an item was processed).
    """
    cfg = t.cfg
    consumed = 0
    n_items = len(seg_steps) - offset
    prefetcher = Prefetcher(build, n_items)
    K = max(int(cfg.steps_per_dispatch), 1)
    fused_ok = K > 1 and t.train_step_scan is not None

    def maybe_profile_start():
        if t._profile_steps > 0 and not t._profiling:
            import jax.profiler

            jax.profiler.start_trace(os.path.join(t.out_dir, "profile"))
            t._profiling = True

    def maybe_profile_stop():
        if t._profiling and t.global_step >= t._profile_steps:
            import jax.profiler

            jax.profiler.stop_trace()
            t._profiling = False
            t._profile_steps = 0

    def submit_scalars(metrics, i=None):
        pick = (lambda v: v if i is None else v[i])
        scalars = {
            "loss": pick(metrics["loss"]),
            "learning_rate": pick(metrics["learning_rate"]),
        }
        if cfg.loss.pn_loss:
            scalars["loss_pos"] = pick(metrics["loss_pos"])
            scalars["loss_neg"] = pick(metrics["loss_neg"])
        t.metrics_logger.submit(t.global_step, scalars)

    def process_single(item):
        batch, used = item
        maybe_profile_start()
        # dispatch_put (H2D of the host batch) vs train_step (the async
        # executable launch) are split so a relay-side transfer stall is
        # attributable — both are host-blocking time only, never device time.
        with t.timer.span("dispatch_put"):
            snaps = updater.feed_states() if updater is not None else None
            device_batch = shard_batch(
                t._augment_batch(batch, snaps), t.mesh
            )
        with t.timer.span("train_step"):
            if pool_rows is not None:
                t.state, metrics = t.train_step_pooled(
                    t.state, device_batch, t._image_pool.array
                )
            else:
                t.state, metrics = t.train_step(
                    t.state, device_batch
                )
        t.used_images.update(used)
        # Host-side step counter: state.step increments by exactly 1
        # per train_step, so counting here avoids a device fetch (a
        # full relay RTT) in the hot loop; resume re-seeds it from
        # the restored state.step (resume_latest).
        t.global_step += 1
        with t.timer.span("submit"):
            submit_scalars(metrics)
        with t.timer.span("pca_update"):
            has_in = ("pca_in" in metrics) or ("loss_pca_in" in metrics)
            if updater is not None and has_in:
                # async: the worker fetches + applies while the
                # device runs the next step (deterministic lag-2)
                updater.submit(
                    metrics.get("pca_in"), metrics.get("loss_pca_in")
                )
            elif updater is None:
                if t.pca is not None and "pca_in" in metrics:
                    t.pca.update(np.asarray(metrics["pca_in"]))
                if t.loss_pca is not None and "loss_pca_in" in metrics:
                    t.loss_pca.update(np.asarray(metrics["loss_pca_in"]))
        maybe_profile_stop()

    def process_group(items):
        # K-step fused dispatch (train/step.py::build_train_step_scan):
        # leaves stacked to (K, ...), one transfer set + one scan call.
        maybe_profile_start()
        # host assembly OUTSIDE the train_step span: the K-batch
        # np.stack is host memcpy and belongs with host_build, not
        # device step time (process_single only device_puts inside
        # its span — keep the two attributions comparable)
        with t.timer.span("host_build"):
            stacked = {
                k: np.stack([b[k] for b, _ in items])
                for k in items[0][0]
            }
        with t.timer.span("dispatch_put"):
            device_batch = shard_batch_stacked(stacked, t.mesh)
        with t.timer.span("train_step"):
            if pool_rows is not None:
                t.state, ms = t.train_step_scan_pooled(
                    t.state, device_batch, t._image_pool.array
                )
            else:
                t.state, ms = t.train_step_scan(
                    t.state, device_batch
                )
        for _, used in items:
            t.used_images.update(used)
        with t.timer.span("submit"):
            for i in range(len(items)):
                t.global_step += 1
                submit_scalars(ms, i)
        maybe_profile_stop()

    def boundary(j: int) -> bool:
        """Does item j host an eval/save event (processed singly)?"""
        s = int(seg_steps[j])
        return s % cfg.eval_step == 0 or s % cfg.save_step == 0

    it = iter(prefetcher)
    _NO_ITEM = object()
    pending = _NO_ITEM
    # Steady-state segment window: sync the device queue here, time
    # through to the post-loop drain + sync, and subtract in-segment
    # eval/save span time. Because dispatch is fully async, per-call
    # spans can't see the device time — only sync-to-sync windows
    # measure true sustained throughput ('segment_steady' span,
    # consumed by bench_train).
    np.asarray(t.state.step)  # sync point (one fetch)
    seg_t0 = time.perf_counter()
    seg_excl0 = t._span_total(*EVAL_SAVE_SPANS)
    # Deferred from the boundary: segment setup is done, and the
    # refresh's device work lands inside the timed window (the
    # overlap is the thing being measured). From here every exit
    # path joins the worker (except hook / epoch-end join).
    if spawn_args is not None:
        t._spawn_mining_refresh(*spawn_args)
    try:
        while True:
            if pending is _NO_ITEM:
                try:
                    with t.timer.span("data_wait"):
                        pending = next(it)
                except StopIteration:
                    break
            abs_step = int(seg_steps[offset + consumed])
            # items fully processed so far (the current one re-trains
            # on resume; its eval/save are suppressed by resume)
            t._seg_ctx["consumed"] = offset + consumed
            side_effects = not suppress_first
            suppress_first = False
            if side_effects and abs_step % cfg.eval_step == 0:
                t._run_eval(epoch, abs_step // max(cfg.eval_step, 1))
            if side_effects and abs_step % cfg.save_step == 0:
                with t.timer.span("ckpt_save"):
                    if updater is not None:
                        updater.drain()
                    t.ckpts.save(
                        "part", t.global_step, t.state,
                        t._pca_sd(), t._loss_pca_sd(),
                        t._extras(),
                    )
            item, pending = pending, _NO_ITEM
            if item is None:
                t.log("Faulty training batch... skipping.")
                consumed += 1
                t._seg_ctx["consumed"] = offset + consumed
                continue
            # Form a full K-group only when K boundary-free items
            # remain (shorter groups would each compile a new scan
            # length; stragglers run on the single-step executable).
            group = [item]
            if fused_ok:
                j0 = offset + consumed
                room = all(
                    j0 + i < len(seg_steps) and not boundary(j0 + i)
                    for i in range(1, K)
                )
                while room and len(group) < K:
                    try:
                        with t.timer.span("data_wait"):
                            nxt = next(it)
                    except StopIteration:
                        break
                    if nxt is None:
                        pending = None  # faulty: handle after group
                        break
                    group.append(nxt)
            if len(group) == K and fused_ok:
                process_group(group)
                consumed += K
            else:
                for g in group:
                    process_single(g)
                    consumed += 1
            t._seg_ctx["consumed"] = offset + consumed
    except BaseException:
        # Early exit: unblock the producer thread (it would otherwise
        # stay parked on the bounded queue holding decoded batches),
        # and don't let updater.close() (which drains and re-raises
        # queued worker errors) mask the original exception.
        prefetcher.close()
        if updater is not None:
            try:
                updater.close()
            except Exception as drain_err:
                t.log(f"PCA worker error during unwind: {drain_err}")
        t._updater = None
        t._join_mining(raise_error=False)
        raise
    else:
        prefetcher.close()
        if updater is not None:
            updater.close()
        t._updater = None
        t.metrics_logger.drain()
        np.asarray(t.state.step)  # absorb the device tail
        excl = t._span_total(*EVAL_SAVE_SPANS) - seg_excl0
        t.timer.add(
            "segment_steady",
            time.perf_counter() - seg_t0 - excl,
            count=consumed,
        )
    return suppress_first
