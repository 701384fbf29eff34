"""In-training evaluation: held-out loss, localization, triptych plots.

The reference runs these inline in its epoch loop plus a plotting thread
(reference train/train.py:1070-1092 QC loop, :1112-1193 eval bodies,
:399-420 triptych thread). Extracted from the trainer in round 4
(VERDICT #6) so the orchestrator stays orchestration.

``EvalHooks`` reads a narrow surface of its host trainer at call time:
``cfg``, ``source``, ``state``, ``mesh``, ``pca``, ``eval_rng``,
``extract_features``, ``eval_loss_step``, ``_sampler_for``,
``_augment_batch``, ``_pool`` (decode thread pool), ``writers``, ``log``,
``save_plots``, ``out_dir``.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from soft_contrastive_learning_tpu.data.pipeline import assemble_batch
from soft_contrastive_learning_tpu.evaluation.metrics import (
    localization_summary,
    save_curve_plot,
)
from soft_contrastive_learning_tpu.ops.topk import topk_l2
from soft_contrastive_learning_tpu.parallel.mesh import shard_batch
from soft_contrastive_learning_tpu.utils.meta import get_xy


class EvalHooks:
    def __init__(self, trainer):
        self.t = trainer

    def loss_other(
        self, epoch: int, global_step: int, eval_ordinal: int
    ) -> None:
        """Held-out-region training loss (reference get_eval_loss,
        train/train.py:1112-1149). ``eval_ordinal`` counts eval FIRINGS
        (abs_step // eval_step, see Trainer._run_eval) — global_step counts
        batches, so deriving a window from it here would replay the same
        queries tuples_per_batch times."""
        t = self.t
        cfg = t.cfg
        meta = t.source.epoch_meta(cfg.other_ref_set, epoch)
        sampler = t._sampler_for(meta, rng=t.eval_rng)
        n = len(meta["t"])
        test_number = eval_ordinal
        per_eval = (cfg.num_eval_queries // cfg.tuples_per_batch) * cfg.tuples_per_batch
        idx = np.arange(test_number * per_eval, (test_number + 1) * per_eval) % n
        outs = []
        for chunk in idx.reshape(-1, cfg.tuples_per_batch):
            sample = sampler.sample(chunk, use_hard=False)
            if sample is None:
                continue
            batch = assemble_batch(cfg, t.source, meta, sample.indices,
                                   sample.payload, epoch, t._pool)
            batch = shard_batch(t._augment_batch(batch), t.mesh)
            outs.append(t.eval_loss_step(t.state.params, batch))
        # One batched transfer after all chunks are dispatched: a float()
        # inside the loop would pay a full transport RTT per chunk — and
        # per-key float() here would still pay one RTT per scalar
        # (docs/TRAINBENCH.md).
        losses = [
            {k: float(v) for k, v in out.items()}
            for out in jax.device_get(outs)
        ]
        if losses:
            mean = {k: float(np.mean([d[k] for d in losses])) for k in losses[0]}
            t.writers["other"].scalars(mean, global_step)
            t.log(f"Other region loss: {mean}")
        else:
            t.log("Evaluated but got no valid losses.")

    def localization(
        self, epoch: int, global_step: int, ref_set: str, query_set: str,
        mode: str, eval_ordinal: int,
    ) -> Dict[str, float]:
        """In-training localization eval (reference evaluate_localization,
        train/train.py:1156-1193) with on-device brute-force top-k.
        ``eval_ordinal`` counts eval FIRINGS (abs_step // eval_step,
        see Trainer._run_eval)."""
        t = self.t
        cfg = t.cfg
        ref_meta = t.source.cluster_meta(ref_set, cfg.eval_ref_r)
        n_ref = len(ref_meta["t"])
        ref_xy = get_xy(ref_meta)

        query_meta = t.source.epoch_meta(query_set, epoch)
        test_number = eval_ordinal
        q_idx = np.arange(
            test_number * cfg.num_eval_queries,
            (test_number + 1) * cfg.num_eval_queries,
        ) % len(query_meta["t"])
        query_xy = get_xy(query_meta)[q_idx]

        # Latent retrieval runs entirely on device; without a host-side
        # whitening step the feature matrices never cross to the host at
        # all — only the (Q, k) int32 neighbor indices do (topk_l2 computes
        # the same distances either way; this just skips the D2H+H2D
        # roundtrip of ref/query features, which dominates eval cost
        # through the relay — same reasoning as the order-only mining
        # refresh, docs/TRAINBENCH.md).
        if t.pca is None:
            ref_features = t.extract_features(
                ref_meta, np.arange(n_ref), device_only=True
            )
            query_features = t.extract_features(
                query_meta, q_idx, device_only=True
            )
        else:
            ref_features = t.extract_features(ref_meta, np.arange(n_ref))
            query_features = t.extract_features(query_meta, q_idx)

        k = min(5, n_ref)
        _, latent_idx = topk_l2(query_features, ref_features, k)
        latent_idx = np.asarray(latent_idx)
        # Geographic nearest ref on host in float64: raw UTM coordinates
        # (~1e6 m) destroy fp32 precision in the q^2-2qr+r^2 device expansion
        # (the reference used an exact float64 KDTree here, train/train.py:1184).
        geo_d = np.linalg.norm(
            query_xy[:, None, :] - ref_xy[None, :, :], axis=-1
        )  # (Q, R) float64
        opt_idx = np.argmin(geo_d, axis=1)[:, None]
        opt_dists = geo_d[np.arange(len(query_xy)), opt_idx[:, 0]]

        scalars, curves = localization_summary(query_xy, ref_xy, latent_idx, opt_dists)
        t.writers[mode].scalars(scalars, global_step)
        t.log(f"[{mode}] localization @{global_step}: {scalars}")
        if t.save_plots:
            for rad, bundle in curves.items():
                save_curve_plot(
                    bundle, rad, f"{mode} epoch {epoch}",
                    os.path.join(t.out_dir, f"{mode}_{epoch:02d}_{global_step}_{rad}.pdf"),
                )
            self.save_triptychs(
                mode, epoch, global_step, query_meta, q_idx, ref_meta,
                latent_idx, opt_idx, query_xy, ref_xy,
            )
        return scalars

    def save_triptychs(
        self, mode, epoch, global_step, query_meta, q_idx, ref_meta,
        latent_idx, opt_idx, query_xy, ref_xy, num_examples: int = 10,
    ) -> None:
        """Query / retrieved / optimal image triptychs
        (reference evaluate_localization_thread, train/train.py:399-420)."""
        from soft_contrastive_learning_tpu.utils.cv import merge_images, put_text
        from soft_contrastive_learning_tpu.utils.io import save_img

        t = self.t
        out_dir = os.path.join(
            t.out_dir, f"{mode}_{epoch:02d}_{global_step}_examples"
        )
        os.makedirs(out_dir, exist_ok=True)
        picks = t.eval_rng.choice(
            len(q_idx), size=min(num_examples, len(q_idx)), replace=False
        )
        for i in picks:
            qi = int(q_idx[i])
            q_key = (query_meta["date"][qi], query_meta["folder"][qi], query_meta["t"][qi])
            ri = int(latent_idx[i, 0])
            r_key = (ref_meta["date"][ri], ref_meta["folder"][ri], ref_meta["t"][ri])
            oi = int(opt_idx[i, 0])
            o_key = (ref_meta["date"][oi], ref_meta["folder"][oi], ref_meta["t"][oi])
            try:
                q_img = put_text("Query", t.source.load_image(q_key).copy())
                d_r = float(np.linalg.norm(query_xy[i] - ref_xy[ri]))
                r_img = put_text(f"Retrieved {d_r:.1f}", t.source.load_image(r_key).copy())
                d_o = float(np.linalg.norm(query_xy[i] - ref_xy[oi]))
                o_img = put_text(f"Optimal {d_o:.1f}", t.source.load_image(o_key).copy())
                merged = merge_images(merge_images(q_img, r_img), o_img)
                save_img(merged, os.path.join(out_dir, f"{q_key[2]}.png"))
            except Exception as e:  # missing image file: skip the example
                t.log(f"triptych skipped: {e}")
