"""The jitted training/eval/embed steps.

TPU-native replacement for the reference's placeholder-fed TF1 session calls
(reference train/train.py:263-309 train_gpu_thread, :143-161
localization_gpu_thread): pure functions of (state, batch) compiled once,
with the batch sharded over the mesh's data axis (XLA inserts the gradient
all-reduce over ICI).

Batch contract (all host-built numpy, converted by shard_batch):
  images           (B, H, W, 3) float32 RGB in [0, 255]
  epoch            () float32 — drives the LR schedule
  payload[...]     per-loss geometric arrays (losses/registry.py)
  pca_components/pca_mean/pca_variance       when reduction == 'pca'
  loss_pca_{s,v,m,seen}                      when the loss is incremental

PN losses (two-op alternating pos/neg optimization, reference
train/train.py:872-875,285-296) perform two sequential optimizer updates that
share optimizer slots — same semantics as TF's shared-slot twin minimize ops —
and increment the step once.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from soft_contrastive_learning_tpu.core.config import TrainConfig
from soft_contrastive_learning_tpu.losses.incremental import PCAState
from soft_contrastive_learning_tpu.losses.registry import LossFn, split_batch
from soft_contrastive_learning_tpu.models.heads import apply_pca_projection
from soft_contrastive_learning_tpu.models.model import EmbeddingNet
from soft_contrastive_learning_tpu.train.schedule import learning_rate


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32
    rng: jax.Array  # dropout key


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam | SGD-momentum with an injectable learning rate
    (reference train/train.py:867-870)."""
    if cfg.optimizer == "momentum":
        make = lambda learning_rate: optax.sgd(learning_rate, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        make = lambda learning_rate: optax.adam(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return optax.inject_hyperparams(make)(learning_rate=cfg.base_lr)


def init_train_state(
    cfg: TrainConfig, params: Any, rng: Optional[jax.Array] = None
) -> TrainState:
    tx = make_optimizer(cfg)
    if rng is None:
        rng = jax.random.key(cfg.seed)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )


def _forward(
    model: EmbeddingNet,
    cfg: TrainConfig,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(output, full_out); applies the functional PCA projection head."""
    output, full_out = model.apply(
        {"params": params}, batch["images"], train=train, rngs=rngs
    )
    if cfg.model.reduction == "pca":
        output = apply_pca_projection(
            full_out,
            batch["pca_components"],
            batch["pca_mean"],
            batch["pca_variance"],
        )
    return output, full_out


def _loss_from_output(
    cfg: TrainConfig,
    loss_fn: LossFn,
    output: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
):
    tb = split_batch(output, cfg.tuples_per_batch, cfg.tuple_shape)
    state = None
    if cfg.loss.incremental:
        state = PCAState(
            s=batch["loss_pca_s"],
            v=batch["loss_pca_v"],
            m=batch["loss_pca_m"],
            seen=batch["loss_pca_seen"],
        )
    payload = {
        k: batch[k]
        for k in (
            "sq_pos_geo_dists",
            "sq_neg_geo_dists",
            "pairwise_sq_geo_dists",
            "pos_weights",
            "neg_weights",
            "geo_dist_matrix",
        )
        if k in batch
    }
    return loss_fn(tb, payload, state)


def build_train_step(
    cfg: TrainConfig, model: EmbeddingNet, loss_fn: LossFn,
    image_pool: bool = False,
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Compile the full training step. Returned metrics dict contains
    'loss' (+ 'loss_pos'/'loss_neg' for PN losses), 'learning_rate', and
    'pca_in' / 'loss_pca_in' feature dumps for the host streaming-PCA updates
    (empty (0,) arrays when inactive, keeping the output structure static).

    ``image_pool=True`` compiles the device-resident-pool variant with
    signature ``(state, batch, pool)``: the batch carries ``image_idx``
    (B,) int32 instead of ``images`` and the step gathers its images from
    the HBM-resident uint8 pool (data/device_pool.py) — per-step host->
    device traffic collapses to the indices + payload scalars."""
    step_fn = _make_step_fn(cfg, model, loss_fn, image_pool)
    if image_pool:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(lambda s, b: step_fn(s, b), donate_argnums=(0,))


def _make_step_fn(
    cfg: TrainConfig, model: EmbeddingNet, loss_fn: LossFn, image_pool: bool
):
    tx = make_optimizer(cfg)
    pn = cfg.loss.pn_loss

    def select_total(res):
        return res.total

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                pool: Optional[jnp.ndarray] = None):
        if image_pool:
            batch = dict(batch)
            batch["images"] = jnp.take(pool, batch["image_idx"], axis=0)
        lr = learning_rate(cfg, batch["epoch"])
        rng, dropout_rng = jax.random.split(state.rng)
        rngs = {"dropout": dropout_rng}

        def compute(params, which: str):
            def inner(p):
                output, full_out = _forward(model, cfg, p, batch, True, rngs)
                res = _loss_from_output(cfg, loss_fn, output, batch)
                value = {"total": res.total, "pos": res.pos, "neg": res.neg}[which]
                return value, (res, full_out)

            return jax.value_and_grad(inner, has_aux=True)(params)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr

        if pn:
            (loss_pos, _), grads = compute(state.params, "pos")
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            (loss_neg, (res, full_out)), grads = compute(params, "neg")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "loss": loss_pos + loss_neg,
                "loss_pos": loss_pos,
                "loss_neg": loss_neg,
                "learning_rate": lr,
            }
        else:
            (loss, (res, full_out)), grads = compute(state.params, "total")
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, "learning_rate": lr}

        if cfg.model.reduction == "pca":
            metrics["pca_in"] = full_out
        if cfg.loss.incremental and res.pca_in is not None:
            metrics["loss_pca_in"] = res.pca_in

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, metrics

    return step_fn


def build_train_step_scan(
    cfg: TrainConfig, model: EmbeddingNet, loss_fn: LossFn,
    image_pool: bool = True,
):
    """K-step fused dispatch: ``(state, batches, pool?) -> (state, metrics)``
    where every batch leaf is stacked to ``(K, ...)`` and the K train steps
    run as one ``lax.scan`` inside one jit call; metrics come back stacked.

    Why: on a relay-attached chip every host->device transfer pays a ~30 ms
    per-CALL floor and every dispatch a few ms (perf probe, round 3) — at
    K=1 those floors cost 2-3x the 40 ms device step. Fusing K steps
    amortizes floor + dispatch K-fold while the device pipeline executes
    group N as the host assembles group N+1. The scan body is the same
    step_fn: K fused steps match K sequential singles (losses bitwise;
    params to float-reassociation tolerance — XLA schedules the optimizer
    update slightly differently under scan; tests/test_device_pool.py).

    Not available for configs that feed host state back per step
    (incremental losses / pca reduction) — the trainer gates on that.

    CPU-backend caveat (measured, round 3): XLA:CPU compiles AND executes
    the scanned conv train step orders of magnitude slower than K
    sequential singles once the model passes toy size — at 64x80/vlad-8 on
    a 1-core host the scan costs ~10 min to compile and ~2 min per
    3-step call (vs seconds for singles); at 32x32/vlad-4 it is fine. This
    is a backend pathology, not a correctness issue (results match
    bitwise); keep K=1 for CPU runs/tests above toy shapes. On the real
    TPU the fused path is the measured default-capable winner
    (docs/TRAINBENCH.md: K=16 at full flagship shape, 51 ms/step).
    """
    assert not cfg.loss.incremental and cfg.model.reduction != "pca", (
        "fused multi-step dispatch requires a loop with no per-step host "
        "state feedback (incremental losses / pca reduction excluded)"
    )
    step_fn = _make_step_fn(cfg, model, loss_fn, image_pool)

    if image_pool:

        def scan_fn(state, batches, pool):
            def body(s, b):
                s2, m = step_fn(s, b, pool)
                return s2, m

            return jax.lax.scan(body, state, batches)

        return jax.jit(scan_fn, donate_argnums=(0,))

    def scan_fn_host(state, batches):
        def body(s, b):
            s2, m = step_fn(s, b)
            return s2, m

        return jax.lax.scan(body, state, batches)

    return jax.jit(scan_fn_host, donate_argnums=(0,))


def build_eval_loss_step(cfg: TrainConfig, model: EmbeddingNet, loss_fn: LossFn):
    """Held-out loss evaluation (reference get_eval_loss consumer threads,
    train/train.py:193-223): forward in eval mode, no update."""

    def step_fn(params, batch):
        output, _ = _forward(model, cfg, params, batch, train=False)
        res = _loss_from_output(cfg, loss_fn, output, batch)
        if cfg.loss.pn_loss:
            return {"loss": res.total, "loss_pos": res.pos, "loss_neg": res.neg}
        return {"loss": res.total}

    return jax.jit(step_fn)


def build_embed_step(cfg: TrainConfig, model: EmbeddingNet):
    """Batch descriptor extraction (reference localization_gpu_thread,
    train/train.py:143-161): returns (output_without_pca, full_out); the host
    applies streaming-PCA whitening itself when configured (mirrors the
    reference's FULL_FEATS switching)."""

    @jax.jit
    def embed(params, images):
        output, full_out = model.apply({"params": params}, images, train=False)
        return output, full_out

    return embed


def build_embed_pool_step(cfg: TrainConfig, model: EmbeddingNet):
    """build_embed_step over the device-resident image pool: the host sends
    only (B,) indices; the gather runs in HBM."""

    @jax.jit
    def embed(params, idx, pool):
        images = jnp.take(pool, idx, axis=0)
        output, full_out = model.apply({"params": params}, images, train=False)
        return output, full_out

    return embed
