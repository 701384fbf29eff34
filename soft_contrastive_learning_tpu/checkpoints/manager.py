"""Orbax checkpointing of the full training state.

Capability superset of the reference's three TF1 Savers
(reference train/train.py:935-937: rolling ``saver`` max_to_keep=1, unbounded
``epoch_saver`` and ``part_saver``): three orbax managers under one run dir.
Unlike the reference — which never restores optimizer state, step, or the
streaming-PCA state (SURVEY.md §5 checkpoint/resume) — the saved payload here
is {params, opt_state, step, rng, streaming-PCA states}, so training resumes
exactly.

``warm_start_params`` is the partial-restore equivalent of the reference's
``restore_weights`` (train/train.py:882-905): only the backbone+NetVLAD
subtrees are taken from the donor checkpoint; heads start fresh.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

# Parameter subtrees covered by the reference's 'vgg16_netvlad_pca' scope.
WARM_START_SCOPES = ("vgg16", "netvlad")

_RNG_BYTES = 512  # fixed-size buffer for serialized numpy Generator states


def numpy_rng_to_array(gen: np.random.Generator) -> np.ndarray:
    """Serialize a numpy Generator's bit-generator state to a fixed-size
    uint8 array (orbax payloads need stable shapes)."""
    raw = json.dumps(gen.bit_generator.state).encode()
    assert len(raw) < _RNG_BYTES, "rng state unexpectedly large"
    buf = np.zeros(_RNG_BYTES, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    return buf


def numpy_rng_from_array(buf: np.ndarray) -> np.random.Generator:
    raw = bytes(np.asarray(buf, np.uint8)).rstrip(b"\x00")
    state = json.loads(raw.decode())
    gen = np.random.default_rng()
    gen.bit_generator.state = state
    return gen


class RunCheckpoints:
    ROLES = ("rolling", "epoch", "part")

    def __init__(self, out_dir: str, max_to_keep: int = 1, enabled: bool = True):
        """``enabled=False`` (non-primary processes in a multi-host run) makes
        ``save``/``wait`` no-ops; ``restore``/``latest`` still work — every
        process re-reads the shared checkpoint on resume, only the elected
        primary writes it (state is replicated in this framework: only the
        batch axis is sharded, so a primary-only write is complete)."""
        self.out_dir = out_dir
        self.enabled = enabled
        self._max_to_keep = max_to_keep
        self._mgrs: Dict[str, ocp.CheckpointManager] = {}

    def _role_root(self, role: str) -> str:
        return os.path.abspath(os.path.join(self.out_dir, "checkpoints", role))

    def _mgr(self, role: str) -> ocp.CheckpointManager:
        if role not in self._mgrs:
            keep = self._max_to_keep if role == "rolling" else None  # None = unbounded
            # Read-only instances (enabled=False) must not mutate the run dir
            # (e.g. `scl-tpu serve --checkpoint <run_dir>` on a snapshot).
            opts = dict(max_to_keep=keep, create=self.enabled)
            root = self._role_root(role)
            if jax.process_count() > 1:
                # orbax cannot create=True under active_processes; the shared
                # filesystem root is made here instead.
                os.makedirs(root, exist_ok=True)
                opts["create"] = False
                # Scope orbax's barriers to this process alone: saves happen
                # on the primary only and restores are independent reads, so
                # no cross-process sync is needed (and syncing would deadlock
                # the primary-only save).
                opts["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                    primary_host=jax.process_index(),
                    active_processes={jax.process_index()},
                    barrier_sync_key_prefix=f"scl_p{jax.process_index()}",
                )
            # Registering the handler lets a manager that never saved
            # in-process read item_metadata() (used by load_run_params'
            # typed restore) without orbax warning about a missing
            # CheckpointHandlerRegistry.
            self._mgrs[role] = ocp.CheckpointManager(
                root,
                options=ocp.CheckpointManagerOptions(**opts),
                item_handlers=ocp.StandardCheckpointHandler(),
            )
        return self._mgrs[role]

    @staticmethod
    def _payload(
        train_state,
        pca_state: Optional[dict],
        loss_pca_state: Optional[dict],
        extras: Optional[dict] = None,
    ):
        payload = {
            "params": train_state.params,
            "opt_state": train_state.opt_state,
            "step": np.asarray(train_state.step),
            "rng": jax.random.key_data(train_state.rng),
        }
        if pca_state is not None:
            payload["pca"] = pca_state
        if loss_pca_state is not None:
            payload["loss_pca"] = loss_pca_state
        if extras is not None:
            payload["extras"] = extras
        return payload

    def save(
        self,
        role: str,
        step: int,
        train_state,
        pca_state: Optional[dict] = None,
        loss_pca_state: Optional[dict] = None,
        extras: Optional[dict] = None,
    ) -> None:
        if not self.enabled:
            return
        payload = self._payload(train_state, pca_state, loss_pca_state, extras)
        payload = jax.tree_util.tree_map(np.asarray, payload)
        self._mgr(role).save(int(step), args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        for mgr in self._mgrs.values():
            mgr.wait_until_finished()

    def latest(self, role: str = "rolling") -> Optional[int]:
        if not self.enabled and not os.path.isdir(self._role_root(role)):
            return None  # read-only probe of a role that was never written
        return self._mgr(role).latest_step()

    def restore(
        self, role: str, step: int, like_state, like_pca=None,
        like_loss_pca=None, like_extras=None,
    ):
        """Restore a payload shaped like the given state templates. Returns
        (train_state, pca_state_dict, loss_pca_state_dict, extras_dict)."""
        from soft_contrastive_learning_tpu.train.step import TrainState

        template = self._payload(like_state, like_pca, like_loss_pca, like_extras)
        template["rng"] = np.asarray(template["rng"])
        restored = self._mgr(role).restore(
            int(step), args=ocp.args.StandardRestore(template)
        )
        state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]),
        )
        return (
            state,
            restored.get("pca"),
            restored.get("loss_pca"),
            restored.get("extras"),
        )

    def close(self) -> None:
        for mgr in self._mgrs.values():
            mgr.close()


def warm_start_params(fresh_params: Any, donor_params: Any, scopes=WARM_START_SCOPES):
    """Copy ``scopes`` subtrees from a donor parameter pytree into freshly
    initialized params (heads stay fresh). Logs nothing; returns the merged
    pytree and the list of copied top-level scopes."""
    merged = dict(fresh_params)
    copied = []
    for scope in scopes:
        if scope in donor_params and scope in merged:
            merged[scope] = donor_params[scope]
            copied.append(scope)
    return merged, copied


def load_run_params(run_dir: str, role: Optional[str] = None):
    """Load the latest trained parameters from a training-run directory
    (orbax checkpoints + config.json) — the train -> infer/serve seam.

    The reference restores its own TF1 training checkpoints at inference
    (evaluation/inference.py:122-144); this is the orbax equivalent for runs
    produced by this framework. Returns ``(model_config, params)``; the
    run's saved ModelConfig is authoritative (it matches the parameters).
    """
    from soft_contrastive_learning_tpu.core.config import TrainConfig

    cfg_path = os.path.join(run_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"{run_dir} is not a training run dir (no config.json)"
        )
    cfg = TrainConfig.load(cfg_path)
    # enabled=False: loading must never create directories in the run
    ckpts = RunCheckpoints(run_dir, max_to_keep=cfg.max_to_keep, enabled=False)
    # close() in finally: the raise paths below (no checkpoints, stale
    # architecture, restore errors) must not leak the managers' non-daemon
    # orbax worker threads in long-lived callers that catch the exception.
    try:
        return _load_run_params_inner(ckpts, run_dir, cfg, role)
    finally:
        ckpts.close()


def _load_run_params_inner(ckpts, run_dir, cfg, role):
    roles = [role] if role else list(RunCheckpoints.ROLES)
    # Roles use different step units ('epoch' saves step=epoch index,
    # 'rolling'/'part' save the global step), so raw step numbers are not
    # comparable across roles — pick the most recently WRITTEN checkpoint
    # by its directory mtime instead.
    best = None  # (mtime, step, role)
    for r in roles:
        try:
            s = ckpts.latest(r)
        except FileNotFoundError:
            s = None  # role never written — genuinely absent
        except Exception as e:
            # A corrupt or permission-broken checkpoint tree is NOT the same
            # as an absent one; surface it per-role instead of letting it
            # masquerade as "no checkpoints under .../checkpoints".
            logging.getLogger(__name__).warning(
                "checkpoint role %r unreadable under %s: %s", r, run_dir, e
            )
            s = None
        if s is None:
            continue
        step_dir = os.path.join(ckpts._role_root(r), str(int(s)))
        mtime = os.path.getmtime(step_dir) if os.path.isdir(step_dir) else 0.0
        if best is None or mtime > best[0]:
            best = (mtime, s, r)
    if best is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}/checkpoints")
    _, step, r = best
    mgr = ckpts._mgr(r)
    # Restore against a typed target tree, never the raw as-saved pytree:
    # an untyped StandardRestore is exactly the "generally UNSAFE" orbax
    # warns about (round-4 verdict) — the saved metadata gives the full
    # payload's shapes/dtypes, and the params subtree is then validated
    # against the run's OWN architecture so a stale checkpoint (config.json
    # edited, or code drift changing the param tree) fails loudly here
    # instead of producing shape errors deep inside a later jit.
    template = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
        mgr.item_metadata(int(step)).tree,
    )
    from soft_contrastive_learning_tpu.models.model import init_params

    expect = jax.eval_shape(
        lambda: init_params(cfg.model, jax.random.key(0))
    )
    def _shape_dtype_by_key(tree):
        return {
            "/".join(
                p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
                for p in path
            ): (tuple(leaf.shape), np.dtype(leaf.dtype))
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    expect_sd = _shape_dtype_by_key(expect)
    saved_sd = _shape_dtype_by_key(template["params"])
    if expect_sd != saved_sd:
        missing = sorted(set(expect_sd) - set(saved_sd))[:3]
        extra = sorted(set(saved_sd) - set(expect_sd))[:3]
        shapes = sorted(
            k for k in set(expect_sd) & set(saved_sd)
            if expect_sd[k] != saved_sd[k]
        )[:3]
        raise ValueError(
            f"checkpoint {run_dir}/checkpoints/{r}/{int(step)} does not match "
            f"the run's ModelConfig (stale architecture?): "
            f"missing={missing} extra={extra} shape/dtype-mismatch={shapes}"
        )
    restored = mgr.restore(int(step), args=ocp.args.StandardRestore(template))
    return cfg.model, restored["params"]
