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

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

# Parameter subtrees covered by the reference's 'vgg16_netvlad_pca' scope.
WARM_START_SCOPES = ("vgg16", "netvlad")


class RunCheckpoints:
    ROLES = ("rolling", "epoch", "part")

    def __init__(self, out_dir: str, max_to_keep: int = 1):
        self.out_dir = out_dir
        self._mgrs: Dict[str, ocp.CheckpointManager] = {}
        for role in self.ROLES:
            keep = max_to_keep if role == "rolling" else None  # None = unbounded
            self._mgrs[role] = ocp.CheckpointManager(
                os.path.abspath(os.path.join(out_dir, "checkpoints", role)),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep),
            )

    @staticmethod
    def _payload(train_state, pca_state: Optional[dict], loss_pca_state: Optional[dict]):
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
        return payload

    def save(
        self,
        role: str,
        step: int,
        train_state,
        pca_state: Optional[dict] = None,
        loss_pca_state: Optional[dict] = None,
    ) -> None:
        payload = self._payload(train_state, pca_state, loss_pca_state)
        self._mgrs[role].save(int(step), args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        for mgr in self._mgrs.values():
            mgr.wait_until_finished()

    def latest(self, role: str = "rolling") -> Optional[int]:
        return self._mgrs[role].latest_step()

    def restore(self, role: str, step: int, like_state, like_pca=None, like_loss_pca=None):
        """Restore a payload shaped like the given state templates. Returns
        (train_state, pca_state_dict, loss_pca_state_dict)."""
        from soft_contrastive_learning_tpu.train.step import TrainState

        template = self._payload(like_state, like_pca, like_loss_pca)
        template["rng"] = np.asarray(template["rng"])
        restored = self._mgrs[role].restore(
            int(step), args=ocp.args.StandardRestore(template)
        )
        state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]),
        )
        return state, restored.get("pca"), restored.get("loss_pca")

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
