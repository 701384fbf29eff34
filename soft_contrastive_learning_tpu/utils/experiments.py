"""Checkpoint-registry lookup.

RECONSTRUCTION: the reference imports ``get_checkpoints(code)`` from the
unpublished ``learnlarge.util.experiments`` module (used at reference
evaluation/top-n.py:6,27 and evaluation/roc.py:4). Call sites show it maps a
short experiment code (e.g. 'obm', 'residual') to a list of checkpoint paths
whose parent-directory names encode the hyperparameters. Implemented as a
JSON registry file so experiment groups are declared as data:

    { "obm": ["/path/to/run_a/epoch-checkpoint-2", ...], ... }
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

_DEFAULT_REGISTRY_ENV = "SCL_TPU_EXPERIMENTS_JSON"


def registry_path(explicit: Optional[str] = None) -> str:
    if explicit:
        return explicit
    return os.environ.get(_DEFAULT_REGISTRY_ENV, "experiments.json")


def load_registry(path: Optional[str] = None) -> Dict[str, List[str]]:
    p = registry_path(path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def save_registry(reg: Dict[str, List[str]], path: Optional[str] = None) -> None:
    with open(registry_path(path), "w") as f:
        json.dump(reg, f, indent=2, sort_keys=True)


def get_checkpoints(code: str, path: Optional[str] = None) -> List[str]:
    """Checkpoint paths registered under an experiment code."""
    return load_registry(path).get(code, [])


def register_checkpoint(code: str, checkpoint: str, path: Optional[str] = None) -> None:
    reg = load_registry(path)
    reg.setdefault(code, [])
    if checkpoint not in reg[code]:
        reg[code].append(checkpoint)
    save_registry(reg, path)


def checkpoint_code_name(checkpoint_path: str) -> str:
    """Display/code name derived from a checkpoint path: parent dir with dots
    stripped + '_e{last char}' (reference evaluation/top-n.py:28-32)."""
    cp_name = checkpoint_path.split("/")[-2]
    cp_name = "".join(os.path.basename(cp_name).split("."))
    return cp_name + f"_e{checkpoint_path[-1]}"
