"""Typed configuration for the framework.

Replaces the reference's argparse-flags-promoted-to-UPPERCASE-globals pattern
(reference train/train.py:1222-1368, util/helper.py:4-6) with frozen dataclasses
that serialize into the run directory. Derived config (``pn_loss``,
``distance_type``, tuple shape) mirrors reference train/train.py:1373-1391 and
:585-594 but is computed once, immutably, at construction.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _derive_distance_type(loss: str) -> str:
    """Infer the host-side distance payload the loss needs.

    Mirrors reference train/train.py:1378-1391 (order matters: 'pairwise' before
    'distance', 'swrd' before 'wrd').
    """
    if "pairwise" in loss:
        return "pairwise"
    if "distance" in loss:
        return "anchor"
    if "swrd" in loss:
        return "swrd"
    if "wrd" in loss:
        return "wrd"  # also prodwrd / sumwrd
    if "wms" in loss:
        return "wms"
    if "logratio" in loss:
        return "logratio"
    return "none"


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture configuration.

    Mirrors the reference's VLAD_CORES / REDUCTION / OUT_DIM / L flags
    (reference train/train.py:1283-1287) and the backbone selection logic in
    build_model (reference train/train.py:599-652).
    """

    vlad_cores: int = 64  # 0 => plain VGG16 (flattened / spp); 64 => NetVLAD
    reduction: str = "none"  # none | 1fc | 2fc | 3fc | pca | spp
    out_dim: int = 512
    spp_levels: int = 3  # 'L' flag: spatial-pyramid-pooling levels
    image_height: int = 180
    image_width: int = 240
    channels: int = 3
    # TPU-first knobs (new capability, no reference equivalent):
    compute_dtype: str = "bfloat16"  # activations dtype for the conv stack
    param_dtype: str = "float32"
    use_pallas: bool = True  # fused Pallas NetVLAD aggregation on TPU
    remat: bool = False  # jax.checkpoint the conv stack to trade FLOPs for HBM
    # Fused Winograd F(2x2,3x3) conv kernels for convs whose INPUT channel
    # count is a multiple of 128 (blocks 2-5 except conv2_1; Mosaic needs
    # lane-aligned DMA extents): 2.25x fewer MXU multiplies at direct-conv
    # HBM traffic (ops/pallas/winograd_kernel.py). Forward only (gradients
    # fall back to the direct-conv vjp). Off by default: measured slower on
    # this chip due to the Pallas matmul ceiling — docs/SPEEDLIGHT.md.
    winograd: bool = False
    # Exact packed-width block1 rewrite (ops/packed_stem.py). The packed conv
    # alone is ~1.5x faster on the MXU, but measured END TO END on v5e the
    # pack/repack data movement loses more than the matmul wins (5.9k -> 3.8k
    # img/s bf16; 9.9k -> 5.9k on the int8 serving path, where it extends
    # through conv2_1 bit-exactly — perf/_stem_packed.log), so it stays
    # opt-in until the repacking fuses into a kernel. Applies to both the
    # float backbone (models/vgg16.py) and the int8 stack (models/quant.py).
    packed_stem: bool = False

    @property
    def descriptor_dim(self) -> int:
        """Raw descriptor dimensionality before reduction."""
        if self.reduction == "spp":
            # SPP over the (H/16, W/16, 512) conv5_3 map: sum_{l<L} 4^l bins x 512 ch
            return sum(4**l for l in range(self.spp_levels)) * 512
        if self.vlad_cores > 0:
            return self.vlad_cores * 512
        # flattened conv5_3 map (reference train/train.py:611)
        return (self.image_height // 16) * (self.image_width // 16) * 512

    @property
    def output_dim(self) -> int:
        """Dimensionality after the reduction head."""
        if self.reduction in ("1fc", "2fc", "3fc", "pca"):
            return self.out_dim
        return self.descriptor_dim


@dataclass(frozen=True)
class TupleConfig:
    """Tuple geometry for the sampler (reference train/train.py:1241-1296)."""

    positives_per_tuple: int = 12
    negatives_per_tuple: int = 12
    hard_positives_per_tuple: int = 6
    hard_negatives_per_tuple: int = 6
    mutually_exclusive_negs: bool = True
    max_pos_radius: float = 15.0
    min_neg_radius: float = 15.0
    max_yaw_diff: float = 3.141592653589793 / 6.0  # reference train/train.py:458


@dataclass(frozen=True)
class LossConfig:
    """Loss selection + hyperparameters (reference train/train.py:1252-1263)."""

    name: str = "wms"
    margin_1: float = 0.1
    margin_2: float = 0.2
    lam: float = 0.5
    alpha: float = 0.8  # geometric sigmoid steepness
    beta: float = 15.0  # geometric sigmoid midpoint [m]
    wfunction: str = "exp"  # exp | lin | tanh
    sumfunction: str = "ms"  # ms | plain
    ms_mining: bool = False
    loss_dim: int = 512  # dims kept in spectral/incremental losses ('loss_dim' flag)
    svd_dimensions: int = 10  # top singular values in the *rd family
    d_max_squared: float = 15.0**2  # MAX_POS_RADIUS**2 (reference train/train.py:695)
    f_max_squared: float = 2.0  # empirical scale (reference train/train.py:696)
    # Opt-in fused Pallas wms forward (ops/pallas/wms_kernel.py). Measured
    # slower than or equal to the XLA formulation at every batch size
    # (B=50 within noise, B=256-512 ~10% slower fwd, compile failure at
    # B>=1024 — perf/_wms.log, perf/_wms_largebatch.log), so the XLA path
    # is the default; the kernel stays as an exact, tested fusion pattern
    # reference (bitwise parity at B=50).
    fused_wms: bool = False

    @property
    def distance_type(self) -> str:
        return _derive_distance_type(self.name)

    @property
    def pn_loss(self) -> bool:
        """Two-op alternating pos/neg optimization (reference train/train.py:1373)."""
        return "eigenvalue" in self.name

    @property
    def needs_other_neg(self) -> bool:
        """Quadruplet losses consume an extra 'other negative' member."""
        return "quadruplet" in self.name

    @property
    def incremental(self) -> bool:
        return "incremental" in self.name


@dataclass(frozen=True)
class TrainConfig:
    """Full training-run configuration (reference train/train.py:1222-1314)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    tuples: TupleConfig = field(default_factory=TupleConfig)
    loss: LossConfig = field(default_factory=LossConfig)

    # Data roots (filesystem contract retained from the reference)
    img_root: str = ""
    shuffled_root: str = ""
    loc_ref_root: str = ""
    anchor_root: str = ""
    checkpoint: str = ""
    out_dir: str = ""

    # Optimization
    tuples_per_batch: int = 2
    max_epoch: int = 5
    base_lr: float = 5e-6
    minimal_lr: float = 5e-12
    lr_down_factor: float = 0.5
    lr_down_frequency: float = 1.0
    momentum: float = 0.9
    optimizer: str = "adam"
    dropout_keep_prob: float = 0.5  # reference train/train.py:273
    forgetting_factor: float = 0.4  # incremental-PCA 'f' flag
    # Streaming-PCA updates on a worker thread, overlapped with device steps
    # (the reference's P1 PCA threads, train/train.py:312-357) with
    # deterministic lag-2 feeds; False = synchronous lag-1 updates on the
    # training loop (round-1 behavior). See pca/async_updater.py.
    async_pca: bool = True

    # Mining / eval cadence
    mining_step: int = 250
    mining_cache_size: int = 1000
    # Async mining refresh (TPU-native; opt-in): instead of the reference's
    # barrier semantics — drain the pipeline, re-embed the mining window,
    # resume (train/train.py:1014-1018) — dispatch the refresh's device work
    # at the boundary and keep training on the PREVIOUS cache while a worker
    # thread fetches the new embeddings and swaps them in (MiningCache.refresh
    # is lock-guarded). The window is embedded with the boundary's params
    # either way; the first few batches of a segment may use the stale cache
    # (hard picks fall back to non-hard for anchors the old window doesn't
    # contain — the reference's own behavior for uncached anchors). Removes
    # the per-boundary queue-drain stall (docs/TRAINBENCH.md "segment-boundary
    # drains"). Auto-falls-back to synchronous at the first boundary of an
    # epoch (no previous cache), on resume segments, when streaming-PCA
    # state is in play (reduction=pca / incremental losses — their update
    # order is part of the training semantics), and in multi-host runs
    # (a worker thread racing the main loop would make the cross-process
    # collective enqueue order scheduler-dependent). Relaxes mid-epoch-resume
    # exactness the same way the cache rebuild already does (see _extras).
    # HBM note: the overlap costs one extra copy of the params tree plus the
    # embed activations living alongside the train step's — configs sized
    # within a few percent of the HBM ceiling should keep the barrier.
    # Measured verdict (docs/TRAINBENCH.md "On-chip sync-vs-async"): with
    # the order-only refresh, the SYNCHRONOUS barrier is faster end-to-end
    # on relay-attached chips (1,028 vs 906 img/s with-mining) because the
    # worker's concurrent dispatches serialize with the training stream;
    # keep this False there, and opt in only when host-side features are
    # needed at the boundary (streaming PCA / incremental losses) or on
    # direct-attached hosts where concurrent dispatch is cheap.
    async_mining: bool = False
    eval_step: int = 100
    save_step: int = 500
    num_eval_queries: int = 50
    eval_ref_r: int = 5
    train_ref_r: int = 1
    max_to_keep: int = 1

    # Set names
    local_ref_set: str = "train_ref"
    local_query_set: str = "train_query"
    other_ref_set: str = "test_ref"
    other_query_set: str = "test_query"

    # Device-resident image pool (TPU-native; data/device_pool.py): keep the
    # training set's decoded uint8 images in HBM and gather batches by index
    # inside the jitted step. Removes the per-step host->device image
    # transfer (the measured bottleneck on relay-attached chips) and the
    # host decode bound. Auto-skipped when the set exceeds the byte budget.
    device_image_pool: bool = True
    device_pool_max_bytes: int = 4_000_000_000
    # K-step fused dispatch (train/step.py::build_train_step_scan): stack K
    # consecutive batches and run them as one on-device lax.scan per
    # dispatch, amortizing the per-call host->device transfer floor and
    # dispatch overhead (dominant on relay-attached chips). 1 = off.
    # Exact: K fused steps == K sequential steps. Auto-disabled for
    # incremental losses / pca reduction (per-step host state feedback)
    # and around eval/save/mining boundaries.
    steps_per_dispatch: int = 1

    # Reproducibility + parallelism (TPU-native additions)
    seed: int = 42
    data_axis: str = "data"
    model_axis: str = "model"
    num_data_shards: int = 0  # 0 => all local devices
    num_model_shards: int = 1

    @property
    def tuple_shape(self) -> Tuple[int, ...]:
        """Images per tuple: [anchor, P, N(, other)] (reference train/train.py:589-594).

        For quadruplet losses the last negative becomes the 'other negative',
        keeping total images per tuple constant.
        """
        p = self.tuples.positives_per_tuple
        n = self.tuples.negatives_per_tuple
        if self.loss.needs_other_neg:
            return (1, p, n - 1, 1)
        return (1, p, n)

    @property
    def images_per_batch(self) -> int:
        return self.tuples_per_batch * sum(self.tuple_shape)

    def encode_name(self) -> str:
        """Hyperparameter-encoding run name (checkpoint-discovery parity with the
        reference's folder-name scheme, e.g. ``al0.8_be15_ha6_lo-wms``)."""
        t = self.tuples
        parts = [
            f"al{self.loss.alpha:g}",
            f"be{self.loss.beta:g}",
            f"ha{t.hard_negatives_per_tuple}",
            f"lo-{self.loss.name}",
            f"re-{self.model.reduction}",
            f"vl{self.model.vlad_cores}",
            f"tb{self.tuples_per_batch}",
        ]
        return "_".join(parts)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        d = dict(d)
        if isinstance(d.get("model"), dict):
            d["model"] = ModelConfig(**d["model"])
        if isinstance(d.get("tuples"), dict):
            d["tuples"] = TupleConfig(**d["tuples"])
        if isinstance(d.get("loss"), dict):
            d["loss"] = LossConfig(**d["loss"])
        return cls(**d)

    @classmethod
    def load(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# Named config bundles for `scl-tpu train --preset <name>`. Values are
# dataclasses.replace overrides applied ON TOP of the flag-built config, so
# a preset is reproducible regardless of flag defaults drifting.
#
# tpu-flagship is the measured production recommendation (docs/TRAINBENCH.md
# round 4; confirmed at the full 5-epoch budget in docs/QUALITY.md round 5):
# B = 4 tuples x 25 imgs = 100 images/step is the relay-chip throughput knee
# (+40% over the reference's B=50 geometry at 94.3% device busy), linear LR
# scaling (base_lr x2 = 1e-5) keeps held-out recall inside the B=50 seed
# spread, K=1 because fused dispatch hurts at B>=100 on relay-attached
# chips, and async_mining=False because the synchronous order-only mining
# refresh measured faster end-to-end there (order-only engages automatically
# whenever no host-side PCA state needs the embedded window).
TRAIN_PRESETS: Dict[str, Dict[str, Any]] = {
    "tpu-flagship": {
        "tuples_per_batch": 4,
        "base_lr": 1e-5,  # reference 5e-6 (train/train.py:1246) x2
        "steps_per_dispatch": 1,
        "async_mining": False,
        "device_image_pool": True,
    },
}


def apply_preset(cfg: TrainConfig, name: str) -> TrainConfig:
    """Overlay a named preset's overrides on ``cfg`` (preset wins over
    conflicting flags — it is the point of asking for one)."""
    try:
        overrides = TRAIN_PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(TRAIN_PRESETS)}"
        )
    return dataclasses.replace(cfg, **overrides)


def unique_out_dir(out_root: str, base_name: str) -> str:
    """Auto-increment ``_{k:03d}`` suffix when the dir exists
    (reference train/train.py:1394-1400)."""
    out_dir = os.path.join(out_root, base_name)
    k = 0
    while os.path.exists(out_dir):
        out_dir = os.path.join(out_root, f"{base_name}_{k:03d}")
        k += 1
    return out_dir
