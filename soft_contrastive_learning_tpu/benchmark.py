"""Headline benchmark: VGG16-NetVLAD embedding throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 10,000 images/sec/chip on TPU v5e.

Two serving configurations are swept and the best QUALITY-GATED one wins:
the bf16 path and the int8 post-training-quantized path
(models/quant.py — measured 1.6-1.7x bf16 on this chip, PARITY.md
"quantized serving"). The int8 candidate only counts if its descriptor
matches the float path to cosine > 0.999 on a live check in the same
process; the winning precision and the measured cosine are reported in
"detail" so the number is self-certifying.

Measurement notes (see .claude/skills/verify/SKILL.md): through the axon
relay, block_until_ready returns early and per-call host fetches pay ~50-80ms
RTT, so the timed region is a lax.scan of ITERS forwards inside ONE jit call
with a single scalar fetch at the end; compile/warmup excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 10_000.0


def _flagship_cfg(use_pallas: bool):
    from soft_contrastive_learning_tpu.core.config import ModelConfig

    return ModelConfig(
        vlad_cores=64,
        reduction="none",
        compute_dtype="bfloat16",
        use_pallas=use_pallas,
    )


def _timed_scan(embed_one, params, cfg, batch_size, iters, compiler_options=None):
    """Best-of-2 timing of ``iters`` chained forwards inside ONE jit call.
    ``embed_one(params, images) -> (B, D)`` descriptors."""

    def many(p, x):
        def body(carry, _):
            # tiny data dependency so XLA can't hoist/elide iterations
            out = embed_one(p, x + carry * 1e-12)
            return out[0, 0].astype(jnp.float32), out[0, 0].astype(jnp.float32)
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return outs.sum()

    f = jax.jit(many, compiler_options=compiler_options)
    x = jnp.asarray(
        np.random.default_rng(0).random(
            (batch_size, cfg.image_height, cfg.image_width, 3), np.float32
        )
        * 255.0
    )
    float(f(params, x))  # compile + warm
    best = 0.0
    for _ in range(2):  # best-of-2 guards against a transient relay stall
        t0 = time.time()
        float(f(params, x))  # one host fetch for the whole scan
        best = max(best, batch_size * iters / (time.time() - t0))
    return best


def measure(batch_size: int, iters: int, use_pallas: bool) -> float:
    from soft_contrastive_learning_tpu.models.model import create_model, init_params

    cfg = _flagship_cfg(use_pallas)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    return _timed_scan(
        lambda p, x: model.apply({"params": p}, x)[0], params, cfg,
        batch_size, iters,
    )


def int8_setup(use_pallas: bool = False):
    """Calibrate once for the int8 sweep: returns (cfg, params, scales, cos)
    where cos is a live descriptor-parity check vs the float path on the
    same params — the caller gates on it so a broken quant path can never
    win. Batch-size independent, so main() hoists it out of the sweep.

    Config follows the measured winner (perf/_quant_push.log): XLA NetVLAD
    aggregation (use_pallas=False)."""
    from soft_contrastive_learning_tpu.models.model import create_model, init_params
    from soft_contrastive_learning_tpu.models.quant import (
        calibrate_scales,
        quantized_embed,
    )

    cfg = _flagship_cfg(use_pallas)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    calib = jnp.asarray(
        np.random.default_rng(0).random(
            (8, cfg.image_height, cfg.image_width, 3), np.float32
        )
        * 255.0
    )
    scales = calibrate_scales(params, calib)

    q = np.asarray(
        jax.jit(lambda p, im: quantized_embed(cfg, p, scales, im)[0])(params, calib),
        np.float64,
    )
    ref = np.asarray(
        jax.jit(lambda p, im: model.apply({"params": p}, im)[0])(params, calib),
        np.float64,
    )
    cos = float(
        np.mean(
            np.sum(q * ref, -1)
            / (np.linalg.norm(q, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-12)
        )
    )
    return cfg, params, scales, cos


def measure_int8(batch_size: int, iters: int, use_pallas: bool = False,
                 setup=None):
    """int8 PTQ serving path (models/quant.py) -> (rate, cosine). The
    64 MiB scoped-vmem compiler option is the measured +3% winner
    (perf/_quant_push.log; only compiles for batches <= 2048)."""
    from soft_contrastive_learning_tpu.models.quant import quantized_embed

    cfg, params, scales, cos = setup or int8_setup(use_pallas)
    compiler_options = (
        {"xla_tpu_scoped_vmem_limit_kib": "65536"}
        if jax.default_backend() == "tpu" and batch_size <= 2048
        else None
    )
    rate = _timed_scan(
        lambda p, x: quantized_embed(cfg, p, scales, x)[0], params, cfg,
        batch_size, iters, compiler_options,
    )
    return rate, cos


def _default_backend_bounded(timeout_s: float = 600.0) -> str:
    """``jax.default_backend()`` with a watchdog: the first call initializes
    the platform, and with the axon relay tunnel down that init HANGS
    indefinitely (observed round 3) — turning the driver's bench run into an
    opaque timeout. Probe on a daemon thread and convert a hang into a fast,
    recorded failure instead."""
    import threading

    result = {}

    def probe():
        result["backend"] = jax.default_backend()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "backend" not in result:
        raise SystemExit(
            f"backend init did not complete within {timeout_s:.0f}s — "
            "TPU relay unreachable? (JAX_PLATFORMS="
            f"{os.environ.get('JAX_PLATFORMS', '')!r})"
        )
    return result["backend"]


def main() -> None:
    on_tpu = _default_backend_bounded() == "tpu"
    if not on_tpu and os.environ.get("SCL_BENCH_REQUIRE_TPU"):
        raise SystemExit(
            f"benchmark requires the TPU backend, got {jax.default_backend()!r}"
        )
    best = 0.0
    config = None  # (precision, batch_size)
    int8_cosine = None
    batch_sizes = (256, 512) if on_tpu else (8,)
    # 120 forwards per timed call: amortizes the axon relay's ~31 ms per-call
    # dispatch floor to <0.2% (perf/_quant_final.log: 20 iters reads ~1% low,
    # 60 iters ~0.25%; the 120-forward numbers are the measured asymptote)
    iters = 120 if on_tpu else 2
    errors = []
    for bs in batch_sizes:
        try:
            rate = measure(bs, iters, use_pallas=on_tpu)
        except (jax.errors.JaxRuntimeError, RuntimeError, MemoryError) as e:
            # An OOM at a large batch is an acceptable sweep outcome; anything
            # else must surface rather than silently reporting a smaller run.
            errors.append(f"bf16 bs={bs}: {type(e).__name__}: {str(e)[:200]}")
            continue
        if rate > best:
            best, config = rate, ("bf16", bs)
    # int8 PTQ serving path — only swept on real hardware (its win is an MXU
    # property; on CPU it is just slow) and only counted when the live
    # descriptor-parity gate passes.
    int8_batches = (512, 1536) if on_tpu else ()  # 1536 = measured knee (perf/_quant_push2.log)
    setup = None
    for bs in int8_batches:
        try:
            # calibration + the parity gate are batch-size independent:
            # run them once for the whole sweep
            setup = setup or int8_setup(use_pallas=False)
            rate, cos = measure_int8(bs, iters, setup=setup)
        except (jax.errors.JaxRuntimeError, RuntimeError, MemoryError) as e:
            errors.append(f"int8 bs={bs}: {type(e).__name__}: {str(e)[:200]}")
            continue
        int8_cosine = cos
        if cos <= 0.999:
            errors.append(f"int8 bs={bs}: quality gate failed (cosine {cos:.5f})")
            continue
        if rate > best:
            best, config = rate, ("int8-ptq", bs)
    if best == 0.0:
        raise SystemExit("all benchmark configs failed:\n" + "\n".join(errors))
    if errors:
        print(f"# skipped configs: {errors}", file=sys.stderr)
    precision, bs = config
    # derive the recorded shape from the swept config — a hardcoded string
    # would silently go stale if _flagship_cfg changes
    cfg = _flagship_cfg(use_pallas=False)
    detail = {
        "backend": jax.default_backend(),
        "precision": precision,
        "batch_size": bs,
        "input": f"{cfg.image_height}x{cfg.image_width}x3",
        "descriptor_dim": cfg.descriptor_dim,
    }
    if precision == "int8-ptq":
        detail["int8_vs_float_descriptor_cosine"] = round(int8_cosine, 6)
    print(
        json.dumps(
            {
                "metric": "vgg16_netvlad_embed_throughput",
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
