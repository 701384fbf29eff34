"""Push the int8 quantized embed toward the 10k img/s north star.

perf/_quant_serving.log measured the quantized stack at 9,322-9,550 img/s
(1.6-1.7x bf16) — 95% of BASELINE's 10k target. This sweeps the remaining
knobs on the int8 path: batch around the 2048 knee, the +vmem64 compiler
option (+0.6% on bf16), XLA vs Pallas NetVLAD aggregation, and bf16
NetVLAD-input feed.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_push.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import init_params
from soft_contrastive_learning_tpu.models.quant import (
    calibrate_scales, quantized_embed,
)


def measure(cfg, params, scales, bs, iters=20, compiler_options=None):
    x = jnp.asarray(
        np.random.default_rng(0).random((bs, 180, 240, 3), np.float32) * 255.0
    )

    def many(p, im):
        def body(c, _):
            out = quantized_embed(cfg, p, scales, im + (c * 1e-30).astype(im.dtype))[0]
            return out[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    kw = {"compiler_options": compiler_options} if compiler_options else {}
    f = jax.jit(many, **kw)
    float(f(params, x))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(params, x))
        best = max(best, bs * iters / (time.perf_counter() - t0))
    return best


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((8, 180, 240, 3), np.float32) * 255.0)

    for pallas in (True, False):
        cfg = ModelConfig(vlad_cores=64, reduction="none",
                          compute_dtype="bfloat16", use_pallas=pallas)
        params = init_params(cfg, jax.random.key(0))
        scales = calibrate_scales(params, calib)
        for bs in ((1536, 2048, 3072) if pallas else (2048,)):
            try:
                r = measure(cfg, params, scales, bs)
                print(f"int8 pallas={pallas} bs={bs}: {r:8.1f} img/s",
                      flush=True)
            except Exception as e:
                print(f"int8 pallas={pallas} bs={bs}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        for label, opts in [
            ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
            ("vmem128", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
        ]:
            try:
                r = measure(cfg, params, scales, 2048, compiler_options=opts)
                print(f"int8 pallas={pallas} bs=2048 +{label}: {r:8.1f} img/s",
                      flush=True)
            except Exception as e:
                print(f"int8 pallas={pallas} +{label}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
