"""Round-3 single-chip embed headroom sweep (VERDICT #2): batch sizes
256-1024, pallas on/off, and compiler-option variants on the best batch.
Target: close 5.9k -> >=6.2k img/s against the ~6.5k conv-rate ceiling
(docs/SPEEDLIGHT.md). Run alone on the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import create_model, init_params


def measure(batch_size, iters=40, use_pallas=True, compiler_options=None,
            donate=False, remat=False):
    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=use_pallas,
                      remat=remat)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))

    def many(p, x):
        def body(carry, _):
            out = model.apply({"params": p}, x + (carry * 1e-30).astype(x.dtype))[0]
            return out[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    kw = {}
    if compiler_options:
        kw["compiler_options"] = compiler_options
    f = jax.jit(many, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).random(
            (batch_size, cfg.image_height, cfg.image_width, 3), np.float32
        ) * 255.0
    )
    float(f(params, x))
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        float(f(params, x))
        dt = time.time() - t0
        best = max(best, batch_size * iters / dt)
    return best


def main():
    print("backend", jax.default_backend(), flush=True)
    results = {}
    for bs in (256, 384, 512, 768, 1024):
        try:
            r = measure(bs)
        except Exception as e:
            print(f"bs={bs}: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        results[bs] = r
        print(f"bs={bs} pallas: {r:8.1f} img/s", flush=True)
    best_bs = max(results, key=results.get)

    r = measure(best_bs, use_pallas=False)
    print(f"bs={best_bs} xla-netvlad: {r:8.1f} img/s", flush=True)

    for label, opts in [
        ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("vmem96", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
        ("no-multi-level", {"xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "false"}),
    ]:
        try:
            r = measure(best_bs, compiler_options=opts)
            print(f"bs={best_bs} +{label}: {r:8.1f} img/s", flush=True)
        except Exception as e:
            print(f"+{label} failed: {type(e).__name__}: {str(e)[:120]}", flush=True)

    # bf16 input feed (halves any H2D influence inside the scan: none, but
    # checks whether the uint8/f32 cast edge costs anything)
    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=True)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))

    def many_bf16(p, x):
        def body(carry, _):
            out = model.apply({"params": p}, x + (carry * 1e-30).astype(x.dtype))[0]
            return out[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=40)
        return c

    f = jax.jit(many_bf16)
    x = jnp.asarray(
        np.random.default_rng(0).random((best_bs, 180, 240, 3), np.float32) * 255.0,
        jnp.bfloat16,
    )
    float(f(params, x))
    t0 = time.time()
    float(f(params, x))
    print(f"bs={best_bs} bf16-input: {best_bs*40/(time.time()-t0):8.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
