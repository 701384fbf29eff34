"""Measure the width-packed int8 stem on the chip (the last 10k lever).

perf/_quant_layers.log: the stem (input + conv1_1 + conv1_2 + conv2_1)
costs 40.1 us/img — 39% of the time for 19% of the FLOPs — because the
64-channel convs idle half the MXU lanes. The packed stem
(models/quant.py::_packed_int8_stem, bit-exact, tests/test_quant.py)
re-aligns them at 4/3 the FLOPs. This measures the full quantized embed
packed vs direct at the winning serving config (XLA NetVLAD + 64 MiB
scoped vmem, perf/_quant_push2.log).

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/stem_packed.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import init_params
from soft_contrastive_learning_tpu.models.quant import (
    calibrate_scales, quantized_embed,
)

VMEM64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def measure(cfg, params, scales, bs, iters=20, compiler_options=None, reps=3):
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
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(params, x))
        rates.append(bs * iters / (time.perf_counter() - t0))
    return rates


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((8, 180, 240, 3), np.float32) * 255.0)
    base = ModelConfig(vlad_cores=64, reduction="none",
                       compute_dtype="bfloat16", use_pallas=False)
    params = init_params(base, jax.random.key(0))
    scales = calibrate_scales(params, calib)

    for packed in (False, True):
        cfg = dataclasses.replace(base, packed_stem=packed)
        for bs, opts, label in (
            (1536, VMEM64, "+vmem64"),
            (2048, VMEM64, "+vmem64"),
            (2048, None, ""),
        ):
            try:
                rates = measure(cfg, params, scales, bs,
                                compiler_options=opts, reps=3)
                r = ", ".join(f"{x:8.1f}" for x in rates)
                print(f"int8 packed={int(packed)} bs={bs} {label}: [{r}] img/s",
                      flush=True)
            except Exception as e:
                print(f"int8 packed={int(packed)} bs={bs} {label}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

    # on-chip exactness spot check (bit-exact on CPU; rounding of the f32
    # dequant multiply is IEEE-deterministic on TPU too, but verify)
    cfg_p = dataclasses.replace(base, packed_stem=True)
    xq = jnp.asarray(rng.random((16, 180, 240, 3), np.float32) * 255.0)
    d = jax.jit(lambda p, a: quantized_embed(base, p, scales, a)[0])(params, xq)
    pk = jax.jit(lambda p, a: quantized_embed(cfg_p, p, scales, a)[0])(params, xq)
    d, pk = np.asarray(d, np.float64), np.asarray(pk, np.float64)
    cos = np.mean(np.sum(d * pk, -1) /
                  (np.linalg.norm(d, axis=-1) * np.linalg.norm(pk, axis=-1)))
    print(f"on-chip packed-vs-direct descriptor cosine: {cos:.8f} "
          f"(max abs diff {np.max(np.abs(d - pk)):.3e})", flush=True)


if __name__ == "__main__":
    main()
