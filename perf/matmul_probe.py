"""Probe which Pallas matmul shapes Mosaic runs at full chip rate.

The Winograd kernel's compute is 16 independent (P, C) @ (C, F) matmuls per
cell. The ablation (perf/_ablate.log) shows them realizing only ~22 TF/s —
hypothesis: small/batched dots don't spread across the chip's MXUs. This
measures batched vs unrolled vs single dots at the candidate shapes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_kernel(name, make_fn, flops, iters=30):
    f = make_fn()

    def many(*args):
        def body(c, _):
            o = f(*args, c)
            return o, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    g = jax.jit(many)
    args = make_args[name]()
    float(g(*args))
    t0 = time.perf_counter()
    float(g(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s}: {dt*1e3:8.3f} ms  {flops/dt/1e12:7.1f} TF/s")


make_args = {}


def probe(name, bm, m, k, n, mode):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((bm, m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((bm, k, n)), jnp.bfloat16)
    make_args[name] = lambda: (a, b)
    flops = 2 * bm * m * k * n

    def kernel(a_ref, b_ref, o_ref):
        if mode == "batched":
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        elif mode == "unrolled":
            for i in range(bm):
                o_ref[i] = jnp.dot(a_ref[i], b_ref[i],
                                   preferred_element_type=jnp.float32)
        elif mode == "single":
            o_ref[0] = jnp.dot(a_ref[0], b_ref[0],
                               preferred_element_type=jnp.float32)

    out_b = bm if mode != "single" else 1

    def make():
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_b, m, n), jnp.float32),
        )

        def f(aa, bb, carry):
            o = fn(aa + (carry * 1e-30).astype(jnp.bfloat16), bb)
            return o[0, 0, 0]
        return f

    bench_kernel(name, make, flops if mode != "single" else 2 * m * k * n)


if __name__ == "__main__":
    print("backend", jax.default_backend())
    probe("batched16 (240,128)@(128,128)", 16, 240, 128, 128, "batched")
    probe("batched16 (1024,128)@(128,128)", 16, 1024, 128, 128, "batched")
    probe("unrolled16 (1024,128)@(128,128)", 16, 1024, 128, 128, "unrolled")
    probe("batched16 (360,256)@(256,256)", 16, 360, 256, 256, "batched")
    probe("batched16 (1024,512)@(512,512)", 16, 1024, 512, 512, "batched")
    probe("single (4096,512)@(512,512)", 1, 4096, 512, 512, "single")
    probe("single (16384,128)@(128,128)", 1, 16384, 128, 128, "single")
    probe("single (4096,128)@(128,512)", 1, 4096, 128, 512, "single")
