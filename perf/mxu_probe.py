"""Decisive multi-MXU Mosaic probe (round-3 VERDICT #3).

Question: can ANY Pallas/Mosaic configuration on this chip/toolchain push
matmuls past the measured 37-44 TF/s (~1 of the v5e TensorCore's 4 MXUs)?
XLA reaches 141-175 TF/s on the same chip, so the hardware can do it from
one instruction stream; if Mosaic can't, the Winograd kernel
(ops/pallas/winograd_kernel.py) stays toolchain-blocked.

Configurations tried (each amortizes the ~0.5-0.8 ms per-call floor by
repeating the dot inside the kernel with a data dependency):

  A. one VMEM-resident dot, in-kernel fori_loop repeat — block-shape sweep
  B. 2-D blocked grid over a 4096^2 matmul, dimension_semantics PARALLEL
     vs ARBITRARY (does grid parallelism engage more MXUs?)
  C. CORE_PARALLEL / SUBCORE_PARALLEL on the leading grid dim
  D. pl.dot vs jnp.dot lowering
  E. bf16 out vs f32 out accumulation

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python perf/mxu_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args, reps=3):
    float(jnp.asarray(fn(*args)).ravel()[0])  # compile + warm, real fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------- A: resident dot
def resident_dot(m, k, n, iters, use_pl_dot=False, out_bf16=False):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, c):
            a = a_ref[:] + (c[0, 0] * 1e-30).astype(jnp.bfloat16)
            if use_pl_dot:
                return pl.dot(a, b_ref[:]).astype(c.dtype)
            d = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
            return d.astype(c.dtype)

        init = jnp.zeros(o_ref.shape, o_ref.dtype)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, init)

    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    dt = timeit(jax.jit(f), (a, b))
    tf = 2.0 * m * k * n * iters / dt / 1e12
    tag = ("pl.dot" if use_pl_dot else "jnp.dot") + (" bf16out" if out_bf16 else "")
    print(f"A resident ({m},{k})@({k},{n}) x{iters} {tag}: "
          f"{dt*1e3:8.3f} ms  {tf:6.1f} TF/s", flush=True)
    return tf


# --------------------------------------------------------- B/C: blocked grid
def blocked_grid(M, K, N, bm, bn, semantics, label, inner_iters=8):
    # grid over (M/bm, N/bn) output tiles; full-K dot per tile, repeated
    # inner_iters times with a data dependency to amortize the call floor.
    def kernel(a_ref, b_ref, o_ref):
        def body(i, c):
            a = a_ref[:] + (c[0, 0] * 1e-30).astype(jnp.bfloat16)
            return jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)

        o_ref[:] = jax.lax.fori_loop(
            0, inner_iters, body, jnp.zeros(o_ref.shape, o_ref.dtype)
        )

    grid = (M // bm, N // bn)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    dt = timeit(jax.jit(f), (a, b))
    tf = 2.0 * M * K * N * inner_iters / dt / 1e12
    print(f"B grid{grid} ({M},{K})@({K},{N}) blk({bm},{bn}) x{inner_iters} "
          f"[{label}]: {dt*1e3:8.3f} ms  {tf:6.1f} TF/s", flush=True)
    return tf


def xla_reference(m, k, n, iters=64):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    def many(aa, bb):
        def body(c, _):
            d = jnp.dot(aa + (c * 1e-30).astype(jnp.bfloat16), bb,
                        preferred_element_type=jnp.float32)
            return d[0, 0], ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    dt = timeit(jax.jit(many), (a, b))
    tf = 2.0 * m * k * n * iters / dt / 1e12
    print(f"XLA ({m},{k})@({k},{n}) x{iters}: {dt*1e3:8.3f} ms  {tf:6.1f} TF/s",
          flush=True)
    return tf


def main():
    print("backend", jax.default_backend(), flush=True)
    try:
        info = pltpu.get_tpu_info()
        print("tpu_info:", info, flush=True)
    except Exception as e:
        print("tpu_info unavailable:", e, flush=True)

    xla_reference(1024, 2048, 1024)

    # A: VMEM-resident single dots, shape sweep (12 MB VMEM at the largest)
    for (m, k, n) in [(512, 512, 512), (1024, 1024, 1024), (1024, 2048, 1024),
                      (2048, 1024, 1024), (1024, 1024, 2048), (256, 4096, 1024)]:
        resident_dot(m, k, n, iters=64)
    resident_dot(1024, 2048, 1024, iters=64, use_pl_dot=True)
    resident_dot(1024, 2048, 1024, iters=64, out_bf16=True)

    # B: blocked grids over a 4096^2 x 2048 matmul
    M = N = 4096
    K = 2048
    for (bm, bn) in [(512, 512), (1024, 1024), (512, 2048), (2048, 512)]:
        for sem, label in [
            ((pltpu.PARALLEL, pltpu.PARALLEL), "parallel,parallel"),
            ((pltpu.ARBITRARY, pltpu.ARBITRARY), "arbitrary"),
        ]:
            try:
                blocked_grid(M, K, N, bm, bn, sem, label)
            except Exception as e:
                print(f"B blk({bm},{bn}) [{label}] failed: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    # C: core/subcore-parallel semantics on the leading dim
    for sem, label in [
        ((pltpu.CORE_PARALLEL, pltpu.PARALLEL), "core_parallel"),
        ((pltpu.SUBCORE_PARALLEL, pltpu.PARALLEL), "subcore_parallel"),
    ]:
        try:
            blocked_grid(M, K, N, 512, 512, sem, label)
        except Exception as e:
            print(f"C [{label}] failed: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
