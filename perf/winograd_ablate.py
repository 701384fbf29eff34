"""Ablate the Winograd kernel's per-cell cost on the real chip: DMA only,
+input transform, +matmuls, full kernel — to find where the time goes."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(stage, ipc, trows, tw, rgroups, tile_c):
    def kernel(u_ref, x_hbm, out_ref, x_vmem, macc, sem):
        i = pl.program_id(0)
        k = pl.program_id(1)
        nc = pl.num_programs(1)
        rows = 2 * trows + 2
        g = (i // rgroups) * ipc
        r0 = 2 * (i % rgroups) * trows
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(g, ipc), pl.ds(r0, rows), :, pl.ds(k * tile_c, tile_c)],
            x_vmem, sem)
        cp.start()

        @pl.when(k == 0)
        def _():
            macc[:] = jnp.zeros_like(macc)

        cp.wait()
        if stage == "dma":
            macc[0, 0, :] += x_vmem[0, 0, 0, :].astype(jnp.float32)
        else:
            x = x_vmem[:].astype(jnp.float32)
            wp = x.shape[2]
            xr = x.reshape(ipc, trows + 1, 2, wp // 2, 2, tile_c)

            def dab(a, b):
                return xr[:, a // 2: a // 2 + trows, a % 2,
                          b // 2: b // 2 + tw, b % 2, :]

            p = ipc * trows * tw
            rowt = []
            for b in range(4):
                d0, d1, d2, d3 = dab(0, b), dab(1, b), dab(2, b), dab(3, b)
                rowt.append((d0 - d2, d1 + d2, d2 - d1, d1 - d3))
            v_list = []
            for a in range(4):
                t0, t1, t2, t3 = (rowt[b][a] for b in range(4))
                for col in (t0 - t2, t1 + t2, t2 - t1, t1 - t3):
                    v_list.append(col.reshape(p, tile_c))
            v = jnp.stack(v_list).astype(jnp.bfloat16)
            if stage == "transform":
                macc[0, 0, :] += v[0, 0, :].astype(jnp.float32)
            else:
                m = jax.lax.dot_general(
                    v, u_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                macc[:] += m

        if stage == "full":
            @pl.when(k == nc - 1)
            def _():
                f = out_ref.shape[-1]
                mm = macc[:].reshape(4, 4, ipc, trows, tw, f)
                t0 = mm[0] + mm[1] + mm[2]
                t1 = mm[1] - mm[2] - mm[3]
                y00 = t0[0] + t0[1] + t0[2]
                y01 = t0[1] - t0[2] - t0[3]
                y10 = t1[0] + t1[1] + t1[2]
                y11 = t1[1] - t1[2] - t1[3]
                row0 = jnp.stack([y00, y01], 3).reshape(ipc, trows, 2 * tw, f)
                row1 = jnp.stack([y10, y11], 3).reshape(ipc, trows, 2 * tw, f)
                y = jnp.stack([row0, row1], 2).reshape(ipc, 2 * trows, 2 * tw, f)
                out_ref[:] = y.astype(out_ref.dtype)
        else:
            @pl.when(k == nc - 1)
            def _():
                out_ref[:] = macc[0][None].astype(out_ref.dtype)

    return kernel


def run(stage, B, h, w, c, f, trows, ipc, iters=20):
    th, tw = -(-h // 2), -(-w // 2)
    th_p = -(-th // trows) * trows
    rgroups = th_p // trows
    tile_c = 128 if c % 128 == 0 else c
    p = ipc * trows * tw
    wp8 = -(-(2 * tw + 2) // 8) * 8
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((B, 2 * th_p + 2, wp8, c)), jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((16, c, f)), jnp.bfloat16)

    if stage == "full":
        out_shape = jax.ShapeDtypeStruct((B, 2 * th_p, 2 * tw, f), jnp.bfloat16)
        out_block = (ipc, 2 * trows, 2 * tw, f)
        out_index = lambda i, j: (i // rgroups, i % rgroups, 0, 0)
    else:
        out_shape = jax.ShapeDtypeStruct((B * rgroups, p, f), jnp.bfloat16)
        out_block = (1, p, f)
        out_index = lambda i, j: (i, 0, 0)

    fn = pl.pallas_call(
        make_kernel(stage, ipc, trows, tw, rgroups, tile_c),
        grid=((B // ipc) * rgroups, c // tile_c),
        in_specs=[
            pl.BlockSpec((16, tile_c, f), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(out_block, out_index, memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ipc, 2 * trows + 2, wp8, tile_c), jnp.bfloat16),
            pltpu.VMEM((16, p, f), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def many(xx, uu):
        def body(carry, _):
            o = fn(uu, xx + (carry * 1e-30).astype(jnp.bfloat16))
            return o.reshape(-1)[0].astype(jnp.float32), ()
        cc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return cc

    g = jax.jit(many)
    float(g(xp, u))
    t0 = time.perf_counter()
    float(g(xp, u))
    dt = (time.perf_counter() - t0) / iters
    ncells = (B // ipc) * rgroups
    flops = 2 * 16 * B * th_p * tw * c * f
    print(f"{stage:10s}: {dt*1e3:8.3f} ms  ({dt/ncells*1e6:6.2f} us/cell, "
          f"{ncells} cells, eff {flops/dt/1e12:6.1f} TF/s)")
    return dt


if __name__ == "__main__":
    B, h, w, c, f = 256, 90, 120, 128, 128
    trows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ipc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(f"conv2_2 shape B={B} {h}x{w} {c}->{f}, trows={trows}, ipc={ipc}")
    for stage in ("dma", "transform", "matmul", "full"):
        run(stage, B, h, w, c, f, trows, ipc)
