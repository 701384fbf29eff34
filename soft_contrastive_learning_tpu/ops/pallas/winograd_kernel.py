"""Fused Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

The production implementation of ops/winograd.py's algorithm (see that
module's docstring for the roofline argument): each grid cell DMAs a strip
of input rows into VMEM once, computes the input transform (pure VPU
adds), runs the 16 Winograd-domain matmuls on the MXU, applies the inverse
transform + bias (+ReLU) in VMEM, and writes only the finished output tile
back to HBM. Activation HBM traffic therefore equals a direct
convolution's while the MXU does 4/9 of the multiplies (16 per 2x2 output
tile vs 36).

Schedule (informed by perf/winograd_ablate.py on the real chip):

* 1-D grid over cells (a cell = ``ipc`` images x ``trows`` tile-rows, full
  width). The transformed filter U (16, C, F) — at most 8 MB for VGG's
  512x512 layers — is VMEM-resident with a constant index_map, so it is
  fetched from HBM once, not per cell (a per-cell refetch costs more HBM
  traffic than the activations themselves for the late layers).
* the full C dimension is kept per cell, so each of the 16 position
  matmuls runs with K = C (128-512): one large MXU op per position.
* input strips overlap between row-neighbors (the 3x3 halo), which
  BlockSpecs cannot express — the input stays in ANY/HBM and each cell
  issues an explicit async copy, double-buffered across cells (slot i%2,
  prefetch of cell i+1 issued before cell i's compute).
* stride-2 tile decimation is layout-hostile on TPU (1D gathers); instead
  rows/cols are split into (half, 2) via reshape — Mosaic handles
  sublane-splitting reshapes natively — and the 16 (a, b) tile phases are
  static slices. Transforms run in bf16 (the matmul operands are bf16
  regardless; only the 0/±1-coefficient sums round differently).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soft_contrastive_learning_tpu.ops.winograd import weight_transform


def _winograd_kernel(
    u_ref,  # (16, C, F) transformed weights, bf16, VMEM-resident
    bias_ref,  # (1, F) f32
    x_hbm,  # (B, Hp, Wp8, C) padded input, ANY/HBM
    out_ref,  # (ipc, 2*trows, 2*tw, F)
    x_vmem,  # scratch (2, ipc, 2*trows+2, Wp8, C) double-buffered strips
    v_scr,  # scratch (16, P, C) bf16
    macc,  # scratch (16, P, F) f32
    sem,  # DMA semaphores (2,)
    *,
    ipc: int,
    trows: int,
    tw: int,
    rgroups: int,
    c: int,
    relu: bool,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = 2 * trows + 2

    def strip_dma(cell, slot):
        g = (cell // rgroups) * ipc
        r0 = 2 * (cell % rgroups) * trows
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(g, ipc), pl.ds(r0, rows), :, :],
            x_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        strip_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        strip_dma(i + 1, (i + 1) % 2).start()

    strip_dma(i, i % 2).wait()
    x = x_vmem[i % 2]
    wp = x.shape[2]
    # (ipc, trows+1, 2, tw+1, 2, C): row/col phase split (no data movement).
    xr = x.reshape(ipc, trows + 1, 2, wp // 2, 2, c)

    def dab(a: int, b: int):
        return xr[
            :, a // 2 : a // 2 + trows, a % 2, b // 2 : b // 2 + tw, b % 2, :
        ]

    p = ipc * trows * tw
    # Input transform: rows then cols, all 0/±1 combinations (VPU adds),
    # written straight into the V scratch (no 16-way stack temporary).
    rowt = []
    for b in range(4):
        d0, d1, d2, d3 = dab(0, b), dab(1, b), dab(2, b), dab(3, b)
        rowt.append((d0 - d2, d1 + d2, d2 - d1, d1 - d3))
    for a in range(4):
        t0, t1, t2, t3 = (rowt[b][a] for b in range(4))
        for bi, col in enumerate((t0 - t2, t1 + t2, t2 - t1, t1 - t3)):
            v_scr[4 * a + bi] = col.reshape(p, c)

    macc[:] = jax.lax.dot_general(
        v_scr[:],
        u_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (16, P, F)

    f = out_ref.shape[-1]
    mm = macc[:].reshape(4, 4, ipc, trows, tw, f)
    t0 = mm[0] + mm[1] + mm[2]
    t1 = mm[1] - mm[2] - mm[3]
    y00 = t0[0] + t0[1] + t0[2]
    y01 = t0[1] - t0[2] - t0[3]
    y10 = t1[0] + t1[1] + t1[2]
    y11 = t1[1] - t1[2] - t1[3]
    # interleave cols then rows: out[g, 2r+a, 2j+b] = y_ab[g, r, j]
    row0 = jnp.stack([y00, y01], axis=3).reshape(ipc, trows, 2 * tw, f)
    row1 = jnp.stack([y10, y11], axis=3).reshape(ipc, trows, 2 * tw, f)
    y = jnp.stack([row0, row1], axis=2).reshape(ipc, 2 * trows, 2 * tw, f)
    y = y + bias_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _plan(b: int, h: int, w: int, f: int) -> Tuple[int, int, int, int]:
    """Pick (ipc, trows, th_padded, tw). Tiles per cell are bounded so the
    f32 (16, P, F) accumulator stays <= ~4 MB of VMEM."""
    th, tw = -(-h // 2), -(-w // 2)
    max_tiles = max(64, 4_000_000 // (64 * f))
    trows = max(1, min(max_tiles // tw, th))
    # Avoid padding waste: shrink trows until padding adds <= 25% dead rows.
    while trows > 1 and (-(-th // trows) * trows - th) * 4 > th:
        trows -= 1
    th_p = -(-th // trows) * trows
    per_img = trows * tw
    ipc = max(1, min(b, max_tiles // per_img))
    while b % ipc:
        ipc -= 1
    return ipc, trows, th_p, tw


@functools.partial(
    jax.jit, static_argnames=("relu", "out_dtype", "interpret")
)
def winograd_conv_pallas(
    x: jnp.ndarray,  # (B, H, W, C)
    k: jnp.ndarray,  # (3, 3, C, F)
    bias: jnp.ndarray,  # (F,)
    *,
    relu: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv (+bias, optional fused ReLU) via the fused
    Winograd kernel. Matches jax.lax.conv_general_dilated 'SAME' up to
    bf16-matmul rounding; any H, W (odd sizes padded internally)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    f = k.shape[-1]
    # Mosaic requires lane-aligned (128) extents on the manually-DMA'd input;
    # sub-128-channel layers (conv1_1/conv1_2) stay on the direct-conv path —
    # conv1_2 is ~40% HBM-bound anyway, so Winograd buys little there.
    assert c % 128 == 0, f"winograd kernel requires C % 128 == 0, got {c}"
    out_dtype = out_dtype or x.dtype
    ipc, trows, th_p, tw = _plan(b, h, w, f)
    rgroups = th_p // trows

    # Width padded to a multiple of 8: sliced DMA requires sublane-aligned
    # (8) extents; the extra columns are dead weight the kernel never reads.
    wp8 = -(-(2 * tw + 2) // 8) * 8
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 2 * th_p - h + 1), (1, wp8 - w - 1), (0, 0)),
    )
    u = weight_transform(k).reshape(16, c, f).astype(jnp.bfloat16)
    bias2 = bias.reshape(1, f).astype(jnp.float32)

    p = ipc * trows * tw
    grid = ((b // ipc) * rgroups,)

    out = pl.pallas_call(
        functools.partial(
            _winograd_kernel,
            ipc=ipc,
            trows=trows,
            tw=tw,
            rgroups=rgroups,
            c=c,
            relu=relu,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, c, f), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (ipc, 2 * trows, 2 * tw, f),
            lambda i: (i // rgroups, i % rgroups, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * th_p, 2 * tw, f), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ipc, 2 * trows + 2, xp.shape[2], c), jnp.bfloat16),
            pltpu.VMEM((16, p, c), jnp.bfloat16),
            pltpu.VMEM((16, p, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * b * (th_p * tw) * c * f,
            bytes_accessed=2 * (b * h * w * c + b * h * w * f) + 2 * 16 * c * f,
            transcendentals=0,
        ),
        interpret=interpret,
    )(u, bias2, xp)
    return out[:, :h, :w, :]


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas Winograd forward, XLA direct-conv backward
# (same pattern as the fused NetVLAD/wms kernels — the backward re-derives
# gradients from the mathematically equivalent direct convolution, so the op
# is usable inside value_and_grad; training backward keeps XLA's fused conv
# transpose kernels).
# ---------------------------------------------------------------------------


def _direct_conv_ref(x, k, bias, relu):
    # No preferred_element_type: keeping the output in the compute dtype
    # keeps the vjp's transpose convs dtype-consistent (TPU convs accumulate
    # f32 internally regardless).
    y = jax.lax.conv_general_dilated(
        x,
        k,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(x.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), x.dtype))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def winograd_conv(x, k, bias, relu=False):
    """SAME 3x3 conv (+bias, optional ReLU): fused Winograd kernel forward,
    direct-conv gradients backward. Output dtype == x.dtype."""
    return winograd_conv_pallas(x, k, bias, relu=relu, out_dtype=x.dtype)


def _winograd_fwd(x, k, bias, relu):
    return winograd_conv(x, k, bias, relu), (x, k, bias)


def _winograd_bwd(relu, res, g):
    x, k, bias = res
    # vjp of the direct formulation with both conv operands in the compute
    # dtype (the backward convs then run bf16 on the MXU); the kernel/bias
    # cotangents are cast back to the parameter dtype.
    _, vjp = jax.vjp(
        lambda xx, kk, bb: _direct_conv_ref(xx, kk, bb, relu),
        x,
        k.astype(x.dtype),
        bias,
    )
    dx, dk, db = vjp(g.astype(x.dtype))
    return dx, dk.astype(k.dtype), db.astype(bias.dtype)


winograd_conv.defvjp(_winograd_fwd, _winograd_bwd)
