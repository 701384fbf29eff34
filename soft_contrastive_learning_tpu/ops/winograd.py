"""Winograd F(2x2, 3x3) convolution — the algorithmic route past the MXU
roofline for the VGG16 stack.

Why: the flagship forward is 26.97 GFLOP/image of 3x3 SAME convs
(reference model/nets.py:72-131). The 10k img/s/chip north star needs a
sustained 270 TF/s, above this chip's measured bf16 MXU rate (~143-175 TF/s,
perf/roofline.py) AND above its realized int8 rate (~161 TOP/s) — no direct
convolution schedule can reach it. Winograd F(2x2, 3x3) computes each 2x2
output tile with 16 multiplies instead of 36 (2.25x fewer MXU FLOPs):

    Y = A^T [ (G g G^T) .o. (B^T d B) ] A            (Lavin & Gray, 2015)

with the 16 elementwise products over channels realized as 16 independent
(tiles, C) @ (C, F) matmuls — exactly the large, batched, MXU-shaped work
XLA and Pallas want.

This module has two implementations sharing the same transform math:

* ``winograd_conv`` — pure-XLA reference (correctness anchor + CPU path).
  Materializes the transformed tensors in HBM, so it trades the FLOP
  reduction for ~4x activation traffic: correct everywhere, fast nowhere.
* ``ops/pallas/winograd_kernel.py`` — the production TPU kernel: input
  tiles are DMA'd to VMEM once, both transforms and the 16 matmuls happen
  in VMEM, and only the final output tile is written back — direct-conv
  HBM traffic at 4/9 of the MXU work.

Numerics: transform matrices for F(2x2, 3x3) are exact in binary floating
point (entries 0, ±1, ±1/2), so the fp32 path is bit-comparable to direct
convolution up to reassociation; the bf16 path rounds the transformed
values instead of the raw values (validated against direct bf16 conv by
descriptor parity in tests).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# F(2x2, 3x3) transform matrices (exact in fp32).
G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)
BT = np.array(
    [
        [1.0, 0.0, -1.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, -1.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, -1.0],
    ],
    np.float32,
)
AT = np.array([[1.0, 1.0, 1.0, 0.0], [0.0, 1.0, -1.0, -1.0]], np.float32)


def weight_transform(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) conv kernel -> (4, 4, C, F) Winograd-domain filter
    U[a, b] = sum_ij G[a, i] G[b, j] k[i, j] (computed in fp32; exact)."""
    k32 = k.astype(jnp.float32)
    u = jnp.einsum("ai,bj,ijcf->abcf", G, G, k32)
    return u


def _input_transform(d: jnp.ndarray) -> jnp.ndarray:
    """B^T d B over the leading two 4x4 tile axes; d: (4, 4, ...). Written as
    adds/subs only (all BT entries are 0/±1) so it lowers to pure VPU work."""
    # rows: t[a] = BT[a, :] . d[:, b]
    t0 = d[0] - d[2]
    t1 = d[1] + d[2]
    t2 = d[2] - d[1]
    t3 = d[1] - d[3]
    rows = [t0, t1, t2, t3]
    out = []
    for t in rows:
        out.append(
            jnp.stack([t[0] - t[2], t[1] + t[2], t[2] - t[1], t[1] - t[3]])
        )
    return jnp.stack(out)  # (4, 4, ...)


def _output_transform(m: jnp.ndarray) -> jnp.ndarray:
    """A^T m A over the leading two 4x4 axes; m: (4, 4, ...) -> (2, 2, ...)."""
    t0 = m[0] + m[1] + m[2]
    t1 = m[1] - m[2] - m[3]
    return jnp.stack(
        [
            jnp.stack([t0[0] + t0[1] + t0[2], t0[1] - t0[2] - t0[3]]),
            jnp.stack([t1[0] + t1[1] + t1[2], t1[1] - t1[2] - t1[3]]),
        ]
    )


def winograd_conv(
    x: jnp.ndarray,  # (B, H, W, C)
    k: jnp.ndarray,  # (3, 3, C, F)
    bias: jnp.ndarray | None = None,  # (F,)
    *,
    matmul_dtype=jnp.float32,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv via Winograd F(2x2, 3x3) — XLA reference
    implementation. Matches jax.lax.conv_general_dilated(..., 'SAME') for
    any H, W (odd sizes are padded up to full tiles and cropped)."""
    b, h, w, c = x.shape
    f = k.shape[-1]
    th, tw = -(-h // 2), -(-w // 2)  # ceil: tiles of 2x2 outputs
    # SAME halo (1 px) + bottom/right pad to full tiles.
    xp = jnp.pad(x, ((0, 0), (1, 2 * th - h + 1), (1, 2 * tw - w + 1), (0, 0)))

    # d[a, b, n, i, j, c] = xp[n, 2i + a, 2j + b, c]: stride-2 shifted views.
    d = jnp.stack(
        [
            jnp.stack(
                [
                    jax.lax.slice(
                        xp,
                        (0, a, bb, 0),
                        (b, a + 2 * th - 1, bb + 2 * tw - 1, c),
                        (1, 2, 2, 1),
                    )
                    for bb in range(4)
                ]
            )
            for a in range(4)
        ]
    )  # (4, 4, B, th, tw, C)

    v = _input_transform(d.astype(jnp.float32))  # (4, 4, B, th, tw, C)
    u = weight_transform(k)  # (4, 4, C, F)

    vm = v.reshape(16, b * th * tw, c).astype(matmul_dtype)
    um = u.reshape(16, c, f).astype(matmul_dtype)
    m = jax.lax.dot_general(
        vm,
        um,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (16, B*th*tw, F)

    y = _output_transform(m.reshape(4, 4, b, th, tw, f))  # (2, 2, B, th, tw, F)
    # interleave tile outputs back to the image grid
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * th, 2 * tw, f)
    y = y[:, :h, :w, :]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
