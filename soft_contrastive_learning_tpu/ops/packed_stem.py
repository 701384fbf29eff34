"""Packed-width rewrite of the VGG16 stem (block1 + pool), exact.

Why: block1's 64-channel 3x3 convs use only half the MXU's 128 lanes — the
measured rates on v5e are ~7 TF/s (conv1_1) and ~75 TF/s (conv1_2) against
145-175 TF/s for the 128+-channel blocks. Packing adjacent width pixels into
the channel dimension makes both the contraction (2*C_in per tap) and the
output (2*C_out) MXU-aligned: the packed conv runs at ~158 TF/s for 4/3 of
the FLOPs, a ~1.5x net win, and the 2x2 max-pool collapses into a cheap
packed-layout max with no unpacking.

The transform is algebraically exact (fp32): a SAME 3x3 stride-1 conv on
(H, W, C) equals a VALID (3, 2) conv on the shifted width-packed tensor

    X'[h, w', pin*C + c] = Xpad[h, 2*w' + pin, c],   Xpad = zero-pad W by 1+1

with the packed kernel

    K'[dh, dwp, pin*C + c, pout*F + f] = K[dh, dw+1, c, f]
        where dw = 2*dwp + pin - pout - 1, zero when |dw| > 1.

Parameters keep the standard (3, 3, C, F) layout — packing happens at apply
time — so checkpoints are unaffected. Verified element-exact against the
naive path in tests/test_packed_stem.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) -> (3, 2, 2C, 2F) packed kernel (zeros outside the 3x3)."""
    kh, kw, c, f = k.shape
    assert (kh, kw) == (3, 3)
    kp = jnp.zeros((3, 2, 2 * c, 2 * f), k.dtype)
    for pout in (0, 1):
        for dwp in (0, 1):
            for pin in (0, 1):
                dw = 2 * dwp + pin - pout - 1
                if -1 <= dw <= 1:
                    kp = kp.at[
                        :, dwp, pin * c : (pin + 1) * c, pout * f : (pout + 1) * f
                    ].set(k[:, dw + 1])
    return kp


def pack_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H+2, W/2+1, 2C) shifted width-packing with SAME
    height padding baked in (the packed conv then runs VALID)."""
    b, h, w, c = x.shape
    assert w % 2 == 0
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xpad.reshape(b, h + 2, (w + 2) // 2, 2 * c)


def repack_shifted(yp: jnp.ndarray) -> jnp.ndarray:
    """Packed conv output (B, H, W/2, 2F) -> the next conv's shifted packed
    input (B, H+2, W/2+1, 2F): channel half 0 = previous unpacked column
    (phase-1 shifted right by one packed col), half 1 = current column."""
    f2 = yp.shape[-1]
    f = f2 // 2
    prev_col = jnp.pad(yp[..., f:], ((0, 0), (1, 1), (1, 0), (0, 0)))
    cur_col = jnp.pad(yp[..., :f], ((0, 0), (1, 1), (0, 1), (0, 0)))
    return jnp.concatenate([prev_col, cur_col], axis=-1)


def packed_conv(xp: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """VALID (3, 2) conv of a packed input with a standard (3, 3, C, F)
    kernel -> packed (B, H, W/2, 2F) output."""
    kp = pack_kernel(k)
    yp = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f = k.shape[-1]
    return yp + jnp.concatenate([b, b]).astype(yp.dtype)


def packed_maxpool(yp: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max-pool directly in packed layout:
    (B, H, W/2, 2F) -> (B, H/2, W/2, F). Width pairs are the two phase
    halves; height pairs are adjacent rows. Dtype-agnostic (used on fp32
    and on requantized int8, where max commutes with the monotone
    quantization)."""
    f = yp.shape[-1] // 2
    m = jnp.maximum(yp[..., :f], yp[..., f:])  # over width phases
    return jnp.maximum(m[:, 0::2], m[:, 1::2])  # over height pairs


def packed_maxpool_relu(yp: jnp.ndarray) -> jnp.ndarray:
    """packed_maxpool + ReLU (the float stem's block-boundary order)."""
    return jax.nn.relu(packed_maxpool(yp))


def unpack_width(yp: jnp.ndarray) -> jnp.ndarray:
    """Packed conv output -> standard layout: (B, H, W/2, 2F) -> (B, H, W, F).

    packed_conv's output satisfies Y'[h, w', pout*F + f] = Y[h, 2w'+pout, f]
    (pout-major channels), so the unpack is a plain contiguous reshape."""
    b, h, wp, f2 = yp.shape
    return yp.reshape(b, h, wp, 2, f2 // 2).reshape(b, h, wp * 2, f2 // 2)


def packed_stem_block(
    x: jnp.ndarray,  # (B, H, W, 3) raw input (mean already subtracted)
    k1: jnp.ndarray, b1: jnp.ndarray,  # conv1_1 (3,3,3,64)
    k2: jnp.ndarray, b2: jnp.ndarray,  # conv1_2 (3,3,64,64)
) -> jnp.ndarray:
    """conv1_1 -> ReLU -> conv1_2 -> maxpool 2x2 -> ReLU, fully packed.
    Matches VGG16 block1 + its trailing pool/relu exactly."""
    y1 = jax.nn.relu(packed_conv(pack_input(x), k1, b1))
    y2 = packed_conv(repack_shifted(y1), k2, b2)
    return packed_maxpool_relu(y2)
