"""Per-layer timing of the int8 quantized VGG stack (find the 10k gap).

perf/_quant_push.log has the full quantized embed at ~9.55k img/s
(104 us/img). Round-2's bf16 stem probe (perf/_stem.log) measured conv1_1
at 8.3 TF/s (18 us/img) — padding-bound on the 3-channel input — which, if
it carries over to int8, is most of the remaining 10k gap by itself. This
probe times successive PREFIXES of quantized_conv_stack (layer i's cost =
prefix[i] - prefix[i-1]; avoids per-layer dispatch floors) plus the
NetVLAD tail, at serving batch.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_layers.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import init_params
from soft_contrastive_learning_tpu.models.quant import (
    CONV_NAMES, calibrate_scales, quantized_embed,
)
from soft_contrastive_learning_tpu.models.vgg16 import _VGG_BLOCKS
from soft_contrastive_learning_tpu.models.quant import (  # noqa: E501
    _gray_to_rgb, _quantize_weight, _requant,
)

BS = 1024
ITERS = 20

# FLOPs per image per conv (fp32-conv convention, mul+add), at 180x240 input
def conv_flops():
    h, w = 180, 240
    cin = 3
    out = {}
    for bi, specs in enumerate(_VGG_BLOCKS):
        for (name, cout, _) in specs:
            out[f"block{bi + 1}/{name}"] = h * w * cin * cout * 9 * 2
            cin = cout
        h, w = h // 2, w // 2
    return out


def prefix_stack(vgg_params, scales, images, n_layers):
    """First n_layers convs of quantized_conv_stack (same fusion layout)."""
    a = _gray_to_rgb(images.astype(jnp.float32))
    a = a - vgg_params["average_rgb"].astype(jnp.float32)
    a8 = _requant(a, scales[CONV_NAMES[0]])
    idx = 0
    y = None
    for bi, specs in enumerate(_VGG_BLOCKS):
        blk = vgg_params[f"block{bi + 1}"]
        for si, (name, _, relu) in enumerate(specs):
            if idx == n_layers:
                # scalar reduce INSIDE the prefix: returning the activation
                # itself forces a full-res f32 materialization (OOMs at
                # bs=1024 on the early layers)
                return jnp.max(a8).astype(jnp.float32)
            k8, sk = _quantize_weight(blk[name]["kernel"].astype(jnp.float32))
            bias = blk[name]["bias"].astype(jnp.float32)
            s_in = scales[CONV_NAMES[idx]]
            y32 = jax.lax.conv_general_dilated(
                a8, k8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y32.astype(jnp.float32) * (s_in * sk) + bias
            if relu:
                y = jax.nn.relu(y)
            if idx < len(CONV_NAMES) - 1:
                s_next = scales[CONV_NAMES[idx + 1]]
                if si == len(specs) - 1:
                    y8 = _requant(jax.nn.relu(y), s_next)
                    a8 = jax.lax.reduce_window(
                        y8, jnp.int8(-128), jax.lax.max,
                        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
                    )
                else:
                    a8 = _requant(y, s_next)
            idx += 1
    return jnp.max(y).astype(jnp.float32)


def timeit_scan(fn, args):
    def many(*a):
        def body(c, _):
            # fn must return a SCALAR (keeps the carried state tiny and
            # avoids materializing full activations across scan iterations)
            r = fn(*a[:-1], a[-1] + (c * 1e-30).astype(a[-1].dtype))
            return r.astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    f = jax.jit(many)
    float(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    print("backend", jax.default_backend(), flush=True)
    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=True)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((8, 180, 240, 3), np.float32) * 255.0)
    scales = calibrate_scales(params, calib)
    x = jnp.asarray(rng.random((BS, 180, 240, 3), np.float32) * 255.0)
    flops = conv_flops()

    prev = 0.0
    for n in range(len(CONV_NAMES) + 1):
        dt = timeit_scan(
            lambda p, im, n=n: prefix_stack(p["vgg16"], scales, im, n),
            (params, x),
        )
        if n > 0:
            layer = CONV_NAMES[n - 1]
            d = (dt - prev) / BS
            tf = flops[layer] / max(d, 1e-12) / 1e12
            print(f"{layer:20s}: {d * 1e6:7.2f} us/img  ({tf:6.1f} TOP/s eff)",
                  flush=True)
        else:
            print(f"input+requant       : {dt / BS * 1e6:7.2f} us/img", flush=True)
        prev = dt

    full = timeit_scan(
        lambda p, im: quantized_embed(cfg, p, scales, im)[0][0, 0],
        (params, x),
    )
    print(f"full embed          : {full / BS * 1e6:7.2f} us/img "
          f"({BS / full:7.1f} img/s)", flush=True)
    print(f"head (full - convs) : {(full - prev) / BS * 1e6:7.2f} us/img",
          flush=True)


if __name__ == "__main__":
    main()
