"""wms fused-kernel vs XLA at large batch (round-3 VERDICT #9).

Round 2 measured the fused wms kernel within noise of the XLA formulation
at the reference's B=50 (perf/_wms.log) — the (50,50) intermediates are
invisible next to the backbone. The kernel's claimed value is the
large-batch regime where the (B,B) similarity/weight matrices and their
logsumexp intermediates actually stress HBM. This probe measures that
claim directly on the loss in isolation (no backbone), forward-only and
forward+grad, B in {256..4096}, D=512 (the reduced descriptor the loss
sees in the flagship config).

Note the fused path is forward-fused only: its custom_vjp backward
re-derives grads from the XLA formulation (wms_kernel.py::_fused_bwd), so
for training (fwd+grad) the fused path does strictly more FLOPs and can
only win if the Pallas forward saves enough HBM traffic. Forward-only is
the serving/eval-shaped question.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python perf/wms_largebatch.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.losses.ms import wms_loss
from soft_contrastive_learning_tpu.ops.pallas.wms_kernel import wms_loss_fused

D_ALPHA, D_BETA = 0.8, 15.0


def timeit(fn, args, iters):
    float(jnp.asarray(fn(*args)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def make_inputs(b, d):
    rng = np.random.default_rng(0)
    xy = rng.random((b, 2)) * 400.0
    geo = jnp.asarray(
        np.linalg.norm(xy[:, None] - xy[None, :], axis=-1), jnp.float32
    )
    emb = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    return geo, emb


def chain(loss_fn, iters, grad):
    """Repeat the loss with a data dependency to amortize dispatch floors."""
    val = jax.value_and_grad(loss_fn, argnums=1) if grad else loss_fn

    def many(geo, emb):
        def body(c, _):
            if grad:
                l, g = val(geo, emb + (c * 1e-30).astype(emb.dtype))
                return l + g[0, 0] * 0.0, ()
            return val(geo, emb + (c * 1e-30).astype(emb.dtype)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    return jax.jit(many)


def main():
    print("backend", jax.default_backend(), flush=True)
    iters = 32
    for b in (256, 512, 1024, 2048, 4096):
        geo, emb = make_inputs(b, 512)
        xla = lambda g, e: wms_loss(g, e, D_ALPHA, D_BETA)
        fused = lambda g, e: wms_loss_fused(g, e, D_ALPHA, D_BETA)
        for grad in (False, True):
            tag = "fwd+grad" if grad else "fwd     "
            row = [f"B={b:5d} {tag}:"]
            for name, fn in (("xla", xla), ("fused", fused)):
                try:
                    dt = timeit(chain(fn, iters, grad), (geo, emb), iters)
                    row.append(f"{name} {dt*1e6:9.1f} us")
                except Exception as e:
                    row.append(f"{name} FAIL({type(e).__name__}:{str(e)[:60]})")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
