"""Loss-zoo tests: closed-form micro-examples, numpy cross-checks, gradient
finiteness for every registered loss (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import LossConfig, TrainConfig, TupleConfig
from soft_contrastive_learning_tpu.losses import ms as ms_losses
from soft_contrastive_learning_tpu.losses import pointnetvlad as pnv
from soft_contrastive_learning_tpu.losses import spectral as spec
from soft_contrastive_learning_tpu.losses.distance import (
    distance_loss,
    huber,
    huber_distance_loss,
    logratio_loss,
    pairwise_distance_loss,
)
from soft_contrastive_learning_tpu.losses.incremental import PCAState, incremental_s
from soft_contrastive_learning_tpu.losses.registry import (
    LOSS_NAMES,
    LossResult,
    build_loss,
    split_batch,
)
from soft_contrastive_learning_tpu.ops.distances import (
    cross_sq_dists,
    pairwise_sq_dists,
)
from soft_contrastive_learning_tpu.ops.spectral import (
    stable_prod,
    svdvals_descending,
    top_svdvals,
)

T, P, N, D = 2, 3, 4, 8


# ------------------------------------------------------------------ distances
def test_pairwise_sq_dists_reference_smoke():
    # The reference's only inline numeric check (model/losses.py:706-714).
    c = jnp.asarray([[[1.0, 1], [2, 2], [3, 3]], [[1, 1], [2, 2], [4, 4]]])
    d = pairwise_sq_dists(c)
    want0 = [[0, 2, 8], [2, 0, 2], [8, 2, 0]]
    want1 = [[0, 2, 18], [2, 0, 8], [18, 8, 0]]
    np.testing.assert_allclose(np.asarray(d[0]), want0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d[1]), want1, atol=1e-5)


def test_cross_sq_dists_matches_numpy(rng):
    q = rng.standard_normal((5, 6)).astype(np.float32)
    r = rng.standard_normal((7, 6)).astype(np.float32)
    got = np.asarray(cross_sq_dists(jnp.asarray(q), jnp.asarray(r)))
    want = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


# ------------------------------------------------------------------ spectral ops
def test_svdvals_match_numpy(rng):
    x = rng.standard_normal((3, 5, 12)).astype(np.float32)
    got = np.asarray(svdvals_descending(jnp.asarray(x)))
    want = np.linalg.svd(x, compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    # wide case (M > D)
    x = rng.standard_normal((2, 12, 5)).astype(np.float32)
    got = np.asarray(svdvals_descending(jnp.asarray(x)))
    want = np.linalg.svd(x, compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_svdvals_gradient_finite_at_degenerate():
    # Duplicate rows => repeated singular values; gradient must stay finite.
    x = jnp.ones((1, 4, 6))
    g = jax.grad(lambda a: jnp.sum(top_svdvals(a, 3)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_stable_prod():
    # Direct fp32 product underflows the 1e-60 intermediate to 0; the
    # log-space evaluation recovers the representable final value 1e-22.
    v = jnp.asarray([1e-30, 1e-30, 1e38], jnp.float32)
    np.testing.assert_allclose(float(stable_prod(v)), 1e-22, rtol=1e-3)
    v = jnp.asarray([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(stable_prod(v)), 24.0, rtol=1e-4)


# ------------------------------------------------------------------ pointnetvlad
def _simple_tuple():
    # 1 tuple, 2 positives, 2 negatives, 2-D embeddings with known distances.
    anchor = jnp.asarray([[[0.0, 0.0]]])
    pos = jnp.asarray([[[1.0, 0.0], [0.0, 2.0]]])  # sq dists 1, 4
    neg = jnp.asarray([[[3.0, 0.0], [0.0, 1.0]]])  # sq dists 9, 1
    return anchor, pos, neg


def test_triplet_closed_form():
    a, p, n = _simple_tuple()
    # best_pos = 1; hinges: max(0, 0.5+1-9)=0, max(0, 0.5+1-1)=0.5; sum=0.5
    got = pnv.triplet_loss(a, p, n, margin=0.5)
    np.testing.assert_allclose(float(got), 0.5, atol=1e-6)
    # lazy: max over hinges = 0.5
    got = pnv.lazy_triplet_loss(a, p, n, margin=0.5)
    np.testing.assert_allclose(float(got), 0.5, atol=1e-6)
    # evil: worst_pos = 4; hinges: max(0, .5+4-9)=0, max(0, .5+4-1)=3.5; sum
    got = pnv.evil_triplet_loss(a, p, n, margin=0.5)
    np.testing.assert_allclose(float(got), 3.5, atol=1e-6)


def test_quadruplet_closed_form():
    a, p, n = _simple_tuple()
    other = jnp.asarray([[[0.0, -1.0]]])
    # d(neg, other): (3,0)-(0,-1) => 9+1=10 ; (0,1)-(0,-1) => 4
    # second (sum): max(0, .2+1-10)=0 + max(0, .2+1-4)=0 => 0
    got = pnv.quadruplet_loss(a, p, n, other, 0.5, 0.2)
    np.testing.assert_allclose(float(got), 0.5, atol=1e-6)
    # larger margin2: hinges .2+1-10<0 -> 0 and 3.2+1-4=0.2 => second=0.2
    got = pnv.quadruplet_loss(a, p, n, other, 0.5, 3.2)
    np.testing.assert_allclose(float(got), 0.7, atol=1e-5)


# ------------------------------------------------------------------ distance family
def test_distance_loss_closed_form():
    a, p, _ = _simple_tuple()
    sq_geo = jnp.asarray([[4.0, 16.0]])
    # scaled geo: 4/16=.25, 16/16=1 ; scaled feat: 1/2=.5, 4/2=2
    # sq diffs: .0625, 1 -> mean .53125
    got = distance_loss(a, p, sq_geo, d_max_squared=16.0, f_max_squared=2.0)
    np.testing.assert_allclose(float(got), 0.53125, atol=1e-6)


def test_huber():
    r = jnp.asarray([0.5, -2.0])
    np.testing.assert_allclose(np.asarray(huber(r)), [0.125, 1.5], atol=1e-6)
    a, p, _ = _simple_tuple()
    sq_geo = jnp.asarray([[4.0, 16.0]])
    got = huber_distance_loss(a, p, sq_geo, 16.0, 2.0)
    # residuals: .25, 1.0 -> huber: .03125, .5 -> mean .265625
    np.testing.assert_allclose(float(got), 0.265625, atol=1e-6)


def test_pairwise_distance_loss_shapes(rng):
    a = jnp.asarray(rng.standard_normal((T, 1, D)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((T, P, D)), jnp.float32)
    geo = jnp.abs(jnp.asarray(rng.standard_normal((T, P + 1, P + 1)), jnp.float32))
    out = pairwise_distance_loss(a, p, geo, 225.0, 2.0)
    assert out.shape == ()
    assert bool(jnp.isfinite(out))


def test_logratio_matches_manual(rng):
    a = jnp.asarray(rng.standard_normal((1, 1, 4)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((1, 2, 4)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((1, 2, 4)), jnp.float32)
    gp = jnp.asarray([[1.0, 4.0]])
    gn = jnp.asarray([[9.0, 16.0]])
    got = float(logratio_loss(a, p, n, gp, gn))
    fp = ((np.asarray(p) - np.asarray(a)) ** 2).sum(-1)[0]
    fn_ = ((np.asarray(n) - np.asarray(a)) ** 2).sum(-1)[0]
    acc = []
    for i in range(2):
        for j in range(2):
            fr = np.log(fp[i] + 1e-12) - np.log(fn_[j] + 1e-12)
            dr = np.log([1.0, 4.0][i] + 1e-12) - np.log([9.0, 16.0][j] + 1e-12)
            acc.append((fr - dr) ** 2)
    np.testing.assert_allclose(got, np.mean(acc), rtol=1e-4)


# ------------------------------------------------------------------ spectral losses
def test_residual_det_matches_numpy(rng):
    a = rng.standard_normal((T, 1, D)).astype(np.float32)
    p = rng.standard_normal((T, P, D)).astype(np.float32)
    n = rng.standard_normal((T, N, D)).astype(np.float32)
    got = float(spec.residual_det_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 0.1, 3))
    ps = np.linalg.svd(p - a, compute_uv=False)[:, :3]
    ns = np.linalg.svd(n - a, compute_uv=False)[:, :3]
    want = np.mean(ps.prod(1) - ns.prod(1) + 0.1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_residual_trace_matches_numpy(rng):
    a = rng.standard_normal((T, 1, D)).astype(np.float32)
    p = rng.standard_normal((T, P, D)).astype(np.float32)
    n = rng.standard_normal((T, N, D)).astype(np.float32)
    got = float(spec.residual_trace_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 0.1, 3))
    ps = np.linalg.svd(p - a, compute_uv=False)[:, :3]
    ns = np.linalg.svd(n - a, compute_uv=False)[:, :3]
    want = np.mean(ps.sum(1) - ns.sum(1) + 0.1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_wrd_matches_numpy(rng):
    a = rng.standard_normal((T, 1, D)).astype(np.float32)
    p = rng.standard_normal((T, P, D)).astype(np.float32)
    n = rng.standard_normal((T, N, D)).astype(np.float32)
    pw = rng.random((T, P + N, 1)).astype(np.float32)
    nw = rng.random((T, P + N, 1)).astype(np.float32)
    got = float(
        spec.wrd_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                      jnp.asarray(pw), jnp.asarray(nw), 0.1, 3)
    )
    allres = np.concatenate([p - a, n - a], axis=1)
    ps = np.linalg.svd(allres * pw, compute_uv=False)[:, :3]
    ns = np.linalg.svd(allres * nw, compute_uv=False)[:, :3]
    want = np.mean(ps.prod(1) - ns.prod(1) + 0.1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_swrd_matches_numpy(rng):
    a = rng.standard_normal((T, 1, D)).astype(np.float32)
    p = rng.standard_normal((T, P, D)).astype(np.float32)
    n = rng.standard_normal((T, N, D)).astype(np.float32)
    pw = rng.random((T, P, 1)).astype(np.float32)
    nw = rng.random((T, N, 1)).astype(np.float32)
    got = float(
        spec.swrd_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                       jnp.asarray(pw), jnp.asarray(nw), 0.1, 3)
    )
    ps = np.linalg.svd((p - a) * pw, compute_uv=False)[:, :3]
    ns = np.linalg.svd((n - a) * nw, compute_uv=False)[:, :3]
    want = np.mean(ps.prod(1) - ns.prod(1) + 0.1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_ntuplet_and_eigen_losses(rng):
    a = jnp.asarray(rng.standard_normal((T, 1, D)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((T, P, D)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((T, N, D)), jnp.float32)
    for fn in (
        lambda: spec.ntuplet_evmm_loss(a, p, n, 0.1),
        lambda: spec.ntuplet_trace_loss(a, p, n, 0.1),
        lambda: spec.neg_eigenvalue_loss(a, n),
    ):
        v = fn()
        assert v.shape == () and bool(jnp.isfinite(v))
    # trace identity: tr(XX^T) = sum of squares
    pos = np.concatenate([a, p], axis=1)
    want = np.mean(
        np.maximum(
            0.1
            + (np.asarray(pos) ** 2).sum((1, 2))
            - (np.concatenate([a, n], 1) ** 2).sum((1, 2)),
            0,
        )
    )
    np.testing.assert_allclose(float(spec.ntuplet_trace_loss(a, p, n, 0.1)), want, rtol=1e-4)


# ------------------------------------------------------------------ ms / wms
def test_ms_loss_manual():
    # 4 embeddings, 2 classes; verify against a direct transcription.
    emb = jnp.asarray(
        [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]], jnp.float32
    )
    labels = jnp.asarray([0, 0, 1, 1])
    got = float(ms_losses.ms_loss(labels, emb, ms_mining=False))

    e = np.asarray(emb) / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = np.maximum(e @ e.T, 0.0)
    lab = np.asarray(labels)
    adj = lab[:, None] == lab[None, :]
    mp = adj.astype(np.float32) - np.eye(4)
    mn = (~adj).astype(np.float32)
    pos_exp = np.where(mp > 0, np.exp(-2.0 * (sim * mp - 1.0)), 0.0)
    neg_exp = np.where(mn > 0, np.exp(50.0 * (sim * mn - 1.0)), 0.0)
    want = np.mean(
        np.log1p(pos_exp.sum(1)) / 2.0 + np.log1p(neg_exp.sum(1)) / 50.0
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ms_det_is_ms_without_mining():
    # ms_det (reference model/losses.py:139-186) has an identical body to
    # ms_loss but defaults mining OFF; the registry dispatches it that way.
    emb = jnp.asarray(
        [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]], jnp.float32
    )
    labels = jnp.asarray([0, 0, 1, 1])
    got = float(ms_losses.ms_det_loss(labels, emb))
    want = float(ms_losses.ms_loss(labels, emb, ms_mining=False))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # And it differs from mined ms on an example where mining prunes a pair:
    # the mining rule drops positives easier than the hardest negative.
    mined = float(ms_losses.ms_loss(labels, emb, ms_mining=True))
    assert got != mined


def test_wms_wfunctions_and_sumfunctions(rng):
    b = 6
    emb = jnp.asarray(rng.standard_normal((b, 4)), jnp.float32)
    geo = jnp.abs(jnp.asarray(rng.standard_normal((b, b)), jnp.float32)) * 20
    geo = 0.5 * (geo + geo.T)
    for wf in ("exp", "lin", "tanh"):
        for sf in ("ms", "plain"):
            v = ms_losses.wms_loss(
                geo, emb, d_alpha=0.8, d_beta=15.0, wfunction=wf, sumfunction=sf
            )
            assert bool(jnp.isfinite(v)), (wf, sf)


def test_wms_exp_weights_behavior():
    # Close pair (d=0) should pull similarity up; far pair (d=100) pushes down.
    emb = jnp.asarray([[1.0, 0.0], [0.6, 0.8]], jnp.float32)
    close = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    far = jnp.asarray([[0.0, 100.0], [100.0, 0.0]])
    l_close = float(ms_losses.wms_loss(close, emb, 0.8, 15.0, ms_mining=False))
    l_far = float(ms_losses.wms_loss(far, emb, 0.8, 15.0, ms_mining=False))
    # identical embeddings pair: treating them as positives (close) costs less
    # than treating them as negatives (far) at sim=0.6
    assert l_close < l_far


# ------------------------------------------------------------------ incremental
def test_incremental_s_matches_numpy(rng):
    L, M, Dd = 5, 4, 10
    s_old = np.abs(rng.standard_normal(L)).astype(np.float32) + 0.5
    v_old = rng.standard_normal((L, Dd)).astype(np.float32)
    m_old = rng.standard_normal(Dd).astype(np.float32)
    seen = np.float32(37.0)
    x = rng.standard_normal((T, M, Dd)).astype(np.float32)

    st = PCAState(jnp.asarray(s_old), jnp.asarray(v_old), jnp.asarray(m_old), jnp.asarray(seen))
    got = np.asarray(incremental_s(jnp.asarray(x), st))

    mx = x.mean(axis=1, keepdims=True)
    for t in range(T):
        b = np.concatenate(
            [
                np.diag(s_old) @ v_old,
                x[t] - mx[t],
                np.sqrt(seen * M / (seen + M)) * (mx[t] - m_old[None, :]),
            ],
            axis=0,
        )
        want = np.linalg.svd(b, compute_uv=False)
        np.testing.assert_allclose(got[t], want, atol=1e-3)


# ------------------------------------------------------------------ registry
def _payload_for(cfg_loss: LossConfig, rng, tuple_shape):
    t = T
    p_count = tuple_shape[1]
    n_count = tuple_shape[2]
    s = sum(tuple_shape)
    dt = cfg_loss.distance_type
    pay = {}
    if dt == "anchor":
        pay["sq_pos_geo_dists"] = jnp.abs(
            jnp.asarray(rng.standard_normal((t, p_count)), jnp.float32)
        )
    elif dt == "pairwise":
        pay["pairwise_sq_geo_dists"] = jnp.abs(
            jnp.asarray(rng.standard_normal((t, p_count + 1, p_count + 1)), jnp.float32)
        )
    elif dt == "swrd":
        pay["pos_weights"] = jnp.asarray(rng.random((t, p_count, 1)), jnp.float32)
        pay["neg_weights"] = jnp.asarray(rng.random((t, n_count, 1)), jnp.float32)
    elif dt == "wrd":
        pay["pos_weights"] = jnp.asarray(rng.random((t, p_count + n_count, 1)), jnp.float32)
        pay["neg_weights"] = jnp.asarray(rng.random((t, p_count + n_count, 1)), jnp.float32)
    elif dt == "wms":
        b = t * s
        m = jnp.abs(jnp.asarray(rng.standard_normal((b, b)), jnp.float32)) * 20
        pay["geo_dist_matrix"] = 0.5 * (m + m.T)
    elif dt == "logratio":
        pay["sq_pos_geo_dists"] = jnp.abs(
            jnp.asarray(rng.standard_normal((t, p_count)), jnp.float32)
        ) + 0.1
        pay["sq_neg_geo_dists"] = jnp.abs(
            jnp.asarray(rng.standard_normal((t, n_count)), jnp.float32)
        ) + 0.1
    return pay


@pytest.mark.parametrize("name", LOSS_NAMES)
def test_registry_all_losses_finite_with_finite_grads(name, rng):
    lcfg = LossConfig(name=name, loss_dim=6)
    tcfg = TupleConfig(positives_per_tuple=P, negatives_per_tuple=N)
    train_cfg = TrainConfig(loss=lcfg, tuples=tcfg, tuples_per_batch=T)
    tuple_shape = train_cfg.tuple_shape
    loss_fn = build_loss(lcfg, tcfg, T)

    emb = jnp.asarray(rng.standard_normal((T * sum(tuple_shape), D)), jnp.float32)
    payload = _payload_for(lcfg, rng, tuple_shape)
    state = None
    if lcfg.incremental:
        state = PCAState(
            s=jnp.abs(jnp.asarray(rng.standard_normal(6), jnp.float32)) + 0.5,
            v=jnp.asarray(rng.standard_normal((6, D)), jnp.float32),
            m=jnp.asarray(rng.standard_normal(D), jnp.float32),
            seen=jnp.asarray(25.0, jnp.float32),
        )

    def total(e):
        batch = split_batch(e, T, tuple_shape)
        res = loss_fn(batch, payload, state)
        assert isinstance(res, LossResult)
        return res.total

    val, grad = jax.value_and_grad(total)(emb)
    assert bool(jnp.isfinite(val)), name
    assert bool(jnp.all(jnp.isfinite(grad))), name
    if LossConfig(name=name).pn_loss:
        batch = split_batch(emb, T, tuple_shape)
        res = loss_fn(batch, payload, state)
        assert res.pos is not None and res.neg is not None


def test_split_batch_layout(rng):
    tuple_shape = (1, 2, 3)
    emb = jnp.arange(2 * 6 * 4, dtype=jnp.float32).reshape(12, 4)
    b = split_batch(emb, 2, tuple_shape)
    np.testing.assert_array_equal(np.asarray(b.anchor[0, 0]), np.asarray(emb[0]))
    np.testing.assert_array_equal(np.asarray(b.positives[0, 1]), np.asarray(emb[2]))
    np.testing.assert_array_equal(np.asarray(b.negatives[1, 0]), np.asarray(emb[9]))
    assert b.other is None


def test_tuple_labels():
    labels = np.asarray(ms_losses.tuple_labels(2, 3, 2))
    want = [0, 0, 0, 0, 1, 2, 3, 3, 3, 3, 4, 5]
    np.testing.assert_array_equal(labels, want)
