"""Property tests for the tuple sampler, mining cache, toy-city dataset, and
the streaming/batch PCA implementations."""

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import LossConfig, TrainConfig, TupleConfig
from soft_contrastive_learning_tpu.data.toycity import ToyCity
from soft_contrastive_learning_tpu.pca.incremental import (
    StreamingPCA,
    multiple_skl_increments,
    single_skl_increment,
    skl_init,
)
from soft_contrastive_learning_tpu.pca.whiten import fit_pca
from soft_contrastive_learning_tpu.sampling.mining import MiningCache
from soft_contrastive_learning_tpu.sampling.tuples import TupleSampler
from soft_contrastive_learning_tpu.utils.meta import get_xy, get_yaw


def _make_sampler(loss_name="wms", seed=0, **tuple_kw):
    city = ToyCity(num_points=200, radius=150.0, seed=1)
    tuple_kw.setdefault("positives_per_tuple", 4)
    tuple_kw.setdefault("negatives_per_tuple", 4)
    tuple_kw.setdefault("hard_positives_per_tuple", 2)
    tuple_kw.setdefault("hard_negatives_per_tuple", 2)
    tcfg = TupleConfig(**tuple_kw)
    lcfg = LossConfig(name=loss_name)
    cfg = TrainConfig(loss=lcfg, tuples=tcfg, tuples_per_batch=2)
    meta = city.meta()
    sampler = TupleSampler(
        tcfg, lcfg, cfg.tuple_shape, get_xy(meta), get_yaw(meta),
        rng=np.random.default_rng(seed),
    )
    return city, cfg, sampler


def test_sampler_invariants():
    city, cfg, sampler = _make_sampler("triplet")
    xy = city.xy()
    sample = sampler.sample([3, 77])
    assert sample is not None
    assert sample.indices.shape == (2, sum(cfg.tuple_shape))
    p = cfg.tuples.positives_per_tuple
    for row in sample.indices:
        anchor, pos, neg = row[0], row[1 : 1 + p], row[1 + p :]
        d_pos = np.linalg.norm(xy[pos] - xy[anchor], axis=1)
        d_neg = np.linalg.norm(xy[neg] - xy[anchor], axis=1)
        assert (d_pos < cfg.tuples.max_pos_radius).all()
        assert (d_neg > cfg.tuples.min_neg_radius).all()
        assert anchor not in set(pos.tolist())
    assert len(sample.used_indices) > 2  # accumulated over all tuples


def test_sampler_mutually_exclusive_negatives():
    city, cfg, sampler = _make_sampler("triplet", mutually_exclusive_negs=True)
    xy = city.xy()
    sample = sampler.sample([10, 60])
    p = cfg.tuples.positives_per_tuple
    for row in sample.indices:
        neg = row[1 + p :]
        d = np.linalg.norm(xy[neg][:, None] - xy[neg][None, :], axis=-1)
        off_diag = d[~np.eye(len(neg), dtype=bool)]
        assert (off_diag > cfg.tuples.min_neg_radius).all()


def test_sampler_quadruplet_other_negative():
    city, cfg, sampler = _make_sampler("quadruplet")
    xy = city.xy()
    sample = sampler.sample([5])
    assert sample.indices.shape == (1, sum(cfg.tuple_shape))
    row = sample.indices[0]
    p, n = cfg.tuple_shape[1], cfg.tuple_shape[2]
    other = row[-1]
    negs = row[1 + p : 1 + p + n]
    # other negative is far from the anchor and from every negative
    assert np.linalg.norm(xy[other] - xy[row[0]]) > cfg.tuples.min_neg_radius
    d = np.linalg.norm(xy[negs] - xy[other], axis=1)
    assert (d > cfg.tuples.min_neg_radius).all()


@pytest.mark.parametrize(
    "loss,keys",
    [
        ("huber_distance_triplet", {"sq_pos_geo_dists"}),
        ("pairwise_distance_neg_eigenvalue", {"pairwise_sq_geo_dists"}),
        ("swrd", {"pos_weights", "neg_weights"}),
        ("wrd", {"pos_weights", "neg_weights"}),
        ("wms", {"geo_dist_matrix"}),
        ("logratio", {"sq_pos_geo_dists", "sq_neg_geo_dists"}),
        ("triplet", set()),
    ],
)
def test_sampler_payloads(loss, keys):
    city, cfg, sampler = _make_sampler(loss)
    sample = sampler.sample([3, 50])
    assert set(sample.payload.keys()) == keys
    t = cfg.tuples_per_batch
    p, n = cfg.tuple_shape[1], cfg.tuple_shape[2]
    s = sum(cfg.tuple_shape)
    if loss == "swrd":
        assert sample.payload["pos_weights"].shape == (t, p, 1)
        assert sample.payload["neg_weights"].shape == (t, n, 1)
        # positives are close => weights near 1; negatives far => near 1 too
        assert (sample.payload["pos_weights"] > 0.4).all()
    if loss == "wrd":
        assert sample.payload["pos_weights"].shape == (t, p + n, 1)
        pw = sample.payload["pos_weights"][:, :, 0]
        nw = sample.payload["neg_weights"][:, :, 0]
        np.testing.assert_allclose(pw + nw, 1.0, atol=1e-5)  # sigmoid pair
    if loss == "wms":
        m = sample.payload["geo_dist_matrix"]
        assert m.shape == (t * s, t * s)
        np.testing.assert_allclose(m, m.T, atol=1e-4)
        assert np.allclose(np.diag(m), 0.0, atol=1e-4)


def test_sampler_hard_mining_uses_cache():
    city, cfg, sampler = _make_sampler("triplet", seed=3)
    cache = MiningCache()
    assert not cache.ready
    # Embeddings = xy coordinates; embedding-nearest non-excluded = geo-nearest.
    indices = np.arange(200)
    cache.refresh(city.xy().astype(np.float32), indices)
    assert cache.ready
    sn = cache.sorted_neighbors(7)
    assert sn[0] == 7  # itself is nearest
    assert cache.sorted_neighbors(10**9) is None

    sample = sampler.sample([7], use_hard=True, cache=cache)
    xy = city.xy()
    p, n = cfg.tuple_shape[1], cfg.tuple_shape[2]
    row = sample.indices[0]
    negs = row[1 + p : 1 + p + n]
    # hard negatives appended last (reference ordering: random first)
    hard = negs[-cfg.tuples.hard_negatives_per_tuple :]
    d_hard = np.linalg.norm(xy[hard] - xy[7], axis=1)
    assert (d_hard > cfg.tuples.min_neg_radius).all()


def test_sampler_reproducible():
    _, _, s1 = _make_sampler("wms", seed=9)
    _, _, s2 = _make_sampler("wms", seed=9)
    a = s1.sample([3, 50])
    b = s2.sample([3, 50])
    np.testing.assert_array_equal(a.indices, b.indices)


# ------------------------------------------------------------------ toy city
def test_toycity_determinism_and_locality():
    c1 = ToyCity(num_points=60, seed=5, img_h=32, img_w=48)
    c2 = ToyCity(num_points=60, seed=5, img_h=32, img_w=48)
    np.testing.assert_array_equal(c1.image(3), c2.image(3))
    img0 = c1.image(0).astype(float)
    img1 = c1.image(1).astype(float)  # neighboring pose
    img_far = c1.image(30).astype(float)  # opposite side of the loop
    d_near = np.abs(img0 - img1).mean()
    d_far = np.abs(img0 - img_far).mean()
    assert d_near < d_far  # nearby poses look more alike
    key = (c1.meta()["date"][3], "1", c1.meta()["t"][3])
    np.testing.assert_array_equal(c1.image_by_key(key), c1.image(3))


def test_toycity_write_to_disk(tmp_path):
    from soft_contrastive_learning_tpu.utils.io import load_csv, load_img

    city = ToyCity(num_points=4, seed=0, img_h=16, img_w=24)
    city.write_to_disk(str(tmp_path))
    meta = load_csv(str(tmp_path / "meta.csv"))
    assert len(meta["t"]) == 4
    img = load_img(
        str(tmp_path / f"{city.date}_stereo_centre_01" / f"{meta['t'][0]}.png")
    )
    np.testing.assert_array_equal(img, city.image(0))


# ------------------------------------------------------------------ PCA
def test_skl_init_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    x = rng.standard_normal((100, 12)).astype(np.float32) * ([3, 2, 1] * 4)
    s, v, m, seen, true_seen, var = skl_init(x, 4)
    ref = PCA(n_components=4).fit(x)
    np.testing.assert_allclose(m, x.mean(0), atol=1e-4)
    np.testing.assert_allclose(s, ref.singular_values_, rtol=1e-4)
    np.testing.assert_allclose(var, ref.explained_variance_, rtol=1e-3)
    # components match up to sign
    dots = np.abs(np.sum(v * ref.components_, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
    assert seen == true_seen == 100.0


def test_incremental_pca_tracks_batch_pca(rng):
    # With forgetting=1 (no decay), incremental PCA over chunks should span
    # nearly the same subspace as batch PCA on everything.
    d, k = 10, 3
    basis = rng.standard_normal((k, d))
    x = rng.standard_normal((400, k)) @ basis + 0.01 * rng.standard_normal((400, d))
    x = x.astype(np.float32)
    state = skl_init(x[:100], k)
    for start in range(100, 400, 50):
        state = single_skl_increment(x[start : start + 50], *state[:5], 1.0)
    s, v, m, seen, true_seen, var = state
    assert true_seen == 400.0
    from sklearn.decomposition import PCA

    ref = PCA(n_components=k).fit(x)
    # principal subspaces align: projection matrix difference is small
    p_inc = v.T @ v
    p_ref = ref.components_.T @ ref.components_
    assert np.abs(p_inc - p_ref).max() < 0.05


def test_multiple_increments_equals_loop(rng):
    x = rng.standard_normal((90, 8)).astype(np.float32)
    init = skl_init(x[:30], 4)
    a = multiple_skl_increments(x[30:], 20, *init[:5], 0.5)
    state = init
    for start in range(30, 90, 20):
        state = single_skl_increment(x[start : start + 20], *state[:5], 0.5)
    for got, want in zip(a[:3], state[:3]):
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_streaming_pca_whiten(rng):
    x = rng.standard_normal((300, 16)).astype(np.float32) * 5
    pca = StreamingPCA(out_dim=8, forgetting=1.0)
    pca.update(x[:150])
    pca.update(x[150:])
    w = pca.whiten(x)
    assert w.shape == (300, 8)
    # approximately unit variance in the retained subspace
    assert 0.5 < w.std(axis=0).mean() < 2.0
    # state dict roundtrip
    pca2 = StreamingPCA.from_state_dict(pca.state_dict())
    np.testing.assert_allclose(pca2.whiten(x[:5]), w[:5], atol=1e-5)


def test_fit_pca_host_eigh_matches_device(rng):
    """The host-LAPACK eigh dispatch (used automatically above
    _HOST_EIGH_THRESHOLD, where XLA's TPU eigh is ~20x slower than one-core
    LAPACK) must produce the same whitening as the on-device path, up to
    per-component sign — both Gram (N<=D) and covariance (N>D) branches."""
    import jax.numpy as jnp

    for shape in ((40, 60), (60, 12)):
        x = rng.standard_normal(shape).astype(np.float32)
        k = 8
        dev = fit_pca(jnp.asarray(x), k, host_eigh=False)
        host = fit_pca(jnp.asarray(x), k, host_eigh=True)
        got_d = np.asarray(dev.transform(jnp.asarray(x)))
        got_h = np.asarray(host.transform(jnp.asarray(x)))
        signs = np.sign(np.sum(got_d * got_h, axis=0))
        np.testing.assert_allclose(got_h * signs, got_d, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(host.explained_variance),
            np.asarray(dev.explained_variance), rtol=1e-3,
        )


def test_fit_pca_matches_sklearn(rng):
    import jax.numpy as jnp
    from sklearn.decomposition import PCA

    x = rng.standard_normal((50, 20)).astype(np.float32) * np.linspace(5, 1, 20)
    ours = fit_pca(jnp.asarray(x), 6)
    got = np.asarray(ours.transform(jnp.asarray(x)))
    ref = PCA(n_components=6, whiten=True).fit(x)
    want = ref.transform(x)
    # whitened coordinates match up to per-component sign
    signs = np.sign(np.sum(got * want, axis=0))
    np.testing.assert_allclose(got * signs, want, atol=2e-2)
    # tall case (N > D)
    x2 = rng.standard_normal((80, 10)).astype(np.float32)
    ours2 = fit_pca(jnp.asarray(x2), 4)
    got2 = np.asarray(ours2.transform(jnp.asarray(x2)))
    ref2 = PCA(n_components=4, whiten=True).fit(x2)
    want2 = ref2.transform(x2)
    signs2 = np.sign(np.sum(got2 * want2, axis=0))
    np.testing.assert_allclose(got2 * signs2, want2, atol=2e-2)
