"""CLI surface tests: flag parity, config building, and the non-train
subcommands driven on tiny real files (the train path is covered by the
toy-city e2e run documented in the verify skill)."""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.cli import main
from soft_contrastive_learning_tpu.utils.io import load_pickle, save_csv, save_pickle


def test_train_flag_parity_builds_config(tmp_path):
    """The reference's train flags (train/train.py:1222-1314) parse and land
    in the typed config."""
    import argparse

    from soft_contrastive_learning_tpu.cli import _add_train_flags, config_from_args

    p = argparse.ArgumentParser()
    _add_train_flags(p)
    args = p.parse_args([
        "--loss", "swrd", "--alpha", "1.2", "--beta", "20", "--reduction", "spp",
        "--vlad_cores", "0", "--L", "2", "--positives_per_tuple", "10",
        "--max_pos_radius", "10", "--optimizer", "momentum", "--msmining", "True",
    ])
    cfg = config_from_args(args)
    assert cfg.loss.name == "swrd"
    assert cfg.loss.alpha == 1.2
    assert cfg.loss.d_max_squared == 100.0  # follows max_pos_radius
    assert cfg.model.reduction == "spp" and cfg.model.spp_levels == 2
    assert cfg.tuples.positives_per_tuple == 10
    assert cfg.optimizer == "momentum"
    assert cfg.loss.ms_mining is True


def test_tpu_flagship_preset_builds_measured_winner():
    """`--preset tpu-flagship` must build EXACTLY the measured-winner config
    (docs/TRAINBENCH.md round 4: tpb=4 + base_lr x2 + K=1 + synchronous
    order-only mining), regardless of the flags it is overlaid on."""
    import argparse

    from soft_contrastive_learning_tpu.cli import _add_train_flags, config_from_args
    from soft_contrastive_learning_tpu.core.config import apply_preset

    p = argparse.ArgumentParser()
    _add_train_flags(p)
    # conflicting flags: the preset must win over every one of them
    args = p.parse_args([
        "--loss", "wms", "--tuples_per_batch", "2", "--base_lr", "5e-6",
        "--steps_per_dispatch", "4", "--async_mining", "True",
    ])
    cfg = apply_preset(config_from_args(args), "tpu-flagship")
    assert cfg.tuples_per_batch == 4  # B = 4 x 25 = 100 images/step
    assert cfg.base_lr == pytest.approx(1e-5)  # reference 5e-6 x2
    assert cfg.steps_per_dispatch == 1
    assert cfg.async_mining is False
    assert cfg.device_image_pool is True
    # non-preset flags pass through untouched
    assert cfg.loss.name == "wms"
    assert cfg.images_per_batch == 100

    with pytest.raises(ValueError, match="unknown preset"):
        apply_preset(config_from_args(args), "nope")


def test_cli_topn_and_roc(tmp_path, rng):
    # feature pickles + csvs
    r, q, d = 40, 6, 16
    ref_f = rng.standard_normal((r, d)).astype(np.float32)
    query_f = rng.standard_normal((q, d)).astype(np.float32)
    pca_f = rng.standard_normal((100, d)).astype(np.float32)
    save_pickle(pca_f, str(tmp_path / "oxford_pca_m.pickle"))
    save_pickle(ref_f, str(tmp_path / "oxford_ref_m.pickle"))
    save_pickle(query_f, str(tmp_path / "oxford_night_m.pickle"))
    save_csv(
        {"easting": np.arange(r) * 3.0, "northing": np.zeros(r)},
        str(tmp_path / "ref.csv"),
    )
    save_csv(
        {"easting": rng.random(q) * 100, "northing": np.zeros(q)},
        str(tmp_path / "query.csv"),
    )
    rc = main([
        "topn",
        "--pca_lv_pickle", str(tmp_path / "oxford_pca_m.pickle"),
        "--ref_lv_pickle", str(tmp_path / "oxford_ref_m.pickle"),
        "--query_lv_pickle", str(tmp_path / "oxford_night_m.pickle"),
        "--ref_csv", str(tmp_path / "ref.csv"),
        "--query_csv", str(tmp_path / "query.csv"),
        "--out_root", str(tmp_path / "top_n"), "--N", "5",
        "--dims", "8", "--spacings", "0.0",
    ])
    assert rc == 0
    out = tmp_path / "top_n" / "l0.0_dim8" / "oxford_night_m.pickle"
    assert out.exists()
    assert len(load_pickle(str(out))) == 6

    # roc over the produced pickles: rename to a known series code
    os.rename(out, out.parent / "oxford_night_wms.pickle")
    rc = main([
        "roc", "--top_n_root", str(tmp_path / "top_n"),
        "--out_root", str(tmp_path / "figs"), "--l", "0.0", "--d", "8",
    ])
    assert rc == 0
    assert (tmp_path / "figs" / "l00_dim8_roc.pdf").exists()


def test_cli_roc_missing_inputs(tmp_path):
    rc = main([
        "roc", "--top_n_root", str(tmp_path / "none"),
        "--out_root", str(tmp_path / "figs"),
    ])
    assert rc == 1


def test_model_grad_in(rng):
    import jax

    from soft_contrastive_learning_tpu.core.config import ModelConfig
    from soft_contrastive_learning_tpu.models.model import create_model, init_params

    cfg = ModelConfig(vlad_cores=4, reduction="none", image_height=32,
                      image_width=32, compute_dtype="float32", use_pallas=False)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    x = np.ones((1, 32, 32, 3), np.float32)
    out, full, grad_in = model.apply({"params": params}, x, return_grad_in=True)
    assert grad_in.shape == (1, 2, 2, 512)


def test_cli_compile_cache_wiring(tmp_path, monkeypatch):
    """Every CLI run points JAX's persistent compile cache at a real dir by
    default; SCL_COMPILE_CACHE_DIR overrides it and 'off' (or an explicit
    JAX_COMPILATION_CACHE_DIR, the benchmark-child convention) disables the
    default wiring."""
    import jax

    from soft_contrastive_learning_tpu.cli import _enable_compile_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.setenv("SCL_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
        _enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert os.path.isdir(tmp_path / "cc")

        # opt-out leaves whatever was configured untouched
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "keep"))
        monkeypatch.setenv("SCL_COMPILE_CACHE_DIR", "off")
        _enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "keep")

        # an explicit benchmark-style env var also disables the default
        monkeypatch.setenv("SCL_COMPILE_CACHE_DIR", str(tmp_path / "cc2"))
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jc"))
        _enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "keep")
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_load_model_params_flagship_artifact():
    """--checkpoint <flagship npz> loads the committed trained artifact
    directly (no TF1 conversion) when the flag-built architecture matches;
    a non-flagship architecture falls through to the TF1 interpretation and
    fails loudly rather than half-loading."""
    import pytest as _pytest

    from soft_contrastive_learning_tpu import flagship
    from soft_contrastive_learning_tpu.cli import _load_model_params
    from soft_contrastive_learning_tpu.core.config import ModelConfig

    if not os.path.exists(flagship.TRAINED_PARAMS_PATH):
        _pytest.skip("no committed trained artifact")
    cfg = ModelConfig(vlad_cores=64, reduction="none")
    out_cfg, params = _load_model_params(cfg, flagship.TRAINED_PARAMS_PATH)
    assert out_cfg is cfg
    leaves = [x for x in __import__("jax").tree_util.tree_leaves(params)]
    assert leaves and all(l.size for l in leaves)

    # wrong architecture: the flagship key check rejects, and the TF1
    # converter then rejects the artifact's non-TF1 names
    bad = ModelConfig(vlad_cores=8, reduction="none")
    with _pytest.raises(SystemExit, match="ZERO variables"):
        _load_model_params(bad, flagship.TRAINED_PARAMS_PATH)
