"""Command-line interface.

Mirrors the reference's script entry points as subcommands of one CLI:

  scl-tpu train  — reference train/train.py:1222-1314 (same flag names)
  scl-tpu infer  — reference evaluation/inference.py
  scl-tpu topn   — reference evaluation/top-n.py
  scl-tpu roc    — reference evaluation/roc.py
  scl-tpu prep   — reference prepare_data/004-014 via the stage framework
  scl-tpu bench  — the throughput benchmark

``--task_id -1`` on train/infer renders + submits an array job of the frozen
script (the reference's self-submission convention, train/train.py:1465-1466).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np


def _bool_flag(s: str) -> bool:
    """Strict boolean flag parser: True/False (any case) or 1/0; anything
    else is an argparse error instead of a silent default."""
    v = s.strip().lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    # Named config bundle overlaid on the flag-built config (core/config.py::
    # TRAIN_PRESETS): `--preset tpu-flagship` is the measured production
    # recommendation (tpb=4, base_lr x2, K=1, synchronous order-only mining).
    p.add_argument("--preset", default="",
                   help="named config bundle applied over the flags "
                        "(e.g. tpu-flagship; see core/config.py TRAIN_PRESETS)")
    # Data roots (filesystem contract, reference train/train.py:1226-1233)
    p.add_argument("--img_root", default="")
    p.add_argument("--shuffled_root", default="")
    p.add_argument("--loc_ref_root", default="")
    p.add_argument("--anchor_root", default="")
    p.add_argument("--checkpoint", default="",
                   help="warm-start donor: a .npz TF1 export (see "
                        "models/convert_tf1.py); to continue an orbax run "
                        "use --resume with the same --out_folder")
    p.add_argument("--out_root", default="runs")
    p.add_argument("--out_folder", default="")
    p.add_argument("--max_to_keep", type=int, default=1)
    p.add_argument("--toy_city", action="store_true", help="train on the synthetic toy city")

    # Tuples (reference :1241-1249)
    p.add_argument("--positives_per_tuple", type=int, default=12)
    p.add_argument("--negatives_per_tuple", type=int, default=12)
    p.add_argument("--hard_positives_per_tuple", type=int, default=6)
    p.add_argument("--hard_negatives_per_tuple", type=int, default=6)
    p.add_argument("--mutually_exclusive_negs", type=_bool_flag, default=True)

    # Loss (reference :1252-1266)
    p.add_argument("--loss", default="wrd")
    p.add_argument("--margin_1", type=float, default=0.1)
    p.add_argument("--margin_2", type=float, default=0.2)
    p.add_argument("--lam", type=float, default=0.5)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--beta", type=float, default=15.0)
    p.add_argument("--wfunction", default="exp", choices=["exp", "lin", "tanh"])
    p.add_argument("--sumfunction", default="ms", choices=["ms", "plain"])
    p.add_argument("--msmining", type=_bool_flag, default=False)
    p.add_argument("--max_pos_radius", type=float, default=15.0)
    p.add_argument("--min_neg_radius", type=float, default=15.0)

    # Optimization (reference :1269-1280)
    p.add_argument("--tuples_per_batch", type=int, default=2)
    p.add_argument("--max_epoch", type=int, default=5)
    p.add_argument("--base_lr", type=float, default=5e-6)
    p.add_argument("--minimal_lr", type=float, default=5e-12)
    p.add_argument("--lr_down_factor", type=float, default=0.5)
    p.add_argument("--lr_down_frequency", type=float, default=1.0)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="adam", choices=["adam", "momentum"])

    # Reduction (reference :1283-1288)
    p.add_argument("--out_dim", type=int, default=512)
    p.add_argument("--loss_dim", type=int, default=512)
    p.add_argument("--reduction", default="none",
                   choices=["none", "1fc", "2fc", "3fc", "pca", "spp"])
    p.add_argument("--vlad_cores", type=int, default=64)
    p.add_argument("--L", type=int, default=3)
    p.add_argument("--f", type=float, default=0.4)

    # Mining / eval cadence (reference :1291-1301)
    p.add_argument("--mining_step", type=int, default=250)
    p.add_argument("--mining_cache_size", type=int, default=1000)
    p.add_argument("--eval_step", type=int, default=100)
    p.add_argument("--save_step", type=int, default=500)
    p.add_argument("--num_eval_queries", type=int, default=50)
    p.add_argument("--eval_ref_r", type=int, default=5)
    p.add_argument("--train_ref_r", type=int, default=1)

    # Sets (reference :1304-1308)
    p.add_argument("--local_ref_set", default="train_ref")
    p.add_argument("--local_query_set", default="train_query")
    p.add_argument("--other_ref_set", default="test_ref")
    p.add_argument("--other_query_set", default="test_query")

    # TPU-native additions
    p.add_argument("--image_height", type=int, default=180)
    p.add_argument("--image_width", type=int, default=240)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--use_pallas", type=_bool_flag, default=True)
    p.add_argument("--num_data_shards", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_plots", action="store_true")
    p.add_argument("--task_id", type=int, default=0)
    p.add_argument("--queue", default="48h")
    p.add_argument("--decoded_cache_root", default="",
                   help="dir of a decoded-uint8 image cache written by "
                        "'scl-tpu cache' (batch assembly becomes memcpy)")
    p.add_argument("--device_image_pool", type=_bool_flag, default=True,
                   help="keep the training set's images resident in HBM and "
                        "gather batches by index inside the jitted step")
    p.add_argument("--device_pool_max_bytes", type=int, default=4_000_000_000)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="fuse K consecutive train steps into one on-device "
                        "scan per dispatch (amortizes per-call transfer/"
                        "dispatch floors; exact)")
    p.add_argument("--async_mining", type=_bool_flag, default=False,
                   help="overlap the hard-mining cache refresh with training "
                        "(train on the previous window until the new one "
                        "lands) instead of the reference's pipeline barrier")


def config_from_args(args) -> "TrainConfig":
    from soft_contrastive_learning_tpu.core.config import (
        LossConfig, ModelConfig, TrainConfig, TupleConfig,
    )

    model = ModelConfig(
        vlad_cores=args.vlad_cores, reduction=args.reduction,
        out_dim=args.out_dim, spp_levels=args.L,
        image_height=args.image_height, image_width=args.image_width,
        compute_dtype=args.compute_dtype, use_pallas=args.use_pallas,
    )
    tuples = TupleConfig(
        positives_per_tuple=args.positives_per_tuple,
        negatives_per_tuple=args.negatives_per_tuple,
        hard_positives_per_tuple=args.hard_positives_per_tuple,
        hard_negatives_per_tuple=args.hard_negatives_per_tuple,
        mutually_exclusive_negs=args.mutually_exclusive_negs,
        max_pos_radius=args.max_pos_radius,
        min_neg_radius=args.min_neg_radius,
    )
    loss = LossConfig(
        name=args.loss, margin_1=args.margin_1, margin_2=args.margin_2,
        lam=args.lam, alpha=args.alpha, beta=args.beta,
        wfunction=args.wfunction, sumfunction=args.sumfunction,
        ms_mining=args.msmining, loss_dim=args.loss_dim,
        d_max_squared=args.max_pos_radius**2,
    )
    return TrainConfig(
        model=model, tuples=tuples, loss=loss,
        img_root=args.img_root, shuffled_root=args.shuffled_root,
        loc_ref_root=args.loc_ref_root, anchor_root=args.anchor_root,
        checkpoint=args.checkpoint,
        tuples_per_batch=args.tuples_per_batch, max_epoch=args.max_epoch,
        base_lr=args.base_lr, minimal_lr=args.minimal_lr,
        lr_down_factor=args.lr_down_factor, lr_down_frequency=args.lr_down_frequency,
        momentum=args.momentum, optimizer=args.optimizer,
        forgetting_factor=args.f,
        mining_step=args.mining_step, mining_cache_size=args.mining_cache_size,
        eval_step=args.eval_step, save_step=args.save_step,
        num_eval_queries=args.num_eval_queries, eval_ref_r=args.eval_ref_r,
        train_ref_r=args.train_ref_r, max_to_keep=args.max_to_keep,
        local_ref_set=args.local_ref_set, local_query_set=args.local_query_set,
        other_ref_set=args.other_ref_set, other_query_set=args.other_query_set,
        seed=args.seed, num_data_shards=args.num_data_shards,
        device_image_pool=args.device_image_pool,
        device_pool_max_bytes=args.device_pool_max_bytes,
        steps_per_dispatch=args.steps_per_dispatch,
        async_mining=args.async_mining,
    )


def cmd_train(args) -> int:
    from soft_contrastive_learning_tpu.core.config import unique_out_dir
    from soft_contrastive_learning_tpu.data.pipeline import (
        FilesystemSource, ToyCitySource,
    )
    from soft_contrastive_learning_tpu.launch.jobs import run_one_job
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    cfg = config_from_args(args)
    if args.preset:
        from soft_contrastive_learning_tpu.core.config import apply_preset

        cfg = apply_preset(cfg, args.preset)
    out_folder = args.out_folder or cfg.encode_name()
    out_dir = os.path.join(args.out_root, out_folder)

    if args.task_id == -1:
        # Self-submission convention (reference train/train.py:1216-1219,1465-1466):
        # freeze this CLI module and submit 'python cli.py train <flags>'.
        # store_true flags render bare when True / drop when False; the
        # value-typed boolean flags (_bool_flag) must render an explicit
        # True/False value or the child's argparse rejects the bare flag.
        # Derived from the parser itself so a future store_true train flag
        # cannot fall out of sync with this serialization.
        probe = argparse.ArgumentParser()
        _add_train_flags(probe)
        # Zero-arg boolean flags (store_true AND store_false/const): render
        # the bare flag only when the value equals the action's const (the
        # flag was actually given); a value must never follow them or the
        # child's argparse rejects it. nargs == 0 + bool const covers the
        # whole family without touching argparse private classes.
        bare_flags = {
            a.dest: (a.option_strings[-1].lstrip("-"), a.const)
            for a in probe._actions
            if a.nargs == 0 and isinstance(a.const, bool) and a.option_strings
        }
        params = []
        for k, v in vars(args).items():
            if k in ("task_id", "func", "command"):
                continue
            if v is None or (isinstance(v, str) and v == ""):
                continue
            if isinstance(v, bool):
                if k in bare_flags:
                    flag, const = bare_flags[k]
                    if v == const:
                        params.append((flag, True))
                else:
                    params.append((k, str(v)))
                continue
            params.append((k, v))
        if not any(k == "out_folder" for k, _ in params):
            # pin the resolved run name: run_one_job pre-creates out_dir, and
            # without an explicit out_folder the child's unique_out_dir would
            # skip to a _000 suffix, detaching training output from the job
            params.append(("out_folder", out_folder))
        run_one_job(os.path.abspath(__file__), params,
                    positional_args=("train",),
                    queue=args.queue, out_dir=out_dir, memory=50,
                    name=f"train_{args.loss}", overwrite=True, array=True,
                    num_jobs=1)
        return 0

    if not args.out_folder and not args.resume:
        # fresh runs get a unique suffix; --resume must reuse the existing dir
        out_dir = unique_out_dir(args.out_root, out_folder)

    if args.toy_city:
        source = ToyCitySource(
            num_points=120, radius=150.0,
            img_h=args.image_height, img_w=args.image_width,
        )
    else:
        source = FilesystemSource(
            cfg.img_root, cfg.shuffled_root, cfg.anchor_root, cfg.loc_ref_root
        )
    if args.decoded_cache_root:
        # Serve geometry-normalized uint8 batches from the memmap written by
        # `scl-tpu cache` (decode leaves the hot path; data/decoded_cache.py)
        from soft_contrastive_learning_tpu.data.decoded_cache import (
            CachedDecodedSource,
        )

        source = CachedDecodedSource(source, args.decoded_cache_root)

    warm_donor = None
    if cfg.checkpoint:
        if not cfg.checkpoint.endswith(".npz"):
            raise SystemExit(
                f"--checkpoint {cfg.checkpoint!r}: only .npz TF1 exports are "
                "supported for warm starts; to continue an orbax run use "
                "--resume with the same --out_folder"
            )
        from soft_contrastive_learning_tpu.models.convert_tf1 import convert_checkpoint

        warm_donor, _ = convert_checkpoint(cfg.checkpoint)

    mesh = None
    if args.num_data_shards > 1:
        from soft_contrastive_learning_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_data=args.num_data_shards)

    trainer = Trainer(cfg, source, out_dir=out_dir, mesh=mesh,
                      save_plots=args.save_plots, warm_start_donor=warm_donor)
    if args.resume:
        if not trainer.resume_latest():
            trainer.log("--resume requested but no checkpoint found; starting fresh")
    trainer.train()
    trainer.close()
    return 0


def _load_model_params(cfg, checkpoint: str):
    """Resolve --checkpoint for infer/serve/quant: a .npz TF1 export warm-
    starts the flag-built config; a training-run DIRECTORY loads the run's
    own ModelConfig + latest orbax parameters (the train -> infer seam,
    reference evaluation/inference.py:122-144); empty = fresh random params.
    Returns (model_config, params)."""
    import jax

    from soft_contrastive_learning_tpu.models.model import init_params

    if checkpoint.endswith(".npz"):
        # A flagship params artifact (the committed trained model,
        # assets/flagship_trained.npz) loads directly when its key set
        # matches the flag-built architecture; any other .npz is treated
        # as a TF1 checkpoint export. The flagship loader validates keys
        # and shapes exactly, so the dispatch cannot half-load.
        from soft_contrastive_learning_tpu import flagship

        try:
            params = flagship.load_trained_params(cfg, checkpoint)
        except ValueError:
            params = None
        if params is not None:
            print(f"loaded flagship artifact {checkpoint}")
            return cfg, params
        from soft_contrastive_learning_tpu.checkpoints.manager import warm_start_params
        from soft_contrastive_learning_tpu.models.convert_tf1 import convert_checkpoint

        donor, _ = convert_checkpoint(checkpoint)
        params, copied = warm_start_params(init_params(cfg, jax.random.key(0)), donor)
        if not copied:
            raise SystemExit(
                f"--checkpoint {checkpoint!r} matched ZERO variables — "
                "neither a flagship params artifact for this architecture "
                "nor a TF1 export with recognizable names; refusing to run "
                "on silently-random params")
        print(f"warm-started {copied} from {checkpoint}")
        return cfg, params
    if checkpoint and os.path.isdir(checkpoint):
        from soft_contrastive_learning_tpu.checkpoints.manager import load_run_params

        run_cfg, params = load_run_params(checkpoint)
        print(f"loaded trained params from run dir {checkpoint} "
              f"(run ModelConfig overrides flags)")
        return run_cfg, params
    if checkpoint:
        raise SystemExit(
            f"--checkpoint {checkpoint!r}: expected a .npz TF1 export or a "
            "training-run directory")
    return cfg, init_params(cfg, jax.random.key(0))


def cmd_infer(args) -> int:
    from soft_contrastive_learning_tpu.core.config import ModelConfig
    from soft_contrastive_learning_tpu.evaluation.inference import run_inference

    cfg = ModelConfig(vlad_cores=args.vlad_cores, reduction=args.reduction,
                      out_dim=args.out_dim)
    cfg, params = _load_model_params(cfg, args.checkpoint)
    out = run_inference(cfg, params, args.set, args.csv_root, args.img_root,
                        args.out_root, args.out_name,
                        batch_size=args.images_per_pass,
                        dump_dtype=args.dump_dtype)
    print(out)
    return 0


def cmd_topn(args) -> int:
    from soft_contrastive_learning_tpu.evaluation.topn import get_top_n
    from soft_contrastive_learning_tpu.utils.io import load_csv, load_pickle
    from soft_contrastive_learning_tpu.utils.meta import get_xy

    name = "".join(os.path.basename(args.query_lv_pickle).split(".")[:-1])
    kwargs = {}
    if args.dims:
        kwargs["dims"] = tuple(int(d) for d in args.dims.split(","))
    if args.spacings:
        kwargs["spacings"] = tuple(float(s) for s in args.spacings.split(","))
    paths = get_top_n(
        np.asarray(load_pickle(args.pca_lv_pickle)),
        np.asarray(load_pickle(args.ref_lv_pickle)),
        np.asarray(load_pickle(args.query_lv_pickle)),
        get_xy(load_csv(args.ref_csv)),
        get_xy(load_csv(args.query_csv)),
        args.out_root, name, n=args.N, **kwargs,
    )
    print("\n".join(sorted(paths.values())))
    return 0


def cmd_roc(args) -> int:
    from soft_contrastive_learning_tpu.evaluation.roc import compile_roc

    kwargs = {}
    if args.queries:
        kwargs["queries"] = tuple(
            (name, name, 0) for name in args.queries.split(",")
        )
    out = compile_roc(args.top_n_root, args.out_root,
                      setting=f"l{args.l}_dim{args.d}", **kwargs)
    print(out or "no top-n pickles found")
    return 0 if out else 1


def cmd_prep(args) -> int:
    from soft_contrastive_learning_tpu.data.robotcar import prep
    from soft_contrastive_learning_tpu.data.robotcar.analysis import plot_statistics
    from soft_contrastive_learning_tpu.data.robotcar.downsize import downsize_images
    from soft_contrastive_learning_tpu.data.robotcar.stages import PrepContext, run_all

    ctx = PrepContext(
        root=args.root, raw_img_root=args.raw_img_root, ins_root=args.ins_root,
        tar_root=args.tar_root, img_root=args.img_root,
        camera_models=args.camera_models, max_epochs=args.max_epochs,
        grid_masks={
            name: os.path.join(args.mask_root, f"{name}.png")
            for name in ("full", "train", "test", "val")
        } if args.mask_root else {},
    )
    dates = sorted(os.listdir(ctx.ins_root)) if ctx.ins_root else []
    if args.task_id > 0:
        # Array-job sharding: one date per task (the reference's per-date SGE
        # array contract, prepare_data/001:22-25).
        dates = dates[args.task_id - 1 : args.task_id]
    for date in dates:
        downsize_images(ctx, date)
        prep.interpolate_image_xy(ctx, date)
        if ctx.grid_masks:
            prep.assign_splits(ctx, date)
    if args.task_id > 0:
        return 0  # array tasks only do per-date work; a final run merges
    run_all(prep.metadata_stages(ctx), ctx)
    if args.statistics:
        plot_statistics(ctx, tag_root=args.tag_root)
    return 0


def cmd_metrics(args) -> int:
    """Summarize (and optionally plot) a run's JSONL metrics — the viewer for
    the TensorBoard-scalar replacement."""
    import json as _json

    summary = {}
    for role in ("local", "other"):
        path = os.path.join(args.run_dir, f"metrics_{role}.jsonl")
        if not os.path.exists(path):
            continue
        series = {}
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue  # tolerate a truncated/blank trailing line
                try:
                    rec = _json.loads(line)
                except ValueError:
                    continue
                series.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))
        summary[role] = series
        for tag, pts in sorted(series.items()):
            vals = [v for _, v in pts]
            print(
                f"[{role}] {tag}: n={len(vals)} last={vals[-1]:.6g} "
                f"min={min(vals):.6g} max={max(vals):.6g}"
            )
        if args.plot:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for tag, pts in series.items():
                plt.clf()
                xs, ys = zip(*sorted(pts))
                plt.plot(xs, ys)
                plt.xlabel("step")
                plt.ylabel(tag)
                plt.title(f"{role}/{tag}")
                safe = tag.replace("/", "_").replace("%", "pct").replace("<", "lt")
                plt.savefig(os.path.join(args.run_dir, f"metric_{role}_{safe}.pdf"))
    if getattr(args, "tb_export", False):
        from soft_contrastive_learning_tpu.core.tb_export import export_run

        counts = export_run(args.run_dir)
        for role, n in counts.items():
            print(f"[tb] wrote {n} scalars -> {args.run_dir}/tb/{role}")
        if not counts:
            print("no metrics found to export")
    if not summary:
        print("no metrics found")
        return 1
    return 0


def cmd_quant(args) -> int:
    """Calibrate int8 PTQ activation scales (models/quant.py) from sample
    images and write them as JSON for `scl-tpu serve --quant_scales`."""
    import jax
    import numpy as np

    from soft_contrastive_learning_tpu.core.config import ModelConfig
    from soft_contrastive_learning_tpu.models.model import init_params
    from soft_contrastive_learning_tpu.models.quant import (
        calibrate_scales,
        save_scales,
    )
    from soft_contrastive_learning_tpu.utils.cv import normalize_geometry
    from soft_contrastive_learning_tpu.utils.io import load_img

    cfg = ModelConfig(vlad_cores=args.vlad_cores, reduction=args.reduction,
                      out_dim=args.out_dim)
    if args.checkpoint:
        cfg, params = _load_model_params(cfg, args.checkpoint)
    elif not args.allow_random:
        # Scales calibrated on random weights are wrong for any real model;
        # refuse unless the caller explicitly asks (smoke tests).
        print("error: --checkpoint (npz or run dir) required; scales "
              "calibrated on randomly initialized weights would silently "
              "mis-quantize a real model. Pass --allow_random to override "
              "for smoke tests.")
        return 1
    else:
        params = init_params(cfg, jax.random.key(0))

    from soft_contrastive_learning_tpu.evaluation.parity import IMAGE_EXTENSIONS

    names = sorted(
        n for n in os.listdir(args.image_dir)
        if os.path.splitext(n)[1].lower() in IMAGE_EXTENSIONS
    )[: args.num_images]
    if not names:
        print(f"no images in {args.image_dir}")
        return 1
    imgs = np.stack([
        normalize_geometry(
            load_img(os.path.join(args.image_dir, n)),
            cfg.image_height, cfg.image_width,
            keep_aspect=cfg.vlad_cores > 0,
        )
        for n in names
    ]).astype(np.float32)
    scales = calibrate_scales(params, imgs)
    save_scales(scales, args.out)
    print(f"calibrated {len(scales)} conv scales from {len(imgs)} images "
          f"-> {args.out}")
    return 0


def cmd_serve(args) -> int:
    import jax

    from soft_contrastive_learning_tpu.core.config import ModelConfig
    from soft_contrastive_learning_tpu.serving import DescriptorService, serve
    from soft_contrastive_learning_tpu.utils.io import load_pickle

    cfg = ModelConfig(vlad_cores=args.vlad_cores, reduction=args.reduction,
                      out_dim=args.out_dim)
    cfg, params = _load_model_params(cfg, args.checkpoint)
    index = np.asarray(load_pickle(args.index)) if args.index else None
    quant_scales = None
    if args.quant_scales:
        from soft_contrastive_learning_tpu.models.quant import load_scales

        quant_scales = load_scales(args.quant_scales)
    service = DescriptorService(cfg, params, batch_size=args.batch_size,
                                index=index, quant_scales=quant_scales)
    server = serve(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()
    return 0


def cmd_bench(args) -> int:
    if args.train:
        import json as _json

        from soft_contrastive_learning_tpu import bench_train

        res = bench_train.run(
            tuples_per_batch=args.tuples_per_batch,
            num_points=args.num_points,
            use_cache=not args.no_cache,
            steps_per_dispatch=args.steps_per_dispatch,
            async_mining=args.async_mining,
        )
        print(_json.dumps(res))
        return 0
    from soft_contrastive_learning_tpu import benchmark

    benchmark.main()
    return 0


def cmd_cache(args) -> int:
    """Write the decoded-uint8 image cache (data/decoded_cache.py): a prep
    stage that moves image decode off the training hot path."""
    from soft_contrastive_learning_tpu.data.decoded_cache import (
        cache_training_sets,
    )
    from soft_contrastive_learning_tpu.data.pipeline import (
        FilesystemSource, ToyCitySource,
    )

    if args.toy_city:
        source = ToyCitySource(img_h=args.image_height, img_w=args.image_width)
    else:
        source = FilesystemSource(
            args.img_root, args.shuffled_root, args.anchor_root,
            args.loc_ref_root,
        )
    cluster_sets = []
    for spec in (args.cluster_sets or "").split(","):
        if spec:
            name, r = spec.rsplit(":", 1)
            cluster_sets.append((name, int(r)))
    cache_training_sets(
        source,
        [s for s in args.sets.split(",") if s],
        args.image_height, args.image_width,
        keep_aspect=args.vlad_cores > 0,
        cache_dir=args.cache_dir,
        cluster_sets=cluster_sets,
        num_workers=args.num_workers,
    )
    return 0


def cmd_parity(args) -> int:
    """Descriptor parity vs a converted reference TF1 checkpoint
    (PARITY.md layer 2; reference restore contract train/train.py:882-905)."""
    import json

    from soft_contrastive_learning_tpu.evaluation.parity import run_parity

    report = run_parity(
        checkpoint=args.checkpoint,
        images=args.images,
        golden=args.golden,
        out=args.out,
        tolerance=args.tolerance,
    )
    print(json.dumps(report.to_dict(), indent=1))
    if report.passed is False:
        return 1
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="scl-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train an embedding model")
    _add_train_flags(p)
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("infer", help="batch descriptor extraction")
    p.add_argument("--set", required=True)
    p.add_argument("--csv_root", required=True)
    p.add_argument("--img_root", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--out_name", default="model")
    p.add_argument("--out_root", default="lv")
    p.add_argument("--out_dim", type=int, default=512)
    p.add_argument("--reduction", default="none")
    p.add_argument("--vlad_cores", type=int, default=64)
    p.add_argument("--images_per_pass", type=int, default=32)
    p.add_argument("--dump_dtype", default="float32",
                   choices=("float32", "float16"),
                   help="storage dtype of the feature dump; float16 halves "
                        "the pipeline's dominant disk/transfer cost "
                        "(characterized in docs/REHEARSAL.md)")
    p.set_defaults(func=cmd_infer)

    p = sub.add_parser("topn", help="top-N retrieval sweep")
    p.add_argument("--pca_lv_pickle", required=True)
    p.add_argument("--ref_lv_pickle", required=True)
    p.add_argument("--query_lv_pickle", required=True)
    p.add_argument("--ref_csv", required=True)
    p.add_argument("--query_csv", required=True)
    p.add_argument("--out_root", default="top_n")
    p.add_argument("--N", type=int, default=25)
    p.add_argument("--dims", default="", help="comma list, e.g. 64,256 (default: full reference sweep)")
    p.add_argument("--spacings", default="", help="comma list, e.g. 0.0,1.0")
    p.set_defaults(func=cmd_topn)

    p = sub.add_parser("roc", help="compile ROC figures")
    p.add_argument("--top_n_root", required=True)
    p.add_argument("--out_root", default="figs")
    p.add_argument("--l", default="0.0")
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--queries", default="",
                   help="comma-separated query-set names to plot instead of "
                        "the reference's five paper conditions (roc.py "
                        "DEFAULT_QUERIES), e.g. 'toy_query'")
    p.set_defaults(func=cmd_roc)

    p = sub.add_parser("prep", help="run the RobotCar ETL pipeline")
    p.add_argument("--root", required=True)
    p.add_argument("--raw_img_root", default="")
    p.add_argument("--ins_root", default="")
    p.add_argument("--tar_root", default="")
    p.add_argument("--img_root", default="")
    p.add_argument("--camera_models", default="")
    p.add_argument("--mask_root", default="")
    p.add_argument("--max_epochs", type=int, default=5)
    p.add_argument("--task_id", type=int, default=0,
                   help=">0: process only the task_id-th date (array jobs)")
    p.add_argument("--statistics", action="store_true",
                   help="also run stage 009 dataset statistics")
    p.add_argument("--tag_root", default="")
    p.set_defaults(func=cmd_prep)

    p = sub.add_parser("metrics", help="summarize/plot a run's JSONL metrics")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--tb-export", dest="tb_export", action="store_true",
                   help="write TensorBoard event files (run_dir/tb/{role}) "
                        "from the JSONL metrics")
    p.set_defaults(func=cmd_metrics)

    p = sub.add_parser("quant", help="calibrate int8 PTQ activation scales")
    p.add_argument("--checkpoint", default="", help="npz TF1 export (optional)")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--num_images", type=int, default=32)
    p.add_argument("--out", required=True, help="output scales JSON")
    p.add_argument("--allow_random", action="store_true",
                   help="permit calibration without a checkpoint (smoke only)")
    p.add_argument("--vlad_cores", type=int, default=64)
    p.add_argument("--reduction", default="none")
    p.add_argument("--out_dim", type=int, default=512)
    p.set_defaults(func=cmd_quant)

    p = sub.add_parser("serve", help="HTTP descriptor-embedding service")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--index", default="", help="feature pickle to serve /search from")
    p.add_argument("--vlad_cores", type=int, default=64)
    p.add_argument("--reduction", default="none")
    p.add_argument("--out_dim", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8377)
    p.add_argument("--quant_scales", default="",
                   help="JSON of int8 PTQ activation scales (scl-tpu quant "
                        "calibration output) — serve with the int8 conv stack")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser("bench", help="embedding-throughput benchmark")
    p.add_argument("--train", action="store_true",
                   help="end-to-end train-loop throughput (sampler + decode/"
                        "cache + prefetch + step) instead of the embed bench")
    p.add_argument("--tuples_per_batch", type=int, default=2)
    p.add_argument("--num_points", type=int, default=600)
    p.add_argument("--no_cache", action="store_true",
                   help="decode images in the producer instead of the "
                        "decoded-uint8 cache")
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--async_mining", action="store_true",
                   help="overlap the mining-cache refresh with training "
                        "(stale-window) instead of the reference barrier")
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser(
        "cache", help="write the decoded-uint8 image cache (prep stage)"
    )
    p.add_argument("--cache_dir", required=True)
    p.add_argument("--sets", default="train_ref,test_ref",
                   help="comma list of set names to cache")
    p.add_argument("--cluster_sets", default="",
                   help="comma list of cluster eval sets as name:r, "
                        "e.g. train_ref:5,test_ref:5")
    p.add_argument("--img_root", default="")
    p.add_argument("--shuffled_root", default="")
    p.add_argument("--anchor_root", default="")
    p.add_argument("--loc_ref_root", default="")
    p.add_argument("--toy_city", action="store_true")
    p.add_argument("--image_height", type=int, default=180)
    p.add_argument("--image_width", type=int, default=240)
    p.add_argument("--vlad_cores", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.set_defaults(func=cmd_cache)

    p = sub.add_parser(
        "parity",
        help="descriptor parity vs a converted reference TF1 checkpoint",
    )
    p.add_argument("--checkpoint", required=True,
                   help="TF1 checkpoint export (.npz of {tf_name: array})")
    p.add_argument("--images", required=True,
                   help="image directory or newline-separated list file")
    p.add_argument("--golden", default=None,
                   help=".npz with reference 'descriptors' for the same images")
    p.add_argument("--out", default=None,
                   help="write our descriptors (.npz) for offline comparison")
    p.add_argument("--tolerance", type=float, default=1e-3,
                   help="max-abs descriptor tolerance for pass/fail")
    p.set_defaults(func=cmd_parity)

    args = parser.parse_args(argv)
    _enable_compile_cache()
    return args.func(args)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every CLI run, on by default.

    Remote compiles through the TPU relay cost 2-40 s per program and the
    CLI workflows re-pay them every invocation (the top-N sweep alone
    compiles ~28 retrieval shapes; the flagship forward is 20-40 s). The
    cache is keyed by XLA's own fingerprint, so staleness is impossible —
    a toolchain bump just misses and re-fills. Opt out with
    SCL_COMPILE_CACHE_DIR=off; an explicit JAX_COMPILATION_CACHE_DIR (how
    benchmark.py points children at the committed perf/jax_cache) wins."""
    d = os.environ.get("SCL_COMPILE_CACHE_DIR", "")
    if d.lower() == "off" or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    d = d or os.path.join(
        os.path.expanduser("~"), ".cache", "scl_tpu", "jax_cache"
    )
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # default threshold (1 s) skips the small per-shape retrieval
        # programs that dominate the sweep's compile count
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass  # cache is an optimization; never fail a CLI run over it


if __name__ == "__main__":
    sys.exit(main())
