"""Export a training run's final checkpoint as the committed flagship
trained-params artifact (``soft_contrastive_learning_tpu/assets/
flagship_trained.npz``).

Round-3 verdict: the int8-PTQ quality gate calibrated and certified on
seed-0 RANDOM weights — the activation distributions PTQ actually has to
survive are a trained network's. This exports the params from a real
training run (e.g. perf/quality_run.py's /tmp/scl_quality_run) so
flagship.flagship_params(), benchmark.py's gate, and the driver entry all
run on trained weights. float16 storage (see flagship.save_trained_params)
halves the artifact; the gate compares quantized-vs-float on the SAME
loaded params, so storage rounding cancels out of the parity question.

Usage:
    PYTHONPATH=. python scripts/export_flagship_params.py /tmp/scl_quality_run

Reference counterpart: the restore-for-serving seam,
reference evaluation/inference.py:122-144.
"""

import sys

from soft_contrastive_learning_tpu import flagship
from soft_contrastive_learning_tpu.checkpoints.manager import load_run_params


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(f"usage: {sys.argv[0]} <run_dir>")
    run_dir = sys.argv[1]
    run_model_cfg, params = load_run_params(run_dir)
    path = flagship.TRAINED_PARAMS_PATH
    flagship.save_trained_params(params)
    # loud round-trip: a key/shape mismatch vs the current flagship
    # architecture must fail HERE, not in the next benchmark run
    cfg = flagship.flagship_model_config()
    reloaded = flagship.load_trained_params(cfg)
    assert reloaded is not None
    print(f"exported params from {run_dir} (run model cfg: {run_model_cfg}) "
          f"-> {path}")


if __name__ == "__main__":
    main()
