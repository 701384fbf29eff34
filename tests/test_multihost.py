"""Real 2-process jax.distributed bootstrap test (no TPU pod required).

Spawns two CPU-backend subprocesses (tests/multihost_worker.py), wires them
through ``initialize_multihost`` over a localhost coordinator, checks a
cross-process collective, and verifies writer election: in the shared run
dir, only the primary process wrote config/checkpoints/metrics. This is the
executable counterpart of SURVEY.md §5's 'distributed communication backend'
row (the reference has none; coordination there is filesystem + qsub).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_dir = str(tmp_path / "run")
    worker = os.path.join(_REPO, "tests", "multihost_worker.py")

    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), out_dir],
            env=env,
            cwd=_REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)  # 1-core CI boxes are slow
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["process_id"]: o for o in outs}
    for pid, o in by_pid.items():
        assert o["process_count"] == 2
        assert o["local_device_count"] == 2
        assert o["global_device_count"] == 4
        assert o["process_index"] == pid
        assert o["primary"] == (pid == 0)
        # the cross-process psum saw every shard
        assert o["psum"] == o["expected_psum"]
        assert o["steps"] > 0

    # Writer election: exactly the primary's artifacts exist, once.
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    metrics = os.path.join(out_dir, "metrics_local.jsonl")
    assert os.path.exists(metrics)
    with open(metrics) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    # Two processes ran the same steps; had both written, every (step, tag)
    # would appear twice. Primary-only writing means each appears once.
    keys = [(r["step"], r["tag"]) for r in recs]
    assert len(keys) == len(set(keys)), "non-primary process also wrote metrics"
    ckpt_root = os.path.join(out_dir, "checkpoints", "part")
    assert os.path.isdir(ckpt_root)
    steps = [d for d in os.listdir(ckpt_root) if d.isdigit()]
    assert steps, "primary wrote no part checkpoints"
