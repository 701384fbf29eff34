"""Driver-contract tests for ``__graft_entry__``.

The round-1 driver check failed because ``dryrun_multichip`` asserted on the
device count instead of self-provisioning the virtual CPU mesh
(MULTICHIP_r01.json: ``ok: false, "need 8 devices, have 1"``). These tests
pin the contract: the function must succeed no matter how many devices the
calling process has, by re-exec'ing a child with
``--xla_force_host_platform_device_count`` and the platform forced to CPU.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun_subprocess(n_devices: int, extra_env: dict) -> str:
    env = dict(os.environ)
    env.pop("SCL_TPU_DRYRUN_CHILD", None)
    env.update(extra_env)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"import __graft_entry__ as g; g.dryrun_multichip({n_devices})"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Simulate the driver: fresh interpreter, default env (sitecustomize may
    bring up the single-chip axon backend), ask for an 8-device dryrun."""
    out = _run_dryrun_subprocess(8, extra_env={})
    assert "sharded-topk ok" in out


@pytest.mark.slow
def test_dryrun_multichip_in_process(mesh8):
    """When the calling process already has >= n devices (pytest's 8-CPU
    mesh), the dryrun runs in-process without a re-exec."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)
