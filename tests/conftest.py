"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU backend and forces
``jax_platforms='axon,cpu'`` via jax.config (overriding the JAX_PLATFORMS env
var), so tests must re-override the config AFTER importing jax but before any
backend initializes. Multi-chip sharded paths then run on 8 virtual CPU
devices (SURVEY.md §4 test plan).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def mesh8():
    from soft_contrastive_learning_tpu.parallel.mesh import make_mesh

    return make_mesh(num_data=8)
