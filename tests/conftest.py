"""Test harness: run everything on an emulated 8-device CPU mesh.

The standard JAX trick (SURVEY.md §4): split the host platform into 8 virtual
devices so jit/shard_map/NamedSharding code paths run exactly as they would on
an 8-chip TPU slice.

The image's sitecustomize imports jax and pins ``JAX_PLATFORMS=axon`` (the TPU
tunnel) before any of our code runs, so plain env-var edits are too late.
``jax.config.update`` works until the backend is first touched, and XLA_FLAGS
is read at backend init — both still unset at conftest import time.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
