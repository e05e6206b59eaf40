"""Test configuration: run everything on a virtual 8-device CPU mesh.

Environment variables must be set before jax is first imported, which is why
they live at conftest import time (mirrors SURVEY.md §4 test plan item (c)).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# single-core CI box: don't let XLA oversubscribe threads
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# this image pre-imports jax via sitecustomize with a TPU platform latched in
# jax.config; force CPU here (XLA_FLAGS above still applies — no backend has
# been initialized yet at conftest time)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset():
    """Tiny synthetic radar dataset: (8 days, 24, 64, 64) strictly positive
    rain blobs plus a valid-index list, mirroring BASELINE config 2."""
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(n_days=8, ny=64, nx=64, seed=0)
