"""Test configuration: 8 virtual CPU devices, x64 available for parity tests.

The multi-device CPU mesh is the TPU analog of the reference's
Docker-rosbridge fake network (SURVEY.md §4): it lets sharding/collective
paths run and be validated without TPU hardware.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; this does not
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DATA = "/root/reference/scripts/data_IJAC2018.mat"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    XLA:CPU in this environment segfaults inside backend_compile after
    ~85 tests' worth of accumulated live executables in one process
    (deterministic at the same test index across runs; every module
    passes in isolation).  Capping the live-executable count avoids the
    crasher at the cost of some recompilation."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def ijac():
    from icm_slam_tpu.data.datasets import load_ijac2018
    return load_ijac2018(REF_DATA)


@pytest.fixture(scope="session")
def golden_small():
    path = os.path.join(GOLDEN_DIR, "ijac2018_T400_N3_inconsistent.npz")
    if not os.path.exists(path):
        pytest.skip("small golden trace not generated")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_full():
    path = os.path.join(GOLDEN_DIR, "ijac2018_T1833_N30_inconsistent.npz")
    if not os.path.exists(path):
        pytest.skip("full golden trace not generated")
    return np.load(path)
