"""Test configuration: force a virtual 8-device CPU mesh.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some environments (the axon TPU tunnel) register a PJRT plugin at
# interpreter start and force jax_platforms; override it back to the
# virtual-device CPU mesh the test suite is designed for.
jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated on this 1-core harness; the persistent
# cache makes every run after the first warm (keys hash the HLO, so
# code changes invalidate exactly the programs they touch).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_DATA = "/root/reference/data"
REF_GOLDEN = "/root/reference/src/V1/feat"


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURES, name)


def load_f32(name: str, shape) -> np.ndarray:
    return np.fromfile(fixture_path(name), dtype=np.float32).reshape(shape)


def load_xyv(name: str):
    rec = np.fromfile(fixture_path(name), dtype=np.float32).reshape(-1, 3)
    return rec[:, 0].copy(), rec[:, 1].copy(), rec[:, 2].view(np.int32).copy()


@pytest.fixture(scope="session")
def provided_frames():
    """The 10-frame images_provided sequence (uint8 [240, 320] each)."""
    from klt_tpu.io.pnm import read_pgm
    d = os.path.join(REF_DATA, "images_provided")
    if not os.path.isdir(d):
        pytest.skip("images_provided dataset not available")
    return [read_pgm(os.path.join(d, f"img{i}.pgm")) for i in range(10)]


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full fuzz matrices)")


def pytest_collection_modifyitems(config, items):
    if (config.getoption("--runslow") or
            os.environ.get("KLT_TPU_SLOW_TESTS") == "1"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or "
                            "KLT_TPU_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _quiet():
    import klt_tpu
    klt_tpu.set_verbosity(0)
    yield
