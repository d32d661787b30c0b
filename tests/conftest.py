"""Test configuration: force an 8-device virtual CPU mesh BEFORE any jax use
so multi-chip sharding paths are exercised without TPU hardware (and so unit
tests never dispatch op-by-op to a remote TPU tunnel — note the tunnel
plugin ignores the JAX_PLATFORMS env var; jax.config is authoritative)."""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT-cache noise

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the limb-plane kernels produce large HLO graphs;
# caching makes re-runs compile-free.
import pathlib

# CPU-only cache, SEPARATE from the TPU/tunnel processes' .jax_cache:
# entries written by axon-connected processes carry mismatched CPU feature
# flags and sporadically segfault the AOT loader when tests re-load them.
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# Slow-test gating: the DEFAULT `pytest tests/` run is the CI gate and must
# complete in a bounded window on a 1-core box. Tests marked `slow` (the
# shipped-geometry width-256 suite, interpret-mode Pallas kernel drives,
# the 2^17-query multiproof) are deselected by default; run them with
#     pytest tests/ --runslow        (or VKZG_SLOW_TESTS=1)
# The slow set is coverage-additive only: every code path it exercises also
# runs in the fast set at smaller shapes.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (shipped-geometry / interpret-mode)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (see conftest)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("VKZG_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow: use --runslow / VKZG_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
