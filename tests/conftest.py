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

# XLA:CPU's LoadedExecutable.serialize() sporadically SIGSEGVs in long
# multi-compile pytest processes (observed twice in round 3: the FIRST
# serialize in a fresh process succeeds, a later one after many compiles
# dies inside put_executable_and_time). Until the upstream bug is gone,
# run each persistent-cache write in a forked child: a crash there loses
# one cache entry (recompiled next run), never the suite. The child is
# alarm-bounded in case the post-fork serialize deadlocks on a thread-pool
# mutex instead of crashing.
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


def _forked_put(cache_key, module_name, executable, backend, compile_time):
    pid = os.fork()
    if pid == 0:  # child
        code = 1
        try:
            import signal

            signal.alarm(300)
            _orig_put(cache_key, module_name, executable, backend, compile_time)
            code = 0
        finally:
            os._exit(code)  # never run pytest/atexit machinery in the child
    os.waitpid(pid, 0)


_cc.put_executable_and_time = _forked_put


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
