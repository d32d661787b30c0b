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
