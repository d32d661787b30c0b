"""jax.profiler capture helpers (SURVEY.md §5 tracing row; the reference's
analog is the criterion+pprof flamegraph wiring at ``benches/ipa.rs:161-169``).

Usage::

    from verkle_kzg_tpu.utils.profiling import device_trace
    with device_trace("/tmp/vkzg-trace"):
        msm_auto(points, scalars).block_until_ready()

The captured directory opens in Perfetto / TensorBoard's profile plugin and
shows per-kernel device timelines (pallas kernels appear as custom calls).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of everything inside the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-span inside a device_trace capture."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
