"""Persistent AOT program store built on ``jax.export``.

Cold-process latency on the verkle path is dominated by Python TRACING of
the big fixed-shape jit programs (~25-30 s measured in round 2) — the
persistent XLA compilation cache only skips the backend compile, not the
trace/lower step. This module serializes the traced StableHLO once per
(program, arg shapes, statics, platform, jax version) to ``.jax_aot/`` and
re-loads it in later processes, so a warm process pays neither tracing nor
compilation.

The reference has no analog (its programs are AOT by construction —
compiled Rust); this is the TPU-native equivalent of shipping compiled
kernels (SURVEY.md §5 checkpoint/config rows).

Usage::

    _commit_dev = aot_jit(_commit_impl, "verkle_sparse_commit",
                          static_argnames=("t",))
    pts = _commit_dev(basis, idx, scal, t=4)

Behavior notes:
  * keyed by abstract shapes/dtypes — one artifact per distinct shape set;
  * falls back to plain ``jax.jit`` on ANY export/deserialize failure
    (e.g. an unknown custom call on a new backend) and remembers the
    fallback for the process lifetime;
  * ``VKZG_AOT=0`` disables the store entirely (plain jit);
  * Pallas/Mosaic programs export as ``tpu_custom_call`` custom calls,
    which have no cross-release stability guarantee — fine here, since the
    store is a same-machine cache keyed by jax version, not a distribution
    format. The corresponding safety checks are disabled on export and
    deserialize.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pathlib
import threading

import jax
from jax import export as jexport

__all__ = ["aot_jit", "aot_dir", "clear_memory_cache"]

_LOCK = threading.Lock()
# key -> callable taking the ARRAY arguments only
_MEM: dict[str, object] = {}

_CUSTOM_CALLS = ("tpu_custom_call", "Sharding", "annotate_device_placement")


def aot_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "VKZG_AOT_DIR",
            str(pathlib.Path(__file__).resolve().parents[2] / ".jax_aot"),
        )
    )


def _enabled() -> bool:
    return os.environ.get("VKZG_AOT", "1") != "0"


def clear_memory_cache() -> None:
    """Drop in-process entries (tests; on-disk artifacts are kept)."""
    with _LOCK:
        _MEM.clear()


def _disabled_checks():
    return [jexport.DisabledSafetyCheck.custom_call(c) for c in _CUSTOM_CALLS]


@functools.cache
def _source_digest() -> bytes:
    """Content hash of the package's .py sources: an artifact must never
    outlive the code that traced it (same name/shapes + edited internals
    would silently run the OLD program otherwise)."""
    pkg = pathlib.Path(__file__).resolve().parents[1]
    h = hashlib.sha256()
    for p in sorted(pkg.rglob("*.py")):
        h.update(p.read_bytes())
    return h.digest()


def _key(name: str, args, statics) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    h.update(_source_digest())
    # trace-affecting knobs (pallas dispatch, signed digits, mul unroll,
    # window width), read RESOLVED from the modules that consume them
    # (knobs.snapshot) — an artifact traced under one variant must never
    # shadow a run under another, and key + behavior must share a source
    from ..knobs import snapshot

    h.update(snapshot().encode())
    h.update(name.encode())
    h.update(repr(statics).encode())
    for leaf in jax.tree_util.tree_leaves(args):
        h.update(str(jax.api_util.shaped_abstractify(leaf)).encode())
    return h.hexdigest()[:24]


def _load_or_export(key: str, name: str, jfn, args):
    path = aot_dir() / f"{name}-{key}.jaxexp"
    if path.exists():
        try:
            # jit the bound .call so repeat invocations hit the dispatch
            # cache instead of re-staging the embedded module each time
            return jax.jit(jexport.deserialize(path.read_bytes()).call)
        except Exception:
            # stale/corrupt artifact: fall through to re-export over it
            pass
    try:
        exp = jexport.export(jfn, disabled_checks=_disabled_checks())(*args)
        data = exp.serialize()
    except Exception:
        return jfn  # unexportable program: plain jit for this process
    try:
        aot_dir().mkdir(exist_ok=True)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        tmp.write_bytes(data)
        os.replace(tmp, path)
    except OSError:
        pass  # read-only checkout etc. — still use the in-memory export
    return jax.jit(exp.call)


def aot_jit(fn, name: str, static_argnames: tuple[str, ...] = ()):
    """jit ``fn`` with a persistent export store.

    Static arguments MUST be passed as keyword arguments at call time;
    array arguments positionally (keeps the exported calling convention —
    arrays only — trivially alignable)."""

    jits: dict[tuple, object] = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        statics = tuple(sorted(kwargs.items()))
        assert all(k in static_argnames for k, _ in statics), (
            "aot_jit: only static args may be keywords"
        )
        jfn = jits.get(statics)
        if jfn is None:
            jfn = jits[statics] = jax.jit(functools.partial(fn, **kwargs))
        if not _enabled():
            return jfn(*args)
        key = _key(name, args, statics)
        with _LOCK:
            entry = _MEM.get(key)
        if entry is None:
            entry = _load_or_export(key, name, jfn, args)
            with _LOCK:
                _MEM[key] = entry
        return entry(*args)

    return wrapper
