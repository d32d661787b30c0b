"""Radix-2 evaluation domain over Fr with the precomputations the protocols
need (the equivalent of ``vector-commit/src/precompute.rs`` +
ark_poly's Radix2EvaluationDomain).

Host side keeps python-int mirrors for O(1) protocol arithmetic (transcript
challenges, single barycentric vectors); device side keeps Montgomery-form
limb planes — LAYOUT (L, N): domain elements ride the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hostmath.field import fr_batch_inverse, fr_inv
from ..params import R, NLIMBS, fr_root_of_unity
from ..ops import field as df
from ..ops.limbs import ints_to_limbs

L = NLIMBS


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


@functools.lru_cache(maxsize=None)
class Domain:
    """Evaluation domain of ``size`` (rounded up to a power of two, like
    ark_poly GeneralEvaluationDomain::new, used at
    ``vector-commit/src/precompute.rs:26``)."""

    def __init__(self, size: int):
        self.size = _next_pow2(size)
        n = self.size
        self.omega = fr_root_of_unity(n)
        self.omega_inv = fr_inv(self.omega)
        self.size_inv = fr_inv(n)

        # omegas[i] = w^i
        self.omegas = [1] * n
        for i in range(1, n):
            self.omegas[i] = self.omegas[i - 1] * self.omega % R

        # A'(w^i) = N / w^i and inverses (precompute.rs:46-58)
        self.vanishing = [n * fr_inv(w) % R for w in self.omegas]
        self.vanishing_inv = fr_batch_inverse(self.vanishing)

    # -- device mirrors (Montgomery form, (L, N)), built lazily --------------

    @functools.cached_property
    def d_omegas(self) -> jnp.ndarray:
        return df.to_mont(jnp.asarray(ints_to_limbs(self.omegas).T), "fr")

    @functools.cached_property
    def d_vanishing(self) -> jnp.ndarray:
        return df.to_mont(jnp.asarray(ints_to_limbs(self.vanishing).T), "fr")

    @functools.cached_property
    def d_vanishing_inv(self) -> jnp.ndarray:
        return df.to_mont(jnp.asarray(ints_to_limbs(self.vanishing_inv).T), "fr")

    def invdiff_rows(self, z_sel: jnp.ndarray) -> jnp.ndarray:
        """(Zq, L, N) Montgomery rows InvDiff[k, :, i] = 1/(w^i - w^z_k),
        zero where i == z_k — computed ON DEMAND for the selected domain
        indices only (one broadcast subtract + batched inversion), so
        in-domain quotients never materialize the O(N^2) all-pairs tensor
        and large domains (e.g. the 2^20 CRS) stay in budget. Feeds the
        quotient kernel (``lagrange_basis.rs:91-119``)."""
        return _invdiff_rows(self.d_omegas, jnp.asarray(z_sel, jnp.int32))

    # -- host-side helpers ---------------------------------------------------

    def element(self, index: int) -> int:
        """w^index (``lagrange_basis.rs:86-88``)."""
        return self.omegas[index % self.size]

    def barycentric_coefficients(self, point: int) -> list:
        """The b vector: one-hot inside the integer-index domain, else
        b_i = ((z^N - 1)/N) * w^i / (z - w^i). Bit-exact mirror of
        ``precompute.rs:72-90`` including the ``point < size`` shortcut."""
        n = self.size
        if 0 <= point < n:
            res = [0] * n
            res[point] = 1
            return res
        t = (pow(point, n, R) - 1) * self.size_inv % R
        denoms = fr_batch_inverse([(point - w) % R for w in self.omegas])
        return [t * w % R * d % R for w, d in zip(self.omegas, denoms)]


@jax.jit
def _invdiff_rows(omegas: jnp.ndarray, z_sel: jnp.ndarray) -> jnp.ndarray:
    """(L, N) domain omegas x (Zq,) int32 indices -> (Zq, L, N) rows of
    1/(w^i - w^z) with zeros on the i == z diagonal (batch_inv_mont's
    zero-skip semantics)."""
    n = omegas.shape[-1]
    zq = z_sel.shape[0]
    wz = jnp.moveaxis(omegas[:, z_sel], -1, 0)[:, :, None]  # (Zq, L, 1)
    wi = jnp.broadcast_to(omegas[None], (zq, L, n))
    diff = df.sub(wi, jnp.broadcast_to(wz, (zq, L, n)), "fr")
    return df.batch_inv_mont(diff, "fr", axis=-1)
