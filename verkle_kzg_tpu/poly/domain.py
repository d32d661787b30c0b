"""Radix-2 evaluation domain over Fr with the precomputations the protocols
need (the equivalent of ``vector-commit/src/precompute.rs`` +
ark_poly's Radix2EvaluationDomain).

Host side keeps python-int mirrors for O(1) protocol arithmetic (transcript
challenges, single barycentric vectors); device side keeps Montgomery-form
limb planes — LAYOUT (L, N): domain elements ride the lane axis.
"""

from __future__ import annotations

import functools

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

    @functools.cached_property
    def d_invdiff(self) -> jnp.ndarray:
        """(Z, L, N) Montgomery tensor InvDiff[z, :, i] = 1/(w^i - w^z), zero
        on the diagonal. One-time cost per domain; feeds every in-domain
        quotient (``lagrange_basis.rs:91-119``) as a dense row gather."""
        n = self.size
        wi = jnp.broadcast_to(self.d_omegas[None], (n, L, n))
        wz = jnp.moveaxis(self.d_omegas, -1, 0)[:, :, None]  # (N, L, 1)
        diff = df.sub(wi, jnp.broadcast_to(wz, (n, L, n)), "fr")
        return df.batch_inv_mont(diff, "fr", axis=-1)

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
