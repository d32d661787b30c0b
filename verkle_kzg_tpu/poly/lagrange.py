"""Device-resident evaluation-form polynomial vector (LagrangeBasis).

Mirrors the semantics of ``vector-commit/src/lagrange_basis.rs`` — including
the ``max`` watermark (data can be shorter than the domain; indices >= max
read as zero) and the 3-path ``evaluate`` — but stores the data as a
Montgomery-form limb-plane array so all batched math runs on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R, NLIMBS
from ..ops import field as df
from ..ops.limbs import ints_to_limbs, limbs_to_ints
from .domain import Domain

L = NLIMBS


@jax.jit
def _quotient_in_domain(vals, invdiff_row, vanishing_ratio_row, index):
    """q = (f - f[index]) / (X - w^index) on the domain, with the q[index]
    correction term of ``lagrange_basis.rs:91-119``.

    invdiff_row[i] = 1/(w^i - w^index) (0 at i = index);
    vanishing_ratio_row[i] = A'(w^index) / A'(w^i).
    """
    f_z = vals[index]
    sub = df.sub(vals, jnp.broadcast_to(f_z, vals.shape), "fr")  # f_i - f_z
    q = df.mont_mul(sub, invdiff_row, "fr")  # zero at i=index (invdiff 0)
    # q[index] = sum_i (f_i - f_z) * ratio_i * (1/(w^z - w^i))
    #          = sum_i -(f_i - f_z) * ratio_i * invdiff_row[i]
    corr_terms = df.neg(df.mont_mul(q, vanishing_ratio_row, "fr"), "fr")
    corr = df.lazy_sum(corr_terms, 0, "fr")
    return q.at[index].set(corr)


@jax.jit
def _quotient_out_domain(vals, eval_mont, inv_terms):
    """q_i = (f_i - f(z)) / (w^i - z)  (``lagrange_basis.rs:121-142``)."""
    sub = df.sub(vals, jnp.broadcast_to(eval_mont, vals.shape), "fr")
    return df.mont_mul(sub, inv_terms, "fr")


@dataclasses.dataclass
class FrVector:
    """Data vector in evaluation form over ``domain``; ``vals`` is a
    (domain.size, L) Montgomery-form device array, zero-padded past ``max``."""

    vals: jnp.ndarray
    max: int
    domain: Domain

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_ints(data, domain: Domain | None = None) -> "FrVector":
        data = [d % R for d in data]
        if domain is None:
            domain = Domain(len(data))
        n = domain.size
        assert len(data) <= n
        padded = data + [0] * (n - len(data))
        vals = df.to_mont(jnp.asarray(ints_to_limbs(padded)), "fr")
        return FrVector(vals, len(data), domain)

    @staticmethod
    def zero(domain: Domain) -> "FrVector":
        return FrVector(df.zeros((domain.size,)), domain.size, domain)

    def to_ints(self) -> list:
        return limbs_to_ints(df.from_mont(self.vals, "fr"))

    def to_scalars_standard(self) -> jnp.ndarray:
        """Standard-form limbs for MSM consumption."""
        return df.from_mont(self.vals, "fr")

    # -- reference-semantics evaluation (lagrange_basis.rs:59-72) -----------

    def get(self, index: int) -> int:
        return limbs_to_ints(df.from_mont(self.vals[index], "fr").reshape(1, L))[0]

    def evaluate(self, point: int) -> int:
        """3-path evaluate: stored / zero-inside-domain / barycentric.

        The boundaries replicate the reference exactly: stored if
        point <= max-1, zero if point <= domain_size, else barycentric
        (note the reference's own off-by-one quirks, SURVEY.md §5 item 2,
        are preserved faithfully here)."""
        if point <= self.max - 1:
            return self.get(point)
        if point <= self.domain.size:
            return 0
        return self.evaluate_outside_domain(point)

    def evaluate_outside_domain(self, point: int) -> int:
        b = self.domain.barycentric_coefficients(point)
        vals = self.to_ints()
        return sum(v * c % R for v, c in zip(vals, b)) % R

    # -- quotients ------------------------------------------------------------

    def divide_by_vanishing(self, index: int) -> "FrVector":
        """In-domain quotient (``lagrange_basis.rs:91-119``)."""
        n = self.domain.size
        invdiff_row = self.domain.d_invdiff[index]  # 1/(w^i - w^index)
        ratio = df.mont_mul(
            jnp.broadcast_to(self.domain.d_vanishing[index], (n, L)),
            self.domain.d_vanishing_inv,
            "fr",
        )  # A'(z)/A'(i)
        q = _quotient_in_domain(self.vals, invdiff_row, ratio, jnp.int32(index))
        return FrVector(q, n, self.domain)

    def divide_by_vanishing_outside(self, point: int) -> "FrVector":
        """Out-of-domain quotient (``lagrange_basis.rs:121-142``)."""
        n = self.domain.size
        ev = self.evaluate(point)
        z_mont = df.to_mont(jnp.asarray(ints_to_limbs([point % R])), "fr")[0]
        diff = df.sub(self.domain.d_omegas, jnp.broadcast_to(z_mont, (n, L)), "fr")
        inv_terms = df.batch_inv_mont(diff, "fr")
        ev_mont = df.to_mont(jnp.asarray(ints_to_limbs([ev])), "fr")[0]
        q = _quotient_out_domain(self.vals, ev_mont, inv_terms)
        return FrVector(q, n, self.domain)

    # -- arithmetic ------------------------------------------------------------

    def __add__(self, other: "FrVector") -> "FrVector":
        assert self.domain is other.domain
        return FrVector(
            df.add(self.vals, other.vals, "fr"), max(self.max, other.max), self.domain
        )

    def __sub__(self, other: "FrVector") -> "FrVector":
        assert self.domain is other.domain
        return FrVector(
            df.sub(self.vals, other.vals, "fr"), max(self.max, other.max), self.domain
        )

    def scale(self, k: int) -> "FrVector":
        k_mont = df.to_mont(jnp.asarray(ints_to_limbs([k % R])), "fr")[0]
        return FrVector(
            df.mont_mul(self.vals, jnp.broadcast_to(k_mont, self.vals.shape), "fr"),
            self.max,
            self.domain,
        )

    def inner_product_ints(self, other_ints: list) -> int:
        """<self, other> mod r with ``other`` as host ints (protocol-size
        vectors only; batched paths use device inner products)."""
        vals = self.to_ints()
        return sum(v * o % R for v, o in zip(vals, other_ints)) % R
