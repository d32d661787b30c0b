"""Device-resident evaluation-form polynomial vector (LagrangeBasis).

Mirrors the semantics of ``vector-commit/src/lagrange_basis.rs`` — including
the ``max`` watermark (data can be shorter than the domain; indices >= max
read as zero) and the 3-path ``evaluate`` — but stores the data as a
Montgomery-form limb-plane array of shape (L, N) (elements in lanes) so all
batched math runs packed on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..params import R, NLIMBS
from ..ops import field as df
from ..ops.limbs import ints_to_limbs, limbs_to_ints
from .domain import Domain

L = NLIMBS


@jax.jit
def _quotient_in_domain(vals, invdiff_row, vanishing_ratio_row, index):
    """q = (f - f[index]) / (X - w^index) on the domain, with the q[index]
    correction term of ``lagrange_basis.rs:91-119``.

    vals/invdiff_row/ratio: (L, N); invdiff_row[:, i] = 1/(w^i - w^index)
    (zero at i = index); ratio[:, i] = A'(w^index) / A'(w^i).
    """
    f_z = jax.lax.dynamic_slice_in_dim(vals, index, 1, axis=-1)  # (L, 1)
    sub = df.sub(vals, jnp.broadcast_to(f_z, vals.shape), "fr")  # f_i - f_z
    q = df.mont_mul(sub, invdiff_row, "fr")  # zero at i = index
    # q[index] = sum_i -(f_i - f_z) * ratio_i * invdiff_row[i]
    corr_terms = df.neg(df.mont_mul(q, vanishing_ratio_row, "fr"), "fr")
    corr = df.lazy_sum_lanes(corr_terms, "fr")  # (L, 1)
    lane = jnp.arange(q.shape[-1])[None, :] == index
    return jnp.where(lane, corr, q)


@jax.jit
def _quotient_out_domain(vals, eval_mont, inv_terms):
    """q_i = (f_i - f(z)) / (w^i - z)  (``lagrange_basis.rs:121-142``)."""
    sub = df.sub(vals, jnp.broadcast_to(eval_mont, vals.shape), "fr")
    return df.mont_mul(sub, inv_terms, "fr")


def _int_to_mont_col(v: int) -> jnp.ndarray:
    """(L, 1) Montgomery column for a single scalar."""
    return df.to_mont(jnp.asarray(ints_to_limbs([v % R]).T), "fr")


@dataclasses.dataclass
class FrVector:
    """Data vector in evaluation form over ``domain``; ``vals`` is a
    (L, domain.size) Montgomery-form device array, zero-padded past ``max``."""

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
        vals = df.to_mont(jnp.asarray(ints_to_limbs(padded).T), "fr")
        return FrVector(vals, len(data), domain)

    @staticmethod
    def zero(domain: Domain) -> "FrVector":
        return FrVector(df.zeros((), domain.size), domain.size, domain)

    def to_ints(self) -> list:
        return limbs_to_ints(df.from_mont(self.vals, "fr").T)

    def to_scalars_standard(self) -> jnp.ndarray:
        """Standard-form limbs (L, N) for MSM consumption."""
        return df.from_mont(self.vals, "fr")

    # -- reference-semantics evaluation (lagrange_basis.rs:59-72) -----------

    def get(self, index: int) -> int:
        col = df.from_mont(self.vals[:, index : index + 1], "fr")
        return limbs_to_ints(col.T)[0]

    def evaluate(self, point: int) -> int:
        """3-path evaluate: stored / zero-inside-domain / barycentric,
        boundaries replicated exactly (incl. the reference's own off-by-one
        quirks, SURVEY.md §5 item 2)."""
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
        invdiff_row = self.domain.invdiff_rows(jnp.asarray([index]))[0]  # (L, N)
        van_z = self.domain.d_vanishing[:, index : index + 1]  # (L, 1)
        ratio = df.mont_mul(
            jnp.broadcast_to(van_z, (L, n)), self.domain.d_vanishing_inv, "fr"
        )
        q = _quotient_in_domain(self.vals, invdiff_row, ratio, jnp.int32(index))
        return FrVector(q, n, self.domain)

    def divide_by_vanishing_outside(self, point: int) -> "FrVector":
        """Out-of-domain quotient (``lagrange_basis.rs:121-142``)."""
        n = self.domain.size
        ev = self.evaluate(point)
        z_mont = _int_to_mont_col(point)
        diff = df.sub(self.domain.d_omegas, jnp.broadcast_to(z_mont, (L, n)), "fr")
        inv_terms = df.batch_inv_mont(diff, "fr", axis=-1)
        q = _quotient_out_domain(self.vals, _int_to_mont_col(ev), inv_terms)
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
        k_mont = _int_to_mont_col(k)
        return FrVector(
            df.mont_mul(self.vals, jnp.broadcast_to(k_mont, self.vals.shape), "fr"),
            self.max,
            self.domain,
        )

    def inner_product_ints(self, other_ints: list) -> int:
        vals = self.to_ints()
        return sum(v * o % R for v, o in zip(vals, other_ints)) % R

    # -- VCData parity surface (``vector-commit/src/lib.rs:37-49``) ----------

    def set_evaluation(self, index: int, value: int) -> "FrVector":
        """Functional set (arrays are immutable): returns the updated vector."""
        col = _int_to_mont_col(value)
        return FrVector(
            self.vals.at[:, index].set(col[:, 0]), self.max, self.domain
        )

    def get_all(self) -> list:
        """All (index, value) pairs (``lib.rs:46``)."""
        return list(enumerate(self.to_ints()))

    @staticmethod
    def bytes_to_item(raw: bytes) -> int:
        """Fr::from_le_bytes_mod_order (``lagrange_basis.rs:175-178``)."""
        from ..hostmath.serialize import fr_from_le_bytes_mod_order

        return fr_from_le_bytes_mod_order(raw)

    def interpolate(self) -> list:
        """Coefficient form via the device INTT (``lagrange_basis.rs:146-148``;
        'rarely would we want coefficient form' — FK does)."""
        from ..ops import ntt as dntt
        from ..ops.limbs import limbs_to_ints
        import numpy as np

        coeffs = dntt.intt_fr(self.vals)
        return limbs_to_ints(np.asarray(df.from_mont(coeffs, "fr")).T)
