"""KZG vector commitment in Lagrange (evaluation) form.

Re-design of ``vector-commit/src/kzg/mod.rs`` for TPU:

  * the SRS commits to the Lagrange polynomials l_i(alpha)*G so commit and
    prove never leave evaluation form (``kzg/mod.rs:28-57``);
  * setup derives the Lagrange SRS directly as l_i(alpha)*G via one batched
    device scalar-mul sweep. The reference reaches the *identical* group
    elements by an IFFT over the monomial SRS (``kzg/mod.rs:115-124``):
    ifft([alpha^j G])_i = G*(1/N)(alpha^N - 1)/(alpha w^-i - 1) = l_i(alpha)G.
    Since this PointGenerator's trusted setup is test-only with a known
    secret (s = 100), evaluating l_i(alpha) in Fr and scalar-multiplying is
    the cheaper, output-identical construction (documented divergence in
    method, none in value). The general G1-IFFT lives in ops/ntt.py and
    backs the Feist-Khovratovich all-points prover.
  * commit/prove are device Pippenger MSMs; quotients are the device
    kernels of poly/lagrange.py;
  * verify's two pairings are O(1) per verification and run on the host
    BN254 pairing (hostmath/pairing.py), mirroring how the reference leans
    on arkworks for this single non-batchable step (``kzg/mod.rs:182-186``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..errors import KZGError
from ..hostmath.curve import g1_add, g1_generator, g1_mul, g1_neg, g2_add, g2_mul, g2_neg, g2_generator
from ..hostmath.field import Fq12, fr_batch_inverse
from ..hostmath.pairing import multi_pairing, pairing
from ..ops import curve as dc
from ..ops import msm as dmsm
from ..ops.limbs import ints_to_limbs
from ..params import R
from ..poly import Domain, FrVector
from .generators import DEFAULT_KZG_SECRET, kzg_g2

L = 16


@dataclasses.dataclass
class KZGParams:
    """KZGKey (``kzg/mod.rs:28-57``): Lagrange SRS + alpha*H in G2."""

    size: int
    lagrange_host: list
    g2: tuple
    domain: Domain

    @functools.cached_property
    def lagrange_affine(self) -> jnp.ndarray:
        return dc.host_points_to_affine(self.lagrange_host)

    def max_size(self) -> int:
        return self.size


@dataclasses.dataclass
class KZGProof:
    proof: tuple  # pi, host G1 point
    y: int


def kzg_setup(max_items: int, secret: int = DEFAULT_KZG_SECRET) -> KZGParams:
    """Lagrange SRS [l_i(alpha) G] + [alpha H] (see module docstring)."""
    domain = Domain(max_items)
    n = domain.size
    # l_i(alpha) = (alpha^N - 1)/N * w^i / (alpha - w^i)
    t = (pow(secret, n, R) - 1) * domain.size_inv % R
    denoms = fr_batch_inverse([(secret - w) % R for w in domain.omegas])
    lag = [t * w % R * d % R for w, d in zip(domain.omegas, denoms)]
    g = g1_generator()
    g_dev = dc.from_affine(dc.host_points_to_affine([g] * n))
    pts = jax.jit(dc.scalar_mul)(g_dev, jnp.asarray(ints_to_limbs(lag).T))
    return KZGParams(
        size=n,
        lagrange_host=dc.projective_to_host_points(pts),
        g2=kzg_g2(secret),
        domain=domain,
    )


class KZG:
    """Namespace mirroring the reference's VectorCommitment impl for KZG."""

    transcript_label = "kzg"  # unused: KZG paths never open a transcript

    @staticmethod
    def basis_affine(params: KZGParams):
        """The commitment basis (for fused batch commits, e.g. verkle)."""
        return params.lagrange_affine

    @staticmethod
    def commit(params: KZGParams, data: FrVector, mesh=None):
        """C = <lagrange_srs, a> (``kzg/mod.rs:126-134``); with ``mesh``,
        sharded across devices (parallel/mesh.py::msm_sharded)."""
        scalars = data.to_scalars_standard()
        if mesh is not None:
            from ..parallel.mesh import msm_sharded

            out = msm_sharded(params.lagrange_affine, scalars, mesh)
        else:
            out = dmsm.msm_auto(params.lagrange_affine, scalars)
        return dc.projective_to_host_points(out)[0]

    @staticmethod
    def prove(params: KZGParams, commitment, index: int, data: FrVector) -> KZGProof:
        return KZG.prove_point(params, commitment, index, data, None)

    @staticmethod
    def prove_point(
        params: KZGParams, commitment, point: int, data: FrVector, transcript=None
    ) -> KZGProof:
        """``kzg/mod.rs:136-154``. The in-domain test is the reference's
        ``point <= max_size`` (its own boundary quirk, SURVEY.md §5 item 2:
        point == max_size would panic in the reference; we raise)."""
        evaluation = data.evaluate(point)
        if point <= params.size:
            if point == params.size:
                raise KZGError(
                    "point == max_size is out of range for the in-domain "
                    "quotient (reference panics here too)"
                )
            q = data.divide_by_vanishing(point)
        else:
            q = data.divide_by_vanishing_outside(point)
        out = dmsm.msm_auto(params.lagrange_affine, q.to_scalars_standard())
        pi = dc.projective_to_host_points(out)[0]
        return KZGProof(proof=pi, y=evaluation)

    @staticmethod
    def verify(params: KZGParams, commitment, index: int, proof: KZGProof) -> bool:
        return KZG.verify_point(params, commitment, index, proof, None)

    @staticmethod
    def verify_point(
        params: KZGParams, commitment, point: int, proof: KZGProof, transcript=None
    ) -> bool:
        """e(pi, alpha H - p H) == e(C - y G, H)  (``kzg/mod.rs:165-189``),
        checked as one 2-pairing product with a negated right side (shared
        final exponentiation — value-identical, ~2x cheaper than two full
        pairings). In-domain points (< max_size) are re-mapped to w^point."""
        p = params.domain.element(point) if point < params.size else point
        h = g2_generator()
        lhs_g2 = g2_add(params.g2, g2_neg(g2_mul(h, p)))
        rhs_g1 = g1_add(commitment, g1_neg(g1_mul(g1_generator(), proof.y)))
        return multi_pairing(
            [(proof.proof, lhs_g2), (g1_neg(rhs_g1), h)]
        ) == Fq12.one()

    @staticmethod
    def prove_batch(params, commitment, indexes, data):
        """todo!() in the reference (``kzg/mod.rs:156-163``); use
        prove_multiproof or prove_all_points."""
        raise NotImplementedError(
            "prove_batch is todo!() in the reference; use prove_multiproof"
        )

    @staticmethod
    def verify_batch(params, commitment, proof):
        raise NotImplementedError(
            "verify_batch is todo!() in the reference; use verify_multiproof"
        )

    @staticmethod
    def prove_all_points(params: KZGParams, data: FrVector) -> list:
        """Feist-Khovratovich amortized all-points prover
        (``kzg/mod.rs:200-235``): implemented over the device NTT stack."""
        from . import fk  # local import: fk pulls in ops/ntt

        return fk.prove_all_points(params, data)
