"""Feist-Khovratovich amortized KZG all-points prover, on the device NTT
stack (Fr NTT + G1 NTT).

Re-design of ``vector-commit/src/kzg/mod.rs:200-235``. DOCUMENTED DIVERGENCE
(fix-and-document per SURVEY.md §5): the reference builds the circulant
product but returns its raw output as the proofs, omitting the final
domain-sized FFT that turns the h-polynomial coefficients into per-point
proofs h(w^i); its own test (``kzg/mod.rs:299-308``) is missing the
``#[test]`` attribute and never runs, so the omission is dead/broken code.
We implement the full, correct FK pipeline:

  1. c = INTT(evals)                      (coefficients of f)
  2. a = G1-INTT(lagrange SRS)            (monomial SRS [s^i G], as the
                                           reference does at kzg/mod.rs:215)
  3. h_j = sum_{d} c_{j+1+d} * a_d        via one length-2N circular
     convolution: three NTTs (Fr, G1, G1-inverse)
  4. proofs pi_i = h(w^i)                 via one final G1 NTT
  5. pi_i opens f at w^i to y_i = evals_i (KZG::verify-compatible)

Static shapes throughout: we convolve at full domain size N rather than the
polynomial degree, so one compiled program serves every dataset.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import curve as dc
from ..ops import field as df
from ..ops import ntt as dntt
from ..ops.limbs import ints_to_limbs
from ..params import NLIMBS
from ..poly import FrVector
from .kzg import KZGParams, KZGProof

L = NLIMBS


def prove_all_points(params: KZGParams, data: FrVector, mesh=None) -> list:
    """With ``mesh``, every transform (Fr and G1, size N and 2N) runs as
    the distributed four-step over the device mesh (parallel/ntt.py) —
    the sharded analog of the reference's single-threaded FK transforms
    (``kzg/mod.rs:200-235``). Mesh runs require both four-step factors of
    N and 2N to be divisible by the mesh size."""
    n = params.size
    assert data.domain.size == n

    if mesh is not None:
        from ..parallel.ntt import (
            intt_fr_sharded,
            intt_g1_sharded,
            ntt_fr_sharded,
            ntt_g1_sharded,
        )

        ntt_fr_ = lambda x: ntt_fr_sharded(x, mesh)  # noqa: E731
        intt_fr_ = lambda x: intt_fr_sharded(x, mesh)  # noqa: E731
        ntt_g1_ = lambda x: ntt_g1_sharded(x, mesh)  # noqa: E731
        intt_g1_ = lambda x: intt_g1_sharded(x, mesh)  # noqa: E731
    else:
        ntt_fr_, intt_fr_ = dntt.ntt_fr, dntt.intt_fr
        ntt_g1_, intt_g1_ = dntt.ntt_g1, dntt.intt_g1

    # 1. coefficients of f
    c = intt_fr_(data.vals)  # (L, N) mont

    # 2. monomial SRS back from the Lagrange SRS. Setup computed
    #    lagrange = ifft(monomial) (kzg/mod.rs:121), so the inverse map is
    #    the FORWARD fft. (The reference's dead FK code applies ifft again
    #    at kzg/mod.rs:215 — part of the same documented breakage.)
    lag = dc.from_affine(params.lagrange_affine)
    mono = ntt_g1_(lag)  # [s^i G], (3, L, N)

    # 3. circulant Toeplitz product at size 2N:
    #    c_hat = [c_0..c_{N-1}, 0 x N]
    #    s_hat = [a_{N-2}, ..., a_0, 0 x (N+1)]   (a_i = s^i G)
    #    r = INTT_G1( NTT_G1(s_hat) .* NTT_Fr(c_hat) )  ->  h_j = r_{N-1+j}
    c_hat = jnp.concatenate([c, df.zeros((), n)], axis=-1)  # (L, 2N)

    a_rev = mono[..., : n - 1][..., ::-1]  # a_{N-2} .. a_0
    s_hat = jnp.concatenate([a_rev, dc.infinity((), n + 1)], axis=-1)  # (3, L, 2N)

    y_f = ntt_fr_(c_hat)  # (L, 2N) mont
    v_g = ntt_g1_(s_hat)  # (3, L, 2N)
    u = dc.scalar_mul(v_g, df.from_mont(y_f, "fr"))
    r = intt_g1_(u)

    h = jnp.concatenate(
        [r[..., n - 1 : 2 * n - 2], dc.infinity((), 1)], axis=-1
    )  # (3, L, N)

    # 4. proofs = h evaluated over the domain
    pis = ntt_g1_(h)
    pi_hosts = dc.projective_to_host_points(pis)

    # 5. package with the stored evaluations (zero past the watermark)
    evals = data.to_ints()
    return [KZGProof(proof=pi_hosts[i], y=evals[i]) for i in range(n)]
