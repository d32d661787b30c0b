"""PCS multiproof (Dankrad Feist's random-linear-combination batch opening),
generic over IPA and KZG — re-design of ``vector-commit/src/multiproof.rs``.

The reference parallelizes with a rayon thread pool (``multiproof.rs:14,
120,132``); here every per-query computation is a single batched device
program over an (M, N, L) tensor:

  * query scaling by r^i  ->  one broadcast Montgomery multiply;
  * group-by-evaluation-point -> scatter-add of lazy uint32 limb columns
    (exact because M < 2**16 keeps columns below 2**32) + one Montgomery
    collapse;
  * per-point quotients    -> the dense all-points quotient kernel, run for
    every domain point at once (absent points contribute zero vectors and
    thus zero quotients — branchless, static shapes);
  * h(x) accumulation      -> broadcast multiply + lazy tree sum.

Transcript bytes match the reference exactly (labels "C"/"z"/"y"/"r"/"D"/
"t"/"E"; z is appended as an 8-byte LE usize). Deliberate quirk decision
(SURVEY.md §5 item 1): the reference's verifier computes g2_of_t but never
checks it against the proof's claimed y (dead code, ``multiproof.rs:194-209``)
— we FOLLOW the reference (no extra check) so acceptance behavior is
bit-identical; a fixed variant can be layered on later without breaking
compatibility.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..fiatshamir.transcript import Transcript
from ..utils import metrics
from ..utils.aot import aot_jit
from ..hostmath.field import fr_batch_inverse
from ..ops import curve as dc
from ..ops import field as df
from ..ops import msm as dmsm
from ..ops.limbs import ints_to_limbs
from ..params import R, NLIMBS
from ..poly import FrVector
from ..poly.lagrange import _quotient_in_domain

L = NLIMBS


@dataclasses.dataclass
class ProverQuery:
    """(data, commitment, z, y) — ``multiproof.rs:26-41``."""

    data: FrVector
    commit: tuple
    z: int
    y: int

    def to_verifier_query(self) -> "VerifierQuery":
        return VerifierQuery(self.commit, self.z, self.y)


@dataclasses.dataclass
class VerifierQuery:
    commit: tuple
    z: int
    y: int


@dataclasses.dataclass
class Multiproof:
    proof: object  # scheme proof for the final opening
    d: tuple  # commitment to g(x)


_SCATTER_BLOCK = 1 << 15  # lazy uint32 columns overflow past ~2^16 terms


def _scale_and_group_impl(data_stack, r_pows, z_compact, zp: int):
    """Scale each query's data by r^i and scatter-sum into COMPACT per-z
    rows (one row per DISTINCT opening point, not per domain point — the
    round-1 advisor flagged the dense variant's O(N^2) invdiff + all-N
    quotients as a hard ceiling on large domains).

    data_stack: (M, L, N) Mont; r_pows: (M, L, 1) Mont; z_compact: (M,)
    int32 indices into the distinct-z list (padded length zp). The
    scatter-sum is EXACT lazy integer addition on limb planes, chunked in
    2^15-row blocks with a Montgomery collapse between blocks so columns
    never overflow uint32 — M is unbounded (vs the reference harness's
    2^15 ceiling, ``benches/ipa.rs:19``)."""
    scaled = df.mont_mul(data_stack, jnp.broadcast_to(r_pows, data_stack.shape), "fr")
    m = scaled.shape[0]
    grouped = None
    for s in range(0, m, _SCATTER_BLOCK):
        lazy = (
            jnp.zeros((zp,) + scaled.shape[1:], jnp.uint32)
            .at[z_compact[s : s + _SCATTER_BLOCK]]
            .add(scaled[s : s + _SCATTER_BLOCK])
        )
        part = df.reduce_columns(lazy, "fr")
        grouped = part if grouped is None else df.add(grouped, part, "fr")
    return scaled, grouped


def _quotients_sum_impl(grouped, invdiff_rows, vanishing, vanishing_inv, z_vals):
    """g(x) = sum over the distinct opening points z of
    quotient(grouped[z-row], z). grouped/invdiff_rows: (Zq, L, N);
    z_vals: (Zq,) int32 actual domain indices (duplicated padding rows
    carry zero data and contribute zero quotients)."""
    zq = grouped.shape[0]
    van_z = jnp.moveaxis(vanishing[:, z_vals], -1, 0)[:, :, None]  # (Zq, L, 1)
    ratio = df.mont_mul(
        jnp.broadcast_to(van_z, grouped.shape),
        jnp.broadcast_to(vanishing_inv[None], grouped.shape),
        "fr",
    )
    q = jax.vmap(_quotient_in_domain)(grouped, invdiff_rows, ratio, z_vals)
    return df.lazy_sum(q, 0, "fr")


def _h_accumulate_impl(scaled, inv_factors):
    """h(x) = sum_m scaled_m * (1/(t - z_m)) — ``multiproof.rs:161-166``.
    scaled: (M, L, N); inv_factors: (M, L, 1)."""
    terms = df.mont_mul(scaled, jnp.broadcast_to(inv_factors, scaled.shape), "fr")
    return df.lazy_sum(terms, 0, "fr")


# persistent-AOT entries (utils/aot.py): the multiproof device programs
# are fixed-shape per (M, N) and re-trace expensively in a cold process
_scale_and_group = aot_jit(
    _scale_and_group_impl, "mp_scale_group", static_argnames=("zp",)
)
_quotients_sum = aot_jit(_quotients_sum_impl, "mp_quotients_sum")
_h_accumulate = aot_jit(_h_accumulate_impl, "mp_h_accumulate")


def _absorb_queries(t: Transcript, queries) -> None:
    for q in queries:
        t.append_point(q.commit, "C")
        t.append_usize(q.z, "z")
        t.append_scalar(q.y, "y")


def prove_multiproof(scheme, params, queries: list, mesh=None) -> Multiproof:
    """``multiproof.rs:99-176``. ``scheme`` is IPA or KZG (schemes/*).
    With ``mesh``, the D/E commitment MSMs shard across devices — the
    mesh-parallel replacement for the reference's rayon pool
    (``multiproof.rs:119-132``)."""
    domain = params.domain
    n = domain.size
    m = len(queries)
    metrics.record("multiproof.prove.calls")
    metrics.record("multiproof.prove.queries", m)
    t = Transcript("multiproof")
    _absorb_queries(t, queries)
    r = t.digest("r", True)

    # Stack per-query data DEDUPED by object identity: callers reuse vector
    # objects heavily (the verkle path opens the same node vector at many
    # points), and a 2^17-operand jnp.stack is a compile-time hazard —
    # stacking the distinct vectors and gathering per query is one cheap
    # device op instead.
    uniq_ids, uniq_vals, sel = {}, [], []
    for q in queries:
        k = id(q.data)
        if k not in uniq_ids:
            uniq_ids[k] = len(uniq_vals)
            uniq_vals.append(q.data.vals)
        sel.append(uniq_ids[k])
    data_stack = jnp.stack(uniq_vals)[jnp.asarray(sel, dtype=jnp.int32)]  # (M, L, N)
    r_mont = df.to_mont(jnp.asarray(ints_to_limbs([r]).T), "fr")[:, 0]  # (L,)
    r_pows = df.powers_of_mont(r_mont, m, "fr")  # (L, M)
    r_pows = jnp.moveaxis(r_pows, -1, 0)[:, :, None]  # (M, L, 1)

    # group by DISTINCT opening point, padded to a power of two so the
    # device program compiles once per (M, Zq, N) bucket (pad rows reuse
    # z=0 but carry zero data -> zero quotients)
    zs = sorted({q.z for q in queries})
    z_of = {z: i for i, z in enumerate(zs)}
    zp = 1 << (len(zs) - 1).bit_length() if len(zs) > 1 else 1
    z_compact = jnp.asarray([z_of[q.z] for q in queries], dtype=jnp.int32)
    z_vals = jnp.asarray(zs + [0] * (zp - len(zs)), dtype=jnp.int32)

    scaled, grouped = _scale_and_group(data_stack, r_pows, z_compact, zp=zp)

    g_vals = _quotients_sum(
        grouped,
        domain.invdiff_rows(z_vals),
        domain.d_vanishing,
        domain.d_vanishing_inv,
        z_vals,
    )
    g = FrVector(g_vals, n, domain)

    d_commit = scheme.commit(params, g, mesh=mesh)
    t.append_point(d_commit, "D")
    t_chal = t.digest("t", True)

    # 1/(t - z) for integer z in 0..N (``utils.rs:57-62``)
    inversions = fr_batch_inverse([(t_chal - i) % R for i in range(n)])
    inv_per_query = [inversions[q.z] for q in queries]
    inv_mont = df.to_mont(jnp.asarray(ints_to_limbs(inv_per_query))[:, :, None], "fr")

    h_vals = _h_accumulate(scaled, inv_mont)
    h = FrVector(h_vals, n, domain)

    e_commit = scheme.commit(params, h, mesh=mesh)
    t.append_point(e_commit, "E")

    h_minus_g = h - g
    from ..hostmath.curve import g1_add, g1_neg

    multiproof_commit = g1_add(e_commit, g1_neg(d_commit))
    proof = scheme.prove_point(params, multiproof_commit, t_chal, h_minus_g, t)
    return Multiproof(proof=proof, d=d_commit)


def verify_multiproof(scheme, params, queries: list, proof: Multiproof, mesh=None) -> bool:
    """``multiproof.rs:178-215``. With ``mesh``, the E-aggregation MSM
    shards across devices."""
    from ..hostmath.curve import g1_add, g1_neg

    domain = params.domain
    n = domain.size

    t = Transcript("multiproof")
    _absorb_queries(t, queries)
    r = t.digest("r", True)
    t.append_point(proof.d, "D")
    t_chal = t.digest("t", True)

    inversions = fr_batch_inverse([(t_chal - i) % R for i in range(n)])

    e_coeffs: dict = {}
    r_pow = 1
    for q in queries:
        e_coeff = r_pow * inversions[q.z] % R
        e_coeffs[q.commit] = (e_coeffs.get(q.commit, 0) + e_coeff) % R
        # NOTE: the reference also accumulates g2_of_t += e_coeff * y here
        # but never uses it (followed quirk; see module docstring).
        r_pow = r_pow * r % R

    commits = list(e_coeffs.keys())
    coeffs = [e_coeffs[c] for c in commits]
    pts = dc.host_points_to_affine(commits)
    scalars = jnp.asarray(ints_to_limbs(coeffs).T)
    if mesh is not None:
        from ..parallel.mesh import msm_sharded

        e_dev = msm_sharded(pts, scalars, mesh)
    else:
        e_dev = dmsm.msm_auto(pts, scalars)
    e_commit = dc.projective_to_host_points(e_dev)[0]
    t.append_point(e_commit, "E")

    return scheme.verify_point(
        params, g1_add(e_commit, g1_neg(proof.d)), t_chal, proof.proof, t
    )
