"""IPA (inner-product argument) vector commitment, evaluation form.

Re-design of ``vector-commit/src/ipa/mod.rs`` for TPU:

  * the CRS and all data vectors are device-resident limb planes;
  * every inner product / MSM in the halving loop is a batched device
    kernel (Pippenger for points, lazy-column dot for field vectors);
  * vector folds a <- a_l + x*a_r are single fused device ops;
  * the Fiat-Shamir transcript (serial SHA-256) runs on the host between
    rounds, exactly matching the reference's byte layout so challenges are
    bit-identical (labels "C", "input point", "output point", "w", "L",
    "R", "x" — ``ipa/mod.rs:268-319``).

Note the reference's direction quirks are preserved: gens fold as
g <- g_r + x*g_l (reversed relative to data), and the in-domain "point" is
the integer index as a field element (one-hot b vector; SURVEY.md §5 item 3).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fiatshamir.transcript import Transcript
from ..hostmath.curve import g1_mul
from ..ops import curve as dc
from ..ops import field as df
from ..ops import msm as dmsm
from ..ops import sha256 as dsha
from ..ops.limbs import ints_to_limbs, limbs_to_ints
from ..params import R, NLIMBS
from ..poly import Domain, FrVector
from ..utils import metrics
from ..utils.aot import aot_jit
from .generators import DEFAULT_IPA_SEED, ipa_generate_points

L = NLIMBS


def _int_to_mont(v: int) -> jnp.ndarray:
    """(L, 1) Montgomery column."""
    return df.to_mont(jnp.asarray(ints_to_limbs([v % R]).T), "fr")


def _int_to_std(v: int) -> jnp.ndarray:
    """(L, 1) standard-form column."""
    return jnp.asarray(ints_to_limbs([v % R]).T)


def _mont_to_int(x: jnp.ndarray) -> int:
    """(L, 1) Montgomery column -> python int."""
    return limbs_to_ints(df.from_mont(x, "fr").T)[0]


@jax.jit
def _inner_mont(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> over Fr for Montgomery-form (L, n) vectors -> (L, 1)."""
    return df.lazy_sum_lanes(df.mont_mul(a, b, "fr"), "fr")


@jax.jit
def _fold_field(lo: jnp.ndarray, hi: jnp.ndarray, x_mont: jnp.ndarray):
    """lo + x*hi (vec_add_and_distribute, ``utils.rs:31-38``); x (L, 1)."""
    return df.add(lo, df.mont_mul(hi, jnp.broadcast_to(x_mont, hi.shape), "fr"), "fr")


@jax.jit
def _fold_points(keep: jnp.ndarray, scaled: jnp.ndarray, x_std: jnp.ndarray):
    """keep + x*scaled for projective (3, L, n) points; x (L, 1) standard."""
    n = scaled.shape[-1]
    prod = dc.scalar_mul(scaled, jnp.broadcast_to(x_std, (L, n)))
    return dc.add(keep, prod)


@jax.jit
def _ipa_round(g, a, b, q_proj):
    """One fused halving-round: computes BOTH cross terms
    y_l = <g_r, a_l> + q*<a_l, b_r>, y_r = <g_l, a_r> + q*<a_r, b_l>
    entirely on device; returns them as a (2, 2, L, 1)-ish affine pair so
    the host only serializes two points into the transcript. This keeps the
    per-round host<->device round-trips at two (the Fiat-Shamir digest is
    inherently a host sync point)."""
    n = a.shape[-1]
    half = n // 2
    a_l, a_r = a[:, :half], a[:, half:]
    g_l, g_r = g[..., :half], g[..., half:]
    b_l, b_r = b[:, :half], b[:, half:]

    ip_l = df.from_mont(_inner_mont(a_l, b_r), "fr")  # (L, 1) standard
    ip_r = df.from_mont(_inner_mont(a_r, b_l), "fr")
    y_l = dc.add(
        dmsm.msm_auto(dc.to_affine(g_r), df.from_mont(a_l, "fr")),
        dc.scalar_mul(q_proj, ip_l),
    )
    y_r = dc.add(
        dmsm.msm_auto(dc.to_affine(g_l), df.from_mont(a_r, "fr")),
        dc.scalar_mul(q_proj, ip_r),
    )
    return dc.to_affine(jnp.concatenate([y_l, y_r], axis=-1))  # (2, L, 2)


# ---------------------------------------------------------------------------
# Fused device halving loop: the ENTIRE prove sequence — inner products,
# cross-term MSMs, point compression, the Fiat-Shamir SHA-256 digest chain
# (ops/sha256.py), and the challenge folds — compiles into ONE device
# program. The reference host-sequences this loop with 2*log2(n) device
# round-trips per prove (``ipa/mod.rs:268-319``); over a network-attached
# TPU those syncs dominate latency, so here the host only ships the initial
# transcript state in and reads the finished proof out.
#
# The generator vector is folded in COEFFICIENT space, not point space:
# folding g on device (g <- g_r + x*g_l) would cost a 256-bit scalar-mul
# chain plus projective->affine inversions per round — thousands of serial
# tiny-vector ops that dominate the program (measured ~16 s at domain 256).
# Instead the loop tracks, per ORIGINAL basis index i, the accumulated
# challenge weight W(i) = prod over past rounds of (x_k if i sat in that
# round's left half else 1); the current folded generator at position j is
# then g_cur[j] = sum_{i mod len == j} W(i) * g_i, so each round's cross
# terms are ONE Pippenger MSM over the FIXED affine basis (with q appended
# carrying the w-scaled inner-product term):
#   y_l = <g_r, a_l> + (w*<a_l,b_r>)*q = MSM(g || q, gamma_l || w*ip_l)
# with gamma_l(i) = W(i)*a_cur[(i mod len) - half] on the right half, 0 on
# the left (y_r mirrored). W updates and gamma builds are shallow field
# math; all group work runs through the fused Pallas MSM kernels. The group
# elements are identical to the reference's fold (``ipa/mod.rs:295-311``),
# so proofs and transcripts stay bit-exact.
# ---------------------------------------------------------------------------


def _fused_ipa_loop(basis, a, b, state, dst: bytes, with_q: bool):
    """Halving loop as ONE ``lax.scan`` over rounds with a SHAPE-UNIFORM
    body: ``a``/``b`` stay padded to full width n (live prefix [0, ln)
    halves per round) and every round-varying access pattern — half
    membership, the gamma gathers, the fold shifts — is a precomputed
    static (rounds, n) index/mask plane fed through the scan. One round
    body traces/compiles once instead of log2(n) inlined rounds (the
    unrolled form took >45 min of XLA:CPU compile at domain 256 on the
    1-core CI box; ~8x smaller here).

    ``basis``: the (2, L, n) affine generator vector, with the
    inner-product point q appended as lane n when ``with_q`` (built
    host-side from the fixed CRS). ``state`` is the 33-byte cleared
    transcript state entering the loop; challenges are recomputed
    bit-identically to fiatshamir/transcript.py. Returns per-round (L, R)
    affine pairs, the tip, and (with_q) the evaluation — all on device."""
    nq = basis.shape[-1]
    n = nq - 1 if with_q else nq
    assert n & (n - 1) == 0, "halving loop needs a power-of-two length"
    eval_std = None
    if with_q:
        eval_std = df.from_mont(_inner_mont(a, b), "fr")
        msg = jnp.concatenate(
            [
                state,
                dsha.const_bytes(b"output point"),
                dsha.fr_to_bytes(eval_std),
                dsha.const_bytes(b"w"),
            ]
        )
        w_std = dsha.hash_to_fr(msg, dst)
        state = jnp.concatenate([dsha.fr_to_bytes(w_std), dsha.const_bytes(b"w")])
        w_mont = df.to_mont(w_std, "fr")  # (L, 1)

    wts = df.one_mont("fr", (), n)  # (L, n) accumulated challenge weights

    # Per-round MSM primitive: the fused Pallas Pippenger on TPU; the naive
    # scalar-mul fold on the XLA path (embedding Pippenger's bucket
    # fori-loops in the scanned body is a large XLA:CPU compile for no
    # test-speed gain). Same group elements either way.
    if dmsm._pallas_mode() == "off" and nq >= 64:
        basis_proj = dc.from_affine(basis)

        def _round_msm(sc_std):
            return dmsm.fold_reduce_lanes(dc.scalar_mul(basis_proj, sc_std))
    else:

        def _round_msm(sc_std):
            return dmsm._msm_auto_impl(basis, sc_std)

    # static per-round access planes over ORIGINAL indices i / slots j:
    #   right: position (i mod ln) sits in the current right half
    #   idx_l/idx_r: gamma gathers a[(i mod ln) -/+ half] (0 where masked)
    #   idx_f: fold shift a[j + half] for live slots j < half (0 elsewhere)
    #   left: slot j is live after this round's fold (j < half)
    rounds = n.bit_length() - 1
    i_arr = np.arange(n)
    right_np = np.zeros((rounds, n), np.bool_)
    left_np = np.zeros((rounds, n), np.bool_)
    idx_l_np = np.zeros((rounds, n), np.int32)
    idx_r_np = np.zeros((rounds, n), np.int32)
    idx_f_np = np.zeros((rounds, n), np.int32)
    ln = n
    for r in range(rounds):
        half = ln // 2
        pos = i_arr % ln
        right_np[r] = pos >= half
        left_np[r] = i_arr < half
        idx_l_np[r] = np.where(pos >= half, pos - half, 0)
        idx_r_np[r] = np.where(pos < half, pos + half, 0)
        idx_f_np[r] = np.where(i_arr < half, i_arr + half, 0)
        ln = half
    planes = (
        jnp.asarray(right_np),
        jnp.asarray(left_np),
        jnp.asarray(idx_l_np),
        jnp.asarray(idx_r_np),
        jnp.asarray(idx_f_np),
    )

    def round_body(carry, plane):
        a, b, wts, state = carry
        right, left, idx_l, idx_r, idx_f = plane
        zeros = jnp.zeros_like(wts)
        gamma_l = df.select(right, df.mont_mul(wts, a[:, idx_l], "fr"), zeros)
        gamma_r = df.select(right, zeros, df.mont_mul(wts, a[:, idx_r], "fr"))
        if with_q:
            # <a_l, b_r> / <a_r, b_l> over the live prefix: mask dead slots
            p_l = df.select(left, df.mont_mul(a, b[:, idx_f], "fr"), zeros)
            p_r = df.select(left, df.mont_mul(a[:, idx_f], b, "fr"), zeros)
            ip_l = df.reduce_columns(
                jnp.sum(p_l, axis=-1, keepdims=True, dtype=jnp.uint32), "fr"
            )
            ip_r = df.reduce_columns(
                jnp.sum(p_r, axis=-1, keepdims=True, dtype=jnp.uint32), "fr"
            )
            sc_l = jnp.concatenate([gamma_l, df.mont_mul(w_mont, ip_l, "fr")], -1)
            sc_r = jnp.concatenate([gamma_r, df.mont_mul(w_mont, ip_r, "fr")], -1)
        else:
            sc_l, sc_r = gamma_l, gamma_r
        y_l = _round_msm(df.from_mont(sc_l, "fr"))
        y_r = _round_msm(df.from_mont(sc_r, "fr"))
        pair = dc.to_affine(jnp.concatenate([y_l, y_r], axis=-1))  # (2, L, 2)

        pbytes = dsha.g1_compressed_bytes(pair)  # (2, 32)
        msg = jnp.concatenate(
            [
                state,
                dsha.const_bytes(b"L"),
                pbytes[0],
                dsha.const_bytes(b"R"),
                pbytes[1],
                dsha.const_bytes(b"x"),
            ]
        )
        x_std = dsha.hash_to_fr(msg, dst)
        state = jnp.concatenate([dsha.fr_to_bytes(x_std), dsha.const_bytes(b"x")])

        x_mont = df.to_mont(x_std, "fr")
        x_b = jnp.broadcast_to(x_mont, a.shape)
        # folds on the padded arrays: live slots j < half take the folded
        # value, dead slots keep stale data (never referenced again —
        # every later plane indexes below the live watermark)
        a2 = df.select(left, df.add(a, df.mont_mul(a[:, idx_f], x_b, "fr"), "fr"), a)
        if with_q:
            b2 = df.select(
                left, df.add(b[:, idx_f], df.mont_mul(b, x_b, "fr"), "fr"), b
            )
        else:
            b2 = b
        # g <- g_r + x*g_l in coefficient space: left-half positions pick
        # up a factor x, right-half weights are unchanged
        wts2 = df.select(right, wts, df.mont_mul(wts, x_b, "fr"))
        return (a2, b2, wts2, state), pair

    if b is None:
        b = jnp.zeros_like(a)  # inert placeholder keeps the carry uniform
    (a, b, wts, state), stacked = jax.lax.scan(
        round_body, (a, b, wts, state), planes
    )

    tip_std = df.from_mont(a[:, :1], "fr")
    return (stacked, tip_std, eval_std) if with_q else (stacked, tip_std)


# persistent-AOT entries: the unrolled halving loop with in-circuit
# SHA-256 is the single most expensive TRACE in the package; exporting the
# StableHLO makes cold-process proves skip it (utils/aot.py)
_fused_prove_program = aot_jit(
    lambda basis, a, b, state, dst: _fused_ipa_loop(
        basis, a, b, state, dst, with_q=True
    ),
    "ipa_fused_prove",
    static_argnames=("dst",),
)
_fused_commit_proof_program = aot_jit(
    lambda basis, a, state, dst: _fused_ipa_loop(
        basis, a, None, state, dst, with_q=False
    ),
    "ipa_fused_commit_proof",
    static_argnames=("dst",),
)


def _state_to_device(t: Transcript) -> jnp.ndarray:
    return jnp.asarray(np.frombuffer(bytes(t._state), np.uint8).astype(np.uint32))


@jax.jit
def _ipa_fold(g, a, b, x_mont, x_std):
    """Fused fold of all three vectors by the round challenge."""
    n = a.shape[-1]
    half = n // 2
    a2 = _fold_field(a[:, :half], a[:, half:], x_mont)
    g2 = _fold_points(g[..., half:], g[..., :half], x_std)
    b2 = _fold_field(b[:, half:], b[:, :half], x_mont)
    return g2, a2, b2


@dataclasses.dataclass
class IPAParams:
    """IPAUniversalParams (``ipa/mod.rs:22-68``): N basis points g, the
    inner-product point q, and the domain precompute."""

    n: int
    g_host: list
    q_host: tuple
    domain: Domain

    @functools.cached_property
    def g_affine(self) -> jnp.ndarray:
        return dc.host_points_to_affine(self.g_host)

    @functools.cached_property
    def g_proj(self) -> jnp.ndarray:
        return dc.from_affine(self.g_affine)

    @functools.cached_property
    def q_proj(self) -> jnp.ndarray:
        return dc.host_point_to_projective(self.q_host)

    @functools.cached_property
    def q_affine(self) -> jnp.ndarray:
        return dc.host_points_to_affine([self.q_host])  # (2, L, 1)

    def max_size(self) -> int:
        return self.n


@dataclasses.dataclass
class IPAProof:
    l: list
    r: list
    tip: int
    y: int


@dataclasses.dataclass
class IPACommitProof:
    l: list
    r: list
    tip: int


def ipa_setup(n: int, seed: bytes = DEFAULT_IPA_SEED) -> IPAParams:
    """N+1 hash-to-curve points (``ipa/mod.rs:121-128``)."""
    pts = ipa_generate_points(n + 1, seed)
    return IPAParams(n=n, g_host=pts[:n], q_host=pts[n], domain=Domain(n))


class IPA:
    """Namespace mirroring the reference's VectorCommitment impl for IPA."""

    transcript_label = "ipa"

    @staticmethod
    def basis_affine(params: IPAParams):
        """The commitment basis (for fused batch commits, e.g. verkle)."""
        return params.g_affine

    @staticmethod
    def commit(params: IPAParams, data: FrVector, mesh=None):
        """C = <g, a> (``ipa/mod.rs:130-135``): one device Pippenger MSM;
        with ``mesh``, the point/scalar vectors shard across devices
        (parallel/mesh.py::msm_sharded)."""
        scalars = data.to_scalars_standard()
        if mesh is not None:
            from ..parallel.mesh import msm_sharded

            out = msm_sharded(params.g_affine, scalars, mesh)
        else:
            out = dmsm.msm_auto(params.g_affine, scalars)
        return dc.projective_to_host_points(out)[0]

    # -- eval proofs ----------------------------------------------------------

    @staticmethod
    def prove(params: IPAParams, commitment, index: int, data: FrVector) -> IPAProof:
        return IPA.prove_point(params, commitment, index, data, None)

    @staticmethod
    def prove_point(
        params: IPAParams, commitment, point: int, data: FrVector, transcript=None
    ) -> IPAProof:
        b = params.domain.barycentric_coefficients(point)
        b_mont = df.to_mont(jnp.asarray(ints_to_limbs(b).T), "fr")
        return _low_level_ipa(params, data.vals, b_mont, commitment, point, transcript)

    @staticmethod
    def verify(params: IPAParams, commitment, index: int, proof: IPAProof) -> bool:
        return IPA.verify_point(params, commitment, index, proof, None)

    @staticmethod
    def verify_point(
        params: IPAParams, commitment, point: int, proof: IPAProof, transcript=None
    ) -> bool:
        b = params.domain.barycentric_coefficients(point)
        return _low_level_verify_ipa(params, b, commitment, point, proof, transcript)

    # -- batch proofs: unimplemented in the reference (todo!() at
    #    ``ipa/mod.rs:156-163`` and ``:183-189``); the batching story here is
    #    the multiproof protocol (schemes/multiproof.py) -----------------------

    @staticmethod
    def prove_batch(params, commitment, indexes, data):
        raise NotImplementedError(
            "prove_batch is todo!() in the reference; use prove_multiproof"
        )

    @staticmethod
    def verify_batch(params, commitment, proof):
        raise NotImplementedError(
            "verify_batch is todo!() in the reference; use verify_multiproof"
        )

    # -- commitment well-formedness proofs (``ipa/mod.rs:199-265``) ----------

    @staticmethod
    def prove_commitment(
        params: IPAParams, commitment, data: FrVector
    ) -> IPACommitProof:
        m = data.max  # reference: data.max() + 1 elements = data.max
        # Non-power-of-two watermark: pad with zeros to the next power of
        # two. The commitment is unchanged (zero coefficients contribute
        # nothing), the halving loop stays shape-regular, and the proof
        # verifies against g[..2^k]. DOCUMENTED DIVERGENCE (COMPAT.md):
        # the reference's fold silently DROPS the tail element of each odd
        # half via iterator zip (``utils.rs:31-38``), producing proofs its
        # own verifier rejects.
        n2 = 1 << (m - 1).bit_length() if m > 1 else 1
        a = data.vals[:, :m]
        if n2 != m:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], n2 - m), jnp.uint32)], axis=-1
            )
        g = params.g_affine[..., :n2]

        t = Transcript(IPA.transcript_label)
        t.append_point(commitment, "C")
        t.digest("x", True)  # state <- fr(x0) || "x"; x0 itself is unused
        if n2 == 1:
            return IPACommitProof(l=[], r=[], tip=_mont_to_int(a))

        pairs, tip_std = jax.device_get(
            _fused_commit_proof_program(g, a, _state_to_device(t), dst=t._dst)
        )
        l_pts, r_pts, tip = _unpack_fused(t, pairs, tip_std)
        return IPACommitProof(l=l_pts, r=r_pts, tip=tip)

    @staticmethod
    def verify_commitment_proof(
        params: IPAParams, commitment, proof: IPACommitProof
    ) -> bool:
        """``ipa/mod.rs:238-265``, fused like _low_level_verify_ipa: one
        device MSM over {g_i, C, L_i, R_i} vs the identity."""
        n = 1 << len(proof.l)
        t = Transcript(IPA.transcript_label)
        t.append_point(commitment, "C")
        t.digest("x", True)

        xs = []
        for li, ri in zip(proof.l, proof.r):
            t.append_point(li, "L")
            t.append_point(ri, "R")
            xs.append(t.digest("x", True))

        coeffs = [1]
        for x in xs:
            coeffs = [v for x_ in coeffs for v in (x_ * x % R, x_)]

        prod_all, cl, cr = _round_chain_coeffs(xs)
        g_sc = [proof.tip * ci % R for ci in coeffs]
        extra_sc = [(-prod_all) % R]
        extra_sc += [(-x) % R for x in cl] + [(-x) % R for x in cr]
        extra_pts = [commitment] + list(proof.l) + list(proof.r)

        pts = jnp.concatenate(
            [params.g_affine[..., :n], dc.host_points_to_affine(extra_pts)],
            axis=-1,
        )
        return _msm_is_zero(pts, g_sc + extra_sc)


def _unpack_fused(t: Transcript, pairs_h, tip_h):
    """Convert the fused loop's (already host-side) outputs, then a pure-host
    transcript REPLAY (microseconds of SHA-256) so ``t`` ends in exactly the
    state the device digest chain produced — downstream digests (multiproof)
    stay bit-identical, and any device/host divergence surfaces as a verify
    failure in tests."""
    tip = limbs_to_ints(tip_h.T)[0]
    l_pts, r_pts = [], []
    for k in range(pairs_h.shape[0]):
        pr = dc.affine_to_host_points(pairs_h[k])
        l_pts.append(pr[0])
        r_pts.append(pr[1])
    for y_l, y_r in zip(l_pts, r_pts):
        t.append_point(y_l, "L")
        t.append_point(y_r, "R")
        t.digest("x", True)
    return l_pts, r_pts, tip


def _low_level_ipa(
    params: IPAParams,
    a: jnp.ndarray,
    b: jnp.ndarray,
    commitment,
    input_point: int,
    transcript,
) -> IPAProof:
    """The halving loop (``ipa/mod.rs:268-319``) as ONE fused device program
    (see _fused_ipa_loop); the host appends the public inputs, dispatches,
    and replays the digest chain over the returned L/R points."""
    metrics.record("ipa.prove.calls")
    n = a.shape[-1]

    t = transcript if transcript is not None else Transcript(IPA.transcript_label)
    t.append_point(commitment, "C")
    t.append_scalar(input_point % R, "input point")

    if n == 1:
        eval_ = _mont_to_int(_inner_mont(a, b))
        t.append_scalar(eval_, "output point")
        t.digest("w", True)
        return IPAProof(l=[], r=[], tip=_mont_to_int(a), y=eval_)

    basis = jnp.concatenate([params.g_affine[..., :n], params.q_affine], axis=-1)
    pairs, tip_std, eval_std = jax.device_get(
        _fused_prove_program(basis, a, b, _state_to_device(t), dst=t._dst)
    )  # ONE transfer for the whole proof
    # replay the pre-loop digests host-side (they need eval_, now known)
    y = limbs_to_ints(eval_std.T)[0]
    t.append_scalar(y, "output point")
    t.digest("w", True)
    l_pts, r_pts, tip = _unpack_fused(t, pairs, tip_std)
    return IPAProof(l=l_pts, r=r_pts, tip=tip, y=y)


def _low_level_ipa_hostloop(
    params: IPAParams,
    a: jnp.ndarray,
    b: jnp.ndarray,
    commitment,
    input_point: int,
    transcript,
) -> IPAProof:
    """Host-sequenced reference implementation of the halving loop: the
    Fiat-Shamir chain runs through fiatshamir/transcript.py between device
    rounds, exactly as the reference sequences it. Kept as an independent
    second implementation — tests assert the fused device loop produces
    bit-identical proofs (tests/test_schemes.py)."""
    n = a.shape[-1]
    eval_ = _mont_to_int(_inner_mont(a, b))

    t = transcript if transcript is not None else Transcript(IPA.transcript_label)
    t.append_point(commitment, "C")
    t.append_scalar(input_point % R, "input point")
    t.append_scalar(eval_, "output point")
    ra = t.digest("w", True)

    q_proj = dc.host_point_to_projective(g1_mul(params.q_host, ra))
    g = params.g_proj[..., :n]
    l_pts, r_pts = [], []

    n_cur = n
    while n_cur > 1:
        pair = dc.affine_to_host_points(_ipa_round(g, a, b, q_proj))
        y_l, y_r = pair[0], pair[1]
        l_pts.append(y_l)
        r_pts.append(y_r)
        t.append_point(y_l, "L")
        t.append_point(y_r, "R")
        ra = t.digest("x", True)
        g, a, b = _ipa_fold(g, a, b, _int_to_mont(ra), _int_to_std(ra))
        n_cur //= 2

    return IPAProof(l=l_pts, r=r_pts, tip=_mont_to_int(a), y=eval_)


def _round_chain_coeffs(xs: list):
    """Coefficient expansion of the verifier's folded commitment chain
    c_{i+1} = L_i + x_i*c_i + x_i^2*R_i over the basis {c_0, L_i, R_i}:
    returns (prod_all, cl, cr) with c_final = prod_all*c_0 + sum cl_i*L_i
    + sum cr_i*R_i. Pure host bigint math — no group ops."""
    k = len(xs)
    suffix = [1] * (k + 1)
    for i in range(k - 1, -1, -1):
        suffix[i] = suffix[i + 1] * xs[i] % R
    cl = [suffix[i + 1] for i in range(k)]
    cr = [xs[i] * xs[i] % R * suffix[i + 1] % R for i in range(k)]
    return suffix[0], cl, cr


def _msm_is_zero(points_affine: jnp.ndarray, scalar_ints: list) -> bool:
    """One device MSM, checked against the identity."""
    out = dmsm.msm_auto(points_affine, jnp.asarray(ints_to_limbs(scalar_ints).T))
    return dc.projective_to_host_points(out)[0] is None


def _low_level_verify_ipa(
    params: IPAParams,
    b: list,
    commitment,
    input_point: int,
    proof: IPAProof,
    transcript,
) -> bool:
    """``ipa/mod.rs:321-360``, restructured TPU-first: every round challenge
    is replayable from the proof's L/R points with no group work, so the
    whole verification equation collapses into ONE device MSM over
    {g_i, q, C, L_i, R_i} compared against the identity — zero host
    scalar-muls and a single device round trip (the reference folds C
    round-by-round with 3 group ops per round)."""
    metrics.record("ipa.verify.calls")
    t = transcript if transcript is not None else Transcript(IPA.transcript_label)
    t.append_point(commitment, "C")
    t.append_scalar(input_point % R, "input point")
    t.append_scalar(proof.y, "output point")
    w = t.digest("w", True)

    xs = []
    for li, ri in zip(proof.l, proof.r):
        t.append_point(li, "L")
        t.append_point(ri, "R")
        xs.append(t.digest("x", True))

    coeffs = [1]
    for x in xs:
        coeffs = [v for x_ in coeffs for v in (x_ * x % R, x_)]

    prod_all, cl, cr = _round_chain_coeffs(xs)
    combined_b = sum(bi * ci % R for bi, ci in zip(b, coeffs)) % R

    # c_0 = C + (w*y)*q_base; check  combined*tip + (w*q_base)*(tip*b') == c
    #   <=>  sum tip*coeffs_i*g_i + q_base*w*(tip*b' - prod_all*y)
    #        - prod_all*C - sum cl_i*L_i - sum cr_i*R_i  ==  0
    g_sc = [proof.tip * ci % R for ci in coeffs]
    q_sc = w * ((proof.tip * combined_b - prod_all * proof.y) % R) % R
    extra_sc = [q_sc, (-prod_all) % R]
    extra_sc += [(-x) % R for x in cl] + [(-x) % R for x in cr]
    extra_pts = [params.q_host, commitment] + list(proof.l) + list(proof.r)

    pts = jnp.concatenate(
        [params.g_affine[..., : len(coeffs)], dc.host_points_to_affine(extra_pts)],
        axis=-1,
    )
    return _msm_is_zero(pts, g_sc + extra_sc)
