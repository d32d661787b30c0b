"""Device-side SHA-256 / RFC-9380 hash-to-field, for in-program Fiat-Shamir.

The reference sequences its IPA halving loop on the host: every round
serializes two points, SHA-256s the transcript, and ships the challenge back
(``vector-commit/src/ipa/mod.rs:268-319`` + ``transcript.rs:28-62``). On a
TPU behind a network tunnel those 2*log2(n) host round-trips dominate prove
latency, so this module re-implements the exact digest chain as jax ops:
the whole halving loop then compiles into ONE device program with zero host
syncs (see schemes/ipa.py::_fused_ipa_loop).

Byte-exactness contract: for any message these functions produce the same
bytes/field elements as ``hostmath/hashing.py`` (itself vector-checked
against RFC 9380 K.1) — tested in tests/test_ops_sha.py.

Representation: byte strings are 1-D uint32 arrays, one byte (0..255) per
element, all lengths static. This is scalar-unit work on TPU — a few
thousand sequential uint32 ops per digest — which is negligible next to the
MSMs it unblocks, and it removes the host from the loop entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import NLIMBS
from . import field as F

L = NLIMBS

# FIPS 180-4 constants.
_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

_SHA_BLOCK = 64  # bytes
_FR_HASH_LEN = 48  # DefaultFieldHasher<Sha256> len_per_elem for BN254 Fr


def const_bytes(raw: bytes) -> jnp.ndarray:
    """Static byte string -> (len,) uint32 device constant."""
    return jnp.asarray(np.frombuffer(raw, dtype=np.uint8).astype(np.uint32))


def _rotr(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x >> r) | (x << (32 - r))


def sha256_bytes(msg: jnp.ndarray) -> jnp.ndarray:
    """(n,) uint32 bytes -> (32,) uint32 digest bytes. Static-length padding;
    message schedule and rounds as lax.fori_loop (traced once, compile-cheap)."""
    n = int(msg.shape[0])
    total = ((n + 9 + _SHA_BLOCK - 1) // _SHA_BLOCK) * _SHA_BLOCK
    tail = np.zeros(total - n, dtype=np.uint32)
    tail[0] = 0x80
    bitlen = n * 8
    tail[-8:] = [(bitlen >> (8 * (7 - i))) & 0xFF for i in range(8)]
    padded = jnp.concatenate([msg.astype(jnp.uint32), jnp.asarray(tail)])
    byts = padded.reshape(-1, 16, 4)
    words = (
        (byts[..., 0] << 24) | (byts[..., 1] << 16) | (byts[..., 2] << 8)
        | byts[..., 3]
    )  # (nblocks, 16) uint32 big-endian words

    k_arr = jnp.asarray(_K)

    def block(h, w16):
        wf = jnp.zeros(64, jnp.uint32).at[:16].set(w16)

        def sched(t, w):
            w15 = w[t - 15]
            w2 = w[t - 2]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
            return w.at[t].set(w[t - 16] + s0 + w[t - 7] + s1)

        wf = jax.lax.fori_loop(16, 64, sched, wf)

        def rnd(t, st):
            a, b, c, d, e, f, g, hh = st
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = hh + s1 + ch + k_arr[t] + wf[t]
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            return (t1 + s0 + maj, a, b, c, d + t1, e, f, g)

        st = jax.lax.fori_loop(0, 64, rnd, tuple(h))
        return tuple(x + y for x, y in zip(h, st)), None

    h, _ = jax.lax.scan(block, tuple(jnp.asarray(_H0)), words)
    dig = jnp.stack(h)  # (8,) uint32
    return jnp.stack(
        [(dig >> 24) & 0xFF, (dig >> 16) & 0xFF, (dig >> 8) & 0xFF, dig & 0xFF],
        axis=-1,
    ).reshape(32)


def expand_message_xmd(msg: jnp.ndarray, dst: bytes, len_in_bytes: int) -> jnp.ndarray:
    """RFC 9380 section 5.3.1 with SHA-256, device-side; mirrors
    hostmath/hashing.py::expand_message_xmd byte-for-byte. ``dst`` is static."""
    ell = -(-len_in_bytes // 32)
    assert ell <= 255 and len_in_bytes <= 65535 and len(dst) <= 255
    dst_prime = const_bytes(dst + len(dst).to_bytes(1, "big"))
    z_pad = jnp.zeros(_SHA_BLOCK, jnp.uint32)
    l_i_b = const_bytes(len_in_bytes.to_bytes(2, "big"))
    b0 = sha256_bytes(
        jnp.concatenate([z_pad, msg, l_i_b, jnp.zeros(1, jnp.uint32), dst_prime])
    )
    bs = [sha256_bytes(jnp.concatenate([b0, const_bytes(b"\x01"), dst_prime]))]
    for i in range(2, ell + 1):
        bs.append(
            sha256_bytes(
                jnp.concatenate(
                    [b0 ^ bs[-1], const_bytes(i.to_bytes(1, "big")), dst_prime]
                )
            )
        )
    return jnp.concatenate(bs)[:len_in_bytes]


def _be_bytes_to_limb_col(b: jnp.ndarray) -> jnp.ndarray:
    """(nbytes,) big-endian bytes (nbytes even, <= 32) -> (L, 1) uint32
    little-endian 16-bit limb column of the same integer."""
    nb = int(b.shape[0])
    nl = nb // 2
    rev = b[::-1]  # little-endian bytes
    limbs = rev[0::2] + (rev[1::2] << 8)  # (nl,)
    if nl < L:
        limbs = jnp.concatenate([limbs, jnp.zeros(L - nl, jnp.uint32)])
    return limbs[:, None]


def hash_to_fr(msg: jnp.ndarray, dst: bytes) -> jnp.ndarray:
    """DefaultFieldHasher<Sha256>::hash_to_field, one element: expand to 48
    bytes, reduce big-endian mod r. Returns a CANONICAL standard-form (L, 1)
    limb column (matches hostmath/hashing.py::hash_to_fr)."""
    uniform = expand_message_xmd(msg, dst, _FR_HASH_LEN)
    hi = _be_bytes_to_limb_col(uniform[:24])  # value = hi*2^192 + lo
    lo = _be_bytes_to_limb_col(uniform[24:])
    c192 = jnp.asarray(F.const_mont(1 << 192, "fr"))[:, None]
    return F.add(F.mont_mul(hi, c192, "fr"), lo, "fr")


def fr_to_bytes(x_std: jnp.ndarray) -> jnp.ndarray:
    """Canonical standard-form (L, 1) Fr column -> (32,) LE bytes
    (serialize_compressed layout, hostmath/serialize.py::fr_to_bytes)."""
    limbs = x_std[:, 0]
    return jnp.stack([limbs & 0xFF, limbs >> 8], axis=-1).reshape(2 * L)[:32]


def _gt_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(L, B) canonical limb columns -> (B,) bool, a > b (multi-limb)."""
    d = F._carry_signed(b.astype(jnp.int32) - a.astype(jnp.int32))
    return d[L - 1, :] < 0  # b - a underflowed  <=>  b < a


def g1_compressed_bytes(aff_mont: jnp.ndarray) -> jnp.ndarray:
    """(2, L, B) Montgomery affine batch ((0,0) = infinity sentinel) ->
    (B, 32) uint32 compressed bytes, byte-exact with
    hostmath/serialize.py::g1_to_compressed_bytes (SWFlags in byte 31)."""
    x_std = F.from_mont(aff_mont[0], "fq")  # (L, B)
    y_std = F.from_mont(aff_mont[1], "fq")
    neg_y = F.neg(y_std, "fq")
    is_neg = _gt_cols(y_std, neg_y)  # (B,)
    inf = jnp.all(aff_mont[0] == 0, axis=0) & jnp.all(aff_mont[1] == 0, axis=0)

    byts = jnp.stack([x_std & 0xFF, x_std >> 8], axis=1).reshape(2 * L, -1)
    byts = jnp.where(inf[None, :], 0, byts)  # infinity: x field is all-zero
    flags = jnp.where(inf, 1 << 6, 0) | jnp.where(is_neg & ~inf, 1 << 7, 0)
    byts = byts.at[31].add(flags.astype(jnp.uint32))
    return byts[:32].T  # (B, 32)
