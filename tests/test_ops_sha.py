"""Device-side SHA-256 / expand_message_xmd / hash_to_fr (ops/sha256.py)
vs hashlib and the host oracle (hostmath/hashing.py, itself anchored to the
RFC 9380 K.1 vectors in test_vectors.py)."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp

from verkle_kzg_tpu.hostmath.hashing import (
    expand_message_xmd as host_xmd,
    hash_to_fr as host_hash_to_fr,
    eth_try_and_increment,
)
from verkle_kzg_tpu.hostmath.serialize import (
    fr_to_bytes as host_fr_to_bytes,
    g1_to_compressed_bytes,
)
from verkle_kzg_tpu.ops import curve as C
from verkle_kzg_tpu.ops import sha256 as S
from verkle_kzg_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from verkle_kzg_tpu.params import Q


def _bytes(arr) -> bytes:
    return bytes(np.asarray(arr).astype(np.uint8))


def test_sha256_matches_hashlib():
    rng = random.Random(1)
    # lengths straddling every padding boundary (55/56/63/64) + multi-block
    for n in [0, 1, 55, 56, 63, 64, 100, 171, 200]:
        msg = bytes(rng.randrange(256) for _ in range(n))
        assert _bytes(S.sha256_bytes(S.const_bytes(msg))) == hashlib.sha256(msg).digest()


def test_expand_and_hash_to_fr_match_host():
    rng = random.Random(2)
    for n, dst in [(33, b"ipa"), (100, b"ipa"), (100, b"multiproof")]:
        msg = bytes(rng.randrange(256) for _ in range(n))
        assert _bytes(S.expand_message_xmd(S.const_bytes(msg), dst, 48)) == host_xmd(
            msg, dst, 48
        )
        got = limbs_to_ints(np.asarray(S.hash_to_fr(S.const_bytes(msg), dst)).T)[0]
        assert got == host_hash_to_fr(msg, dst, 1)[0]


def test_fr_to_bytes_matches_host():
    rng = random.Random(3)
    for _ in range(4):
        v = rng.getrandbits(253)
        got = _bytes(S.fr_to_bytes(jnp.asarray(ints_to_limbs([v]).T)))
        assert got == host_fr_to_bytes(v)


def test_g1_compressed_bytes_matches_host():
    pts = eth_try_and_increment(b"shatest", 4)
    pts += [None, (pts[0][0], (Q - pts[0][1]) % Q)]  # infinity + negated y
    got = np.asarray(S.g1_compressed_bytes(C.host_points_to_affine(pts)))
    for i, p in enumerate(pts):
        assert bytes(got[i].astype(np.uint8)) == g1_to_compressed_bytes(p)
