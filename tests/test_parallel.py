"""Distributed components on the 8-device virtual CPU mesh: sharded MSM and
the four-step distributed NTT (bit-exact vs their single-device versions)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.ops import curve as dc
from verkle_kzg_tpu.ops import field as df
from verkle_kzg_tpu.ops import ntt as dntt
from verkle_kzg_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from verkle_kzg_tpu.parallel import make_mesh, msm_sharded
from verkle_kzg_tpu.parallel.ntt import intt_fr_sharded, ntt_fr_sharded
from verkle_kzg_tpu.params import R

rng = random.Random(0xD157)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def test_msm_sharded_bit_exact():
    mesh = make_mesh(8)
    n = 24
    g = hc.g1_generator()
    pts_host = [hc.g1_mul(g, rng.randrange(1, R)) for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    pts = dc.host_points_to_affine(pts_host)
    scs = jnp.asarray(ints_to_limbs(ks).T)
    out = msm_sharded(pts, scs, mesh, c=4, lanes=1)
    assert dc.projective_to_host_points(out)[0] == hc.g1_msm_naive(pts_host, ks)


def test_four_step_ntt_single_device():
    n = 64
    coeffs = [rng.randrange(R) for _ in range(n)]
    x = df.to_mont(jnp.asarray(ints_to_limbs(coeffs).T), "fr")
    ref = dntt.ntt_fr(x)
    got = ntt_fr_sharded(x, mesh=None, n1=8)
    assert bool(jnp.all(got == ref))


def test_protocol_layers_on_mesh():
    """Mesh-wired PRODUCTION paths (not just kernels): verkle node-commit
    batches, scheme commits and the multiproof D/E commits + E-aggregation
    all shard across the 8-device mesh, bit-exact vs single-device."""
    from verkle_kzg_tpu.poly import FrVector
    from verkle_kzg_tpu.schemes import IPA, ipa_setup
    from verkle_kzg_tpu.schemes.multiproof import (
        ProverQuery,
        prove_multiproof,
        verify_multiproof,
    )
    from verkle_kzg_tpu.verkle import VerkleTree

    mesh = make_mesh(8)
    crs = ipa_setup(8)
    keys = [(0, 1, 2), (0, 1, 3), (2, 5, 7), (6, 1, 2)]
    t_mesh = VerkleTree(IPA, crs, key_len=3, internal_width=8, mesh=mesh)
    t_ref = VerkleTree(IPA, crs, key_len=3, internal_width=8)
    for i, k in enumerate(keys):
        t_mesh.insert_single(k, 1000 + i)
        t_ref.insert_single(k, 1000 + i)
    assert t_mesh.commitment() == t_ref.commitment()

    data = FrVector.from_ints([3, 1, 4, 1, 5, 9, 2, 6], crs.domain)
    c_data = IPA.commit(crs, data, mesh=mesh)
    assert c_data == IPA.commit(crs, data)
    queries = [ProverQuery(data=data, commit=c_data, z=2, y=4)]
    mp_mesh = prove_multiproof(IPA, crs, queries, mesh=mesh)
    assert mp_mesh.d == prove_multiproof(IPA, crs, queries).d
    vq = [q.to_verifier_query() for q in queries]
    assert verify_multiproof(IPA, crs, vq, mp_mesh, mesh=mesh)


def test_four_step_ntt_sharded_roundtrip():
    mesh = make_mesh(8)
    n = 64
    coeffs = [rng.randrange(R) for _ in range(n)]
    x = df.to_mont(jnp.asarray(ints_to_limbs(coeffs).T), "fr")

    evals = ntt_fr_sharded(x, mesh=mesh, n1=8)
    ref = dntt.ntt_fr(x)
    assert bool(jnp.all(jnp.asarray(evals) == ref))

    back = intt_fr_sharded(jnp.asarray(evals), mesh=mesh, n1=8)
    got = limbs_to_ints(np.asarray(df.from_mont(jnp.asarray(back), "fr")).T)
    assert got == coeffs


def test_g1_ntt_sharded_bit_exact():
    """Distributed G1 four-step vs the single-device G1 NTT (the missing
    half of round-1's distributed NTT; backs the distributed FK prover)."""
    from verkle_kzg_tpu.parallel.ntt import intt_g1_sharded, ntt_g1_sharded

    mesh = make_mesh(8)
    n = 64
    g = hc.g1_generator()
    pts_host = [hc.g1_mul(g, rng.randrange(1, R)) for _ in range(n)]
    pts = dc.from_affine(dc.host_points_to_affine(pts_host))

    got = ntt_g1_sharded(pts, mesh=mesh, n1=8)
    ref = dntt.ntt_g1(pts)
    assert dc.projective_to_host_points(got) == dc.projective_to_host_points(ref)

    back = intt_g1_sharded(jnp.asarray(got), mesh=mesh, n1=8)
    assert dc.projective_to_host_points(back) == pts_host


def test_fk_distributed_end_to_end():
    """fk.prove_all_points with a mesh: EVERY transform (Fr + G1, size N and
    2N) runs as the distributed four-step, and the proof list must be
    identical to the single-device FK output (the mesh-parallel analog of
    the reference's transforms at ``kzg/mod.rs:200-235``)."""
    from verkle_kzg_tpu.poly import FrVector
    from verkle_kzg_tpu.schemes import KZG, kzg_setup
    from verkle_kzg_tpu.schemes.fk import prove_all_points

    mesh = make_mesh(8)
    n = 64
    crs = kzg_setup(n)
    data = FrVector.from_ints([rng.randrange(1, 2**61) for _ in range(n)], crs.domain)
    commit = KZG.commit(crs, data)

    single = prove_all_points(crs, data)
    sharded = prove_all_points(crs, data, mesh=mesh)
    assert [(p.proof, p.y) for p in sharded] == [(p.proof, p.y) for p in single]
    for i in (0, 13, n - 1):
        assert KZG.verify(crs, commit, i, sharded[i])
