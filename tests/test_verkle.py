"""Verkle tree semantics (mirrors ``verkle-tree/src/lib.rs:167-351`` tests)
plus the batched-commitment path, with fixed seeds."""

import random

import pytest

from verkle_kzg_tpu.poly import FrVector
from verkle_kzg_tpu.schemes import KZG, kzg_setup
from verkle_kzg_tpu.verkle import VerkleTree
from verkle_kzg_tpu.verkle.tree import INTERNAL_WIDTH, _split_value, _stem_item

rng = random.Random(0x7EE)

KEY_LEN = 3


WIDTH = 16  # narrow internal width for CPU-friendly tests (default is the
# reference's hardcoded 256; narrow widths exercise identical code paths)


@pytest.fixture(scope="module")
def crs():
    return kzg_setup(WIDTH)


def random_key(arity=WIDTH, prefix=None):
    key = [rng.randrange(arity) for _ in range(KEY_LEN)]
    if prefix:
        key[: len(prefix)] = prefix
    return tuple(key)


def random_value():
    return rng.randrange(1 << 256)


def test_insert_get_shuffled(crs):
    num = 10  # must stay well under WIDTH distinct first units
    kvs = {}
    stem = random_key()
    while len(kvs) < num // 4:  # quarter of keys share a first unit
        k = random_key(prefix=stem[:1])
        if any(e[1] == k[1] for e in kvs):
            continue  # avoid the reference's depth-(N-2) panic path
        kvs[k] = random_value()
    while len(kvs) < num:
        # NOTE: keys dedupe on the first unit: the reference's trie layout is
        # only self-consistent when sibling stems diverge one level below
        # their parent (see tree.py docstring on the reference's
        # depth-skipping internal-node quirk).
        k = random_key()
        if any(e[0] == k[0] for e in kvs):
            continue
        kvs[k] = random_value()

    t1 = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    t2 = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    keys = list(kvs)
    shuffled = keys[:]
    rng.shuffle(shuffled)
    for k in keys:
        t1.insert_single(k, kvs[k])
    for k in shuffled:
        t2.insert_single(k, kvs[k])

    for k in keys:
        assert t1.get_single(k) == kvs[k]
        assert t2.get_single(k) == kvs[k]

    # insertion-order invariance of the root commitment
    assert t1.commitment() == t2.commitment()


def test_overwrite(crs):
    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k = random_key()
    t.insert_single(k, 1111)
    t.insert_single(k, 2222)
    assert t.get_single(k) == 2222


def test_commitment_matches_unbatched(crs):
    """The fused batched MSM pass must equal a hand-rolled per-node commit
    (semantics of ``node.rs:212-277``)."""
    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k1 = random_key()
    k2 = random_key(prefix=(k1[0],))
    v1, v2 = random_value(), random_value()
    t.insert_single(k1, v1)
    if k2 == k1:
        k2 = (k1[0], (k1[1] + 1) % WIDTH, k1[2])
    t.insert_single(k2, v2)

    root = t.commitment()

    # recompute by hand via scheme.commit per node
    from verkle_kzg_tpu.hostmath.serialize import g1_to_data_item

    def ext_commit(stem, leaves):
        w = KEY_LEN
        c1, c2 = [0] * w, [0] * w
        for unit, val in leaves.items():
            low, high = _split_value(val)
            tgt = c1 if unit < w // 2 else c2
            tgt[(2 * unit) % w] = low
            tgt[(2 * unit + 1) % w] = high
        c1p = KZG.commit(crs, FrVector.from_ints(c1, crs.domain))
        c2p = KZG.commit(crs, FrVector.from_ints(c2, crs.domain))
        data = [1, _stem_item(stem), g1_to_data_item(c1p), g1_to_data_item(c2p)]
        return KZG.commit(crs, FrVector.from_ints(data, crs.domain))

    def node_commit(node):
        from verkle_kzg_tpu.verkle.tree import ExtensionNode

        if isinstance(node, ExtensionNode):
            return ext_commit(node.stem, node.leaves)
        vec = [0] * WIDTH
        for unit, child in node.children.items():
            vec[unit] = g1_to_data_item(node_commit(child))
        return KZG.commit(crs, FrVector.from_ints(vec, crs.domain))

    assert root == node_commit(t.root)


def test_cache_invalidation(crs):
    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k = random_key()
    t.insert_single(k, 10)
    c1 = t.commitment()
    assert t.commitment() == c1  # memoized
    t.insert_single(k, 11)  # invalidates along the path
    c2 = t.commitment()
    assert c1 != c2


def test_prove_keys_stateless(crs):
    """Path proving via the multiproof (greenfield: the reference's proving
    impl block is empty, ``verkle-tree/src/lib.rs:141-152``). Verification
    is STATELESS: after proving, the tree is destroyed and the check runs
    from (root commitment, keys, values, proof) alone."""
    from verkle_kzg_tpu.verkle.tree import VerkleVerifier

    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k1 = random_key()
    k2 = random_key(prefix=(k1[0],))
    if k2 == k1:
        k2 = (k1[0], (k1[1] + 1) % WIDTH, k1[2])
    v1, v2 = random_value(), random_value()
    t.insert_single(k1, v1)
    t.insert_single(k2, v2)
    root = t.commitment()

    proof = t.prove_keys([k1, k2])
    verifier = VerkleVerifier(
        scheme=KZG, params=crs, key_len=KEY_LEN, ext_width=t.ext_width
    )
    del t  # light client: no tree state

    assert verifier.verify(root, [k1, k2], {k1: v1, k2: v2}, proof)
    # wrong claimed value must fail
    assert not verifier.verify(root, [k1, k2], {k1: v1 + 1, k2: v2}, proof)
    # tampered commitment stream must fail
    from verkle_kzg_tpu.hostmath.curve import g1_add, g1_generator

    proof.commitments[0] = g1_add(proof.commitments[0], g1_generator())
    assert not verifier.verify(root, [k1, k2], {k1: v1, k2: v2}, proof)


def test_path_to_stem(crs):
    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k = random_key()
    t.insert_single(k, random_value())
    t.insert_single(random_key(prefix=(k[0],)), random_value())

    path = t.path_to_stem(k)
    for i, (prefix, unit, _node) in enumerate(path):
        assert prefix == k[: i + 1]
        assert unit == k[i]
