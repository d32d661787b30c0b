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


def test_absence_proofs(crs):
    """Stateless absence proofs for all three path-termination modes
    (greenfield vs the empty proving block ``verkle-tree/src/lib.rs:141-152``;
    Ethereum verkle absence semantics): empty internal slot ("E"),
    extension with another stem ("O"), extension missing the unit ("L")."""
    from verkle_kzg_tpu.verkle.tree import VerkleVerifier

    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k1 = (2, 3, 4)
    k2 = (2, 5, 6)  # shares first unit -> internal node at depth 1
    v1, v2 = random_value(), random_value()
    t.insert_single(k1, v1)
    t.insert_single(k2, v2)
    # "L": extension whose stem matches k_l but holds a different unit
    # (only reachable through the multi-value insert surface)
    k_l = (7, 1, 1)
    t._insert(t.root, k_l, [(9, random_value())], 0)
    t.commitment()
    root = t.root.commit

    absent_e = (9, 0, 0)  # no child at root slot 9
    absent_e2 = (2, 7, 7)  # internal at depth 1 has no child at 7
    absent_o = (2, 3, 5)  # hits k1's extension: stem differs in the last unit
    verifier = VerkleVerifier(
        scheme=KZG, params=crs, key_len=KEY_LEN, ext_width=t.ext_width
    )

    keys = [k1, absent_e, absent_e2, absent_o, k_l]
    values = {k1: v1, absent_e: None, absent_e2: None, absent_o: None, k_l: None}
    proof = t.prove_keys(keys)
    assert proof.modes[absent_e][0] == "E" and proof.modes[absent_e][1] == 0
    assert proof.modes[absent_e2] == ("E", 1)
    assert proof.modes[absent_o][0] == "O"
    assert proof.modes[k_l][0] == "L"
    assert verifier.verify(root, keys, values, proof)

    # claiming a PRESENT value for a proven-absent key must fail
    bad = dict(values)
    bad[absent_o] = 123
    assert not verifier.verify(root, keys, bad, proof)
    # claiming absence for the present key must fail
    bad = dict(values)
    bad[k1] = None
    assert not verifier.verify(root, keys, bad, proof)
    # tampering the other-stem metadata must fail (stems must differ but
    # share the path prefix, and the multiproof binds the real stem item)
    import copy

    p2 = copy.deepcopy(proof)
    p2.modes[absent_o] = ("O", p2.modes[absent_o][1], absent_o)
    assert not verifier.verify(root, keys, values, p2)
    p3 = copy.deepcopy(proof)
    p3.modes[absent_o] = ("O", p3.modes[absent_o][1], (9, 9, 9))
    assert not verifier.verify(root, keys, values, p3)
    # flipping an absent mode to "present" must fail
    p4 = copy.deepcopy(proof)
    p4.modes[absent_e2] = ("P", 2)
    vals4 = dict(values)
    vals4[absent_e2] = 5
    assert not verifier.verify(root, keys, vals4, p4)


def test_mixed_density_commit(crs):
    """Per-node sparse/dense routing in _batched_commit: one busy extension
    (dense c1) alongside 1-leaf extensions (sparse) in the SAME chunk must
    equal the hand-rolled per-node commit (``node.rs:212-277`` semantics)."""
    from verkle_kzg_tpu.hostmath.serialize import g1_to_data_item
    from verkle_kzg_tpu.verkle.tree import ExtensionNode

    EXTW = 16
    t = VerkleTree(KZG, crs, KEY_LEN, ext_width=EXTW, internal_width=WIDTH)
    t.insert_single((1, 2, 3), random_value())
    t.insert_single((4, 5, 6), random_value())
    # busy stem: 8 units -> 16 nonzero c1/c2 slots > SPARSE_NNZ_MAX
    busy = (7, 7, 7)
    t._insert(t.root, busy, [(u, random_value()) for u in range(8)], 0)
    root = t.commitment()

    def ext_commit(node):
        c1, c2 = [0] * EXTW, [0] * EXTW
        for unit, val in node.leaves.items():
            low, high = _split_value(val)
            tgt = c1 if unit < EXTW // 2 else c2
            tgt[(2 * unit) % EXTW] = low
            tgt[(2 * unit + 1) % EXTW] = high
        c1p = KZG.commit(crs, FrVector.from_ints(c1, crs.domain))
        c2p = KZG.commit(crs, FrVector.from_ints(c2, crs.domain))
        data = [1, _stem_item(node.stem), g1_to_data_item(c1p), g1_to_data_item(c2p)]
        return KZG.commit(crs, FrVector.from_ints(data, crs.domain))

    def node_commit(node):
        if isinstance(node, ExtensionNode):
            return ext_commit(node)
        vec = [0] * WIDTH
        for unit, child in node.children.items():
            vec[unit] = g1_to_data_item(node_commit(child))
        return KZG.commit(crs, FrVector.from_ints(vec, crs.domain))

    assert root == node_commit(t.root)


def test_path_to_stem(crs):
    t = VerkleTree(KZG, crs, KEY_LEN, internal_width=WIDTH)
    k = random_key()
    t.insert_single(k, random_value())
    t.insert_single(random_key(prefix=(k[0],)), random_value())

    path = t.path_to_stem(k)
    for i, (prefix, unit, _node) in enumerate(path):
        assert prefix == k[: i + 1]
        assert unit == k[i]
