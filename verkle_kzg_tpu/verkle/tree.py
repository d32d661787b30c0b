"""Ethereum-style verkle trie over any vector-commitment scheme.

Re-design of ``verkle-tree/src/{lib,node}.rs``. The trie itself is host-side
pointer structure (insertion is O(depth) dict work), but commitment
generation — the hot path (SURVEY.md §3.5: one MSM per node, 3 per extension)
— is *batched*: every commitment pass collects ALL dirty nodes and issues a
handful of fused device MSM calls (one per vector width), instead of the
reference's per-node serial MSMs (``node.rs:212-277``).

Faithfully replicated reference semantics (with quirks, SURVEY.md §5):
  * ``Key::split`` returns the FULL key as the stem (quirk 5,
    ``verkle-tree/src/lib.rs:62-68``), so keys differing only in their last
    unit live in different extension nodes;
  * extension c1/c2 vectors have width = key length N by default (the
    reference reuses the key-length const generic at ``node.rs:226-241``);
    pass ``ext_width=256`` for the Ethereum-style wide layout;
  * internal nodes commit a WIDTH-256 vector regardless (quirk 4,
    ``node.rs:263-264``);
  * values are 256-bit, split into low/high 128-bit Fr halves
    (``verkle-tree/src/lib.rs:77-84``, test impl :194-202), placed at slots
    (2i)%W and (2i+1)%W of c1 (i < W/2) or c2;
  * extension commitment = commit([1, stem_as_field, c1_item, c2_item])
    (``node.rs:246-253``);
  * commitments are cached per node and invalidated along the insert path
    (``node.rs:145,156``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..hostmath.serialize import fr_from_le_bytes_mod_order, g1_to_data_item
from ..ops import curve as dc
from ..ops import msm as dmsm
from ..ops.limbs import ints_to_limbs
from ..params import R

INTERNAL_WIDTH = 256  # hardcoded in the reference (node.rs:263-264)


@dataclasses.dataclass
class ExtensionNode:
    stem: tuple
    commit: object = None
    leaves: dict = dataclasses.field(default_factory=dict)  # unit -> int value


@dataclasses.dataclass
class InternalNode:
    commit: object = None
    children: dict = dataclasses.field(default_factory=dict)  # unit -> node


def _split_value(value: int):
    """256-bit value -> (low, high) Fr items: LE bytes [0:16] and [16:32]
    (the SplittableValue impl at ``verkle-tree/src/lib.rs:194-202``)."""
    b = int(value).to_bytes(32, "little")
    return (
        fr_from_le_bytes_mod_order(b[0:16]),
        fr_from_le_bytes_mod_order(b[16:32]),
    )


def _stem_item(stem: tuple) -> int:
    """bytes_to_item(stem bytes) — Fr::from_le_bytes_mod_order."""
    return fr_from_le_bytes_mod_order(bytes(stem))


class VerkleTree:
    """``VerkleTree`` (``verkle-tree/src/lib.rs:87-138``), generic over the
    scheme namespace (schemes.IPA / schemes.KZG) and its params."""

    def __init__(self, scheme, params, key_len: int, ext_width: int | None = None):
        self.scheme = scheme
        self.params = params
        self.key_len = key_len
        self.ext_width = ext_width if ext_width is not None else key_len
        self.root = InternalNode()

    # -- key machinery (lib.rs:30-73) ---------------------------------------

    def _split_key(self, key):
        key = tuple(key)
        assert len(key) == self.key_len
        return key, key[-1]  # full key as stem (reference quirk)

    @staticmethod
    def _next_diff_depth(a, b, cur_depth: int) -> int:
        d = cur_depth + 1
        while d < len(a):
            if a[d] != b[d]:
                break
            d += 1
        return d

    # -- ops (lib.rs:106-138) -------------------------------------------------

    def insert_single(self, key, value: int) -> None:
        stem, unit = self._split_key(key)
        self._insert(self.root, stem, [(unit, value)], 0)

    def get_single(self, key):
        stem, unit = self._split_key(key)
        node = self._get_stem(self.root, stem, 0)
        if node is None:
            return None
        return node.leaves.get(unit)

    def path_to_stem(self, stem):
        """(prefix, child-index, node) triples (``node.rs:101-119``)."""
        stem = tuple(stem)
        path = []
        node = self.root
        while isinstance(node, InternalNode):
            depth = len(path)
            child = node.children.get(stem[depth])
            if child is None:
                raise KeyError("Invalid path requested")
            path.append((stem[: depth + 1], stem[depth], node))
            node = child
        return path

    def _get_stem(self, node, stem, depth):
        if isinstance(node, ExtensionNode):
            return node if node.stem == stem else None
        child = node.children.get(stem[depth])
        if child is None:
            return None
        return self._get_stem(child, stem, depth + 1)

    def _insert(self, node, stem, values, cur_depth):
        """``node.rs:133-197`` with identical branching."""
        if isinstance(node, ExtensionNode):
            if node.stem != stem:
                raise AssertionError("Traversed to extension node with differing stem")
            node.commit = None
            node.leaves.update(values)
            return

        node.commit = None
        k = stem[cur_depth]
        child = node.children.get(k)
        if child is None:
            node.children[k] = ExtensionNode(stem=stem, leaves=dict(values))
        elif isinstance(child, InternalNode):
            self._insert(child, stem, values, cur_depth + 1)
        else:  # extension child
            if child.stem == stem or cur_depth == self.key_len - 2:
                self._insert(child, stem, values, cur_depth + 1)
            else:
                depth = self._next_diff_depth(child.stem, stem, cur_depth)
                new_internal = InternalNode(
                    children={
                        stem[depth]: ExtensionNode(stem=stem, leaves=dict(values)),
                        child.stem[depth]: child,
                    }
                )
                node.children[k] = new_internal

    # -- batched commitment generation ---------------------------------------

    def commitment(self):
        """Root commitment with memoization, computed with fused batched
        MSMs over all dirty nodes (vs per-node MSMs in ``node.rs:212-277``)."""
        dirty_ext, dirty_internal = [], []
        self._collect_dirty(self.root, 0, dirty_ext, dirty_internal)

        if dirty_ext:
            self._commit_extensions(dirty_ext)

        # deepest level first so children resolve before parents
        for depth in sorted({d for d, _ in dirty_internal}, reverse=True):
            level = [n for d, n in dirty_internal if d == depth]
            self._commit_internals(level)

        return self.root.commit

    def _collect_dirty(self, node, depth, dirty_ext, dirty_internal):
        if isinstance(node, ExtensionNode):
            if node.commit is None:
                dirty_ext.append(node)
            return
        if node.commit is None:
            dirty_internal.append((depth, node))
            for child in node.children.values():
                self._collect_dirty(child, depth + 1, dirty_ext, dirty_internal)

    def _batched_commit(self, vectors):
        """Commit a list of equal-width int vectors with ONE device call."""
        width = len(vectors[0])
        basis = self.scheme.basis_affine(self.params)[:width]
        scalars = jnp.asarray(
            ints_to_limbs([v % R for vec in vectors for v in vec])
        ).reshape(len(vectors), width, -1)
        out = dmsm.msm_fixed_base(basis, scalars, c=8, lanes=1)
        return dc.projective_to_host_points(out)

    def _commit_extensions(self, nodes):
        w = self.ext_width
        half = w // 2
        c_vectors = []
        for n in nodes:
            c1 = [0] * w
            c2 = [0] * w
            for unit, value in n.leaves.items():
                low, high = _split_value(value)
                lo_idx, hi_idx = (2 * unit) % w, (2 * unit + 1) % w
                target = c1 if unit < half else c2
                target[lo_idx] = low
                target[hi_idx] = high
            c_vectors.append(c1)
            c_vectors.append(c2)

        c_points = self._batched_commit(c_vectors)

        ext_vectors = []
        for i, n in enumerate(nodes):
            c1_pt, c2_pt = c_points[2 * i], c_points[2 * i + 1]
            ext_vectors.append(
                [1, _stem_item(n.stem), g1_to_data_item(c1_pt), g1_to_data_item(c2_pt)]
            )
        ext_points = self._batched_commit(ext_vectors)
        for n, pt in zip(nodes, ext_points):
            n.commit = pt

    def _commit_internals(self, nodes):
        vectors = []
        for n in nodes:
            vec = [0] * INTERNAL_WIDTH
            for unit, child in n.children.items():
                assert child.commit is not None, "child committed before parent"
                vec[unit] = g1_to_data_item(child.commit)
            vectors.append(vec)
        points = self._batched_commit(vectors)
        for n, pt in zip(nodes, points):
            n.commit = pt
