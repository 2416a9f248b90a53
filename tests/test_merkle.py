"""Merkle tree tests: device build vs host hashing, proof verify."""

import numpy as np

from olavm_tpu.field import goldilocks as g
from olavm_tpu.hash import poseidon as pos
from olavm_tpu.hash.hashers import POSEIDON
from olavm_tpu.merkle.tree import MerkleTree, _leaf_digest_host


def _rand_leaves(n, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 62, size=(n, w), dtype=np.uint64) % np.uint64(g.P)


def test_build_matches_host():
    leaves = _rand_leaves(8, 7, 1)
    t = MerkleTree.build(leaves, cap_height=0)
    # host recompute
    digs = [_leaf_digest_host([int(v) for v in row], POSEIDON) for row in leaves]
    while len(digs) > 1:
        digs = [pos.two_to_one(digs[i], digs[i + 1]) for i in range(0, len(digs), 2)]
    assert [int(v) for v in t.cap[0]] == digs[0]


def test_short_leaf_noop_hash():
    leaves = _rand_leaves(4, 3, 2)
    t = MerkleTree.build(leaves, cap_height=0)
    lvl0 = t.levels[0]
    for i in range(4):
        assert [int(v) for v in lvl0[i]] == [int(v) for v in leaves[i]] + [0]


def test_cap_and_proofs():
    leaves = _rand_leaves(16, 9, 3)
    t = MerkleTree.build(leaves, cap_height=2)
    assert t.cap.shape == (4, 4)
    for idx in [0, 5, 15]:
        proof = t.prove(idx)
        assert len(proof) == 2  # 4 levels to leaves, cap at height 2
        assert MerkleTree.verify([int(v) for v in leaves[idx]], idx, t.cap, proof)
    # tampered leaf fails
    bad = [int(v) + 1 for v in leaves[3]]
    assert not MerkleTree.verify(bad, 3, t.cap, t.prove(3))
