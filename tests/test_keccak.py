"""Keccak-256 hasher config (reference KeccakGoldilocksConfig,
plonk/config.rs:141-152): spec vectors, batch==scalar, and a Merkle
round-trip through the generic tree with merkle_hasher="keccak"."""

import numpy as np

from olavm_tpu.hash.keccak import keccak256, keccak256_batch
from olavm_tpu.hash.hashers import by_name
import pytest

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold


def test_keccak256_spec_vectors():
    # legacy (pre-NIST) Keccak-256 published vectors
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak256_batch_matches_scalar_multiblock():
    msg = bytes(range(256)) * 2  # 512 bytes: crosses the 136-byte rate
    want = keccak256(msg)
    arr = np.frombuffer(msg * 3, dtype=np.uint8).reshape(3, len(msg))
    got = keccak256_batch(arr)
    for row in got:
        assert row.tobytes() == want


def test_keccak_hasher_tree_ops():
    h = by_name("keccak")
    leaves = np.arange(40, dtype=np.uint64).reshape(8, 5)
    digs = h.hash_leaves(leaves)
    assert digs.shape == (8, 4)
    # compress consistency with two_to_one
    comp = h.compress(digs[0::2], digs[1::2])
    assert [int(v) for v in comp[0]] == h.two_to_one(digs[0], digs[1])
    # digest_to_fields: 5 field elements from 32 bytes (7-byte chunks)
    fields = h.digest_to_fields(digs[0])
    assert len(fields) == 5


def test_keccak_merkle_cap_tree():
    from olavm_tpu.merkle.tree import MerkleTree

    rng = np.random.RandomState(7)
    leaves = rng.randint(0, 1 << 63, size=(64, 6)).astype(np.uint64)
    tree = MerkleTree.build(leaves, cap_height=2, hasher=by_name("keccak"))
    proof = tree.prove(13)
    assert MerkleTree.verify(
        [int(v) for v in leaves[13]], 13, tree.cap, proof,
        hasher=by_name("keccak"),
    )
