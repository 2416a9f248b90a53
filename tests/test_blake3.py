"""BLAKE3 hasher: known-vector + batch-consistency checks."""

import numpy as np

from olavm_tpu.hash.hashers import BLAKE3, POSEIDON
from olavm_tpu.merkle.tree import MerkleTree
from olavm_tpu.native import blake3_native as b3
import pytest

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold


def test_blake3_known_vector():
    # official BLAKE3 test vector for input b"abc"
    assert (
        b3.blake3_hash(b"abc").hex()
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )
    # 32-byte output, deterministic
    assert b3.blake3_hash(b"") == b3.blake3_hash(b"")
    assert len(b3.blake3_hash(b"x" * 5000)) == 32


def test_blake3_multichunk_consistency():
    # chunk-boundary lengths exercise the tree mode
    for n in (1023, 1024, 1025, 2048, 2049, 4096):
        h1 = b3.blake3_hash(b"a" * n)
        h2 = b3.blake3_hash(b"a" * n)
        assert h1 == h2 and len(h1) == 32
    assert b3.blake3_hash(b"a" * 1024) != b3.blake3_hash(b"a" * 1025)


def test_blake3_batch_matches_single():
    rng = np.random.RandomState(0)
    leaves = rng.randint(0, 1 << 63, size=(16, 9)).astype(np.uint64)
    digs = b3.hash_leaves(leaves)
    for i in range(16):
        expect = np.frombuffer(b3.blake3_hash(leaves[i].tobytes()), dtype="<u8")
        assert np.array_equal(digs[i], expect)
    comp = b3.compress_batch(digs[0::2], digs[1::2])
    expect0 = np.frombuffer(
        b3.blake3_hash(digs[0].tobytes() + digs[1].tobytes()), dtype="<u8"
    )
    assert np.array_equal(comp[0], expect0)


def test_blake3_merkle_roundtrip():
    rng = np.random.RandomState(1)
    leaves = rng.randint(0, 1 << 62, size=(64, 7)).astype(np.uint64)
    t = MerkleTree.build(leaves, cap_height=2, hasher=BLAKE3)
    for idx in (0, 5, 63):
        proof = t.prove(idx)
        assert MerkleTree.verify(
            [int(v) for v in leaves[idx]], idx, t.cap, proof, hasher=BLAKE3
        )
    # poseidon tree over the same leaves differs
    t2 = MerkleTree.build(leaves, cap_height=2, hasher=POSEIDON)
    assert not np.array_equal(t.cap, t2.cap)


def test_digest_to_fields_seven_byte_chunks():
    digest = np.arange(4, dtype=np.uint64)
    fields = BLAKE3.digest_to_fields(digest)
    assert len(fields) == 5
    raw = digest.tobytes()
    assert fields[0] == int.from_bytes(raw[0:7], "little")
    assert fields[4] == int.from_bytes(raw[28:32], "little")
    assert POSEIDON.digest_to_fields(digest) == [0, 1, 2, 3]
