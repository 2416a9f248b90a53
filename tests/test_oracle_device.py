"""Device commitment pipeline vs host PolynomialBatch: caps, coefficients,
query leaves and Merkle paths must match bit-for-bit (the device prover and
host verifier share the transcript)."""

import numpy as np
import pytest

from olavm_tpu.field import gf
from olavm_tpu.hash.hashers import by_name
from olavm_tpu.merkle.tree import MerkleTree
from olavm_tpu.stark.oracle import PolynomialBatch
from olavm_tpu.stark.oracle_device import DevicePolynomialBatch


@pytest.mark.parametrize("C,logn", [(7, 6), (3, 5), (12, 4)])
def test_device_commit_matches_host_blake3(C, logn):
    rng = np.random.RandomState(C * 100 + logn)
    vals = rng.randint(0, 1 << 63, size=(C, 1 << logn)).astype(np.uint64)
    host = PolynomialBatch.from_values(vals, 3, 4, by_name("blake3"))
    dev = DevicePolynomialBatch.from_values(gf.from_u64(vals), 3, 4, "blake3")
    assert np.array_equal(host.cap, dev.cap)
    assert np.array_equal(host.polynomials, gf.to_u64(dev.coeffs))
    idxs = [0, 1, 5, (1 << (logn + 3)) - 1]
    leaves = dev.query_leaves(idxs)
    proofs = dev.prove_batch(idxs)
    for i, x in enumerate(idxs):
        hleaf, hproof = host.leaf_and_proof(x)
        assert [int(v) for v in leaves[i]] == hleaf
        assert proofs[i] == hproof
        assert MerkleTree.verify(hleaf, x, dev.cap, proofs[i],
                                 hasher=by_name("blake3"))


def test_device_commit_matches_host_poseidon():
    # poseidon leaf sponge path of the streaming absorber (blake3 is covered
    # above); C=17 exercises a partial final rate chunk
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1 << 63, size=(17, 32)).astype(np.uint64)
    host = PolynomialBatch.from_values(vals, 3, 2, by_name("poseidon"))
    dev = DevicePolynomialBatch.from_values(gf.from_u64(vals), 3, 2,
                                            "poseidon")
    assert np.array_equal(host.cap, dev.cap)
    idxs = [0, 17, 255]
    leaves = dev.query_leaves(idxs)
    proofs = dev.prove_batch(idxs)
    for i, x in enumerate(idxs):
        hleaf, hproof = host.leaf_and_proof(x)
        assert [int(v) for v in leaves[i]] == hleaf
        assert proofs[i] == hproof
