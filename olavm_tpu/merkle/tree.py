"""Merkle tree commitment with cap, Poseidon hashing, TPU-vectorized.

Replaces the reference's rayon-parallel digest tree
(/root/reference/plonky2/plonky2/src/hash/merkle_tree/mod.rs:146-228) with a
level-by-level batched build: leaf hashing is a vectorized sponge over all
leaves at once (each permutation runs over the full leaf axis on the VPU),
then log2(n) - cap_height rounds of batched two-to-one compressions.

Leaf hashing follows plonky2's hash_or_noop semantics
(plonky2/src/hash/hash_types.rs + hashing.rs:16-23): a leaf of <= 4 field
elements is its own (zero-padded) digest; longer leaves get the rate-8
overwrite sponge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf
from ..field import goldilocks as g
from ..hash import poseidon as pos


def hash_leaves_gf(leaves: gf.GF) -> list[gf.GF]:
    """Hash a (n_leaves, leaf_len) GF matrix into 4 digest lanes of shape (n,)."""
    n, leaf_len = leaves.shape
    if leaf_len <= 4:
        zero = gf.zeros((n,))
        return [
            leaves[:, i] if i < leaf_len else zero for i in range(4)
        ]
    state = [gf.zeros((n,)) for _ in range(pos.WIDTH)]
    for start in range(0, leaf_len, pos.RATE):
        chunk = min(pos.RATE, leaf_len - start)
        for i in range(chunk):
            state[i] = leaves[:, start + i]
        state = pos.permute_gf(state)
    return state[:4]


def _compress_level(digests: list[gf.GF]) -> list[gf.GF]:
    """One tree level: pairwise two_to_one over (n,) lanes -> (n/2,)."""
    evens = [d[0::2] for d in digests]
    odds = [d[1::2] for d in digests]
    return pos.two_to_one_gf(evens, odds)


def _default_is_cpu() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True


class MerkleTree:
    """Digest tree with cap. levels[0] = leaf digests ... levels[-1] = cap.

    Digests are kept as host uint64 arrays of shape (n, 4) per level so query
    proofs are cheap; the build itself runs on device.
    """

    def __init__(self, levels: list[np.ndarray], cap_height: int,
                 hasher=None):
        from ..hash.hashers import POSEIDON

        self.levels = levels
        self.cap_height = cap_height
        self.hasher = hasher or POSEIDON

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    @staticmethod
    def build(
        leaves_u64: np.ndarray, cap_height: int = 0, backend: str = "auto",
        hasher=None,
    ) -> "MerkleTree":
        """leaves_u64: (n_leaves, leaf_len) uint64; n_leaves a power of two.

        backend: "device" (JAX, batched Poseidon permutations), "host"
        (vectorized numpy/native — faster for small trees and avoids device
        compiles), or "auto" (device only on an accelerator, only for big
        trees, Poseidon only). hasher: hash.hashers.POSEIDON / BLAKE3.
        """
        from ..hash.hashers import POSEIDON

        hasher = hasher or POSEIDON
        n = leaves_u64.shape[0]
        log_n = n.bit_length() - 1
        assert 1 << log_n == n, "leaf count must be a power of two"
        assert cap_height <= log_n
        if hasher.kind != "poseidon":
            backend = "host"
        if backend == "auto":
            backend = "host" if (n < 4096 or _default_is_cpu()) else "device"
        if backend == "host":
            levels = _build_host(leaves_u64, log_n - cap_height, hasher)
        else:
            digs = _jit_build(gf.from_u64(leaves_u64), log_n - cap_height)
            levels = [
                np.stack([gf.to_u64(x) for x in level], axis=-1) for level in digs
            ]
        return MerkleTree(levels, cap_height, hasher)

    def prove(self, leaf_index: int) -> list[list[int]]:
        """Merkle path: sibling digests from leaf level up to (excl.) the cap."""
        out = []
        idx = leaf_index
        num_levels = len(self.levels) - 1  # exclude cap
        for lvl in range(num_levels):
            sib = idx ^ 1
            out.append([int(v) for v in self.levels[lvl][sib]])
            idx >>= 1
        return out

    @staticmethod
    def verify(
        leaf_data: list[int],
        leaf_index: int,
        cap: np.ndarray,
        proof: list[list[int]],
        hasher=None,
    ) -> bool:
        from ..hash.hashers import POSEIDON

        hasher = hasher or POSEIDON
        digest = _leaf_digest_host(leaf_data, hasher)
        idx = leaf_index
        for sib in proof:
            if idx & 1:
                digest = hasher.two_to_one(sib, digest)
            else:
                digest = hasher.two_to_one(digest, sib)
            idx >>= 1
        return [int(v) for v in cap[idx]] == [int(v) for v in digest]


def _build_host(leaves_u64: np.ndarray, num_compress: int, hasher
                ) -> list[np.ndarray]:
    """Vectorized numpy/native build (batched over all nodes per level)."""
    n, leaf_len = leaves_u64.shape
    if leaf_len <= hasher.noop_max:
        digs = np.zeros((n, 4), dtype=np.uint64)
        digs[:, :leaf_len] = leaves_u64
    else:
        digs = hasher.hash_leaves(leaves_u64)
    levels = [digs]
    for _ in range(num_compress):
        digs = hasher.compress(
            np.ascontiguousarray(digs[0::2]), np.ascontiguousarray(digs[1::2])
        )
        levels.append(digs)
    return levels


def _leaf_digest_host(leaf_data: list[int], hasher) -> list[int]:
    if len(leaf_data) <= hasher.noop_max:
        return list(leaf_data) + [0] * (4 - len(leaf_data))
    return hasher.hash_no_pad(leaf_data)


def _build_levels(leaves: gf.GF, num_compress: int):
    digests = hash_leaves_gf(leaves)
    levels = [digests]
    for _ in range(num_compress):
        digests = _compress_level(digests)
        levels.append(digests)
    return levels


_jit_build_cache = {}


def _jit_build(leaves: gf.GF, num_compress: int):
    key = (leaves.shape, num_compress)
    if key not in _jit_build_cache:
        _jit_build_cache[key] = jax.jit(
            lambda lv: _build_levels(lv, num_compress)
        )
    return _jit_build_cache[key](leaves)
