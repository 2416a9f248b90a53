"""Device-resident Merkle commitment kernels (jnp; run under jit on TPU).

Replaces the reference's rayon digest tree
(/root/reference/plonky2/plonky2/src/hash/merkle_tree/mod.rs:146-228) with
fully batched level-by-level builds on the accelerator. Two hashers, matching
the host configs in olavm_tpu.hash.hashers:

- blake3 (Blake3GoldilocksConfig, the reference bench config): pure u32
  VPU arithmetic, ideal for TPU lanes. A digest is 8 u32 word lanes.
- poseidon (PoseidonGoldilocksConfig): field-native; digest = 4 GF lanes
  stored as 8 u32 lanes (lo0,hi0,lo1,hi1,...).

Layout: a batch of n leaves of C field elements is a gf.GF of shape (n, C)
(or word-lane lists); digests are lists of 8 uint32 arrays of shape (n,).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import gf
from ..hash import blake3 as b3
from ..hash import poseidon as pos


def _gf_cols_to_words(leaves: gf.GF) -> list:
    """(n, C) GF -> 2C u32 lanes in little-endian u64 byte order.

    Transposes first: strided column slices ([:, c]) feeding a hash chain
    hit XLA:CPU's pathological codegen path (round-4 finding)."""
    n, C = leaves.shape
    lo = leaves.lo.T
    hi = leaves.hi.T
    words = []
    for c in range(C):
        words.append(lo[c])
        words.append(hi[c])
    return words


def leaf_digests(leaves: gf.GF, hasher_kind: str) -> list:
    """Hash (n, C) GF leaf rows -> 8 u32 digest lanes of shape (n,).

    hash_or_noop semantics for <= 4 field elements (a short leaf is its own
    zero-padded digest) apply to the poseidon config only; the byte hasher
    treats 4 u64 = 32 bytes = digest size the same way (hashers.py noop_max).
    """
    n, C = leaves.shape
    if C <= 4:
        zero = jnp.zeros((n,), jnp.uint32)
        out = []
        for i in range(4):
            out.append(leaves.lo[:, i] if i < C else zero)
            out.append(leaves.hi[:, i] if i < C else zero)
        return out
    if hasher_kind == "blake3":
        return b3.hash_words(jnp, _gf_cols_to_words(leaves))
    # poseidon rate-8 overwrite sponge over the row
    state = [gf.zeros((n,)) for _ in range(pos.WIDTH)]
    for start in range(0, C, pos.RATE):
        chunk = min(pos.RATE, C - start)
        for i in range(chunk):
            state[i] = leaves[:, start + i]
        state = pos.permute_gf(state)
    out = []
    for d in state[:4]:
        out.append(d.lo)
        out.append(d.hi)
    return out


def word_digests(words: list, hasher_kind: str, byte_len: int | None = None) -> list:
    """Hash word-lane leaves directly (no GF structure), e.g. FRI tree leaves
    of flattened extension values. blake3 only needs the raw words; poseidon
    reinterprets word pairs as field elements."""
    if hasher_kind == "blake3":
        return b3.hash_words(jnp, words, byte_len)
    n = words[0].shape[0]
    C = len(words) // 2
    if C <= 4:
        zero = jnp.zeros((n,), jnp.uint32)
        return [words[i] if i < 2 * C else zero for i in range(8)]
    state = [gf.zeros((n,)) for _ in range(pos.WIDTH)]
    for start in range(0, C, pos.RATE):
        chunk = min(pos.RATE, C - start)
        for i in range(chunk):
            state[i] = gf.GF(words[2 * (start + i)], words[2 * (start + i) + 1])
        state = pos.permute_gf(state)
    out = []
    for d in state[:4]:
        out.append(d.lo)
        out.append(d.hi)
    return out


# ---------------------------------------------------------------------------
# streaming leaf hashing: absorb column blocks of a (C, size) LDE without the
# full LDE ever being resident.  The leaf for position i is the i-th column
# (C field elements = 2C u32 words).  Blocks must start at 8-column (one
# blake3 64-byte block / one poseidon rate) boundaries; any block but the
# last must also END on one.
# ---------------------------------------------------------------------------


def leaf_stream_init(xp, shape, hasher_kind: str) -> list:
    """Fresh absorber state (list of u32 lanes of `shape`)."""
    if hasher_kind == "blake3":
        return [xp.full(shape, b3.IV[i], np.uint32) for i in range(8)]
    # poseidon: width-12 zero state as 24 u32 lanes (lo,hi interleaved)
    z = xp.zeros(shape, np.uint32)
    return [z] * 24


def absorb_block_meta(total_cols: int):
    """Per-64-byte-block (flags, blen, counter) u32 arrays for a blake3
    message of total_cols u64 columns, following the blake3 chunk structure
    (1024-byte chunks; ROOT only set when the message is a single chunk —
    multi-chunk parents are hashed by the finalize step). These are passed
    as TRACED args to leaf_stream_absorb so one compiled graph serves any
    block position of any table (round-4 graph-count collapse)."""
    total_bytes = 8 * total_cols
    nblocks = max(1, (total_bytes + 63) // 64)
    nchunks = max(1, (total_bytes + 1023) // 1024)
    flags = np.zeros(nblocks, dtype=np.uint32)
    blen = np.full(nblocks, 64, dtype=np.uint32)
    counter = np.zeros(nblocks, dtype=np.uint32)
    blen[-1] = total_bytes - 64 * (nblocks - 1)
    for b in range(nblocks):
        chunk = b // 16
        counter[b] = chunk
        if b % 16 == 0:
            flags[b] |= b3.CHUNK_START
        if b == nblocks - 1 or b % 16 == 15:
            flags[b] |= b3.CHUNK_END
            if nchunks == 1:
                flags[b] |= b3.ROOT
    return flags, blen, counter


def leaf_stream_absorb(xp, state: list, words: list, flags_arr, blen_arr,
                       hasher_kind: str, counter_arr=None) -> list:
    """Absorb `len(words)//2` columns' word lanes into the running per-leaf
    states. Columns must be a multiple of 8 (one blake3 64-byte block /
    one poseidon rate), except for the final tail block.

    flags_arr / blen_arr / counter_arr: one u32 entry per 64-byte block
    covered by these words (slices of absorb_block_meta's arrays) — host
    ints or traced scalars; ALL position information lives in them. Ignored
    by poseidon (its overwrite sponge is position-independent). Chunk
    RESETS (multi-chunk messages) are structural and handled by the caller
    between absorb calls."""
    k = len(words) // 2
    shape = words[0].shape
    if hasher_kind == "blake3":
        cv = list(state)
        zero = xp.zeros(shape, np.uint32)
        nblk = (2 * k + 15) // 16
        for j in range(nblk):
            m = [words[16 * j + w] if 16 * j + w < 2 * k else zero
                 for w in range(16)]
            counter = 0 if counter_arr is None else counter_arr[j]
            cv = b3.compress(xp, cv, m, blen_arr[j], flags_arr[j], shape,
                             counter=counter)
        return cv
    # poseidon rate-8 overwrite sponge
    st = [gf.GF(state[2 * i], state[2 * i + 1]) for i in range(pos.WIDTH)]
    for local in range(0, k, 8):
        chunk = min(8, k - local)
        for i in range(chunk):
            st[i] = gf.GF(words[2 * (local + i)], words[2 * (local + i) + 1])
        st = pos.permute_gf(st)
    out = []
    for e in st:
        out.extend([e.lo, e.hi])
    return out


def leaf_stream_finalize(state: list, hasher_kind: str) -> list:
    """State after the final absorb -> 8 u32 digest lanes."""
    if hasher_kind == "blake3":
        return list(state)
    return list(state[:8])


def compress_digests(left: list, right: list, hasher_kind: str) -> list:
    """two_to_one over parallel digest lanes (8 u32 lanes each side)."""
    if hasher_kind == "blake3":
        return b3.two_to_one_words(jnp, left, right)
    state = [gf.zeros(left[0].shape) for _ in range(pos.WIDTH)]
    for i in range(4):
        state[i] = gf.GF(left[2 * i], left[2 * i + 1])
        state[4 + i] = gf.GF(right[2 * i], right[2 * i + 1])
    state = pos.permute_gf(state)
    out = []
    for d in state[:4]:
        out.append(d.lo)
        out.append(d.hi)
    return out


def compress_level(digests: list, hasher_kind: str) -> list:
    # reshape-based pairing rather than d[0::2]/d[1::2]: chained
    # strided-slice -> hash graphs hit a pathological slow path in XLA:CPU
    # (hours-long execution); the reshape form is fast on both backends
    left = [d.reshape(-1, 2)[:, 0] for d in digests]
    right = [d.reshape(-1, 2)[:, 1] for d in digests]
    return compress_digests(left, right, hasher_kind)


def build_levels(leaf_digs: list, num_compress: int, hasher_kind: str) -> list:
    """leaf digests -> [leaf level, ..., cap level] (each 8 u32 lanes)."""
    levels = [leaf_digs]
    for _ in range(num_compress):
        levels.append(compress_level(levels[-1], hasher_kind))
    return levels


_stack_jit_cache: dict = {}


def stack_lanes_device(digs: list):
    """Stack 8 u32 lanes -> one (n, 8) device array (so a host pull is ONE
    D2H transfer instead of eight latency-bound lane pulls)."""
    import jax

    key = ("stacklanes", digs[0].shape, len(digs))
    if key not in _stack_jit_cache:
        _stack_jit_cache[key] = jax.jit(
            lambda *lanes: jnp.stack(lanes, axis=1))
    return _stack_jit_cache[key](*digs)


def digests_to_u64_np(digs: list) -> np.ndarray:
    """8 u32 lanes (n,) -> host (n, 4) u64 digest rows (one D2H pull)."""
    arr = np.asarray(stack_lanes_device(digs), dtype=np.uint32)
    return np.ascontiguousarray(arr).view(np.uint64).reshape(arr.shape[0], 4)
