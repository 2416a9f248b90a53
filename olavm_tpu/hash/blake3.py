"""Vectorized BLAKE3 over u32 word lanes, generic over numpy / jax.numpy.

This is the hasher behind Blake3GoldilocksConfig-style Merkle caps
(/root/reference/plonky2/plonky2/src/hash/blake3.rs, plonk/config.rs:115-160).
Inputs here are always single-chunk (<= 1024 bytes = 128 field-element
leaves), so a hash is a chain of 64-byte block compressions with
CHUNK_START / CHUNK_END|ROOT flags and counter 0 — exactly what the native
host kernel does (olavm_tpu/native/gl_blake3.cpp:82-141).

Layout convention is word-major: a batch of n messages of W u32 words each
is a (W, n) array, so on TPU the LDE matrix (cols, size) feeds leaf hashing
with no transpose (leaf i's words are a column slice). Digests are (8, n)
u32 word lanes.

Used two ways:
- as the host fallback when the native .so is unavailable (numpy backend);
- as the device Merkle kernel in the TPU prover (jnp backend).
"""

from __future__ import annotations

import numpy as np

IV = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

# message word permutation applied between rounds
PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3


def _rotr(xp, x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(xp, s, a, b, c, d, x, y):
    s[a] = s[a] + s[b] + x
    s[d] = _rotr(xp, s[d] ^ s[a], 16)
    s[c] = s[c] + s[d]
    s[b] = _rotr(xp, s[b] ^ s[c], 12)
    s[a] = s[a] + s[b] + y
    s[d] = _rotr(xp, s[d] ^ s[a], 8)
    s[c] = s[c] + s[d]
    s[b] = _rotr(xp, s[b] ^ s[c], 7)


def _lane(xp, v, shape):
    """Broadcast a host int OR a traced u32 scalar to a `shape` lane."""
    if isinstance(v, (int, np.integer)):
        return xp.full(shape, v, np.uint32)
    return xp.broadcast_to(v.astype(np.uint32), shape)


def compress(xp, cv, m, block_len, flags, shape, counter: int = 0):
    """One compression: cv = 8 lanes, m = 16 lanes, returns 8 lanes.

    Lanes are uint32 arrays of `shape` (scalars broadcast fine). counter is
    the chunk counter (0 for single-chunk messages / parent nodes).
    block_len and flags may be host ints or traced u32 scalars — passing
    them traced lets one compiled graph serve any block position.
    """
    u = np.uint32
    if isinstance(counter, (int, np.integer)):
        c_lo, c_hi = counter & 0xFFFFFFFF, counter >> 32
    else:  # traced u32 scalar (chunk counters fit 32 bits here)
        c_lo, c_hi = counter, 0
    s = list(cv) + [
        xp.full(shape, IV[0], u), xp.full(shape, IV[1], u),
        xp.full(shape, IV[2], u), xp.full(shape, IV[3], u),
        _lane(xp, c_lo, shape), _lane(xp, c_hi, shape),
        _lane(xp, block_len, shape), _lane(xp, flags, shape),
    ]
    m = list(m)
    for r in range(7):
        _g(xp, s, 0, 4, 8, 12, m[0], m[1])
        _g(xp, s, 1, 5, 9, 13, m[2], m[3])
        _g(xp, s, 2, 6, 10, 14, m[4], m[5])
        _g(xp, s, 3, 7, 11, 15, m[6], m[7])
        _g(xp, s, 0, 5, 10, 15, m[8], m[9])
        _g(xp, s, 1, 6, 11, 12, m[10], m[11])
        _g(xp, s, 2, 7, 8, 13, m[12], m[13])
        _g(xp, s, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[PERM[i]] for i in range(16)]
    return [s[i] ^ s[i + 8] for i in range(8)]


def _chunk_cv(xp, words, byte_len: int, chunk_counter: int, is_root: bool,
              shape):
    """One <=1024-byte chunk -> chaining value (8 lanes)."""
    u = np.uint32
    zero = xp.zeros(shape, u)
    nblocks = max(1, (byte_len + 63) // 64)
    cv = [xp.full(shape, IV[i], u) for i in range(8)]
    for b in range(nblocks):
        m = [words[16 * b + w] if 16 * b + w < len(words) else zero
             for w in range(16)]
        blen = min(64, byte_len - 64 * b)
        flags = (CHUNK_START if b == 0 else 0) | (
            (CHUNK_END | (ROOT if is_root else 0)) if b == nblocks - 1 else 0
        )
        cv = compress(xp, cv, m, blen, flags, shape, counter=chunk_counter)
    return cv


def _subtree_cv(xp, words, byte_len: int, chunk0: int, shape):
    """Subtree chaining value (never root), mirroring gl_blake3.cpp
    b3_subtree_cv."""
    nchunks = (byte_len + 1023) // 1024
    if nchunks <= 1:
        return _chunk_cv(xp, words, byte_len, chunk0, False, shape)
    left = 1
    while left * 2 < nchunks:
        left *= 2
    lcv = _subtree_cv(xp, words[: left * 256], left * 1024, chunk0, shape)
    rcv = _subtree_cv(xp, words[left * 256:], byte_len - left * 1024,
                      chunk0 + left, shape)
    return compress(xp, [xp.full(shape, IV[i], np.uint32) for i in range(8)],
                    lcv + rcv, 64, PARENT, shape)


def hash_words(xp, words, byte_len: int | None = None):
    """BLAKE3 of n parallel messages (vectorized over the lane shape).

    words: sequence of W uint32 lanes (each an array of identical shape; the
    whole batch is one message of W*4 bytes). Returns 8 digest lanes.
    byte_len defaults to W*4. Multi-chunk messages (>1024 bytes, e.g. the
    poseidon table's wide rows) use the chunk-tree exactly as the native
    kernel (gl_blake3.cpp:124-141).
    """
    W = len(words)
    if byte_len is None:
        byte_len = W * 4
    shape = words[0].shape if hasattr(words[0], "shape") else ()
    nchunks = max(1, (byte_len + 1023) // 1024)
    if nchunks == 1:
        return _chunk_cv(xp, words, byte_len, 0, True, shape)
    left = 1
    while left * 2 < nchunks:
        left *= 2
    lcv = _subtree_cv(xp, words[: left * 256], left * 1024, 0, shape)
    rcv = _subtree_cv(xp, words[left * 256:], byte_len - left * 1024, left,
                      shape)
    return compress(xp, [xp.full(shape, IV[i], np.uint32) for i in range(8)],
                    lcv + rcv, 64, PARENT | ROOT, shape)


def two_to_one_words(xp, left8, right8):
    """Digest pairs -> parent digests: blake3 over the 64 concatenated bytes
    (a single 64-byte chunk, NOT the BLAKE3 parent mode — matches the
    reference two_to_one, plonky2/src/hash/blake3.rs)."""
    return hash_words(xp, list(left8) + list(right8), 64)


# ---------------------------------------------------------------------------
# numpy host API mirroring native/blake3_native.py
# ---------------------------------------------------------------------------


def hash_leaves_np(leaves: np.ndarray) -> np.ndarray:
    """(n, width) u64 rows -> (n, 4) u64-word digests (numpy fallback)."""
    leaves = np.ascontiguousarray(leaves, dtype=np.uint64)
    n, width = leaves.shape
    w32 = leaves.view(np.uint32).reshape(n, 2 * width)
    words = [np.ascontiguousarray(w32[:, i]) for i in range(2 * width)]
    digs = hash_words(np, words)
    out32 = np.stack(digs, axis=1)  # (n, 8) u32
    return np.ascontiguousarray(out32).view(np.uint64).reshape(n, 4)


def compress_batch_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """(n, 4) u64 digest pairs -> (n, 4) parents (numpy fallback)."""
    both = np.concatenate(
        [np.ascontiguousarray(left, np.uint64), np.ascontiguousarray(right, np.uint64)],
        axis=1,
    )
    return hash_leaves_np(both)


def blake3_hash_np(data: bytes) -> bytes:
    """One message of <= 1024 bytes -> 32-byte digest (numpy fallback)."""
    buf = np.frombuffer(data.ljust((max(len(data), 1) + 3) // 4 * 4, b"\0"),
                        dtype="<u4")
    # (1,)-shaped lanes: numpy scalar uint32 adds warn on wrap, arrays don't
    words = [np.full((1,), w, np.uint32) for w in buf]
    digs = hash_words(np, words, byte_len=len(data))
    return np.stack([np.asarray(d, np.uint32) for d in digs]).astype("<u4").tobytes()
