"""Device-resident polynomial commitment: the TPU analogue of the reference
PolynomialBatch (plonky2/plonky2/src/fri/oracle.rs:30-164).

Memory architecture (round 3 — the round-2 version kept every oracle's full
8x LDE resident and OOMed a 16 GB v5e at the 2^20 reference workload):

  * Only the COEFFICIENTS (C, n) and the Merkle digest levels stay resident.
  * The LDE is STREAMED: per column block, one fused jit does
    coset-LDE -> absorb into per-leaf running hash states
    (merkle/device.leaf_stream_*), so at most one ~1 GB block of LDE values
    exists at a time.  This replaces the reference's lde_values +
    MerkleTree::new_v2 (fri/oracle.rs:101-164) which keeps the whole LDE.
  * FRI query leaf values are recomputed by DIRECT polynomial evaluation at
    the ~28 queried coset points (exact field arithmetic == the LDE values),
    instead of gathering from a resident LDE.

Only caps, query leaf values, and Merkle paths ever cross device->host (the
tunnel's D2H path is ~1000x slower than H2D; see VERDICT round 1).
"""

from __future__ import annotations

import numpy as np

from ..field import gf
from ..field import gfe
from ..field import goldilocks as g
from ..merkle import device as dmerkle
from ..ntt import ntt as dntt
from ..utils.bits import bit_reversal_perm, log2_strict

# column-block chunking: keep each NTT working set under ~2^27 elements
# (1 GB as a u32 pair) so XLA's buffer planning never sees multi-GB tensors
_CHUNK_ELEMS = 1 << 27
# device tree levels stop here; the tail is hashed on host (fewer jits, and
# the host needs the cap anyway)
_HOST_TAIL = 1 << 12

_jit_cache: dict = {}


def _jit(key, fn):
    import jax

    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(fn)
    return _jit_cache[key]


def _col_chunks(num_cols: int, n: int):
    block = max(1, _CHUNK_ELEMS // max(n, 1))
    return [(s, min(num_cols, s + block)) for s in range(0, num_cols, block)]


def _col_chunks_aligned(num_cols: int, n: int, align: int = 8):
    """Column blocks sized by _CHUNK_ELEMS, starting on `align` boundaries
    (hash-absorption block boundaries)."""
    block = max(align, (_CHUNK_ELEMS // max(n, 1)) // align * align)
    return [(s, min(num_cols, s + block)) for s in range(0, num_cols, block)]


def intt_chunked(values: gf.GF) -> gf.GF:
    """(C, N) values -> coefficients, column-block chunked."""
    import jax.numpy as jnp

    C, n = values.shape
    fn = _jit(("intt", n), lambda lo, hi: tuple(dntt.intt(gf.GF(lo, hi))))
    outs = [fn(values.lo[s:e], values.hi[s:e]) for s, e in _col_chunks(C, n)]
    if len(outs) == 1:
        return gf.GF(*outs[0])
    return gf.GF(jnp.concatenate([o[0] for o in outs]),
                 jnp.concatenate([o[1] for o in outs]))


def coset_lde_chunked(coeffs: gf.GF, rate_bits: int) -> gf.GF:
    """(C, N) coeffs -> (C, N<<rate) coset-LDE values, chunked.

    NOTE: materializes the full output — only call for SMALL rates/sizes
    (e.g. the quotient coset); the commit path streams instead.
    """
    import jax.numpy as jnp

    C, n = coeffs.shape
    big = n << rate_bits
    fn = _jit(
        ("lde", n, rate_bits),
        lambda lo, hi: tuple(dntt.coset_lde(gf.GF(lo, hi), rate_bits)),
    )
    outs = [fn(coeffs.lo[s:e], coeffs.hi[s:e]) for s, e in _col_chunks(C, big)]
    if len(outs) == 1:
        return gf.GF(*outs[0])
    return gf.GF(jnp.concatenate([o[0] for o in outs]),
                 jnp.concatenate([o[1] for o in outs]))


def ntt_chunked(coeffs: gf.GF) -> gf.GF:
    import jax.numpy as jnp

    C, n = coeffs.shape
    fn = _jit(("ntt", n), lambda lo, hi: tuple(dntt.ntt(gf.GF(lo, hi))))
    outs = [fn(coeffs.lo[s:e], coeffs.hi[s:e]) for s, e in _col_chunks(C, n)]
    if len(outs) == 1:
        return gf.GF(*outs[0])
    return gf.GF(jnp.concatenate([o[0] for o in outs]),
                 jnp.concatenate([o[1] for o in outs]))


def _streamed_leaf_digests(coeffs: gf.GF, rate_bits: int,
                           hasher_kind: str) -> list:
    """Leaf digest lanes for the commit tree WITHOUT materializing the full
    LDE: per aligned column block, a fused jit computes the block's coset-LDE
    and absorbs it into the running per-leaf hash states."""
    import jax.numpy as jnp

    C, n = coeffs.shape
    size = n << rate_bits

    if C <= 4:
        # noop leaves: digest lanes ARE the (zero-padded) LDE values
        lde = coset_lde_chunked(coeffs, rate_bits)
        zero = jnp.zeros((size,), jnp.uint32)
        lanes = []
        for i in range(4):
            lanes.append(lde.lo[i] if i < C else zero)
            lanes.append(lde.hi[i] if i < C else zero)
        return lanes

    state = dmerkle.leaf_stream_init(jnp, (size,), hasher_kind)
    for s, e in _col_chunks_aligned(C, size):
        def blk(lo, hi, *st, _s=s, _e=e):
            lde = dntt.coset_lde(gf.GF(lo, hi), rate_bits)
            words = []
            for c in range(_e - _s):
                words.append(lde.lo[c])
                words.append(lde.hi[c])
            return tuple(dmerkle.leaf_stream_absorb(
                jnp, list(st), words, _s, C, hasher_kind))

        fn = _jit(("commitblk", n, rate_bits, s, e, C, hasher_kind), blk)
        state = list(fn(coeffs.lo[s:e], coeffs.hi[s:e], *state))
    return dmerkle.leaf_stream_finalize(state, hasher_kind)


def build_tree_device(leaf_digs: list, size: int, cap_height: int,
                      hasher_kind: str, defer_cap_pull: bool = False):
    """Per-level reduction entirely on device (the host tail of round 2 paid
    a ~130 KB D2H pull per tree; the tunnel's D2H latency makes every pull
    ~30-50 ms, so only the 2^cap_height * 32 B cap ever crosses). Returns
    (levels_dev: list of 8-lane tuples, levels_host: [] (kept for API
    compat), cap: (2^cap_height, 4) u64 host — or the device lane list if
    defer_cap_pull)."""
    levels_dev = [list(leaf_digs)]
    m = size
    while m > (1 << cap_height):
        fn = _jit(("compress", m, hasher_kind),
                  lambda *digs: tuple(dmerkle.compress_level(list(digs),
                                                             hasher_kind)))
        levels_dev.append(list(fn(*levels_dev[-1])))
        m >>= 1
    cap_lanes = levels_dev.pop()  # cap level is not part of query paths
    if defer_cap_pull:
        return levels_dev, [], cap_lanes
    return levels_dev, [], dmerkle.digests_to_u64_np(cap_lanes)


def gather_paths_dev(levels_dev, x_indices, num_path_levels: int):
    """Device Merkle authentication-path gather for a batch of leaf indices:
    ONE fused gather -> (k, num_path_levels, 8) u32 device array (stays on
    device so the caller can batch its D2H pull with everything else the
    proof needs — the tunnel's D2H latency is ~30-50 ms per pull)."""
    import jax.numpy as jnp

    k = len(x_indices)
    idx = np.asarray(x_indices, dtype=np.int64)
    n_dev = min(len(levels_dev), num_path_levels)
    assert n_dev == num_path_levels, "tree must be device-built to the cap"
    sibs = [jnp.asarray((idx >> lvl) ^ 1) for lvl in range(n_dev)]

    def gather(levels, sib_list):
        outs = []
        for digs, s in zip(levels, sib_list):
            outs.append(jnp.stack([lane[s] for lane in digs], axis=-1))
        return jnp.stack(outs, axis=1)  # (k, n_dev, 8) u32

    key = ("qpaths", tuple(d[0].shape for d in levels_dev[:n_dev]), k)
    fn = _jit(key, gather)
    return fn(tuple(tuple(d) for d in levels_dev[:n_dev]), sibs)


def paths_to_host(dev_paths: np.ndarray) -> list[list[list[int]]]:
    """(k, L, 8) u32 host array -> [k][level][4 u64] path lists."""
    arr = np.ascontiguousarray(np.asarray(dev_paths, dtype=np.uint32))
    k, L = arr.shape[0], arr.shape[1]
    u64 = arr.view(np.uint64).reshape(k, L, 4)
    return [
        [[int(v) for v in u64[i, lvl]] for lvl in range(L)]
        for i in range(k)
    ]


def gather_paths_device(levels_dev, levels_host, x_indices,
                        num_path_levels: int) -> list[list[list[int]]]:
    """Host-convenience wrapper: device gather + immediate pull."""
    return paths_to_host(
        gather_paths_dev(levels_dev, x_indices, num_path_levels)
    )


def eval_at_points_dev(coeffs: gf.GF, points: list[int]):
    """Direct evaluation p_c(x_k) for host-known points -> device (k, C, 2)
    u32 array (lo, hi lanes).

    Exact modular arithmetic — identical field elements to what the coset-LDE
    would hold at those positions (used for FRI query leaves so the LDE need
    not stay resident; reference gathers from lde_values instead,
    fri/oracle.rs:141-164)."""
    import jax.numpy as jnp

    C, n = coeffs.shape
    k = len(points)
    bases = gf.from_u64(np.array([p % g.P for p in points], dtype=np.uint64))

    def pwtab(b_lo, b_hi):
        base = gf.GF(b_lo, b_hi)  # (k,)
        out = gf.ones((k, 1))
        shift = base
        length = 1
        while length < n:
            step = min(length, n - length)
            nxt = gf.mul(out[:, :step],
                         gf.GF(shift.lo[:, None], shift.hi[:, None]))
            out = gf.concatenate([out, nxt], axis=1)
            shift = gf.square(shift)
            length += step
        return out.lo, out.hi

    pw_lo, pw_hi = _jit(("qpowtab", k, n), pwtab)(bases.lo, bases.hi)

    def ev(c_lo, c_hi, p_lo, p_hi):
        c = gf.GF(c_lo, c_hi)
        outs_lo, outs_hi = [], []
        for t in range(k):
            prod = gf.mul(c, gf.GF(p_lo[t][None, :], p_hi[t][None, :]))
            r = gf.sum_reduce(prod, -1)
            outs_lo.append(r.lo)
            outs_hi.append(r.hi)
        return jnp.stack(outs_lo), jnp.stack(outs_hi)

    chunks = []
    for s, e in _col_chunks(C, n):
        fn = _jit(("qeval", k, e - s, n), ev)
        chunks.append(fn(coeffs.lo[s:e], coeffs.hi[s:e], pw_lo, pw_hi))
    if len(chunks) == 1:
        lo, hi = chunks[0]
    else:
        cat = _jit(("qevalcat", tuple(c[0].shape for c in chunks)),
                   lambda ls, hs: (jnp.concatenate(ls, axis=1),
                                   jnp.concatenate(hs, axis=1)))
        lo, hi = cat([c[0] for c in chunks], [c[1] for c in chunks])
    return _jit(("qevalstack", lo.shape),
                lambda a, b: jnp.stack([a, b], axis=-1))(lo, hi)


def eval_at_points(coeffs: gf.GF, points: list[int]) -> np.ndarray:
    """Host wrapper: (k, C) u64 values (one D2H pull)."""
    out = np.asarray(eval_at_points_dev(coeffs, points), dtype=np.uint64)
    return out[..., 0] | (out[..., 1] << np.uint64(32))


class DevicePolynomialBatch:
    """Commitment with device-resident coeffs + digest tree (LDE streamed).

    polynomials are (C, n) GF coefficients in NATURAL order; Merkle leaves
    are the LDE columns in BIT-REVERSED order (digest lanes permuted,
    matching the host PolynomialBatch/reference layout).
    """

    def __init__(self, coeffs: gf.GF, levels_dev, levels_host,
                 cap: np.ndarray, degree_log: int, rate_bits: int,
                 hasher_kind: str):
        self.coeffs = coeffs
        self.levels_dev = levels_dev
        self.levels_host = levels_host
        self._cap = cap
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.hasher_kind = hasher_kind

    # --- construction ---------------------------------------------------

    @staticmethod
    def from_values(values: gf.GF, rate_bits: int, cap_height: int,
                    hasher_kind: str,
                    defer_cap_pull: bool = False) -> "DevicePolynomialBatch":
        coeffs = intt_chunked(values)
        return DevicePolynomialBatch.from_coeffs(
            coeffs, rate_bits, cap_height, hasher_kind,
            defer_cap_pull=defer_cap_pull,
        )

    @staticmethod
    def from_coeffs(coeffs: gf.GF, rate_bits: int, cap_height: int,
                    hasher_kind: str,
                    defer_cap_pull: bool = False) -> "DevicePolynomialBatch":
        import jax.numpy as jnp

        C, n = coeffs.shape
        degree_log = log2_strict(n)
        size = n << rate_bits
        digs = _streamed_leaf_digests(coeffs, rate_bits, hasher_kind)
        # bit-reverse the digest lanes -> leaf order of the reference tree
        perm = jnp.asarray(bit_reversal_perm(size))
        brev = _jit(("brevlanes", size, len(digs)),
                    lambda p, *ds: tuple(d[p] for d in ds))
        digs = list(brev(perm, *digs))
        levels_dev, levels_host, cap = build_tree_device(
            digs, size, cap_height, hasher_kind,
            defer_cap_pull=defer_cap_pull,
        )
        return DevicePolynomialBatch(
            coeffs, levels_dev, levels_host, cap, degree_log, rate_bits,
            hasher_kind,
        )

    # --- accessors --------------------------------------------------------

    @property
    def cap(self) -> np.ndarray:
        if isinstance(self._cap, list):  # deferred device lanes
            self._cap = dmerkle.digests_to_u64_np(self._cap)
        return self._cap

    @property
    def cap_lanes_device(self):
        assert isinstance(self._cap, list)
        return self._cap

    @property
    def num_polys(self) -> int:
        return self.coeffs.shape[0]

    @property
    def lde_bits(self) -> int:
        return self.degree_log + self.rate_bits

    def drop_tree(self):
        self.levels_dev = None
        self.levels_host = None

    def free(self):
        """Release all device buffers (after this table's proof is done)."""
        self.coeffs = None
        self.drop_tree()

    # --- openings -----------------------------------------------------------

    def eval_at_ext(self, zeta_pows: gfe.GFE) -> np.ndarray:
        """Evaluate every polynomial at the extension point whose power table
        (n,) is given. Returns host (C, 2) u64."""
        C, n = self.coeffs.shape

        def ev(lo, hi, zr_lo, zr_hi, zi_lo, zi_hi):
            c = gf.GF(lo, hi)
            re = gf.sum_reduce(gf.mul(c, gf.GF(zr_lo, zr_hi)[None, :]), -1)
            im = gf.sum_reduce(gf.mul(c, gf.GF(zi_lo, zi_hi)[None, :]), -1)
            return re.lo, re.hi, im.lo, im.hi

        fn = _jit(("evalext", n), ev)
        outs = []
        for s, e in _col_chunks(C, n):
            outs.append(fn(self.coeffs.lo[s:e], self.coeffs.hi[s:e],
                           zeta_pows.re.lo, zeta_pows.re.hi,
                           zeta_pows.im.lo, zeta_pows.im.hi))
        re_lo = np.concatenate([np.asarray(o[0]) for o in outs])
        re_hi = np.concatenate([np.asarray(o[1]) for o in outs])
        im_lo = np.concatenate([np.asarray(o[2]) for o in outs])
        im_hi = np.concatenate([np.asarray(o[3]) for o in outs])
        re = re_lo.astype(np.uint64) | (re_hi.astype(np.uint64) << np.uint64(32))
        im = im_lo.astype(np.uint64) | (im_hi.astype(np.uint64) << np.uint64(32))
        return np.stack([re, im], axis=-1)

    # --- FRI queries ----------------------------------------------------

    def query_points(self, x_indices: list[int]) -> list[int]:
        """Coset points behind bit-reversed leaf indices."""
        bits = self.lde_bits
        perm = bit_reversal_perm(1 << bits)
        nat = perm[np.asarray(x_indices)]
        w = g.primitive_root_of_unity(bits)
        shift = g.MULTIPLICATIVE_GROUP_GENERATOR
        return [g.mul(shift, pow(w, int(j), g.P)) for j in nat]

    def query_leaves_dev(self, x_indices: list[int]):
        """Leaf values for bit-reversed leaf indices: device (k, C, 2) u32,
        recomputed by direct evaluation (no resident LDE)."""
        return eval_at_points_dev(self.coeffs, self.query_points(x_indices))

    def query_leaves(self, x_indices: list[int]) -> np.ndarray:
        """(k, C) host u64 leaf values (one D2H pull)."""
        out = np.asarray(self.query_leaves_dev(x_indices), dtype=np.uint64)
        return out[..., 0] | (out[..., 1] << np.uint64(32))

    def prove_batch(self, x_indices: list[int]) -> list[list[list[int]]]:
        """Merkle paths for a batch of leaf indices: [k][level][4]."""
        num_path_levels = self.lde_bits - log2_strict(len(self._cap))
        return gather_paths_device(
            self.levels_dev, self.levels_host, x_indices, num_path_levels
        )
