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

Compile architecture (round 4 — the round-3 version compiled hundreds of
distinct XLA programs, many with multi-MB power-table constants baked in;
cold-start was 1-2 h and even warm cache loads took minutes):

  * UNIFORM COLUMN BLOCKS: every per-column-block program (iNTT, commit
    absorb, point evaluation) runs on exactly _BLOCK_COLS columns, with the
    leading block zero-padded / the hash tail handled by one small graph per
    tail size.  All 12 tables of a given degree share the same programs.
  * POSITION AS DATA: blake3 block flags / byte lengths are traced scalars
    (merkle/device.absorb_block_meta), so a block program does not embed its
    column offset.
  * NO LARGE CONSTANTS: twiddles / power tables / bit-reversal permutations
    are computed on device inside the trace (ntt.scale_by_powers,
    ntt.bitrev_lanes); graphs are KBs, not 200 MB.
  * ONE TREE PROGRAM: all Merkle levels of a commit reduce inside a single
    jit per (size, cap_height, hasher) instead of one per level.

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

# uniform column-block width: multiple of 8 (one blake3 64-byte block / one
# poseidon rate per 8 columns); 16 keeps the streamed LDE working set at
# 16 * 2^23 * 8 B = 1 GB for the largest tables
_BLOCK_COLS = 16
# legacy chunking bound for paths not yet on uniform blocks
_CHUNK_ELEMS = 1 << 27

_jit_cache: dict = {}


def _jit(key, fn):
    import os

    import jax

    from ..utils import jitcache

    if key not in _jit_cache:
        jf = jitcache.cached_jit(key, fn)
        if os.environ.get("OLAVM_SYNC_EVERY_JIT"):
            # debug mode: block after every dispatch so a hanging/slow graph
            # is identified by the Python call site (faulthandler stack)
            import sys
            import time

            def synced(*a, _jf=jf, _key=key, **kw):
                if os.environ.get("OLAVM_SYNC_EVERY_JIT") == "2":
                    print(f"# dispatch {_key}", file=sys.stderr, flush=True)
                t0 = time.time()
                out = _jf(*a, **kw)
                leaves = jax.tree_util.tree_leaves(out)
                if leaves:
                    np.asarray(leaves[0]).reshape(-1)[:1]
                dt = time.time() - t0
                if dt > 1.0:
                    print(f"# jit {_key}: {dt:.1f}s", file=sys.stderr,
                          flush=True)
                return out

            _jit_cache[key] = synced
        else:
            _jit_cache[key] = jf
    return _jit_cache[key]


def _col_chunks(num_cols: int, n: int):
    block = max(1, _CHUNK_ELEMS // max(n, 1))
    return [(s, min(num_cols, s + block)) for s in range(0, num_cols, block)]


def _pad_cols(x: gf.GF, mult: int) -> gf.GF:
    """Zero-pad the column axis (axis 0) up to a multiple of `mult`."""
    import jax.numpy as jnp

    C = x.shape[0]
    pad = (-C) % mult
    if pad == 0:
        return x
    return gf.GF(jnp.pad(x.lo, ((0, pad), (0, 0))),
                 jnp.pad(x.hi, ((0, pad), (0, 0))))


def _blocked_transform(values: gf.GF, key_tag: str, transform) -> gf.GF:
    """Apply `transform` ((W, n) GF -> (W, m) GF) over uniform
    _BLOCK_COLS-column blocks (tail zero-padded), concatenate, slice to C.
    Exactly ONE compiled program per (key_tag, n)."""
    import jax.numpy as jnp

    C, n = values.shape
    W = _BLOCK_COLS
    vp = _pad_cols(values, W)
    fn = _jit((key_tag, n),
              lambda lo, hi: tuple(transform(gf.GF(lo, hi))))
    outs = [fn(vp.lo[s:s + W], vp.hi[s:s + W])
            for s in range(0, vp.shape[0], W)]
    if len(outs) == 1:
        res = gf.GF(*outs[0])
    else:
        res = gf.GF(jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
    return res[:C] if res.shape[0] != C else res


def intt_chunked(values: gf.GF) -> gf.GF:
    """(C, N) values -> coefficients, uniform column blocks."""
    return _blocked_transform(values, "intt", dntt.intt)


def ntt_chunked(coeffs: gf.GF) -> gf.GF:
    return _blocked_transform(coeffs, "ntt", dntt.ntt)


def coset_lde_chunked(coeffs: gf.GF, rate_bits: int) -> gf.GF:
    """(C, N) coeffs -> (C, N<<rate) coset-LDE values, uniform blocks.

    NOTE: materializes the full output — only call for SMALL rates/sizes
    (e.g. wide-leaf tables); the commit path streams instead.
    """
    return _blocked_transform(
        coeffs, f"lde{rate_bits}",
        lambda x: dntt.coset_lde(x, rate_bits))


def _streamed_leaf_digests(coeffs: gf.GF, rate_bits: int,
                           hasher_kind: str) -> list:
    """Leaf digest lanes for the commit tree WITHOUT materializing the full
    LDE: per uniform column block, a fused jit computes the block's coset-LDE
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

    W = _BLOCK_COLS
    if hasher_kind == "blake3":
        flags_np, blen_np, counter_np = dmerkle.absorb_block_meta(C)
        nchunks = max(1, (8 * C + 1023) // 1024)
        assert nchunks <= 2, "leaves over 2048 bytes not supported"
    else:  # poseidon ignores position metadata
        nblocks = (C + 7) // 8
        flags_np = np.zeros(nblocks, dtype=np.uint32)
        blen_np = np.zeros(nblocks, dtype=np.uint32)
        counter_np = np.zeros(nblocks, dtype=np.uint32)
        nchunks = 1

    state = dmerkle.leaf_stream_init(jnp, (size,), hasher_kind)
    chunk_cvs = []  # completed blake3 chunk CVs (multi-chunk leaves)
    nfull = C // W
    blocks_per_w = W // 8

    def blk(lo, hi, fl, bl, cn, *st):
        lde = dntt.coset_lde(gf.GF(lo, hi), rate_bits)
        words = []
        for c in range(lo.shape[0]):
            words.append(lde.lo[c])
            words.append(lde.hi[c])
        return tuple(dmerkle.leaf_stream_absorb(
            jnp, list(st), words, fl, bl, hasher_kind, counter_arr=cn))

    def maybe_chunk_reset(col_start):
        # blake3 chunks are 1024 B = 128 cols; a new chunk starts with a
        # fresh IV state (the completed CV joins the chunk tree)
        nonlocal state
        if (hasher_kind == "blake3" and col_start > 0
                and col_start % 128 == 0):
            chunk_cvs.append(state)
            state = dmerkle.leaf_stream_init(jnp, (size,), hasher_kind)

    for bi in range(nfull):
        s = bi * W
        maybe_chunk_reset(s)
        fn = _jit(("commitblk", n, rate_bits, W, hasher_kind), blk)
        fl = flags_np[blocks_per_w * bi: blocks_per_w * (bi + 1)]
        bl = blen_np[blocks_per_w * bi: blocks_per_w * (bi + 1)]
        cn = counter_np[blocks_per_w * bi: blocks_per_w * (bi + 1)]
        state = list(fn(coeffs.lo[s:s + W], coeffs.hi[s:s + W], fl, bl, cn,
                        *state))
    k = C - nfull * W
    if k:
        s = nfull * W
        maybe_chunk_reset(s)
        fn = _jit(("committail", n, rate_bits, k, hasher_kind), blk)
        state = list(fn(coeffs.lo[s:], coeffs.hi[s:],
                        flags_np[blocks_per_w * nfull:],
                        blen_np[blocks_per_w * nfull:],
                        counter_np[blocks_per_w * nfull:], *state))
    if chunk_cvs:
        # blake3 chunk tree for 2 chunks: parent = compress(IV, cv0||cv1,
        # 64, PARENT|ROOT) — matches hash_words / gl_blake3.cpp:124-141
        chunk_cvs.append(state)
        from ..hash import blake3 as b3

        def parent(*lanes):
            left = list(lanes[:8])
            right = list(lanes[8:])
            return tuple(b3.compress(
                jnp, [jnp.full((size,), b3.IV[i], np.uint32)
                      for i in range(8)],
                left + right, 64, b3.PARENT | b3.ROOT, (size,)))

        fn = _jit(("chunkparent", size), parent)
        return list(fn(*(chunk_cvs[0] + chunk_cvs[1])))
    return dmerkle.leaf_stream_finalize(state, hasher_kind)


def build_tree_device(leaf_digs: list, size: int, cap_height: int,
                      hasher_kind: str, defer_cap_pull: bool = False):
    """All Merkle levels in ONE jitted program per (size, cap_height,
    hasher). Only the 2^cap_height * 32 B cap ever crosses D2H (the tunnel's
    D2H latency makes every pull ~30-50 ms). Returns (levels_dev: list of
    8-lane tuples, levels_host: [] (API compat), cap: (2^cap_height, 4) u64
    host — or the device lane list if defer_cap_pull)."""

    # blake3 compress is ~300 u32 ops -> folding all ~19 levels into one
    # graph compiles in seconds; a poseidon permute is ~5k GF muls and ONE
    # traced permute already takes minutes on XLA:CPU, so chaining levels
    # multiplies that — keep poseidon per-level.
    fold = hasher_kind == "blake3"

    def all_levels(*digs):
        cur = list(digs)
        levels = []
        m = size
        while m > (1 << cap_height):
            cur = dmerkle.compress_level(cur, hasher_kind)
            levels.append(tuple(cur))
            m >>= 1
        return tuple(levels)

    if fold:
        fn = _jit(("tree", size, cap_height, hasher_kind), all_levels)
        rest = [list(t) for t in fn(*leaf_digs)]
    else:
        rest = []
        cur = list(leaf_digs)
        m = size
        while m > (1 << cap_height):
            fn = _jit(("compress", m, hasher_kind),
                      lambda *digs: tuple(dmerkle.compress_level(
                          list(digs), hasher_kind)))
            cur = list(fn(*cur))
            rest.append(cur)
            m >>= 1
    levels_dev = [list(leaf_digs)] + rest
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
    if num_path_levels == 0:
        # leaves ARE the cap (tiny tables, e.g. degree-2 sccall): empty path
        return jnp.zeros((k, 0, 8), jnp.uint32)
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

    W = _BLOCK_COLS
    cp = _pad_cols(coeffs, W)
    chunks = []
    for s in range(0, cp.shape[0], W):
        fn = _jit(("qeval", k, W, n), ev)
        chunks.append(fn(cp.lo[s:s + W], cp.hi[s:s + W], pw_lo, pw_hi))
    if len(chunks) == 1:
        lo, hi = chunks[0]
    else:
        cat = _jit(("qevalcat", tuple(c[0].shape for c in chunks)),
                   lambda ls, hs: (jnp.concatenate(ls, axis=1),
                                   jnp.concatenate(hs, axis=1)))
        lo, hi = cat([c[0] for c in chunks], [c[1] for c in chunks])
    return _jit(("qevalstack", lo.shape, C),
                lambda a, b: jnp.stack([a[:, :C], b[:, :C]], axis=-1))(lo, hi)


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
        C, n = coeffs.shape
        degree_log = log2_strict(n)
        size = n << rate_bits
        digs = _streamed_leaf_digests(coeffs, rate_bits, hasher_kind)
        # bit-reverse the digest lanes -> leaf order of the reference tree
        # (decomposed transpose form: no flat gather, no index constant)
        brev = _jit(("brevlanes", size, len(digs)),
                    lambda *ds: tuple(
                        dntt.bitrev_lanes(list(ds), log2_strict(size))))
        digs = list(brev(*digs))
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

        W = _BLOCK_COLS
        cp = _pad_cols(self.coeffs, W)
        fn = _jit(("evalext", W, n), ev)
        outs = []
        for s in range(0, cp.shape[0], W):
            outs.append(fn(cp.lo[s:s + W], cp.hi[s:s + W],
                           zeta_pows.re.lo, zeta_pows.re.hi,
                           zeta_pows.im.lo, zeta_pows.im.hi))
        re_lo = np.concatenate([np.asarray(o[0]) for o in outs])[:C]
        re_hi = np.concatenate([np.asarray(o[1]) for o in outs])[:C]
        im_lo = np.concatenate([np.asarray(o[2]) for o in outs])[:C]
        im_hi = np.concatenate([np.asarray(o[3]) for o in outs])[:C]
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
