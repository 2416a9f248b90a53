"""Pallas TPU NTT kernel: two VMEM-resident butterfly passes.

Replaces the whole-array jnp butterfly ladder (ntt/ntt.py) for large sizes.
The jnp form costs ~2 HBM round-trips per stage (log2(n) stages); this
kernel groups the radix-2 DIT network into TWO passes, each running all of
its stages inside VMEM, so the HBM traffic is

    bit-reversal gather + transpose + pass A + transpose + pass B

~5 round trips instead of ~2*log2(n).  This is the TPU analogue of the
reference's CUDA NTT (/root/reference/plonky2/field/src/cfft/ntt/mod.rs) and
SIMD fft (field/src/fft.rs:99-170).

Structure (flat index i = q*n1 + r after the bit-reversal permutation):
  * stages 1..k1 pair elements within contiguous n1-blocks -> butterflies
    along r.  Transposing to (n1, n2) puts r on the SUBLANE axis; pass A
    runs k1 stages on a (n1, LANE_TILE) VMEM block with the standard
    stage-s twiddles w_{2^s}^j (a concatenated (n1,) table).
  * stages k1+1..ln pair along q with twiddle w_{2^s}^{jq*n1 + r} =
    (w_{2^s}^{n1})^{jq} * w_{2^s}^{r} — SEPARABLE into a sublane factor
    (concatenated (n2,) table) and a lane factor ((k2, n1) table, block-
    sliced per grid step).  Pass B runs them on a (n2, LANE_TILE) block of
    the untransposed layout.

Both passes use only VPU u32 ops (olavm_tpu.field.gf two-limb arithmetic).
"""

from __future__ import annotations

import functools

import numpy as np

from ..field import gf
from ..field import goldilocks as g
from ..utils.bits import bit_reversal_perm, log2_strict

LANE_TILE = 128
# pass A/B sublane counts capped so a (rows, LANE_TILE) two-limb block plus
# its output stays well under VMEM (4096*128*4B*2limbs*2dirs = 8 MB)
MAX_K1 = 12
MAX_K2 = 12

# pallas only on TPU unless forced (interpret mode is used by tests)
_FORCE: dict = {"mode": None}  # None = auto, True/False = override


def use_pallas(n: int) -> bool:
    import jax

    if _FORCE["mode"] is not None:
        return _FORCE["mode"] and n >= (1 << 4)
    return jax.default_backend() == "tpu" and n >= (1 << 14)


def _split(ln: int) -> tuple[int, int]:
    k1 = min(MAX_K1, (ln + 1) // 2)
    k2 = ln - k1
    if k2 > MAX_K2:  # n > 2^24: grow k1 (VMEM alarm only past 2^24)
        k1 = ln - MAX_K2
        k2 = MAX_K2
    return k1, k2


@functools.lru_cache(maxsize=None)
def _twiddle_tables(ln: int, inverse: bool):
    """Host twiddle tables for both passes as u64 numpy arrays."""
    n = 1 << ln
    k1, k2 = _split(ln)
    n1, n2 = 1 << k1, 1 << k2
    root = g.primitive_root_of_unity(ln)
    if inverse:
        root = g.inv(root)

    def w(s):  # 2^s-th root consistent with `root`
        return pow(root, n >> s, g.P)

    twa = np.zeros(max(n1, 2), dtype=np.uint64)  # concat stage 1..k1
    off = 0
    for s in range(1, k1 + 1):
        half = 1 << (s - 1)
        twa[off : off + half] = g.powers(w(s), half)
        off += half
    twq = np.zeros(max(n2, 2), dtype=np.uint64)  # concat sublane factors
    twr = np.zeros((max(k2, 1), n1), dtype=np.uint64)  # lane factors
    off = 0
    for sig in range(1, k2 + 1):
        s = k1 + sig
        half = 1 << (sig - 1)
        twq[off : off + half] = g.powers(pow(w(s), n1, g.P), half)
        twr[sig - 1] = g.powers(w(s), n1)
        off += half
    return twa, twq, twr


def _stage_ladder(lo, hi, k, rows, lt, tw_lo, tw_hi, tw2_lo=None,
                  tw2_hi=None):
    """k DIT stages along the sublane axis of a (rows, lt) block.

    tw_lo/tw_hi: (rows,) concatenated per-stage sublane twiddles.
    tw2_*: optional (k, lt) per-stage lane factors (pass B)."""
    import jax.numpy as jnp

    off = 0
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        grp = rows >> s
        l4 = lo.reshape(grp, 2, half, lt)
        h4 = hi.reshape(grp, 2, half, lt)
        u = gf.GF(l4[:, 0], h4[:, 0])
        v = gf.GF(l4[:, 1], h4[:, 1])
        t_lo = jnp.broadcast_to(tw_lo[off : off + half].reshape(1, half, 1),
                                (grp, half, lt))
        t_hi = jnp.broadcast_to(tw_hi[off : off + half].reshape(1, half, 1),
                                (grp, half, lt))
        tw = gf.GF(t_lo, t_hi)
        if tw2_lo is not None:
            lane = gf.GF(
                jnp.broadcast_to(tw2_lo[s - 1].reshape(1, 1, lt),
                                 (grp, half, lt)),
                jnp.broadcast_to(tw2_hi[s - 1].reshape(1, 1, lt),
                                 (grp, half, lt)),
            )
            tw = gf.mul(tw, lane)
        tv = gf.mul(v, tw)
        a = gf.add(u, tv)
        b = gf.sub(u, tv)
        lo = jnp.stack([a.lo, b.lo], axis=1).reshape(rows, lt)
        hi = jnp.stack([a.hi, b.hi], axis=1).reshape(rows, lt)
        off += half
    return lo, hi


def _pass_a_call(ln: int, inverse: bool, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k1, k2 = _split(ln)
    n1, n2 = 1 << k1, 1 << k2
    lt = min(LANE_TILE, n2)

    def kernel(twa_lo, twa_hi, x_lo, x_hi, o_lo, o_hi):
        lo, hi = _stage_ladder(
            x_lo[0], x_hi[0], k1, n1, lt, twa_lo[:, 0], twa_hi[:, 0]
        )
        o_lo[0] = lo
        o_hi[0] = hi

    def call(b, twa_lo, twa_hi, x_lo, x_hi):
        grid = (b, n2 // lt)
        tw_spec = pl.BlockSpec((n1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((1, n1, lt), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tw_spec, tw_spec, x_spec, x_spec],
            out_specs=(x_spec, x_spec),
            out_shape=(
                jax.ShapeDtypeStruct(x_lo.shape, x_lo.dtype),
                jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
            ),
            interpret=interpret,
        )(twa_lo, twa_hi, x_lo, x_hi)

    return call


def _pass_b_call(ln: int, inverse: bool, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k1, k2 = _split(ln)
    n1, n2 = 1 << k1, 1 << k2
    lt = min(LANE_TILE, n1)

    def kernel(twq_lo, twq_hi, twr_lo, twr_hi, x_lo, x_hi, o_lo, o_hi):
        lo, hi = _stage_ladder(
            x_lo[0], x_hi[0], k2, n2, lt, twq_lo[:, 0], twq_hi[:, 0],
            twr_lo, twr_hi,
        )
        o_lo[0] = lo
        o_hi[0] = hi

    def call(b, twq_lo, twq_hi, twr_lo, twr_hi, x_lo, x_hi):
        grid = (b, n1 // lt)
        twq_spec = pl.BlockSpec((n2, 1), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        twr_spec = pl.BlockSpec((k2, lt), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((1, n2, lt), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[twq_spec, twq_spec, twr_spec, twr_spec, x_spec, x_spec],
            out_specs=(x_spec, x_spec),
            out_shape=(
                jax.ShapeDtypeStruct(x_lo.shape, x_lo.dtype),
                jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
            ),
            interpret=interpret,
        )(twq_lo, twq_hi, twr_lo, twr_hi, x_lo, x_hi)

    return call


def ntt_pallas(x: gf.GF, inverse: bool = False,
               interpret: bool | None = None) -> gf.GF:
    """Batched NTT along the LAST axis (coefficients -> natural-order
    values; inverse lacks the final 1/n scaling — callers apply it)."""
    import jax.numpy as jnp

    n = x.shape[-1]
    ln = log2_strict(n)
    k1, k2 = _split(ln)
    n1, n2 = 1 << k1, 1 << k2
    if interpret is None:
        import jax

        interpret = jax.default_backend() != "tpu"

    batch_shape = x.shape[:-1]
    b = 1
    for d in batch_shape:
        b *= d

    twa, twq, twr = _twiddle_tables(ln, inverse)
    twa_d = gf.from_u64(twa.reshape(-1, 1))
    twq_d = gf.from_u64(twq.reshape(-1, 1))
    twr_d = gf.from_u64(twr)

    perm = jnp.asarray(bit_reversal_perm(n))
    lo = jnp.take(x.lo.reshape(b, n), perm, axis=-1)
    hi = jnp.take(x.hi.reshape(b, n), perm, axis=-1)

    # pass A on (b, n1, n2) transposed layout
    lo = lo.reshape(b, n2, n1).swapaxes(1, 2)
    hi = hi.reshape(b, n2, n1).swapaxes(1, 2)
    lo, hi = _pass_a_call(ln, inverse, interpret)(
        b, twa_d.lo, twa_d.hi, lo, hi
    )
    # pass B on the natural (b, n2, n1) layout
    lo = lo.swapaxes(1, 2)
    hi = hi.swapaxes(1, 2)
    lo, hi = _pass_b_call(ln, inverse, interpret)(
        b, twq_d.lo, twq_d.hi, twr_d.lo, twr_d.hi, lo, hi
    )
    return gf.GF(lo.reshape(*batch_shape, n), hi.reshape(*batch_shape, n))
