"""Pallas TPU NTT kernel: multi-pass VMEM-resident butterflies.

Replaces the whole-array jnp butterfly ladder (ntt/ntt.py) for large sizes.
The jnp form costs ~2 HBM round-trips per stage (log2(n) stages); this
kernel partitions the radix-2 DIT network into ceil(ln/F) passes, each
running F stages inside VMEM, so HBM traffic is

    bit-reversal gather + transpose + pass1 + transpose + pass2 + ... passM

~(3 + M) round trips instead of ~2*log2(n).  This is the TPU analogue of the
reference's CUDA NTT (/root/reference/plonky2/field/src/cfft/ntt/mod.rs) and
SIMD fft (field/src/fft.rs:99-170).

Stage grouping (flat index after the bit-reversal permutation):
  * pass i covers global stages base+1..base+f_i (base = sum of lower
    factors, L = 2^base).  Its butterflies pair indices that differ in bits
    [base, base+f_i): reshaping to (..., q, 2^{f_i}, L) contains every pair
    inside the third axis.  For pass 1 (L=1) the trailing axis is degenerate,
    so the array is transposed once to put the factor on sublanes; higher
    passes block the 4-D view directly — no transpose.
  * the stage-s twiddle w_{2^s}^{j mod 2^{s-1}} factors as
    (w_{2^s}^{L})^{o} * w_{2^s}^{r} for j mod 2^{s-1} = o*L + r — a sublane
    table (concat over stages, (2^{f_i},)) times a lane table ((f_i, L),
    block-sliced per grid step).

Each pass uses only VPU u32 ops (olavm_tpu.field.gf two-limb arithmetic) on
a (2^{f_i}, LANE_TILE) block — small enough that Mosaic's scoped-VMEM stack
(16 MB) holds the unrolled stage temporaries (a single 12-stage pass
overflows it; that is why passes are capped at F=7).
"""

from __future__ import annotations

import functools

import numpy as np

from ..field import gf
from ..field import goldilocks as g
from ..utils.bits import bit_reversal_perm, log2_strict

LANE_TILE = 128
MAX_F = 6  # stages per pass (VMEM scoped-stack bound; f32-limb mul temporaries)

_FORCE: dict = {"mode": None}  # None = auto, True/False = override


def use_pallas(n: int) -> bool:
    import jax

    if _FORCE["mode"] is not None:
        return _FORCE["mode"] and n >= (1 << 6)
    return jax.default_backend() == "tpu" and n >= (1 << 14)


def _factors(ln: int) -> list[int]:
    """Split ln stages into near-equal factors of at most MAX_F."""
    m = (ln + MAX_F - 1) // MAX_F
    base = ln // m
    rem = ln - base * m
    return [base + (1 if i < rem else 0) for i in range(m)]


@functools.lru_cache(maxsize=None)
def _twiddle_tables(ln: int, inverse: bool):
    """Per-pass host twiddle tables: [(A (2^f,), B (f, L) or None)]."""
    root = g.primitive_root_of_unity(ln)
    if inverse:
        root = g.inv(root)
    n = 1 << ln

    def w(s):
        return pow(root, n >> s, g.P)

    tables = []
    base = 0
    for f in _factors(ln):
        L = 1 << base
        nf = 1 << f
        a = np.zeros(max(nf, 8), dtype=np.uint64)
        off = 0
        for sig in range(1, f + 1):
            s = base + sig
            half = 1 << (sig - 1)
            a[off : off + half] = g.powers(pow(w(s), L, g.P), half)
            off += half
        if base == 0:
            b = None
        else:
            b = np.zeros((f, L), dtype=np.uint64)
            for sig in range(1, f + 1):
                b[sig - 1] = g.powers(w(base + sig), L)
        tables.append((a, b))
        base += f
    return tables


def _stage_ladder(lo, hi, f, rows, lt, tw_lo, tw_hi, tw2_lo=None,
                  tw2_hi=None):
    """f DIT stages along the sublane axis of a (rows, lt) block."""
    import jax.numpy as jnp

    off = 0
    for s in range(1, f + 1):
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


def _pass1_call(f: int, rest: int, interpret: bool):
    """First pass: factor axis transposed onto sublanes.
    x: (b, nf, rest) -> same shape, butterflies along axis 1."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = 1 << f
    lt = min(LANE_TILE, rest)

    def kernel(twa_lo, twa_hi, x_lo, x_hi, o_lo, o_hi):
        lo, hi = _stage_ladder(
            x_lo[0], x_hi[0], f, nf, lt, twa_lo[:, 0], twa_hi[:, 0]
        )
        o_lo[0] = lo
        o_hi[0] = hi

    def call(b, twa_lo, twa_hi, x_lo, x_hi):
        grid = (b, rest // lt)
        tw_spec = pl.BlockSpec((twa_lo.shape[0], 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((1, nf, lt), lambda i, j: (i, 0, j),
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


def _passk_call(f: int, hi_count: int, L: int, interpret: bool):
    """Higher pass: x viewed as (b, hi_count, nf, L); butterflies along
    axis 2, lane tiles along L. No transposes."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = 1 << f
    lt = min(LANE_TILE, L)

    def kernel(twa_lo, twa_hi, twb_lo, twb_hi, x_lo, x_hi, o_lo, o_hi):
        lo, hi = _stage_ladder(
            x_lo[0, 0], x_hi[0, 0], f, nf, lt, twa_lo[:, 0], twa_hi[:, 0],
            twb_lo, twb_hi,
        )
        o_lo[0, 0] = lo
        o_hi[0, 0] = hi

    def call(b, twa_lo, twa_hi, twb_lo, twb_hi, x_lo, x_hi):
        grid = (b, hi_count, L // lt)
        twa_spec = pl.BlockSpec((twa_lo.shape[0], 1),
                                lambda i, q, j: (0, 0),
                                memory_space=pltpu.VMEM)
        twb_spec = pl.BlockSpec((f, lt), lambda i, q, j: (0, j),
                                memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((1, 1, nf, lt), lambda i, q, j: (i, q, 0, j),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[twa_spec, twa_spec, twb_spec, twb_spec, x_spec, x_spec],
            out_specs=(x_spec, x_spec),
            out_shape=(
                jax.ShapeDtypeStruct(x_lo.shape, x_lo.dtype),
                jax.ShapeDtypeStruct(x_hi.shape, x_hi.dtype),
            ),
            interpret=interpret,
        )(twa_lo, twa_hi, twb_lo, twb_hi, x_lo, x_hi)

    return call


def ntt_pallas(x: gf.GF, inverse: bool = False,
               interpret: bool | None = None) -> gf.GF:
    """Batched NTT along the LAST axis (coefficients -> natural-order
    values; inverse lacks the final 1/n scaling — callers apply it)."""
    import jax.numpy as jnp

    n = x.shape[-1]
    ln = log2_strict(n)
    if interpret is None:
        import jax

        interpret = jax.default_backend() != "tpu"

    batch_shape = x.shape[:-1]
    b = 1
    for d in batch_shape:
        b *= d

    tables = _twiddle_tables(ln, inverse)
    factors = _factors(ln)

    perm = jnp.asarray(bit_reversal_perm(n))
    lo = jnp.take(x.lo.reshape(b, n), perm, axis=-1)
    hi = jnp.take(x.hi.reshape(b, n), perm, axis=-1)

    base = 0
    for i, f in enumerate(factors):
        nf = 1 << f
        L = 1 << base
        a_tab, b_tab = tables[i]
        twa = gf.from_u64(a_tab.reshape(-1, 1))
        if i == 0:
            rest = n // nf
            lo = lo.reshape(b, rest, nf).swapaxes(1, 2)
            hi = hi.reshape(b, rest, nf).swapaxes(1, 2)
            lo, hi = _pass1_call(f, rest, interpret)(
                b, twa.lo, twa.hi, lo, hi
            )
            lo = lo.swapaxes(1, 2).reshape(b, n)
            hi = hi.swapaxes(1, 2).reshape(b, n)
        else:
            hi_count = n // (nf * L)
            twb = gf.from_u64(b_tab)
            lo = lo.reshape(b, hi_count, nf, L)
            hi = hi.reshape(b, hi_count, nf, L)
            lo, hi = _passk_call(f, hi_count, L, interpret)(
                b, twa.lo, twa.hi, twb.lo, twb.hi, lo, hi
            )
            lo = lo.reshape(b, n)
            hi = hi.reshape(b, n)
        base += f
    return gf.GF(lo.reshape(*batch_shape, n), hi.reshape(*batch_shape, n))
