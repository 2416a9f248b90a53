"""Pallas TPU NTT kernel: multi-pass VMEM-resident butterflies.

Replaces the whole-array jnp butterfly ladder (ntt/ntt.py) for large sizes.
The jnp form costs ~2 HBM round-trips per stage plus a catastrophic flat
bit-reversal gather (~150 ms for 2^23 x 2 on v5e — 70x a same-size copy).
This kernel partitions the radix-2 DIT network into ceil(ln/F) passes, each
running F stages inside VMEM on (2^F, LANE_TILE) blocks, so HBM traffic is

    decomposed bit-reversal + per-pass (transpose in, butterflies, transpose
    out)  ~= (1 + 2*M) copies instead of ~2*log2(n) + gather.

This is the TPU analogue of the reference's CUDA NTT
(/root/reference/plonky2/field/src/cfft/ntt/mod.rs) and SIMD fft
(field/src/fft.rs:99-170).

Key design points (all measured on v5e via the axon tunnel):
  * no flat gather: rev(j) over ln bits = reverse the factor-axis ORDER
    (a transpose, ~2 ms) + per-axis small bit-reversal takes.
  * butterflies via sublane ROLLS + parity masks, not strided reshapes —
    Mosaic lowers (g, 2, half, lt) reshape/stack chains to sublane shuffles
    that ran ~30x slower than the roll form.
  * the stage-s twiddle w_{2^s}^{j mod 2^{s-1}} factors into a sublane
    table ((nf, f), one column per stage) times a lane factor ((f, LT),
    periodic in the flat lane index with period L = 2^(stages below)) —
    so EVERY pass uses the same kernel on a (b, nf, n/nf) transposed view.
  * integer multiplies inside the kernel go through the f32-limb path
    (field/gf_f32.py) — the VPU emulates u32 multiply ~50x slower than f32.
"""

from __future__ import annotations

import functools

import numpy as np

from ..field import gf
from ..field import goldilocks as g
from ..utils.bits import bit_reversal_perm, log2_strict

LANE_TILE = 512
MAX_F = 6  # stages per pass (VMEM scoped-stack bound)

_FORCE: dict = {"mode": None}  # None = auto, True/False = override


def use_pallas(n: int) -> bool:
    if _FORCE["mode"] is not None:
        return _FORCE["mode"] and n >= (1 << 6)
    from ..utils.platform import on_tpu

    return on_tpu() and n >= (1 << 14)


def _factors(ln: int) -> list[int]:
    """Split ln stages into near-equal factors of at most MAX_F."""
    m = (ln + MAX_F - 1) // MAX_F
    base = ln // m
    rem = ln - base * m
    return [base + (1 if i < rem else 0) for i in range(m)]


@functools.lru_cache(maxsize=None)
def _twiddle_tables(ln: int, inverse: bool):
    """Per-pass host twiddle tables.

    For pass p (factor f, L = 2^(sum of lower factors)) the stage-s
    twiddle at butterfly position j = o*L + r (o = offset along the
    factor axis, r = flat offset within the lower factors) is
    w_{2^s}^{(o mod 2^{sig-1})*L} * w_{2^s}^{r}.  Returns per pass:
      a_full: (nf, f) u64 — column sig-1 holds w_{2^s}^{L*(o mod half)}
      b_tab:  (f, L) u64 or None (L == 1) — lane factor, periodic in r.
    """
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
        a_full = np.ones((nf, max(f, 1)), dtype=np.uint64)
        for sig in range(1, f + 1):
            s = base + sig
            half = 1 << (sig - 1)
            pw = g.powers(pow(w(s), L, g.P), half)
            o = np.arange(nf)
            a_full[:, sig - 1] = pw[o & (half - 1)]
        if base == 0:
            b_seeds = None
        else:
            # lane-factor tables are built ON DEVICE from these scalar seeds
            # (a host (f, L) table with L up to 2^18 would be baked into the
            # jit graph as a multi-MB constant — round-4 finding)
            b_seeds = tuple(w(base + sig) for sig in range(1, f + 1))
        tables.append((a_full, b_seeds))
        base += f
    return tables


def _stage_ladder_roll(lo, hi, f, rows, lt, twa_lo, twa_hi,
                       twb_lo=None, twb_hi=None):
    """f DIT stages along the sublane axis of a (rows, lt) block using
    sublane rolls + parity masks (no strided reshapes).

    twa_*: (rows, f) per-stage sublane twiddle columns.
    twb_*: optional (f, lt) per-stage lane factors.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, sh):
        try:
            return pltpu.roll(x, sh, axis=0)
        except Exception:  # interpret mode fallback
            return jnp.roll(x, sh, axis=0)

    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, lt), 0)
    for s in range(1, f + 1):
        half = 1 << (s - 1)
        even = (row_id & half) == 0
        dn_lo = roll(lo, -half)
        dn_hi = roll(hi, -half)
        up_lo = roll(lo, half)
        up_hi = roll(hi, half)
        # u = even ? x : x[i-half];  v = even ? x[i+half] : x
        u = gf.GF(jnp.where(even, lo, up_lo), jnp.where(even, hi, up_hi))
        v = gf.GF(jnp.where(even, dn_lo, lo), jnp.where(even, dn_hi, hi))
        tw = gf.GF(
            jnp.broadcast_to(twa_lo[:, s - 1 : s], (rows, lt)),
            jnp.broadcast_to(twa_hi[:, s - 1 : s], (rows, lt)),
        )
        if twb_lo is not None:
            lane = gf.GF(
                jnp.broadcast_to(twb_lo[s - 1 : s, :], (rows, lt)),
                jnp.broadcast_to(twb_hi[s - 1 : s, :], (rows, lt)),
            )
            tw = gf.mul(tw, lane)
        t = gf.mul(v, tw)
        add = gf.add(u, t)
        sub = gf.sub(u, t)
        lo = jnp.where(even, add.lo, sub.lo)
        hi = jnp.where(even, add.hi, sub.hi)
    return lo, hi


def _pass_call(f: int, rest: int, L: int, interpret: bool):
    """One pass on the TRANSPOSED view x: (b, nf, rest), rest = n/nf.
    Butterflies along axis 1; lane twiddle factor periodic with period L
    (L == 1 -> no lane factor)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = 1 << f
    lt = min(LANE_TILE, rest)
    if L > 1:
        assert lt % L == 0 or L % lt == 0

    def kernel(twa_lo, twa_hi, twb_lo, twb_hi, x_lo, x_hi, o_lo, o_hi):
        lo, hi = _stage_ladder_roll(
            x_lo[0], x_hi[0], f, nf, lt, twa_lo, twa_hi,
            twb_lo if L > 1 else None, twb_hi if L > 1 else None,
        )
        o_lo[0] = lo
        o_hi[0] = hi

    def call(b, twa_lo, twa_hi, twb_lo, twb_hi, x_lo, x_hi):
        grid = (b, rest // lt)
        twa_spec = pl.BlockSpec((nf, twa_lo.shape[1]), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        if L > lt:
            twb_map = (lambda i, j: (0, j % (L // lt)))
        else:
            twb_map = (lambda i, j: (0, 0))
        twb_spec = pl.BlockSpec((twb_lo.shape[0], lt), twb_map,
                                memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((1, nf, lt), lambda i, j: (i, 0, j),
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


def _np_tile_lanes(tab: np.ndarray, L: int, lt: int) -> np.ndarray:
    """(f, L) host lane factors -> (f, max(L, lt)) (tiled when L < lt)."""
    if L >= lt:
        return tab
    return np.tile(tab, (1, lt // L))


def _lane_table_dev(b_seeds, L: int, lt: int) -> gf.GF:
    """Device (f, max(L, lt)) lane-factor table: row sig-1 = powers of
    b_seeds[sig-1] of length L, tiled to lt when L < lt. Computed inside the
    enclosing trace so no large constant enters the graph."""
    import jax.numpy as jnp

    rows = [gf.powers(int(s), L) for s in b_seeds]
    lo = jnp.stack([r.lo for r in rows])
    hi = jnp.stack([r.hi for r in rows])
    if L < lt:
        reps = lt // L
        lo = jnp.tile(lo, (1, reps))
        hi = jnp.tile(hi, (1, reps))
    return gf.GF(lo, hi)


def ntt_pallas(x: gf.GF, inverse: bool = False,
               interpret: bool | None = None) -> gf.GF:
    """Batched NTT along the LAST axis (coefficients -> natural-order
    values; inverse lacks the final 1/n scaling — callers apply it)."""
    import jax.numpy as jnp

    n = x.shape[-1]
    ln = log2_strict(n)
    if interpret is None:
        from ..utils.platform import on_tpu

        interpret = not on_tpu()
    from jax.core import Tracer

    batch_shape = x.shape[:-1]
    b = 1
    for d in batch_shape:
        b *= d

    tables = _twiddle_tables(ln, inverse)
    factors = _factors(ln)

    # bit-reversal WITHOUT a flat gather: rev(j) over ln bits = reverse the
    # factor-axis ORDER (a transpose) + per-axis small bit-reversal takes.
    shapes = [1 << f for f in factors]  # f1 (lowest bits) .. fm (highest)
    ax_perm = tuple([0] + list(range(len(shapes), 0, -1)))

    def brv(arr):
        y = arr.reshape((b,) + tuple(reversed(shapes)))  # (b, fm, .., f1)
        y = y.transpose(ax_perm)  # (b, f1, .., fm)
        for ax, f in enumerate(factors):
            pf = jnp.asarray(bit_reversal_perm(1 << f))
            y = jnp.take(y, pf, axis=ax + 1)
        return y.reshape(b, n)

    lo = brv(x.lo.reshape(b, n))
    hi = brv(x.hi.reshape(b, n))

    base = 0
    for i, f in enumerate(factors):
        nf = 1 << f
        L = 1 << base
        rest = n // nf
        lt = min(LANE_TILE, rest)
        a_full, b_seeds = tables[i]
        twa = gf.from_u64(a_full)
        if b_seeds is None:
            twb = gf.from_u64(np.ones((max(f, 1), lt), dtype=np.uint64))
        elif isinstance(lo, Tracer):
            twb = _lane_table_dev(b_seeds, L, lt)
        else:  # eager caller (tests): host table, no micro-op storm
            tab = np.stack([g.powers(int(s), L) for s in b_seeds])
            twb = gf.from_u64(_np_tile_lanes(tab, L, lt))
        # bring the factor axis onto sublanes: (b, hi_cnt, nf, L) ->
        # (b, nf, hi_cnt, L) == (b, nf, rest)
        hi_cnt = n // (nf * L)
        lo = lo.reshape(b, hi_cnt, nf, L).swapaxes(1, 2).reshape(b, nf, rest)
        hi = hi.reshape(b, hi_cnt, nf, L).swapaxes(1, 2).reshape(b, nf, rest)
        lo, hi = _pass_call(f, rest, L, interpret)(
            b, twa.lo, twa.hi, twb.lo, twb.hi, lo, hi
        )
        lo = (lo.reshape(b, nf, hi_cnt, L).swapaxes(1, 2)).reshape(b, n)
        hi = (hi.reshape(b, nf, hi_cnt, L).swapaxes(1, 2)).reshape(b, n)
        base += f
    return gf.GF(lo.reshape(*batch_shape, n), hi.reshape(*batch_shape, n))
