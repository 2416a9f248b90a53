"""Pallas TPU kernels for the two-limb u32 Goldilocks hot ops
(BASELINE.json: "two-limb u32 Pallas kernels"; the reference's analogues are
the AVX2/AVX512 packed field ops and hand-written Poseidon SIMD,
/root/reference/plonky2/field/src/arch/x86_64/*.rs,
plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs).

Why Pallas here: XLA materializes the carry of a `lax.scan` (and each
sequential jnp round) to HBM, so a width-12 Poseidon permutation over a
large batch costs ~30 round-trips of the (12, n) state. These kernels keep
the whole permutation (or the whole mul chain) resident in VMEM: one HBM
read + one write per element, which is the speed-of-light for a
bandwidth-bound hash.

All field math reuses field/gf.py — pure uint32 jnp that lowers to VPU
integer ops inside a kernel body. Every kernel has `interpret=`
support so the CPU test mesh can validate bit-exactness without TPU
hardware (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import gf

# lane-aligned batch block per grid step (multiple of 8x128 VPU tile)
_MUL_BLOCK = 64 * 1024
_POSEIDON_BLOCK = 2048


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def pallas_enabled() -> bool:
    """Use Pallas kernels on real accelerators; env override OLAVM_PALLAS."""
    env = os.environ.get("OLAVM_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# elementwise Goldilocks mul
# ---------------------------------------------------------------------------


def _mul_kernel(a_lo, a_hi, b_lo, b_hi, o_lo, o_hi):
    out = gf.mul(gf.GF(a_lo[:], a_hi[:]), gf.GF(b_lo[:], b_hi[:]))
    o_lo[:] = out.lo
    o_hi[:] = out.hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mul_call(a_lo, a_hi, b_lo, b_hi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a_lo.shape[0]
    block = min(_MUL_BLOCK, n)
    grid = (n // block,)
    spec = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n,), jnp.uint32)
    return pl.pallas_call(
        _mul_kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(a_lo, a_hi, b_lo, b_hi)


def mul_pallas(a: gf.GF, b: gf.GF) -> gf.GF:
    """Elementwise Goldilocks mul; flat or nd arrays (same shape)."""
    shape = a.shape
    n = int(np.prod(shape)) if shape else 1
    block = min(_MUL_BLOCK, n)
    pad = (-n) % block
    al, ah = a.lo.reshape(-1), a.hi.reshape(-1)
    bl, bh = b.lo.reshape(-1), b.hi.reshape(-1)
    if pad:
        al, ah, bl, bh = (jnp.pad(x, (0, pad)) for x in (al, ah, bl, bh))
    lo, hi = _mul_call(al, ah, bl, bh, interpret=_use_interpret())
    return gf.GF(lo[:n].reshape(shape), hi[:n].reshape(shape))


# ---------------------------------------------------------------------------
# Poseidon permutation (width 12), batched over lanes
# ---------------------------------------------------------------------------


def _poseidon_kernel(s_lo, s_hi, o_lo, o_hi):
    from ..hash import poseidon as pos

    state = gf.GF(s_lo[:, :], s_hi[:, :])
    out = pos.permute_stacked_gf_unrolled(state)
    o_lo[:, :] = out.lo
    o_hi[:, :] = out.hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _poseidon_call(s_lo, s_hi, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w, n = s_lo.shape
    block = min(_POSEIDON_BLOCK, n)
    grid = (n // block,)
    spec = pl.BlockSpec((w, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((w, n), jnp.uint32)
    return pl.pallas_call(
        _poseidon_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(s_lo, s_hi)


def poseidon_permute_pallas(state: gf.GF) -> gf.GF:
    """Batched width-12 Poseidon permutation; state (12, n) GF. All 30
    rounds stay in VMEM per block."""
    w, n = state.shape
    assert w == 12
    block = min(_POSEIDON_BLOCK, max(n, 1))
    pad = (-n) % block
    lo, hi = state.lo, state.hi
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    olo, ohi = _poseidon_call(lo, hi, interpret=_use_interpret())
    return gf.GF(olo[:, :n], ohi[:, :n])
