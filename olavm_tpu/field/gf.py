"""Device-side Goldilocks arithmetic as two-limb uint32 JAX ops.

TPUs have no native 64-bit integer multiply, so a field element is a pair
(lo, hi) of uint32 arrays. All functions are pure jnp and work both in
plain jitted code and inside Pallas kernel bodies (VPU integer ops only).

Reduction follows the reference EPSILON trick
(/root/reference/plonky2/field/src/goldilocks_field.rs:148-326,
reduce128 at :296-326). Outputs are canonical (< p).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
# numpy scalars (not jnp) so they inline as literals inside Pallas kernel
# bodies instead of becoming captured device constants
MASK16 = np.uint32(0xFFFF)
P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)


class GF(NamedTuple):
    """A Goldilocks array: value = hi * 2^32 + lo, both uint32."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return self.lo.shape

    def reshape(self, *shape):
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def transpose(self, *axes):
        return GF(self.lo.transpose(*axes), self.hi.transpose(*axes))

    def __getitem__(self, idx):
        return GF(self.lo[idx], self.hi[idx])


def from_u64(x) -> GF:
    """Host conversion: numpy uint64 (or int list) -> GF of uint32 limbs.

    Precondition: values must already be canonical (< p); they are split,
    not reduced. Use goldilocks.to_gf first for untrusted input.
    """
    a = np.asarray(x, dtype=np.uint64)
    return GF(
        jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
    )


def to_u64(x: GF) -> np.ndarray:
    lo = np.asarray(x.lo, dtype=np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GF:
    z = jnp.zeros(shape, dtype=U32)
    return GF(z, z)


def ones(shape) -> GF:
    return GF(jnp.ones(shape, dtype=U32), jnp.zeros(shape, dtype=U32))


def full(shape, value: int) -> GF:
    value = int(value) % 0xFFFFFFFF00000001
    return GF(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=U32),
        jnp.full(shape, value >> 32, dtype=U32),
    )


def _csub_p(lo, hi):
    """Canonicalize: subtract p once if >= p. Input < 2^64."""
    ge = (hi == P_HI) & (lo >= P_LO)
    return jnp.where(ge, lo - P_LO, lo), jnp.where(ge, hi + P_LO, hi)


def add(a: GF, b: GF) -> GF:
    s_lo = a.lo + b.lo
    c0 = (s_lo < a.lo).astype(U32)
    t = a.hi + b.hi
    c1a = t < a.hi
    s_hi = t + c0
    c1b = (s_hi < t) & (c0 == 1)
    carry = c1a | c1b
    # += EPSILON on carry: lo += 0xFFFFFFFF == lo - 1 with carry-out iff lo >= 1
    ce = carry & (s_lo >= 1)
    s_lo = jnp.where(carry, s_lo - jnp.uint32(1), s_lo)
    s_hi = s_hi + ce.astype(U32)
    return GF(*_csub_p(s_lo, s_hi))


def sub(a: GF, b: GF) -> GF:
    d_lo = a.lo - b.lo
    b0 = (a.lo < b.lo).astype(U32)
    d_hi = a.hi - b.hi - b0
    borrow = (a.hi < b.hi) | ((a.hi == b.hi) & (b0 == 1))
    # -= EPSILON on borrow: lo -= 0xFFFFFFFF == lo + 1, borrow-in iff lo != 0xFFFFFFFF...
    # (lo + 1 overflows iff lo == 0xFFFFFFFF; we need d -= (2^32-1):
    #  d_lo' = d_lo + 1 (wrapping), extra borrow from hi iff d_lo + 1 did NOT wrap
    #  i.e. iff d_lo != 0xFFFFFFFF)
    be = borrow & (d_lo != jnp.uint32(0xFFFFFFFF))
    d_lo = jnp.where(borrow, d_lo + jnp.uint32(1), d_lo)
    d_hi = d_hi - be.astype(U32)
    return GF(d_lo, d_hi)


def neg(a: GF) -> GF:
    is_zero = (a.lo == 0) & (a.hi == 0)
    # p - a: p = (1, 0xFFFFFFFF)
    n_lo = P_LO - a.lo
    borrow = (P_LO < a.lo).astype(U32)
    n_hi = P_HI - a.hi - borrow
    return GF(
        jnp.where(is_zero, jnp.uint32(0), n_lo),
        jnp.where(is_zero, jnp.uint32(0), n_hi),
    )


def _mul32_wide(a, b):
    """uint32 x uint32 -> (lo32, hi32) full product via 16-bit splits."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)
    lo = (p00 & MASK16) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return lo, hi


def _mul64_wide(a: GF, b: GF):
    """64x64 -> 128-bit product as four uint32 limbs (l0, l1, l2, l3)."""
    ll_lo, ll_hi = _mul32_wide(a.lo, b.lo)
    lh_lo, lh_hi = _mul32_wide(a.lo, b.hi)
    hl_lo, hl_hi = _mul32_wide(a.hi, b.lo)
    hh_lo, hh_hi = _mul32_wide(a.hi, b.hi)
    # limb1 = ll_hi + lh_lo + hl_lo, collecting carries into limb2
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(U32)
    l1 = s1 + hl_lo
    c1 = c1 + (l1 < s1).astype(U32)
    # limb2 = lh_hi + hl_hi + hh_lo + c1, carries into limb3
    s2 = lh_hi + hl_hi
    c2 = (s2 < lh_hi).astype(U32)
    s2b = s2 + hh_lo
    c2 = c2 + (s2b < s2).astype(U32)
    l2 = s2b + c1
    c2 = c2 + (l2 < s2b).astype(U32)
    l3 = hh_hi + c2
    return ll_lo, l1, l2, l3


def _reduce128(l0, l1, l2, l3) -> GF:
    """(l3:l2:l1:l0) mod p, canonical. Reference reduce128 trick."""
    # t0 = lo64 - hi_hi (l3), with EPSILON correction on borrow
    t0_lo = l0 - l3
    b0 = (l0 < l3).astype(U32)
    t0_hi = l1 - b0
    borrow = (l1 == 0) & (b0 == 1)
    be = borrow & (t0_lo != jnp.uint32(0xFFFFFFFF))
    t0_lo = jnp.where(borrow, t0_lo + jnp.uint32(1), t0_lo)
    t0_hi = t0_hi - be.astype(U32)
    # t1 = l2 * EPSILON = (l2 << 32) - l2
    t1_lo = jnp.uint32(0) - l2
    t1_hi = l2 - (l2 != 0).astype(U32)
    # t2 = t0 + t1 with EPSILON correction on carry
    s_lo = t0_lo + t1_lo
    c0 = (s_lo < t0_lo).astype(U32)
    t = t0_hi + t1_hi
    c1a = t < t0_hi
    s_hi = t + c0
    c1b = (s_hi < t) & (c0 == 1)
    carry = c1a | c1b
    ce = carry & (s_lo >= 1)
    s_lo = jnp.where(carry, s_lo - jnp.uint32(1), s_lo)
    s_hi = s_hi + ce.astype(U32)
    return GF(*_csub_p(s_lo, s_hi))


# multiply backend: the TPU VPU emulates integer multiply ~50x slower than
# f32 multiply (measured 0.74 vs full-rate Gelem/s), so on TPU the product
# limbs are computed in exact f32 (gf_f32). None = auto by backend.
_MUL_MODE: dict = {"mode": None}  # None | "u32" | "f32"


def _use_f32_mul() -> bool:
    if _MUL_MODE["mode"] is not None:
        return _MUL_MODE["mode"] == "f32"
    from ..utils.platform import on_tpu

    return on_tpu()


def mul(a: GF, b: GF) -> GF:
    if _use_f32_mul():
        from . import gf_f32

        return _reduce128(*gf_f32.mul64_limbs_f32(a.lo, a.hi, b.lo, b.hi))
    return _reduce128(*_mul64_wide(a, b))


def square(a: GF) -> GF:
    return mul(a, a)


def mul_u32(a: GF, k) -> GF:
    """Multiply by a uint32 scalar/array (e.g. small constants)."""
    k = jnp.asarray(k, dtype=U32)
    if _use_f32_mul():
        from . import gf_f32

        return _reduce128(*gf_f32.mul64_u32_f32(a.lo, a.hi, k))
    lo_lo, lo_hi = _mul32_wide(a.lo, k)
    hi_lo, hi_hi = _mul32_wide(a.hi, k)
    l1 = lo_hi + hi_lo
    c = (l1 < lo_hi).astype(U32)
    l2 = hi_hi + c
    return _reduce128(lo_lo, l1, l2, jnp.zeros_like(l2))


def exp_const(a: GF, e: int) -> GF:
    """a ** e for a host-known integer exponent (square-and-multiply)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    if result is None:
        return ones(a.lo.shape)
    return result


def inv(a: GF) -> GF:
    """a^(p-2) via lax.scan over the exponent bits.

    NOT an inlined square-and-multiply chain: p-2 has 62 set bits, and XLA
    compile time explodes superlinearly past ~30 CHAINED muls (measured
    round 4: depth 30 = 2.4s, depth 40 = >400s). The scan compiles ONE
    square+multiply body; runtime is the same ~126 muls."""
    import jax

    e = 0xFFFFFFFF00000001 - 2
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(e.bit_length())], np.uint32))

    def body(carry, bit):
        acc, base = carry
        m = mul(acc, base)
        acc = GF(jnp.where(bit, m.lo, acc.lo), jnp.where(bit, m.hi, acc.hi))
        return (acc, square(base)), None

    (acc, _), _ = jax.lax.scan(body, (ones(a.lo.shape), a), bits)
    return acc


def powers(base: GF | int, n: int) -> GF:
    """Device powers [1, b, b^2, ..., b^{n-1}] via log-doubling (n pow of 2
    or not; log2(n) rounds of array muls)."""
    if isinstance(base, int):
        base = full((), base)
    out = ones((1,))
    length = 1
    import jax.numpy as _jnp

    while length < n:
        step = min(length, n - length)
        # out[length:length+step] = out[:step] * base^length
        shift = exp_const(base, length)
        nxt = mul(out[:step], GF(_jnp.broadcast_to(shift.lo, (step,)),
                                 _jnp.broadcast_to(shift.hi, (step,))))
        out = concatenate([out, nxt])
        length += step
    return out


def sum_reduce(x: GF, axis: int = -1) -> GF:
    """Modular sum along an axis of power-of-2 length (log-depth halving)."""
    import jax.numpy as _jnp

    lo = _jnp.moveaxis(x.lo, axis, -1)
    hi = _jnp.moveaxis(x.hi, axis, -1)
    n = lo.shape[-1]
    while n > 1:
        if n % 2:
            lo = _jnp.concatenate(
                [lo, _jnp.zeros(lo.shape[:-1] + (1,), lo.dtype)], axis=-1)
            hi = _jnp.concatenate(
                [hi, _jnp.zeros(hi.shape[:-1] + (1,), hi.dtype)], axis=-1)
            n += 1
        a = GF(lo[..., 0::2], hi[..., 0::2])
        b = GF(lo[..., 1::2], hi[..., 1::2])
        s = add(a, b)
        lo, hi = s.lo, s.hi
        n = lo.shape[-1]
    return GF(lo[..., 0], hi[..., 0])


def prefix_prod(x: GF, axis: int = -1) -> GF:
    """Inclusive modular prefix product, log depth (Hillis-Steele).

    NOT lax.associative_scan: its recursive odd/even interleave lowers to
    strided slice+concat chains that send the XLA:CPU simplifier into a
    pathological (>10 min) compile for this mul body (measured round 4).
    The Hillis-Steele form is a LINEAR chain of shift+mul steps — ~2x the
    multiplies (2n log n vs ~4n) but compiles in seconds and the muls are
    bandwidth-noise on TPU."""
    lo = jnp.moveaxis(x.lo, axis, -1)
    hi = jnp.moveaxis(x.hi, axis, -1)
    n = lo.shape[-1]
    y = GF(lo, hi)
    d = 1
    while d < n:
        pad = [(0, 0)] * (lo.ndim - 1) + [(d, 0)]
        sh = GF(
            jnp.pad(y.lo[..., :-d], pad, constant_values=1),  # identity = 1
            jnp.pad(y.hi[..., :-d], pad, constant_values=0),
        )
        y = mul(y, sh)
        d <<= 1
    return GF(jnp.moveaxis(y.lo, -1, axis), jnp.moveaxis(y.hi, -1, axis))


def select(pred, a: GF, b: GF) -> GF:
    return GF(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


def eq(a: GF, b: GF):
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF):
    return (a.lo == 0) & (a.hi == 0)


def concatenate(xs, axis=0) -> GF:
    return GF(
        jnp.concatenate([x.lo for x in xs], axis=axis),
        jnp.concatenate([x.hi for x in xs], axis=axis),
    )


def stack(xs, axis=0) -> GF:
    return GF(
        jnp.stack([x.lo for x in xs], axis=axis),
        jnp.stack([x.hi for x in xs], axis=axis),
    )
