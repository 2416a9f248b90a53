"""Device-side quadratic extension GF(p^2) ops over two-limb gf.GF pairs.

Mirrors the host extension (olavm_tpu/field/extension.py; reference
plonky2/field/src/goldilocks_extensions.rs, W = 7): an element is
(a0, a1) = a0 + a1*phi with phi^2 = 7. All ops are pure jnp via gf.*.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import gf

W = 7


class GFE(NamedTuple):
    re: gf.GF
    im: gf.GF

    @property
    def shape(self):
        return self.re.shape

    def __getitem__(self, idx):
        return GFE(self.re[idx], self.im[idx])


def from_base(a: gf.GF) -> GFE:
    return GFE(a, gf.zeros(a.shape))


def from_u64_pair(pair) -> GFE:
    """Host (…, 2) u64 array -> device GFE."""
    arr = np.asarray(pair, dtype=np.uint64)
    return GFE(gf.from_u64(arr[..., 0]), gf.from_u64(arr[..., 1]))


def to_u64_pair(x: GFE) -> np.ndarray:
    out = np.stack([gf.to_u64(x.re), gf.to_u64(x.im)], axis=-1)
    return out


def zeros(shape) -> GFE:
    return GFE(gf.zeros(shape), gf.zeros(shape))


def ones(shape) -> GFE:
    return GFE(gf.ones(shape), gf.zeros(shape))


def add(a: GFE, b: GFE) -> GFE:
    return GFE(gf.add(a.re, b.re), gf.add(a.im, b.im))


def sub(a: GFE, b: GFE) -> GFE:
    return GFE(gf.sub(a.re, b.re), gf.sub(a.im, b.im))


def mul(a: GFE, b: GFE) -> GFE:
    t0 = gf.mul(a.re, b.re)
    t1 = gf.mul(a.im, b.im)
    t2 = gf.mul(gf.add(a.re, a.im), gf.add(b.re, b.im))
    re = gf.add(t0, gf.mul_u32(t1, W))
    im = gf.sub(t2, gf.add(t0, t1))
    return GFE(re, im)


def mul_base(a: GFE, b: gf.GF) -> GFE:
    return GFE(gf.mul(a.re, b), gf.mul(a.im, b))


def scale_add(acc: GFE, alpha: GFE, c: gf.GF) -> GFE:
    """acc * alpha + c (base c) — the alpha-composition inner loop."""
    return add(mul(acc, alpha), from_base(c))


def exp_const(a: GFE, e: int) -> GFE:
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        return ones(a.shape)
    return result


def powers(base: GFE, n: int) -> GFE:
    """[1, b, ..., b^{n-1}] via log-doubling."""
    import jax.numpy as _jnp

    out = ones((1,))
    length = 1
    while length < n:
        step = min(length, n - length)
        shift = exp_const(base, length)

        def bc(x):
            return gf.GF(_jnp.broadcast_to(x.lo, (step,)),
                         _jnp.broadcast_to(x.hi, (step,)))

        nxt = mul(out[:step], GFE(bc(shift.re), bc(shift.im)))
        out = GFE(gf.concatenate([out.re, nxt.re]),
                  gf.concatenate([out.im, nxt.im]))
        length += step
    return out


def inv(a: GFE) -> GFE:
    """Norm trick: (a0 - a1*phi) / (a0^2 - 7*a1^2)."""
    norm = gf.sub(gf.mul(a.re, a.re), gf.mul_u32(gf.mul(a.im, a.im), W))
    ninv = gf.inv(norm)
    return GFE(gf.mul(a.re, ninv), gf.mul(gf.neg(a.im), ninv))


def sum_reduce(x: GFE, axis: int = -1) -> GFE:
    return GFE(gf.sum_reduce(x.re, axis), gf.sum_reduce(x.im, axis))
