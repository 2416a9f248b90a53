"""Field-op adapters so each table's constraint code runs in three modes:

- BaseOps: host quotient evaluation — values are numpy uint64 arrays of
  shape (size,), one per column, vectorized over all coset points (the
  replacement for the reference's packed-SIMD eval,
  circuits/src/stark/stark.rs:35-41);
- GfOps: DEVICE quotient evaluation — values are two-limb uint32 gf.GF
  arrays; the same constraint code traces into one jitted XLA program
  vectorized over all coset points on the TPU;
- ExtOps: verifier evaluation at zeta — values are (2,) extension elements.
"""

from __future__ import annotations

import numpy as np

from ..field import extension as ge
from ..field import gf
from ..field import goldilocks as g


class BaseOps:
    is_ext = False

    @staticmethod
    def add(a, b):
        return g.add_arr(a, b)

    @staticmethod
    def sub(a, b):
        return g.sub_arr(a, b)

    @staticmethod
    def mul(a, b):
        return g.mul_arr(a, b)

    @staticmethod
    def neg(a):
        return g.neg_arr(a)

    @staticmethod
    def constant(c: int):
        return np.uint64(c % g.P)

    @staticmethod
    def scalar_mul(a, c: int):
        return g.mul_arr(a, np.uint64(c % g.P))

    @staticmethod
    def add_many(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = g.add_arr(acc, t)
        return acc

    @staticmethod
    def indicator_eq_const(a, c: int):
        """Elementwise 1 where a == c else 0 (the reference's data-dependent
        packed-value selector, memory_stark.rs:290-298)."""
        return (np.asarray(a) == np.uint64(c % g.P)).astype(np.uint64)


class GfOps:
    """Device ops over two-limb gf.GF arrays (jnp; jit/Pallas-safe)."""

    is_ext = False

    add = staticmethod(gf.add)
    sub = staticmethod(gf.sub)
    mul = staticmethod(gf.mul)
    neg = staticmethod(gf.neg)

    @staticmethod
    def constant(c: int):
        return gf.full((), c)

    @staticmethod
    def scalar_mul(a, c: int):
        c = int(c) % g.P
        if c == 0:
            return gf.zeros(a.shape)
        if c == 1:
            return a
        if c < (1 << 32):
            return gf.mul_u32(a, c)
        return gf.mul(a, gf.full((), c))

    @staticmethod
    def add_many(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = gf.add(acc, t)
        return acc

    @staticmethod
    def indicator_eq_const(a, c: int):
        import jax.numpy as jnp

        eqmask = gf.eq(a, gf.full((), c % g.P))
        one = jnp.uint32(1)
        zero = jnp.uint32(0)
        return gf.GF(jnp.where(eqmask, one, zero),
                     jnp.zeros_like(a.lo))


class ExtOps:
    is_ext = True

    @staticmethod
    def add(a, b):
        return ge.add(a, b)

    @staticmethod
    def sub(a, b):
        return ge.sub(a, b)

    @staticmethod
    def mul(a, b):
        return ge.mul(a, b)

    @staticmethod
    def neg(a):
        return ge.neg(a)

    @staticmethod
    def constant(c: int):
        return ge.from_base(c % g.P)

    @staticmethod
    def scalar_mul(a, c: int):
        return ge.scalar_mul(a, c % g.P)

    @staticmethod
    def add_many(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = ge.add(acc, t)
        return acc

    @staticmethod
    def indicator_eq_const(a, c: int):
        arr = np.asarray(a).reshape(2)
        hit = int(arr[0]) == c % g.P and int(arr[1]) == 0
        return ge.from_base(1 if hit else 0)
