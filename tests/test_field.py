"""Goldilocks field tests: JAX two-limb ops and numpy host ops vs Python-int
ground truth, including edge cases around p, EPSILON, and 2^32 boundaries."""

import numpy as np
import pytest

from olavm_tpu.field import gf
from olavm_tpu.field import goldilocks as g

P = g.P

EDGE = [
    0,
    1,
    2,
    0xFFFFFFFF,  # EPSILON
    0x100000000,  # 2^32
    0x100000001,
    P - 1,
    P - 2,
    P - 0xFFFFFFFF,
    0x7FFFFFFFFFFFFFFF % P,
    1753635133440165772,  # two-adic generator
    7,
]


def _rand(n, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 1 << 62, size=n, dtype=np.uint64) % np.uint64(P)
    # salt with edge cases
    vals[: len(EDGE)] = np.array(EDGE, dtype=np.uint64)
    return vals


@pytest.fixture(scope="module")
def ab():
    a = _rand(256, 1)
    b = _rand(256, 2)
    # pair every edge with every edge in the head
    k = len(EDGE)
    a[k : k + k * k // 4] = np.repeat(np.array(EDGE, dtype=np.uint64), k)[: k * k // 4]
    b[k : k + k * k // 4] = np.tile(np.array(EDGE, dtype=np.uint64), k)[: k * k // 4]
    return a, b


def test_numpy_add_sub_mul(ab):
    a, b = ab
    want_add = [(int(x) + int(y)) % P for x, y in zip(a, b)]
    want_sub = [(int(x) - int(y)) % P for x, y in zip(a, b)]
    want_mul = [(int(x) * int(y)) % P for x, y in zip(a, b)]
    np.testing.assert_array_equal(g.add_arr(a, b), np.array(want_add, dtype=np.uint64))
    np.testing.assert_array_equal(g.sub_arr(a, b), np.array(want_sub, dtype=np.uint64))
    np.testing.assert_array_equal(g.mul_arr(a, b), np.array(want_mul, dtype=np.uint64))
    np.testing.assert_array_equal(
        g.neg_arr(a), np.array([(-int(x)) % P for x in a], dtype=np.uint64)
    )


def test_jax_roundtrip(ab):
    a, _ = ab
    x = gf.from_u64(a)
    np.testing.assert_array_equal(gf.to_u64(x), a)


def test_jax_add_sub_neg_mul(ab):
    a, b = ab
    xa, xb = gf.from_u64(a), gf.from_u64(b)
    np.testing.assert_array_equal(gf.to_u64(gf.add(xa, xb)), g.add_arr(a, b))
    np.testing.assert_array_equal(gf.to_u64(gf.sub(xa, xb)), g.sub_arr(a, b))
    np.testing.assert_array_equal(gf.to_u64(gf.neg(xa)), g.neg_arr(a))
    np.testing.assert_array_equal(gf.to_u64(gf.mul(xa, xb)), g.mul_arr(a, b))
    np.testing.assert_array_equal(gf.to_u64(gf.square(xa)), g.mul_arr(a, a))


def test_jax_mul_u32(ab):
    a, _ = ab
    xa = gf.from_u64(a)
    for k in [0, 1, 3, 0xFFFFFFFF]:
        want = [(int(x) * k) % P for x in a]
        np.testing.assert_array_equal(
            gf.to_u64(gf.mul_u32(xa, k)), np.array(want, dtype=np.uint64)
        )


def test_jax_exp_inv():
    a = _rand(32, 3)
    a[0] = 1  # avoid zero for inverse
    xa = gf.from_u64(a)
    np.testing.assert_array_equal(
        gf.to_u64(gf.exp_const(xa, 5)),
        np.array([pow(int(x), 5, P) for x in a], dtype=np.uint64),
    )
    nz = np.where(a == 0, np.uint64(1), a)
    want_inv = np.array([g.inv(int(x)) for x in nz], dtype=np.uint64)
    np.testing.assert_array_equal(gf.to_u64(gf.inv(gf.from_u64(nz))), want_inv)


def test_host_scalar_ops():
    assert g.mul(g.POWER_OF_TWO_GENERATOR, g.inv(g.POWER_OF_TWO_GENERATOR)) == 1
    r16 = g.primitive_root_of_unity(4)
    assert pow(r16, 16, P) == 1
    assert pow(r16, 8, P) != 1
    sub = g.two_adic_subgroup(3)
    assert len(set(sub)) == 8
    assert all(pow(x, 8, P) == 1 for x in sub)


def test_batch_inv():
    a = _rand(50, 7)
    out = g.batch_inv(a)
    for x, y in zip(a.tolist(), out.tolist()):
        if x == 0:
            assert y == 0
        else:
            assert (x * y) % P == 1


def test_powers():
    pw = g.powers(5, 10)
    assert [int(x) for x in pw] == [pow(5, i, P) for i in range(10)]
