"""Pallas kernel bit-exactness vs the host/numpy reference paths. On the
CPU test mesh the kernels run in interpret mode; on a real TPU the same
code compiles through Mosaic (exercised by tools/roofline.py and the
device prover when OLAVM_PALLAS is on)."""

import numpy as np

from olavm_tpu.field import gf
from olavm_tpu.field import goldilocks as g
from olavm_tpu.field.pallas_kernels import mul_pallas, poseidon_permute_pallas
from olavm_tpu.hash import poseidon as pos


def test_mul_pallas_matches_host():
    rng = np.random.RandomState(0)
    # include values near p and non-block-aligned length
    a = rng.randint(0, g.P, size=1000, dtype=np.uint64)
    b = rng.randint(0, g.P, size=1000, dtype=np.uint64)
    a[:4] = [g.P - 1, g.P - 1, 0, 1]
    b[:4] = [g.P - 1, 1, g.P - 1, g.P - 1]
    out = gf.to_u64(mul_pallas(gf.from_u64(a), gf.from_u64(b)))
    want = g.mul_arr(a, b)
    assert np.array_equal(out, want)


def test_mul_pallas_2d():
    rng = np.random.RandomState(1)
    a = rng.randint(0, g.P, size=(7, 33), dtype=np.uint64)
    b = rng.randint(0, g.P, size=(7, 33), dtype=np.uint64)
    out = gf.to_u64(mul_pallas(gf.from_u64(a), gf.from_u64(b)))
    assert np.array_equal(out, g.mul_arr(a, b))


def test_poseidon_pallas_matches_numpy():
    rng = np.random.RandomState(2)
    states = rng.randint(0, g.P, size=(17, pos.WIDTH), dtype=np.uint64)
    states[0] = 0  # the zero-state golden vector path
    want = pos.permute_np(states.copy())
    stacked = gf.from_u64(states.T)  # (12, n)
    got = gf.to_u64(poseidon_permute_pallas(stacked)).T
    assert np.array_equal(got, want)


def test_poseidon_unrolled_matches_scan():
    import jax

    rng = np.random.RandomState(3)
    states = rng.randint(0, g.P, size=(pos.WIDTH, 9), dtype=np.uint64)
    x = gf.from_u64(states)
    a = jax.jit(lambda lo, hi: tuple(pos.permute_stacked_gf(gf.GF(lo, hi))))(
        x.lo, x.hi
    )
    b = jax.jit(
        lambda lo, hi: tuple(pos.permute_stacked_gf_unrolled(gf.GF(lo, hi)))
    )(x.lo, x.hi)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
