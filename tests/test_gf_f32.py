"""f32-limb 64x64 product vs the u32-path product (exact equality).

The f32 path exists because the TPU VPU emulates integer multiply ~50x
slower than f32 multiply; all 36 limb products fit the 24-bit mantissa
exactly, so results are bit-identical on every backend.
"""

import numpy as np

from olavm_tpu.field import gf
from olavm_tpu.field import gf_f32
from olavm_tpu.field import goldilocks as g


def test_mul64_limbs_f32_matches_u32():
    rng = np.random.default_rng(5)
    vals_a = rng.integers(0, 1 << 64, size=(4096,), dtype=np.uint64)
    vals_b = rng.integers(0, 1 << 64, size=(4096,), dtype=np.uint64)
    # include edge values
    vals_a[:4] = [0, 1, g.P - 1, (1 << 64) - 1]
    vals_b[:4] = [(1 << 64) - 1, g.P - 1, g.P - 1, (1 << 64) - 1]
    a = gf.from_u64(vals_a)
    b = gf.from_u64(vals_b)
    want = gf._mul64_wide(a, b)
    got = gf_f32.mul64_limbs_f32(a.lo, a.hi, b.lo, b.hi)
    for w, (x, y) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"word {w}")


def test_full_mul_via_f32_reduce():
    rng = np.random.default_rng(6)
    vals_a = rng.integers(0, g.P, size=(2048,), dtype=np.uint64)
    vals_b = rng.integers(0, g.P, size=(2048,), dtype=np.uint64)
    a = gf.from_u64(vals_a)
    b = gf.from_u64(vals_b)
    want = gf.to_u64(gf.mul(a, b))
    prod = gf_f32.mul64_limbs_f32(a.lo, a.hi, b.lo, b.hi)
    got = gf.to_u64(gf._reduce128(*prod))
    np.testing.assert_array_equal(got, want)
