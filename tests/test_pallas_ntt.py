"""Pallas two-pass NTT kernel vs the jnp butterfly ladder (interpret mode on
CPU; the same kernel code runs compiled on TPU).

Reference behavior being matched: plonky2/field/src/fft.rs (classic radix-2
DIT with precomputed roots) — values must be bit-identical.
"""

import numpy as np
import pytest

from olavm_tpu.field import gf
from olavm_tpu.field import goldilocks as g
from olavm_tpu.ntt import ntt as dntt
from olavm_tpu.ntt import pallas_ntt


@pytest.mark.parametrize("ln,b", [(6, 3), (8, 2), (10, 1)])
def test_pallas_ntt_matches_jnp(ln, b):
    rng = np.random.default_rng(7 + ln)
    vals = rng.integers(0, g.P, size=(b, 1 << ln), dtype=np.uint64)
    x = gf.from_u64(vals)
    want = gf.to_u64(dntt.ntt(x))
    got = gf.to_u64(pallas_ntt.ntt_pallas(x, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ln", [6, 9])
def test_pallas_intt_roundtrip(ln):
    rng = np.random.default_rng(17 + ln)
    vals = rng.integers(0, g.P, size=(2, 1 << ln), dtype=np.uint64)
    x = gf.from_u64(vals)
    fwd = pallas_ntt.ntt_pallas(x, interpret=True)
    n_inv = gf.from_u64(np.array(g.inv(1 << ln), dtype=np.uint64))
    back = gf.mul(pallas_ntt.ntt_pallas(fwd, inverse=True, interpret=True),
                  n_inv)
    np.testing.assert_array_equal(gf.to_u64(back), vals)
