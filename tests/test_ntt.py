"""NTT/iNTT/coset-LDE tests vs a naive Python-int DFT."""

import numpy as np

from olavm_tpu.field import gf
from olavm_tpu.field import goldilocks as g
from olavm_tpu.ntt import ntt as nttm

P = g.P


def naive_dft(coeffs, shift=1):
    n = len(coeffs)
    root = g.primitive_root_of_unity(g.TWO_ADICITY) if False else None
    w = g.primitive_root_of_unity(n.bit_length() - 1)
    out = []
    for k in range(n):
        x = (shift * pow(w, k, P)) % P
        acc = 0
        for j in range(n - 1, -1, -1):
            acc = (acc * x + int(coeffs[j])) % P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def _rand(shape, seed):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 1 << 62, size=shape, dtype=np.uint64)) % np.uint64(P)


def test_ntt_small_sizes():
    for n in [1, 2, 4, 8, 32, 128]:
        c = _rand((n,), n)
        got = nttm.ntt_u64(c)
        want = naive_dft(c)
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_ntt_batched():
    c = _rand((3, 64), 5)
    got = nttm.ntt_u64(c)
    for i in range(3):
        np.testing.assert_array_equal(got[i], naive_dft(c[i]))


def test_intt_roundtrip():
    c = _rand((2, 256), 9)
    x = gf.from_u64(c)
    back = nttm.intt(nttm.ntt(x))
    np.testing.assert_array_equal(gf.to_u64(back), c)


def test_coset_fft_roundtrip_and_values():
    n = 32
    c = _rand((n,), 11)
    x = gf.from_u64(c)
    vals = nttm.coset_fft(x)
    want = naive_dft(c, shift=g.MULTIPLICATIVE_GROUP_GENERATOR)
    np.testing.assert_array_equal(gf.to_u64(vals), want)
    back = nttm.coset_ifft(vals)
    np.testing.assert_array_equal(gf.to_u64(back), c)


def test_coset_lde():
    n, rate = 16, 2
    c = _rand((n,), 13)
    x = gf.from_u64(c)
    out = nttm.coset_lde(x, rate)
    big = n << rate
    padded = np.zeros(big, dtype=np.uint64)
    padded[:n] = c
    want = naive_dft(padded, shift=g.MULTIPLICATIVE_GROUP_GENERATOR)
    np.testing.assert_array_equal(gf.to_u64(out), want)


def test_lde_prefix_is_subgroup_eval():
    # lde over H' restricted to every 2^rate-th point equals plain ntt over H
    n, rate = 16, 3
    c = _rand((n,), 17)
    x = gf.from_u64(c)
    big_vals = gf.to_u64(nttm.lde(x, rate))
    small_vals = gf.to_u64(nttm.ntt(x))
    np.testing.assert_array_equal(big_vals[:: 1 << rate], small_vals)
