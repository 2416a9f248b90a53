"""Cross-validation against test vectors EMBEDDED IN THE REFERENCE TREE
(VERDICT r3 item 4: replace self-generated goldens at the primitive layer).

Sources (expected values copied from the reference's own unit tests, which
derive them from third-party implementations — hadeshash for Poseidon):
  * Poseidon width-12 permutation vectors:
      /root/reference/plonky2/plonky2/src/hash/poseidon_goldilocks.rs:281-316
  * FFT naive-evaluation property (construction mirrored exactly):
      /root/reference/plonky2/field/src/fft.rs:219-252
  * BLAKE3 empty-message digest: the official BLAKE3 test vector (the
    reference links the blake3 crate, plonky2/plonky2/src/hash/blake3.rs).
"""

import numpy as np
import pytest

from olavm_tpu.field import goldilocks as g
from olavm_tpu.hash import poseidon as pos

P = g.P
NEG_ONE = P - 1

# poseidon_goldilocks.rs:293-316 (input, expected output) — width 12
POSEIDON_VECTORS = [
    (
        [0] * 12,
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4,
         0xC71603F33A1144CA, 0xD7709673896996DC, 0x46A84E87642F44ED,
         0xD032648251EE0B3C, 0x1C687363B207DF62, 0xDF8565563E8045FE,
         0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7],
    ),
    (
        list(range(12)),
        [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825,
         0x613A4F81E81231D2, 0x414754BFEBD051F0, 0xCB1F8980294A023F,
         0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056, 0xF045D5EAFDC6021F,
         0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B],
    ),
    (
        [NEG_ONE] * 12,
        [0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953,
         0x95803A74F4530E82, 0xFCD99EB30A135DF1, 0xE095905E913A3029,
         0xDE0392461B42919B, 0x7D3260E24E81D031, 0x10D3D0465D9DEAA0,
         0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3],
    ),
    (
        [0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A,
         0xDCC0630A3AB8B1B8, 0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB,
         0x48452B17A70FBEE3, 0xEB09D654690B6C88, 0x4A55D3A39C676A88,
         0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F],
        [0xA89280105650C4EC, 0xAB542D53860D12ED, 0x5704148E9CCAB94F,
         0xD3A826D4B62DA9F5, 0x8A7A6CA87892574F, 0xC7017E1CAD1A674E,
         0x1F06668922318E34, 0xA3B203BC8102676F, 0xFCC781B0CE382BF2,
         0x934C69FF3ED14BA5, 0x504688A5996E8F13, 0x401F3F2ED524A2BA],
    ),
]


@pytest.mark.smoke
@pytest.mark.parametrize("idx", range(len(POSEIDON_VECTORS)))
def test_poseidon_permutation_reference_vectors(idx):
    inp, expected = POSEIDON_VECTORS[idx]
    state = np.array([inp], dtype=np.uint64)
    out = pos.permute_np(state)[0]
    assert [int(v) for v in out] == expected


@pytest.mark.smoke
def test_poseidon_native_matches_reference_vectors():
    native = pos._native()
    if native is None:
        pytest.skip("native poseidon unavailable")
    for inp, expected in POSEIDON_VECTORS:
        state = np.array([inp], dtype=np.uint64)
        out = native.permute_batch(state)[0]
        assert [int(v) for v in out] == expected


def _naive_eval(coeffs: list[int]) -> list[int]:
    """evaluate_naive_power_of_2 (fft.rs:255-270): p(g^i) by Horner, exact
    Python ints — an implementation path fully independent of the NTT."""
    n = len(coeffs)
    root = g.primitive_root_of_unity(n.bit_length() - 1)
    out = []
    x = 1
    for _ in range(n):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        out.append(acc)
        x = (x * root) % P
    return out


@pytest.mark.smoke
def test_fft_matches_naive_evaluation_reference_construction():
    # mirrors fft.rs:219-238: degree 200, coeffs i*1337 % 100, zero-padded
    degree = 200
    degree_padded = 256
    coeffs = [(i * 1337) % 100 for i in range(degree)] + [0] * (
        degree_padded - degree)
    from olavm_tpu.ntt import host as ntt_host

    vals = ntt_host.ntt(np.array([coeffs], dtype=np.uint64))[0]
    assert [int(v) for v in vals] == _naive_eval(coeffs)

    back = ntt_host.intt(np.array([vals], dtype=np.uint64))[0]
    assert [int(v) for v in back] == coeffs


@pytest.mark.smoke
def test_device_ntt_matches_naive_evaluation():
    from olavm_tpu.ntt.ntt import ntt_u64

    degree_padded = 256
    coeffs = [(i * 1337) % 100 for i in range(200)] + [0] * 56
    vals = ntt_u64(np.array([coeffs], dtype=np.uint64))[0]
    assert [int(v) for v in vals] == _naive_eval(coeffs)


@pytest.mark.smoke
def test_blake3_official_vectors():
    # official BLAKE3 test vectors (the reference links the blake3 crate,
    # plonky2/plonky2/src/hash/blake3.rs): b"abc", and the repo's
    # input_len=1 vector (first byte of the 0,1,..250 repeating pattern)
    from olavm_tpu.hash.blake3 import blake3_hash_np

    assert blake3_hash_np(b"abc").hex() == (
        "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
    assert blake3_hash_np(b"\x00").hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213")
