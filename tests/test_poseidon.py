"""Poseidon tests against the reference's official test vectors
(plonky2/plonky2/src/hash/poseidon_goldilocks.rs:293-315) and the
intermediate-state golden vectors for the zero input
(core/src/util/poseidon_utils.rs:11-287)."""

import numpy as np

from olavm_tpu.field import gf
from olavm_tpu.field import goldilocks as g
from olavm_tpu.hash import poseidon as pos

P = g.P
NEG_ONE = P - 1

VEC12 = [
    (
        [0] * 12,
        [
            0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4,
            0xC71603F33A1144CA, 0xD7709673896996DC, 0x46A84E87642F44ED,
            0xD032648251EE0B3C, 0x1C687363B207DF62, 0xDF8565563E8045FE,
            0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7,
        ],
    ),
    (
        list(range(12)),
        [
            0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825,
            0x613A4F81E81231D2, 0x414754BFEBD051F0, 0xCB1F8980294A023F,
            0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056, 0xF045D5EAFDC6021F,
            0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B,
        ],
    ),
    (
        [NEG_ONE] * 12,
        [
            0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953,
            0x95803A74F4530E82, 0xFCD99EB30A135DF1, 0xE095905E913A3029,
            0xDE0392461B42919B, 0x7D3260E24E81D031, 0x10D3D0465D9DEAA0,
            0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3,
        ],
    ),
    (
        [
            0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A,
            0xDCC0630A3AB8B1B8, 0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB,
            0x48452B17A70FBEE3, 0xEB09D654690B6C88, 0x4A55D3A39C676A88,
            0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F,
        ],
        [
            0xA89280105650C4EC, 0xAB542D53860D12ED, 0x5704148E9CCAB94F,
            0xD3A826D4B62DA9F5, 0x8A7A6CA87892574F, 0xC7017E1CAD1A674E,
            0x1F06668922318E34, 0xA3B203BC8102676F, 0xFCC781B0CE382BF2,
            0x934C69FF3ED14BA5, 0x504688A5996E8F13, 0x401F3F2ED524A2BA,
        ],
    ),
]

# Zero-input intermediate golden states (poseidon_utils.rs)
ZERO_FULL_0_1 = [
    0x4662CF40A9E0AE34, 0xA83A4F889AF38106, 0xDD0A0533018BD132, 0x1A7A30199BE91317,
    0xF39CB2D0D20C503B, 0xD6A75E3FDB1C08E2, 0x96BFD6422A2214BC, 0x5337A88997F91DEC,
    0x2D38D55F9F150629, 0xA5846C6EE380F7A8, 0xD100EA0201D46811, 0x8401251CCA6FFBBF,
]
ZERO_PARTIAL_0 = 0x3E1E964278F6C853
ZERO_PARTIAL_21 = 0x779A05B6CF99453A


def test_permute_np_vectors():
    ins = np.array([v[0] for v in VEC12], dtype=np.uint64)
    want = np.array([v[1] for v in VEC12], dtype=np.uint64)
    got = pos.permute_np(ins)
    np.testing.assert_array_equal(got, want)


def test_permute_np_trace_intermediates():
    out, tr = pos.permute_np(np.zeros(12, dtype=np.uint64), with_trace=True)
    np.testing.assert_array_equal(
        tr["full_0_1"], np.array(ZERO_FULL_0_1, dtype=np.uint64)
    )
    assert int(tr["partial"][0]) == ZERO_PARTIAL_0
    assert int(tr["partial"][21]) == ZERO_PARTIAL_21
    np.testing.assert_array_equal(out, np.array(VEC12[0][1], dtype=np.uint64))


def test_permute_gf_matches_np():
    rng = np.random.RandomState(3)
    states = rng.randint(0, 1 << 62, size=(5, 12), dtype=np.uint64) % np.uint64(P)
    want = pos.permute_np(states)
    state_gf = [gf.from_u64(states[:, i]) for i in range(12)]
    out = pos.permute_gf(state_gf)
    got = np.stack([gf.to_u64(x) for x in out], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_sponge_and_compress():
    # sponge over 10 elements (hello-world-ish vector from the reference test,
    # core/src/crypto/poseidon_trace.rs:214-229 exercises this shape)
    inputs = [104, 101, 108, 108, 111, 119, 111, 114, 108, 100]
    h4, rows = pos.arbitrary_poseidon_np(inputs, with_rows=True)
    assert len(rows) == 2
    # row chaining: second chunk overwrites first 2 lanes of previous output
    st = rows[0]["output"].copy()
    st[:2] = [108, 100]
    np.testing.assert_array_equal(rows[1]["input"], st)
    np.testing.assert_array_equal(rows[1]["output"][:4], np.array(h4, dtype=np.uint64))

    # hash_n_to_m_no_pad with < rate inputs = single permutation of padded state
    out = pos.hash_no_pad([1, 2, 3])
    st = np.zeros(12, dtype=np.uint64)
    st[:3] = [1, 2, 3]
    np.testing.assert_array_equal(np.array(out), pos.permute_np(st)[:4])

    # compress == permutation with x|y in first 8 lanes
    x, y = [1, 2, 3, 4], [5, 6, 7, 8]
    st = np.zeros(12, dtype=np.uint64)
    st[:8] = x + y
    np.testing.assert_array_equal(
        np.array(pos.two_to_one(x, y)), pos.permute_np(st)[:4]
    )


def test_two_to_one_gf():
    rng = np.random.RandomState(4)
    xs = rng.randint(0, 1 << 62, size=(3, 4), dtype=np.uint64) % np.uint64(P)
    ys = rng.randint(0, 1 << 62, size=(3, 4), dtype=np.uint64) % np.uint64(P)
    out = pos.two_to_one_gf(
        [gf.from_u64(xs[:, i]) for i in range(4)],
        [gf.from_u64(ys[:, i]) for i in range(4)],
    )
    got = np.stack([gf.to_u64(o) for o in out], axis=-1)
    want = np.stack(
        [np.array(pos.two_to_one(xs[i], ys[i]), dtype=np.uint64) for i in range(3)]
    )
    np.testing.assert_array_equal(got, want)
