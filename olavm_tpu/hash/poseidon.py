"""Poseidon permutation over Goldilocks (width 12, 8 full + 22 partial rounds).

Matches the reference's plonky2-style fast-partial-round evaluation exactly
(/root/reference/core/src/util/poseidon_utils.rs:289-375,
/root/reference/core/src/crypto/poseidon_trace.rs:27-185,
/root/reference/plonky2/plonky2/src/hash/poseidon.rs). Round/MDS constants are
data extracted to poseidon_constants.json (required bit-for-bit for proof
compatibility).

Two implementations sharing one structure:
- numpy host version, vectorized over a batch of states (trace generation,
  challenger, SMT hashing);
- JAX two-limb GF version, state held as a list of 12 GF arrays so each lane
  maps cleanly onto the TPU VPU (Merkle commitment, program hashing).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf
from ..field import goldilocks as g

WIDTH = 12
RATE = 8
CAPACITY = 4
HALF_N_FULL_ROUNDS = 4
N_PARTIAL_ROUNDS = 22

_HERE = os.path.dirname(__file__)
with open(os.path.join(_HERE, "poseidon_constants.json")) as f:
    _C = json.load(f)

ALL_ROUND_CONSTANTS = _C["ALL_ROUND_CONSTANTS"]  # 360
MDS_CIRC = _C["MDS_MATRIX_CIRC"]  # 12, small ints
MDS_DIAG = _C["MDS_MATRIX_DIAG"]  # 12, small ints
FAST_PARTIAL_FIRST_ROUND_CONSTANT = _C["FAST_PARTIAL_FIRST_ROUND_CONSTANT"]
FAST_PARTIAL_ROUND_CONSTANTS = _C["FAST_PARTIAL_ROUND_CONSTANTS"]
FAST_PARTIAL_ROUND_VS = _C["FAST_PARTIAL_ROUND_VS"]  # 22 x 11
FAST_PARTIAL_ROUND_W_HATS = _C["FAST_PARTIAL_ROUND_W_HATS"]  # 22 x 11
FAST_PARTIAL_ROUND_INITIAL_MATRIX = _C["FAST_PARTIAL_ROUND_INITIAL_MATRIX"]  # 11x11

_U64 = np.uint64

_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    """Native kernel module if built (olavm_tpu.native), else None."""
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from .. import native

            if native.available:
                _NATIVE = native
        except Exception:
            _NATIVE = None
    return _NATIVE


# ---------------------------------------------------------------------------
# Host (numpy) version. States: uint64 array of shape (..., 12).
# ---------------------------------------------------------------------------


def _sbox_np(x):
    x2 = g.mul_arr(x, x)
    x4 = g.mul_arr(x2, x2)
    x3 = g.mul_arr(x, x2)
    return g.mul_arr(x3, x4)


def _constant_layer_np(state, round_ctr):
    for i in range(WIDTH):
        rc = _U64(ALL_ROUND_CONSTANTS[i + WIDTH * round_ctr])
        state[i] = g.add_arr(state[i], rc)


def _mds_layer_np(state):
    out = []
    for r in range(WIDTH):
        acc = np.zeros_like(state[0])
        for i in range(WIDTH):
            acc = g.add_arr(acc, g.mul_arr(state[(i + r) % WIDTH], _U64(MDS_CIRC[i])))
        acc = g.add_arr(acc, g.mul_arr(state[r], _U64(MDS_DIAG[r])))
        out.append(acc)
    return out


def _partial_first_constant_layer_np(state):
    for i in range(WIDTH):
        state[i] = g.add_arr(state[i], _U64(FAST_PARTIAL_FIRST_ROUND_CONSTANT[i]))


def _mds_partial_layer_init_np(state):
    out = [np.zeros_like(state[0]) for _ in range(WIDTH)]
    out[0] = state[0]
    for r in range(1, WIDTH):
        for c in range(1, WIDTH):
            t = _U64(FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][c - 1])
            out[c] = g.add_arr(out[c], g.mul_arr(state[r], t))
    return out


def _mds_partial_layer_fast_np(state, r):
    mds0to0 = _U64(MDS_CIRC[0] + MDS_DIAG[0])
    d = g.mul_arr(state[0], mds0to0)
    for i in range(1, WIDTH):
        d = g.add_arr(d, g.mul_arr(state[i], _U64(FAST_PARTIAL_ROUND_W_HATS[r][i - 1])))
    out = [None] * WIDTH
    out[0] = d
    for i in range(1, WIDTH):
        out[i] = g.add_arr(
            g.mul_arr(state[0], _U64(FAST_PARTIAL_ROUND_VS[r][i - 1])), state[i]
        )
    return out


def permute_np(states: np.ndarray, with_trace: bool = False):
    """Poseidon permutation; states shape (..., 12) uint64 canonical.

    With with_trace=True also returns a dict of intermediate states matching
    the reference PoseidonRow layout (core/src/trace/trace.rs:195-210):
    full_0_1/2/3 are post-constant-layer states of full rounds 1..3;
    partial[r] is the sbox input of partial round r; full_1_0..3 are
    post-constant-layer states of the second full rounds.
    """
    states = np.asarray(states, dtype=np.uint64)
    if not with_trace:
        native = _native()
        if native is not None:
            return native.permute_batch(states.reshape(-1, WIDTH)).reshape(
                states.shape
            )
    state = [states[..., i].copy() for i in range(WIDTH)]
    trace = {} if with_trace else None
    round_ctr = 0
    for r in range(HALF_N_FULL_ROUNDS):
        _constant_layer_np(state, round_ctr)
        if with_trace and r in (1, 2, 3):
            trace[f"full_0_{r}"] = np.stack(state, axis=-1)
        state = [_sbox_np(x) for x in state]
        state = _mds_layer_np(state)
        round_ctr += 1

    _partial_first_constant_layer_np(state)
    state = _mds_partial_layer_init_np(state)
    partials = []
    for r in range(N_PARTIAL_ROUNDS - 1):
        if with_trace:
            partials.append(state[0].copy())
        state[0] = _sbox_np(state[0])
        state[0] = g.add_arr(state[0], _U64(FAST_PARTIAL_ROUND_CONSTANTS[r]))
        state = _mds_partial_layer_fast_np(state, r)
    if with_trace:
        partials.append(state[0].copy())
    state[0] = _sbox_np(state[0])
    state = _mds_partial_layer_fast_np(state, N_PARTIAL_ROUNDS - 1)
    round_ctr += N_PARTIAL_ROUNDS

    for r in range(HALF_N_FULL_ROUNDS):
        _constant_layer_np(state, round_ctr)
        if with_trace:
            trace[f"full_1_{r}"] = np.stack(state, axis=-1)
        state = [_sbox_np(x) for x in state]
        state = _mds_layer_np(state)
        round_ctr += 1

    out = np.stack(state, axis=-1)
    if with_trace:
        trace["partial"] = np.stack(partials, axis=-1)
        return out, trace
    return out


def hash_n_to_m_no_pad(inputs: Sequence[int], num_outputs: int) -> list[int]:
    """plonky2 sponge (overwrite mode, rate 8); scalar host version.

    Reference: plonky2/plonky2/src/hash/hashing.rs:87-107.
    """
    state = np.zeros(WIDTH, dtype=np.uint64)
    inputs = [int(x) for x in inputs]
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i : i + RATE]
        state[: len(chunk)] = np.array(chunk, dtype=np.uint64)
        state = permute_np(state)
    outputs = []
    while True:
        for x in state[:RATE]:
            outputs.append(int(x))
            if len(outputs) == num_outputs:
                return outputs
        state = permute_np(state)


def hash_no_pad(inputs: Sequence[int]) -> list[int]:
    return hash_n_to_m_no_pad(inputs, 4)


def two_to_one(x: Sequence[int], y: Sequence[int]) -> list[int]:
    """Merkle compression (plonky2 hashing.rs:66-74)."""
    state = np.zeros(WIDTH, dtype=np.uint64)
    state[0:4] = np.array([int(v) for v in x], dtype=np.uint64)
    state[4:8] = np.array([int(v) for v in y], dtype=np.uint64)
    return [int(v) for v in permute_np(state)[:4]]


def arbitrary_poseidon_np(inputs: Sequence[int], with_rows: bool = False):
    """Variable-length sponge used by the VM's POSEIDON opcode and program
    hashing (core/src/crypto/poseidon_trace.rs:67-185). Returns (hash4, rows)
    where rows capture every chunk's full PoseidonRow-compatible data."""
    state = np.zeros(WIDTH, dtype=np.uint64)
    rows = []
    inputs = [int(x) for x in inputs]
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i : i + RATE]
        state[: len(chunk)] = np.array(chunk, dtype=np.uint64)
        if with_rows:
            inp = state.copy()
            out, tr = permute_np(state, with_trace=True)
            rows.append({"input": inp, "output": out, **tr})
            state = out.copy()
        else:
            state = permute_np(state)
    return [int(v) for v in state[:4]], rows


# ---------------------------------------------------------------------------
# Device (JAX) version. State: GF with leading axis 12, i.e. shape (12, ...)
# so the batch rides the TPU lanes. Rounds run under lax.scan to keep the
# compiled graph small (an unrolled permutation is ~100k primitives).
# ---------------------------------------------------------------------------


def _const_rows(vals) -> gf.GF:
    # NB: dtype must be explicit — np.array on python ints > 2^63 silently
    # falls back to float64 and corrupts the low bits.
    arr = np.asarray(vals, dtype=np.uint64)
    return gf.GF(
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


# stacked constants (host numpy; become trace constants under jit)
_RC_ALL = _const_rows(
    np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH)
)  # (30,12)
_PF_CONST = _const_rows(FAST_PARTIAL_FIRST_ROUND_CONSTANT)  # (12,)
_P_CONSTS = _const_rows(FAST_PARTIAL_ROUND_CONSTANTS)  # (22,)
_P_VS = _const_rows(FAST_PARTIAL_ROUND_VS)  # (22,11)
_P_WHATS = _const_rows(FAST_PARTIAL_ROUND_W_HATS)  # (22,11)
_P_INIT = _const_rows(FAST_PARTIAL_ROUND_INITIAL_MATRIX)  # (11,11)
_MDS0TO0 = MDS_CIRC[0] + MDS_DIAG[0]
# per output row r, the circ coefficient applied to state row j is
# CIRC[(j - r) % 12]; build the full 12x12 coefficient matrix once.
_MDS_COEF = np.array(
    [[MDS_CIRC[(j - r) % WIDTH] for j in range(WIDTH)] for r in range(WIDTH)],
    dtype=np.uint32,
)
for _r in range(WIDTH):
    _MDS_COEF[_r, _r] += MDS_DIAG[_r]


def _bcast_row(c: gf.GF, state: gf.GF) -> gf.GF:
    """Broadcast a (12,) constant over state (12, ...)."""
    extra = state.lo.ndim - 1
    shape = (WIDTH,) + (1,) * extra
    return gf.GF(c.lo.reshape(shape), c.hi.reshape(shape))


def _sbox_gf(x: gf.GF) -> gf.GF:
    x2 = gf.mul(x, x)
    x4 = gf.mul(x2, x2)
    x3 = gf.mul(x, x2)
    return gf.mul(x3, x4)


def _sum_rows(x: gf.GF) -> gf.GF:
    """Modular sum over leading axis (length 12) via log-tree of gf.add."""
    n = x.lo.shape[0]
    while n > 1:
        half = n // 2
        lo = gf.GF(x.lo[:half], x.hi[:half])
        hi = gf.GF(x.lo[half : 2 * half], x.hi[half : 2 * half])
        s = gf.add(lo, hi)
        if n % 2:
            s = gf.GF(
                jnp.concatenate([s.lo, x.lo[2 * half :]], axis=0),
                jnp.concatenate([s.hi, x.hi[2 * half :]], axis=0),
            )
            n = half + 1
        else:
            n = half
        x = s
    return gf.GF(x.lo[0], x.hi[0])


def _mds_layer_full(state: gf.GF) -> gf.GF:
    """Full MDS: out[r] = sum_j coef[r,j] * state[j]; state (12, ...)."""
    # (12, 12, ...) = coef[r, j] * state[j]
    lo = jnp.broadcast_to(state.lo[None], (WIDTH,) + state.lo.shape)
    hi = jnp.broadcast_to(state.hi[None], (WIDTH,) + state.hi.shape)
    coef = _MDS_COEF.reshape((WIDTH, WIDTH) + (1,) * (state.lo.ndim - 1))
    prod = gf.mul_u32(gf.GF(lo, hi), coef)
    # sum over j (axis 1): move to axis 0 view per row via reshape trick
    out_lo, out_hi = [], []
    for r in range(WIDTH):
        s = _sum_rows(gf.GF(prod.lo[r], prod.hi[r]))
        out_lo.append(s.lo)
        out_hi.append(s.hi)
    return gf.GF(jnp.stack(out_lo), jnp.stack(out_hi))


def _full_rounds_scan(state: gf.GF, rc_slice: gf.GF) -> gf.GF:
    """4 full rounds under scan; rc_slice: (4, 12) constants."""

    def body(st, rc):
        st = gf.add(st, _bcast_row(rc, st))
        st = _sbox_gf(st)
        st = _mds_layer_full(st)
        return st, None

    out, _ = jax.lax.scan(body, state, rc_slice)
    return out


def _partial_rounds_scan(state: gf.GF) -> gf.GF:
    """All 22 partial rounds under scan (fast MDS form).

    The carry keeps s0 and the 11 'rest' lanes SEPARATE and concatenates
    only once at the end: a per-round concatenate([d, rest]) immediately
    re-sliced as [0] / [1:] by the next round sends XLA:CPU's HLO
    simplifier into a pathological rewrite loop (>10 min compile for TWO
    rounds, measured round 4)."""

    def body(carry, consts):
        s0, rest = carry
        rc, vs_row, wh_row, is_last = consts
        s0 = _sbox_gf(s0)
        s0 = gf.select(is_last == 0, gf.add(s0, rc), s0)
        # d = s0 * mds0to0 + sum_i rest[i] * w_hats[i]
        extra = (1,) * (rest.lo.ndim - 1)
        wh = gf.GF(
            wh_row.lo.reshape((WIDTH - 1,) + extra),
            wh_row.hi.reshape((WIDTH - 1,) + extra),
        )
        vs = gf.GF(
            vs_row.lo.reshape((WIDTH - 1,) + extra),
            vs_row.hi.reshape((WIDTH - 1,) + extra),
        )
        d = gf.add(gf.mul_u32(s0, np.uint32(_MDS0TO0)), _sum_rows(gf.mul(rest, wh)))
        s0b = gf.GF(
            jnp.broadcast_to(s0.lo[None], rest.lo.shape),
            jnp.broadcast_to(s0.hi[None], rest.hi.shape),
        )
        new_rest = gf.add(gf.mul(s0b, vs), rest)
        return (d, new_rest), None

    is_last = np.zeros(N_PARTIAL_ROUNDS, dtype=np.uint32)
    is_last[-1] = 1
    consts = (_P_CONSTS, _P_VS, _P_WHATS, jnp.asarray(is_last))
    carry0 = (gf.GF(state.lo[0], state.hi[0]),
              gf.GF(state.lo[1:], state.hi[1:]))
    (s0, rest), _ = jax.lax.scan(body, carry0, consts)
    return gf.GF(
        jnp.concatenate([s0.lo[None], rest.lo], axis=0),
        jnp.concatenate([s0.hi[None], rest.hi], axis=0),
    )


def _mds_partial_layer_init_gf(state: gf.GF) -> gf.GF:
    """result[0] = state[0]; result[c] = sum_{r>=1} state[r]*M[r-1][c-1]."""
    rest = gf.GF(state.lo[1:], state.hi[1:])  # (11, ...)
    extra = (1,) * (rest.lo.ndim - 1)
    # (11, 11, ...): M[r-1][c-1] * state[r]
    m = gf.GF(
        _P_INIT.lo.reshape((WIDTH - 1, WIDTH - 1) + extra),
        _P_INIT.hi.reshape((WIDTH - 1, WIDTH - 1) + extra),
    )
    st = gf.GF(
        jnp.broadcast_to(rest.lo[:, None], (WIDTH - 1,) + rest.lo.shape),
        jnp.broadcast_to(rest.hi[:, None], (WIDTH - 1,) + rest.hi.shape),
    )
    prod = gf.mul(st, m)  # [r, c, ...]
    cols_lo, cols_hi = [], []
    for c in range(WIDTH - 1):
        s = _sum_rows(gf.GF(prod.lo[:, c], prod.hi[:, c]))
        cols_lo.append(s.lo)
        cols_hi.append(s.hi)
    return gf.GF(
        jnp.concatenate([state.lo[0:1], jnp.stack(cols_lo)], axis=0),
        jnp.concatenate([state.hi[0:1], jnp.stack(cols_hi)], axis=0),
    )


def permute_stacked_gf(state: gf.GF) -> gf.GF:
    """Poseidon permutation; state: GF of shape (12, ...)."""
    assert state.lo.shape[0] == WIDTH
    state = _full_rounds_scan(state, _RC_ALL[0:4])
    state = gf.add(state, _bcast_row(_PF_CONST, state))
    state = _mds_partial_layer_init_gf(state)
    state = _partial_rounds_scan(state)
    state = _full_rounds_scan(state, _RC_ALL[26:30])
    return state


def permute_stacked_gf_unrolled(state: gf.GF) -> gf.GF:
    """Fully-unrolled permutation (no lax.scan): same math as
    permute_stacked_gf with every round inlined at trace time. Used inside
    Pallas kernel bodies (field/pallas_kernels.py) where the whole unrolled
    round chain stays in VMEM/registers — a scan would bounce the carry
    through memory every round."""
    assert state.lo.shape[0] == WIDTH

    def full_round(st, r):
        rc = gf.GF(_RC_ALL.lo[r], _RC_ALL.hi[r])
        st = gf.add(st, _bcast_row(rc, st))
        st = _sbox_gf(st)
        return _mds_layer_full(st)

    for r in range(HALF_N_FULL_ROUNDS):
        state = full_round(state, r)
    state = gf.add(state, _bcast_row(_PF_CONST, state))
    state = _mds_partial_layer_init_gf(state)
    # s0 / rest carried separately, one concatenate at the end (see
    # _partial_rounds_scan: per-round concat+reslice is an XLA:CPU
    # compile-time pathology)
    s0 = gf.GF(state.lo[0], state.hi[0])
    rest = gf.GF(state.lo[1:], state.hi[1:])
    for i in range(N_PARTIAL_ROUNDS):
        s0 = _sbox_gf(s0)
        if i < N_PARTIAL_ROUNDS - 1:
            s0 = gf.add(s0, gf.GF(_P_CONSTS.lo[i], _P_CONSTS.hi[i]))
        extra = (1,) * (rest.lo.ndim - 1)
        wh = gf.GF(
            _P_WHATS.lo[i].reshape((WIDTH - 1,) + extra),
            _P_WHATS.hi[i].reshape((WIDTH - 1,) + extra),
        )
        vs = gf.GF(
            _P_VS.lo[i].reshape((WIDTH - 1,) + extra),
            _P_VS.hi[i].reshape((WIDTH - 1,) + extra),
        )
        d = gf.add(
            gf.mul_u32(s0, np.uint32(_MDS0TO0)), _sum_rows(gf.mul(rest, wh))
        )
        s0b = gf.GF(
            jnp.broadcast_to(s0.lo[None], rest.lo.shape),
            jnp.broadcast_to(s0.hi[None], rest.hi.shape),
        )
        rest = gf.add(gf.mul(s0b, vs), rest)
        s0 = d
    state = gf.GF(
        jnp.concatenate([s0.lo[None], rest.lo], axis=0),
        jnp.concatenate([s0.hi[None], rest.hi], axis=0),
    )
    for r in range(26, 30):
        state = full_round(state, r)
    return state


def permute_gf(state: list[gf.GF]) -> list[gf.GF]:
    """List-of-12-lanes API over permute_stacked_gf."""
    st = gf.stack(state, axis=0)
    out = permute_stacked_gf(st)
    return [gf.GF(out.lo[i], out.hi[i]) for i in range(WIDTH)]


def two_to_one_gf(x: list[gf.GF], y: list[gf.GF]) -> list[gf.GF]:
    """Batched Merkle compression on device: x, y are lists of 4 GF arrays."""
    shape = x[0].lo.shape
    zero = gf.zeros(shape)
    state = list(x) + list(y) + [zero, zero, zero, zero]
    return permute_gf(state)[:4]
