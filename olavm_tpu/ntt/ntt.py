"""Batched Goldilocks NTT / iNTT / coset-LDE on TPU via JAX.

Replaces the reference's FFT/cfft + CUDA NTT
(/root/reference/plonky2/field/src/fft.rs, field/src/cfft/, cfft/ntt/) with a
TPU-native design: iterative radix-2 decimation-in-time over the LAST axis of
a (batch, n) two-limb GF array. One bit-reversal gather up front, then log2(n)
stages of contiguous reshape + butterfly (pure VPU integer ops that XLA fuses);
twiddles are precomputed host-side once per size and cached (the analogue of
the reference's shared twiddle cache, circuits/src/stark/prover.rs:102).

Conventions match the reference polynomial layer
(plonky2/field/src/polynomial/mod.rs): `ntt` maps coefficients -> values
p(g^i) in natural order; `intt` inverts; `coset_lde` evaluates on
(shift * H') where |H'| = n << rate_bits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf
from ..field import goldilocks as g
from ..utils.bits import bit_reversal_perm, log2_strict

# twiddle cache: (log_n, inverse) -> list of GF arrays (device) per stage
_TWIDDLE_CACHE: dict = {}
_PERM_CACHE: dict = {}


def _stage_twiddles(log_n: int, inverse: bool):
    key = (log_n, inverse)
    if key not in _TWIDDLE_CACHE:
        n = 1 << log_n
        root = g.primitive_root_of_unity(log_n)
        if inverse:
            root = g.inv(root)
        stages = []
        for s in range(1, log_n + 1):
            m = 1 << s
            w_m = pow(root, n // m, g.P)
            pw = g.powers(w_m, m // 2)
            # cache as host numpy: safe to reuse across jit traces
            stages.append(
                gf.GF(
                    (pw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (pw >> np.uint64(32)).astype(np.uint32),
                )
            )
        _TWIDDLE_CACHE[key] = stages
    return _TWIDDLE_CACHE[key]


def _bitrev_perm_dev(log_n: int):
    if log_n not in _PERM_CACHE:
        _PERM_CACHE[log_n] = bit_reversal_perm(1 << log_n)
    return _PERM_CACHE[log_n]


def bitrev_lanes(lanes: list, ln: int, max_f: int = 8) -> list:
    """Bit-reversal-permute each (n,) lane (n = 2^ln) WITHOUT a flat gather.

    A flat jnp.take over 2^23 indices is ~70x slower than a transpose on TPU
    and bakes a 64 MB index constant into the graph. Instead: factor the ln
    bits into groups of <= max_f, reverse the group ORDER via a transpose,
    then bit-reverse within each group with a tiny per-axis take (the same
    decomposition the Pallas NTT uses). Call under jit."""
    import jax.numpy as jnp

    m = (ln + max_f - 1) // max_f
    base = ln // m
    rem = ln - base * m
    factors = [base + (1 if i < rem else 0) for i in range(m)]
    shapes = [1 << f for f in factors]  # group sizes, LOWEST bits first
    out = []
    for a in lanes:
        y = a.reshape(tuple(reversed(shapes)))  # axis 0 = highest bit group
        y = y.transpose(tuple(range(len(shapes) - 1, -1, -1)))
        for ax, f in enumerate(factors):
            pf = jnp.asarray(bit_reversal_perm(1 << f))
            y = jnp.take(y, pf, axis=ax)
        out.append(y.reshape(a.shape))
    return out


def _butterfly_stages(x: gf.GF, twiddles) -> gf.GF:
    """Apply all radix-2 DIT stages to a bit-reversed-input array."""
    n = x.shape[-1]
    log_n = log2_strict(n)
    batch_shape = x.shape[:-1]
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        nblocks = n >> s
        xv = x.reshape(*batch_shape, nblocks, 2, half)
        u = xv[..., 0, :]
        v = gf.mul(xv[..., 1, :], twiddles[s - 1])
        x = gf.stack([gf.add(u, v), gf.sub(u, v)], axis=-2).reshape(
            *batch_shape, n
        )
    return x


def ntt(x: gf.GF) -> gf.GF:
    """Coefficients -> values p(g^i), natural order, along the last axis."""
    n = x.shape[-1]
    log_n = log2_strict(n)
    if n == 1:
        return x
    from . import pallas_ntt

    if pallas_ntt.use_pallas(n):
        return pallas_ntt.ntt_pallas(x)
    perm = _bitrev_perm_dev(log_n)
    x = gf.GF(jnp.take(x.lo, perm, axis=-1), jnp.take(x.hi, perm, axis=-1))
    return _butterfly_stages(x, _stage_twiddles(log_n, inverse=False))


def intt(x: gf.GF) -> gf.GF:
    """Values p(g^i) -> coefficients."""
    n = x.shape[-1]
    log_n = log2_strict(n)
    if n == 1:
        return x
    from . import pallas_ntt

    n_inv = gf.from_u64(np.array(g.inv(n), dtype=np.uint64))
    if pallas_ntt.use_pallas(n):
        x = pallas_ntt.ntt_pallas(x, inverse=True)
        return gf.mul(x, gf.GF(n_inv.lo, n_inv.hi))
    perm = _bitrev_perm_dev(log_n)
    x = gf.GF(jnp.take(x.lo, perm, axis=-1), jnp.take(x.hi, perm, axis=-1))
    x = _butterfly_stages(x, _stage_twiddles(log_n, inverse=True))
    return gf.mul(x, gf.GF(n_inv.lo, n_inv.hi))


def scale_by_powers(x: gf.GF, base: int) -> gf.GF:
    """x[..., j] *= base^j (host-known base).

    Under a trace, the power table is computed ON DEVICE by log-doubling
    (gf.powers) rather than as a host numpy table: a host table becomes a
    size-n CONSTANT baked into every jit graph that traces through here
    (64 MB at n=2^23), which made XLA compiles minutes-long and
    persistent-cache entries ~200 MB (round-4 finding). Device computation
    is O(n) — noise next to the NTT. Eager (non-traced) callers get the
    host table: log-doubling would dispatch hundreds of micro-ops."""
    from jax.core import Tracer

    n = x.shape[-1]
    if isinstance(x.lo, Tracer):
        return gf.mul(x, gf.powers(base, n))
    return gf.mul(x, gf.from_u64(g.powers(base, n)))


def coset_fft(coeffs: gf.GF, shift: int = g.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.GF:
    """Evaluate polynomial on shift*H, |H| = len(coeffs)."""
    return ntt(scale_by_powers(coeffs, shift))


def coset_ifft(values: gf.GF, shift: int = g.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.GF:
    """Inverse of coset_fft."""
    return scale_by_powers(intt(values), g.inv(shift))


def lde(coeffs: gf.GF, rate_bits: int) -> gf.GF:
    """Pad coefficients by 2^rate_bits and evaluate over the larger subgroup."""
    n = coeffs.shape[-1]
    big = n << rate_bits
    pad = [(0, 0)] * (coeffs.lo.ndim - 1) + [(0, big - n)]
    return ntt(gf.GF(jnp.pad(coeffs.lo, pad), jnp.pad(coeffs.hi, pad)))


def coset_lde(
    coeffs: gf.GF, rate_bits: int, shift: int = g.MULTIPLICATIVE_GROUP_GENERATOR
) -> gf.GF:
    """Evaluations of the degree-<n polynomial on shift*H', |H'| = n << rate_bits.

    Matches PolynomialBatch's per-polynomial LDE
    (/root/reference/plonky2/plonky2/src/fri/oracle.rs:101-128).
    """
    n = coeffs.shape[-1]
    big = n << rate_bits
    pad = [(0, 0)] * (coeffs.lo.ndim - 1) + [(0, big - n)]
    padded = gf.GF(jnp.pad(coeffs.lo, pad), jnp.pad(coeffs.hi, pad))
    return ntt(scale_by_powers(padded, shift))


@partial(jax.jit, static_argnums=())
def _jit_ntt(x_lo, x_hi):
    out = ntt(gf.GF(x_lo, x_hi))
    return out.lo, out.hi


def ntt_u64(vals: np.ndarray) -> np.ndarray:
    """Convenience host API: uint64 array in, uint64 out (last axis NTT)."""
    x = gf.from_u64(vals)
    lo, hi = _jit_ntt(x.lo, x.hi)
    return gf.to_u64(gf.GF(lo, hi))
