"""Goldilocks multiply via exact f32 limb products.

The TPU VPU has no native 32-bit integer multiply — XLA emulates it ~50x
slower than an f32 multiply (measured: u32 mul 0.74 Gelem/s vs u32 add 39.7,
f32 mul full-rate).  So the hot multiply path decomposes each 64-bit operand
into six 11-bit limbs, forms the 36 pairwise products EXACTLY in f32 (11+11
= 22 bits < 24-bit mantissa), converts each product back to u32 (converts
and adds run at full VPU rate) and reassembles the 128-bit product columns
with shifts/adds before the standard EPSILON reduction (gf._reduce128,
which itself uses no multiplies).

This file only provides the product-limb computation; gf.mul dispatches to
it on TPU (the u32 path stays for CPU tests where int mul is fast).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 11
NL = 6  # ceil(64 / 11) = 6 limbs: 11*5 + 9

_MASK = np.uint32((1 << LIMB_BITS) - 1)


def _split_limbs(lo, hi):
    """(lo, hi) u32 pair -> NL f32 limb arrays (exact)."""
    import jax.numpy as jnp

    # limb k covers bits [11k, 11k+11) of the 64-bit value
    limbs = []
    for k in range(NL):
        start = LIMB_BITS * k
        if start + LIMB_BITS <= 32:
            piece = (lo >> np.uint32(start)) & _MASK
        elif start < 32:
            lo_part = lo >> np.uint32(start)
            hi_part = (hi << np.uint32(32 - start)) & _MASK
            piece = (lo_part | hi_part) & _MASK
        else:
            piece = (hi >> np.uint32(start - 32)) & _MASK
        limbs.append(_to_f32(piece))
    return limbs


def _to_f32(x):
    """u32 (< 2^25) -> exact f32. Mosaic has no u32->f32 cast; go via i32."""
    import jax.numpy as jnp

    return x.astype(jnp.int32).astype(jnp.float32)


def _to_u32(x):
    """f32 integer (< 2^25) -> u32, via i32 for Mosaic."""
    import jax.numpy as jnp

    return x.astype(jnp.int32).astype(jnp.uint32)


def mul64_limbs_f32(a_lo, a_hi, b_lo, b_hi):
    """Full 64x64 -> 128-bit product as four u32 words (l0, l1, l2, l3),
    all multiplies in exact f32."""
    return _limb_product(_split_limbs(a_lo, a_hi), _split_limbs(b_lo, b_hi))


def mul64_u32_f32(a_lo, a_hi, k):
    """64 x u32 -> (l0, l1, l2, l3) with l3 == 0; 18 exact f32 products."""
    import jax.numpy as jnp

    b = [
        _to_f32(k & _MASK),
        _to_f32((k >> np.uint32(LIMB_BITS)) & _MASK),
        _to_f32(k >> np.uint32(2 * LIMB_BITS)),
    ]
    return _limb_product(_split_limbs(a_lo, a_hi), b)


def _limb_product(a: list, b: list):
    import jax.numpy as jnp

    # column sums in f32: col k = sum_{i+j=k} a_i * b_j.
    # Each product < 2^22; up to 6 per column -> < 2^24.6, NOT exact in f32,
    # so accumulate pairwise in f32 only while the bound stays < 2^24
    # (2 products = 2^23 ok) -> convert each pair to u32 and add there
    # (u32 adds/converts run at full VPU rate).
    na, nb = len(a), len(b)
    ncols = na + nb - 1
    cols = [None] * ncols
    for k in range(ncols):
        prods_f32 = []
        for i in range(max(0, k - nb + 1), min(na, k + 1)):
            prods_f32.append(a[i] * b[k - i])
        # pair up in f32 (exact: 2 * 2^22 = 2^23 < 2^24), convert, add
        acc = None
        for t in range(0, len(prods_f32) - 1, 2):
            pair = _to_u32(prods_f32[t] + prods_f32[t + 1])
            acc = pair if acc is None else acc + pair
        if len(prods_f32) % 2:
            last = _to_u32(prods_f32[-1])
            acc = last if acc is None else acc + last
        cols[k] = acc  # < 3 * 2^23 < 2^25

    # reassemble 128-bit product from 11-bit-spaced columns.
    # l_w (w = 0..3) = bits [32w, 32w+32). col k sits at bit 11k with value
    # < 2^25 (34-bit span).  Accumulate in u64-free fashion: process columns
    # in order, carrying via a running u32 pipeline.  Simpler: split each
    # col into (low11 = col & 0x7FF, rest = col >> 11) and propagate rest
    # into the next column — after one pass cols are canonical 11-bit digits
    # except the last.
    digits = []
    carry = jnp.zeros_like(cols[0])
    for k in range(ncols):
        v = cols[k] + carry
        digits.append(v & _MASK)
        carry = v >> np.uint32(LIMB_BITS)
    digits.append(carry & _MASK)
    digits.append(carry >> np.uint32(LIMB_BITS))  # < 2^3
    # now digits occupy disjoint 11-bit ranges -> 143 bits > 128, but the
    # true product < 2^128 so top digits vanish.  Pack into four u32 words.
    words = []
    for w in range(4):
        bit0 = 32 * w
        acc = jnp.zeros_like(cols[0])
        for k, d in enumerate(digits):
            pos = LIMB_BITS * k
            if pos + LIMB_BITS <= bit0 or pos >= bit0 + 32:
                continue
            if pos >= bit0:
                acc = acc + (d << np.uint32(pos - bit0))
            else:
                acc = acc + (d >> np.uint32(bit0 - pos))
        words.append(acc)
    # exact: canonical digits occupy disjoint bit ranges, so the shifted
    # pieces inside each word never overlap and the adds cannot carry out.
    return tuple(words)
