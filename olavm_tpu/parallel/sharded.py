"""Multi-chip sharding for the proving pipeline (pjit/GSPMD style).

The reference is a single-process rayon system (SURVEY.md §2.7); its
parallelism maps onto a TPU mesh as:

- *columns* of a trace table are independent through IFFT + coset-LDE
  (the rayon per-polynomial loops in plonky2/plonky2/src/fri/oracle.rs:56-128)
  -> shard the column axis ("tensor parallel" analogue).
- *rows* (LDE points / Merkle leaves) are independent through leaf hashing
  and within-subtree Merkle reduction
  (plonky2/plonky2/src/hash/merkle_tree/mod.rs:146-228)
  -> shard the leaf axis ("data parallel" analogue). Because leaves are laid
  out in bit-reversed order, a contiguous shard of leaves IS a subtree, so
  each device reduces its own subtree and only the tiny top levels need a
  gather.
- the column->row handoff between those two phases is a distributed
  transpose: expressed as a sharding-constraint change so XLA inserts the
  all-to-all on ICI.
- quotient evaluation over coset points (circuits/src/stark/prover.rs:571-660)
  is elementwise over rows -> row-block sharding.

Everything here is pure jnp on two-limb GF arrays and works both on a real
TPU slice and on the N-virtual-device CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import gf
from ..field import goldilocks as g
from ..merkle import tree as merkle
from ..ntt import ntt as dntt
from ..utils.bits import bit_reversal_perm, log2_strict


def make_mesh(n_devices: int | None = None, shape=None, axis_names=("col", "row")):
    """Build a device mesh. Default: 2D (col, row) as square as possible."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        c = 1 << (n_devices.bit_length() - 1).__floordiv__(2)
        while n_devices % c:
            c >>= 1
        shape = (c, n_devices // c)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def _wsc(x: gf.GF, mesh: Mesh, spec: P) -> gf.GF:
    s = NamedSharding(mesh, spec)
    return gf.GF(
        jax.lax.with_sharding_constraint(x.lo, s),
        jax.lax.with_sharding_constraint(x.hi, s),
    )


def commit_fn(mesh: Mesh, num_cols: int, degree_bits: int, rate_bits: int,
              cap_height: int, col_axes=("col", "row"), row_axes=("col", "row")):
    """Returns a jittable sharded commit step:
    (lo, hi) of shape (num_cols, 2^degree_bits) trace VALUES ->
    (cap_lanes..., leaves_lo, leaves_hi).

    Pipeline: column-sharded IFFT + coset-LDE, all-to-all transpose to
    row-sharded bit-reversed leaves, row-sharded leaf hashing, subtree-local
    Merkle reduction, replicated cap top.
    """
    n = 1 << degree_bits
    lde_bits = degree_bits + rate_bits
    lde_n = 1 << lde_bits
    perm = jnp.asarray(bit_reversal_perm(lde_n))
    col_spec = P(col_axes, None)
    row_spec = P(row_axes, None)

    def step(lo, hi):
        x = _wsc(gf.GF(lo, hi), mesh, col_spec)          # (C, n) col-sharded
        coeffs = dntt.intt(x)
        lde = dntt.coset_lde(coeffs, rate_bits)           # (C, lde_n)
        leaves = gf.GF(lde.lo.T, lde.hi.T)                # (lde_n, C)
        leaves = gf.GF(
            jnp.take(leaves.lo, perm, axis=0),
            jnp.take(leaves.hi, perm, axis=0),
        )
        leaves = _wsc(leaves, mesh, row_spec)             # transpose boundary
        digests = merkle.hash_leaves_gf(leaves)           # 4 lanes of (lde_n,)
        num_compress = lde_bits - cap_height
        for lvl in range(num_compress):
            digests = merkle._compress_level(digests)
            nodes = lde_n >> (lvl + 1)
            # keep subtree reduction local while there are enough nodes
            if nodes >= mesh.size:
                digests = [
                    jax.lax.with_sharding_constraint(
                        d, NamedSharding(mesh, P(row_axes))
                    )
                    for d in digests
                ]
        cap = [
            jax.lax.with_sharding_constraint(d, NamedSharding(mesh, P()))
            for d in digests
        ]
        return cap, (leaves.lo, leaves.hi)

    return step


def quotient_eval_fn(mesh: Mesh, row_axes=("col", "row")):
    """Row-block-sharded constraint evaluation over coset points.

    Takes per-point local/next trace windows (R, C) and evaluates a
    vectorized AIR `eval_fn(local_cols, next_cols) -> list[GF]`, multiplying
    by the Z_H-inverse column. Sharded over rows (coset points)."""
    row_spec = P(row_axes, None)

    def make(eval_fn):
        def step(local_lo, local_hi, next_lo, next_hi, zinv_lo, zinv_hi):
            local = _wsc(gf.GF(local_lo, local_hi), mesh, row_spec)
            nxt = _wsc(gf.GF(next_lo, next_hi), mesh, row_spec)
            zinv = gf.GF(zinv_lo, zinv_hi)
            cs = eval_fn(
                [gf.GF(local.lo[:, i], local.hi[:, i]) for i in range(local.shape[1])],
                [gf.GF(nxt.lo[:, i], nxt.hi[:, i]) for i in range(nxt.shape[1])],
            )
            acc = gf.zeros(local.lo.shape[:1])
            alpha = gf.full(local.lo.shape[:1], 7)  # placeholder alpha for dryrun
            for c in cs:
                acc = gf.add(gf.mul(acc, alpha), c)
            return gf.mul(acc, zinv)

        return step

    return make
