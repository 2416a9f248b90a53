"""Multi-chip sharding for the proving pipeline (shard_map + explicit
collectives).

The reference is a single-process rayon system (SURVEY.md §2.7); its
parallelism maps onto a TPU mesh as:

- *columns* of a trace table are independent through IFFT + coset-LDE
  (the rayon per-polynomial loops in plonky2/plonky2/src/fri/oracle.rs:56-128)
  -> shard the column axis ("tensor parallel" analogue).
- *rows* (LDE points / Merkle leaves) are independent through leaf hashing
  and within-subtree Merkle reduction
  (plonky2/plonky2/src/hash/merkle_tree/mod.rs:146-228)
  -> shard the leaf axis ("data parallel" analogue). Leaves are laid out in
  bit-reversed order, so a contiguous shard of leaves IS a subtree: each
  device reduces its own subtree locally and only the tiny cap level is
  all-gathered.
- the column->row handoff between the two phases is ONE all-to-all on ICI
  (the distributed transpose at the NTT boundary).
- quotient evaluation over coset points (circuits/src/stark/prover.rs:571-660)
  is elementwise over rows -> row-block sharding, no communication.

Everything here is pure jnp on two-limb GF arrays and works both on a real
TPU slice and on the N-virtual-device CPU mesh used in tests. shard_map is
used instead of GSPMD sharding constraints so the per-shard program compiles
once without the partitioner search (much faster XLA compiles, identical
collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
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
        c = 1 << ((n_devices.bit_length() - 1) // 2)
        while n_devices % c:
            c >>= 1
        shape = (c, n_devices // c)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def commit_fn(mesh: Mesh, num_cols: int, degree_bits: int, rate_bits: int,
              cap_height: int):
    """Returns a jittable sharded commit step:
    (lo, hi) of shape (num_cols, 2^degree_bits) trace VALUES ->
    (cap_lo, cap_hi) of shape (2^cap_height, 4), plus the bit-reversed
    leaves (row-sharded) for downstream quotient evaluation.

    Pipeline per device: local IFFT + coset-LDE over its column shard,
    local bit-reversal, ONE all-to-all transpose to row shards, local leaf
    hashing, local subtree Merkle reduction, all-gather of the cap.
    """
    n_dev = mesh.size
    axes = tuple(mesh.axis_names)
    lde_bits = degree_bits + rate_bits
    lde_n = 1 << lde_bits
    assert num_cols % n_dev == 0, "pad columns to a multiple of the mesh size"
    assert cap_height >= log2_strict(n_dev), (
        "cap must be at least one entry per device subtree"
    )
    assert lde_bits - log2_strict(n_dev) >= cap_height - log2_strict(n_dev)
    perm = jnp.asarray(bit_reversal_perm(lde_n))
    # per-shard subtree: lde_n/n_dev leaves -> reduce to cap entries owned
    # by this shard (2^cap_height / n_dev of them)
    local_levels = (lde_bits - log2_strict(n_dev)) - (
        cap_height - log2_strict(n_dev)
    )

    def shard_step(lo, hi):
        # (num_cols/n_dev, n) local columns
        x = gf.GF(lo, hi)
        coeffs = dntt.intt(x)
        lde = dntt.coset_lde(coeffs, rate_bits)          # (C/D, lde_n)
        lde = gf.GF(
            jnp.take(lde.lo, perm, axis=-1), jnp.take(lde.hi, perm, axis=-1)
        )
        # distributed transpose: split the (bit-reversed) row axis across
        # devices, gather all columns -> (C, lde_n/D) then to rows
        t_lo = jax.lax.all_to_all(lde.lo, axes, split_axis=1, concat_axis=0,
                                  tiled=True)
        t_hi = jax.lax.all_to_all(lde.hi, axes, split_axis=1, concat_axis=0,
                                  tiled=True)
        leaves = gf.GF(t_lo.T, t_hi.T)                   # (lde_n/D, C)
        digests = merkle.hash_leaves_gf(leaves)          # 4 lanes (lde_n/D,)
        for _ in range(local_levels):
            digests = merkle._compress_level(digests)
        # (cap/D,) per lane -> all-gather the cap, replicated on all devices
        cap_lo = jnp.stack([d.lo for d in digests], axis=-1)  # (cap/D, 4)
        cap_hi = jnp.stack([d.hi for d in digests], axis=-1)
        cap_lo = jax.lax.all_gather(cap_lo, axes, axis=0, tiled=True)
        cap_hi = jax.lax.all_gather(cap_hi, axes, axis=0, tiled=True)
        return cap_lo, cap_hi, t_lo.T, t_hi.T

    col_spec = P(axes, None)
    row_spec = P(axes, None)
    fn = shard_map(
        shard_step, mesh=mesh,
        in_specs=(col_spec, col_spec),
        out_specs=(P(), P(), row_spec, row_spec),
        check_rep=False,
    )
    return fn


def quotient_eval_fn(mesh: Mesh, eval_fn):
    """Row-block-sharded constraint evaluation over coset points: applies a
    vectorized AIR `eval_fn(local_cols, next_cols) -> list[GF]` to row-sharded
    (R, C) windows and folds with a fixed alpha, multiplying by the Z_H
    inverse column. Purely local per shard (no collectives)."""
    axes = tuple(mesh.axis_names)
    spec = P(axes, None)
    vec_spec = P(axes)

    def shard_step(local_lo, local_hi, next_lo, next_hi, zinv_lo, zinv_hi):
        local = gf.GF(local_lo, local_hi)
        nxt = gf.GF(next_lo, next_hi)
        zinv = gf.GF(zinv_lo, zinv_hi)
        cs = eval_fn(
            [gf.GF(local.lo[:, i], local.hi[:, i]) for i in range(local.lo.shape[1])],
            [gf.GF(nxt.lo[:, i], nxt.hi[:, i]) for i in range(nxt.lo.shape[1])],
        )
        acc = gf.zeros(local.lo.shape[:1])
        alpha = gf.full(local.lo.shape[:1], 7)  # fixed alpha for the dryrun
        for c in cs:
            acc = gf.add(gf.mul(acc, alpha), c)
        out = gf.mul(acc, zinv)
        return out.lo, out.hi

    return shard_map(
        shard_step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, vec_spec, vec_spec),
        out_specs=(vec_spec, vec_spec),
        check_rep=False,
    )
