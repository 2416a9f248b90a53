"""Device-side grand products: CTL Z polynomials and permutation-argument Z
polynomials (circuits/src/stark/cross_table_lookup.rs:224-311,
permutation.rs:103-160) as log-depth prefix scans on the accelerator.

The sequential cumprod the reference computes row-by-row becomes
jax.lax.associative_scan over GF lanes; filters become selects. Challenges
are passed as device scalars (traced arguments), so the compiled programs are
reused across proves with different Fiat-Shamir outcomes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gf
from ..field import goldilocks as g
from .cross_table_lookup import Column, CtlData, CtlZData

from .oracle_device import _jit  # shared cache + OLAVM_SYNC_EVERY_JIT debug


@dataclass(frozen=True)
class DevChallenge:
    """GrandProductChallenge with device-scalar beta/gamma ((,) GF).

    combine_ops mirrors GrandProductChallenge.combine_ops but multiplies by
    the traced scalar instead of baking a host int into the graph, and
    evaluates sum_i t_i beta^i with a log-depth power table + tree sum: the
    sequential Horner builds a terms-deep chained-mul graph and XLA compile
    explodes past ~30 chained muls (round-4 finding; the 24-column
    poseidon-chunk CTL view was the trigger). Exact arithmetic — identical
    values to the reference Horner (cross_table_lookup.rs combine).
    """

    beta: gf.GF
    gamma: gf.GF

    def combine_ops(self, F, terms: list):
        from .consumer import _alpha_powers, _tree_sum

        if not terms:
            return self.gamma
        pw = _alpha_powers(F, self.beta, len(terms) - 1)
        scaled = [t if i == 0 else F.mul(t, pw[i])
                  for i, t in enumerate(terms)]
        return F.add(_tree_sum(F, scaled), self.gamma)


def _column_eval_gf(col: Column, trace: gf.GF) -> gf.GF:
    """Column linear-combination over a device (C, N) table -> (N,)."""
    from .ops import GfOps

    n = trace.shape[1]
    acc = gf.full((n,), col.constant % g.P)
    for c, k in col.linear_combination:
        acc = gf.add(acc, GfOps.scalar_mul(trace[c], k))
    return acc


def ctl_z_device(trace: gf.GF, columns: list[Column], filter_column,
                 beta_gamma: gf.GF) -> gf.GF:
    """Inclusive prefix product of filtered combined rows (the device
    partial_products). beta_gamma: (2,) GF scalar bank [beta, gamma]."""
    n = trace.shape[1]
    beta = beta_gamma[0]
    gamma = beta_gamma[1]
    if filter_column is not None:
        filt = _column_eval_gf(filter_column, trace)
    else:
        filt = gf.ones((n,))
    evals = [_column_eval_gf(col, trace) for col in columns]
    # sum_i evals[i] * beta^i + gamma via DevChallenge (log-depth — a
    # sequential Horner over 24-column views explodes XLA compile time)
    from .ops import GfOps

    combined = DevChallenge(beta, gamma).combine_ops(GfOps, evals)
    is_one = gf.eq(filt, gf.ones((n,)))
    terms = gf.select(is_one, combined, gf.ones((n,)))
    return gf.prefix_prod(terms)


def ctl_data_device(config, values_dev: list[gf.GF], cross_table_lookups,
                    challenger, check_filters: bool = False):
    """Device cross_table_lookup_data: returns (per-table CtlData with
    DEVICE z arrays, per-table list of host z-last ints).

    Consumes CTL challenges from the challenger exactly like the host path
    (cross_table_lookup.rs:224-282), verifies looking/looked product
    equality on host scalars.
    """
    from .stark_base import get_grand_product_challenge_set

    challenges = get_grand_product_challenge_set(
        challenger, config.num_challenges
    )
    num_tables = len(values_dev)
    ctl_data_per_table = [CtlData() for _ in range(num_tables)]

    # one jitted z computation per (table, ctl-view) structure; challenges
    # passed as a (2,) device bank so the graphs cache across proves
    def make_fn(columns, filter_column, shape):
        def fn(lo, hi, bg_lo, bg_hi):
            z = ctl_z_device(gf.GF(lo, hi), columns, filter_column,
                             gf.GF(bg_lo, bg_hi))
            return z.lo, z.hi

        return fn

    pending = []  # (ctl_idx, challenge, table, z GF) in append order
    for ctl_idx, ctl in enumerate(cross_table_lookups):
        for challenge in challenges:
            bg = gf.from_u64(
                np.array([challenge.beta, challenge.gamma], dtype=np.uint64)
            )
            for t in list(ctl.looking_tables) + [ctl.looked_table]:
                trace = values_dev[t.table]
                # key by column STRUCTURE, not view identity: views with the
                # same (columns, filter) on same-shape traces share one
                # compiled scan (cuts the z-graph count across 19 CTLs)
                sig = (
                    tuple((tuple(c.linear_combination), c.constant)
                          for c in t.columns),
                    (tuple(t.filter_column.linear_combination),
                     t.filter_column.constant)
                    if t.filter_column is not None else None,
                )
                key = ("ctlz", sig, trace.shape)
                fn = _jit(key, make_fn(t.columns, t.filter_column, trace.shape))
                z_lo, z_hi = fn(trace.lo, trace.hi, bg.lo, bg.hi)
                z = gf.GF(z_lo, z_hi)
                pending.append((ctl_idx, challenge, t, z))

    # pull all z-last values in one batch (tiny D2H)
    import jax.numpy as jnp

    lasts = np.asarray(
        jnp.stack([z.lo[-1] for (_, _, _, z) in pending]
                  + [z.hi[-1] for (_, _, _, z) in pending])
    ).astype(np.uint64)
    k = len(pending)
    z_last_host = lasts[:k] | (lasts[k:] << np.uint64(32))

    # product check + distribution, mirroring host order
    i = 0
    for ctl_idx, ctl in enumerate(cross_table_lookups):
        for challenge in challenges:
            group = pending[i : i + len(ctl.looking_tables) + 1]
            zl = z_last_host[i : i + len(ctl.looking_tables) + 1]
            i += len(group)
            prod_looking = 1
            for v in zl[:-1]:
                prod_looking = g.mul(prod_looking, int(v))
            if prod_looking != int(zl[-1]):
                raise AssertionError(
                    f"CTL #{ctl_idx} product mismatch (trace inconsistency)"
                )
            for (_, chal, t, z), vlast in zip(group, zl):
                ctl_data_per_table[t.table].zs_columns.append(
                    CtlZData(z, chal, t.columns, t.filter_column)
                )
    return ctl_data_per_table


def permutation_z_polys_device(stark, config, trace: gf.GF,
                               challenge_sets) -> list[gf.GF]:
    """Device compute_permutation_z_polys (permutation.rs:103): per batch,
    Z = exclusive-prefix-prod of (num/den) over rows. Challenges arrive as a
    device bank so the graph caches across proves."""
    from .stark_base import get_permutation_batches

    pairs = stark.permutation_pairs()
    if not pairs:
        return []
    batches = get_permutation_batches(
        pairs, challenge_sets, config.num_challenges,
        stark.permutation_batch_size(),
    )
    n = trace.shape[1]

    def z_fn(lo, hi, bank_lo, bank_hi, instance_meta):
        # instance_meta is static: list of (column_pairs, bank_index)
        x = gf.GF(lo, hi)
        num = gf.ones((n,))
        den = gf.ones((n,))
        for (column_pairs, bi) in instance_meta:
            beta = gf.GF(bank_lo[2 * bi], bank_hi[2 * bi])
            gamma = gf.GF(bank_lo[2 * bi + 1], bank_hi[2 * bi + 1])
            lhs = gf.GF(jnp_broadcast(gamma.lo, n), jnp_broadcast(gamma.hi, n))
            rhs = lhs
            w = gf.ones(())
            for (a, b) in column_pairs:
                lhs = gf.add(lhs, gf.mul(x[a], w))
                rhs = gf.add(rhs, gf.mul(x[b], w))
                w = gf.mul(w, beta)
            num = gf.mul(num, lhs)
            den = gf.mul(den, rhs)
        q = gf.mul(num, gf.inv(den))
        zfull = gf.prefix_prod(q)
        # exclusive: [1, q0, q0q1, ...]
        z = gf.concatenate([gf.ones((1,)), zfull[:-1]])
        return z.lo, z.hi

    import jax.numpy as jnp

    def jnp_broadcast(v, n):
        return jnp.broadcast_to(v, (n,))

    # flatten the challenge bank: for each batch, instances reference
    # (pair, challenge) — we bank all distinct challenges once
    chal_list = []
    chal_index = {}
    for cs in challenge_sets:
        for c in cs:
            if id(c) not in chal_index:
                chal_index[id(c)] = len(chal_list)
                chal_list.append(c)
    bank = np.zeros(2 * len(chal_list), dtype=np.uint64)
    for i, c in enumerate(chal_list):
        bank[2 * i] = c.beta
        bank[2 * i + 1] = c.gamma
    bank_gf = gf.from_u64(bank)

    out = []
    for bidx, instances in enumerate(batches):
        meta = tuple(
            (tuple(pair.column_pairs), chal_index[id(chal)])
            for pair, chal in instances
        )
        key = ("permz", type(stark).__name__, trace.shape, bidx, meta)
        fn = _jit(key, lambda lo, hi, bl, bh, m=meta: z_fn(lo, hi, bl, bh, m))
        z_lo, z_hi = fn(trace.lo, trace.hi, bank_gf.lo, bank_gf.hi)
        out.append(gf.GF(z_lo, z_hi))
    return out
