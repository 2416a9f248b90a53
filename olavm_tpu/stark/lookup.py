"""Halo2-style in-table lookups (circuits/src/stark/lookup.rs)."""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as g


def permuted_cols(inputs: np.ndarray, table: np.ndarray):
    """Generate (sorted_inputs, permuted_table) per lookup.rs:69-134."""
    n = len(inputs)
    sorted_inputs = np.sort(np.asarray(inputs, dtype=np.uint64), kind="stable")
    sorted_table = np.sort(np.asarray(table, dtype=np.uint64), kind="stable")
    permuted_table = np.zeros(n, dtype=np.uint64)
    unused_inds: list[int] = []
    unused_vals: list[int] = []
    i = j = 0
    while i < n and j < n:
        iv = sorted_inputs[i]
        tv = sorted_table[j]
        if iv > tv:
            unused_vals.append(tv)
            j += 1
        elif iv < tv:
            if unused_vals:
                permuted_table[i] = unused_vals.pop()
            else:
                unused_inds.append(i)
            i += 1
        else:
            permuted_table[i] = tv
            i += 1
            j += 1
    for jj in range(j, n):
        unused_vals.append(sorted_table[jj])
    for ii in range(i, n):
        unused_inds.append(ii)
    assert len(unused_inds) == len(unused_vals)
    for ind, val in zip(unused_inds, unused_vals):
        permuted_table[ind] = val
    return sorted_inputs, permuted_table


def eval_lookups(local, nxt, consumer, col_permuted_input, col_permuted_table):
    """Lookup constraints (lookup.rs:13-34)."""
    F = consumer.F
    diff_input_prev = F.sub(nxt[col_permuted_input], local[col_permuted_input])
    diff_input_table = F.sub(nxt[col_permuted_input], nxt[col_permuted_table])
    consumer.constraint(F.mul(diff_input_prev, diff_input_table))
    consumer.constraint_last_row(diff_input_table)
