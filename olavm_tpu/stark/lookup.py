"""Halo2-style in-table lookups (circuits/src/stark/lookup.rs)."""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as g


def permuted_cols(inputs: np.ndarray, table: np.ndarray):
    """Generate (sorted_inputs, permuted_table) for the halo2-style lookup
    (reference algorithm: lookup.rs:69-134).

    Vectorized construction: where the sorted input introduces a new value,
    the permuted table carries that value (consuming one copy from the table
    multiset); the remaining slots take the leftover table values. The
    leftover placement order differs from the reference's stack-based fill,
    but any placement satisfies the lookup constraints and the permutation
    argument (permuted_table is a permutation of table; at every row where
    the input value changes, permuted_table == sorted_input).
    """
    n = len(inputs)
    si = np.sort(np.asarray(inputs, dtype=np.uint64), kind="stable")
    st = np.sort(np.asarray(table, dtype=np.uint64), kind="stable")
    mask_new = np.empty(n, dtype=bool)
    mask_new[0] = True
    mask_new[1:] = si[1:] != si[:-1]
    needed = si[mask_new]
    # first occurrence of each needed value in the sorted table
    pos = np.searchsorted(st, needed)
    if np.any(pos >= n) or np.any(st[np.minimum(pos, n - 1)] != needed):
        raise ValueError("lookup input value not present in table")
    used = np.zeros(n, dtype=bool)
    used[pos] = True
    leftovers = st[~used]
    permuted_table = np.empty(n, dtype=np.uint64)
    permuted_table[mask_new] = needed
    permuted_table[~mask_new] = leftovers
    return si, permuted_table


def eval_lookups(local, nxt, consumer, col_permuted_input, col_permuted_table):
    """Lookup constraints (lookup.rs:13-34)."""
    F = consumer.F
    diff_input_prev = F.sub(nxt[col_permuted_input], local[col_permuted_input])
    diff_input_table = F.sub(nxt[col_permuted_input], nxt[col_permuted_table])
    consumer.constraint(F.mul(diff_input_prev, diff_input_table))
    consumer.constraint_last_row(diff_input_table)
