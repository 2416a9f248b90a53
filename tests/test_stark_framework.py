"""End-to-end framework test with a toy 2-table system: a Fibonacci table and
a copy table bound by a cross-table lookup, plus an in-table permutation
argument. Exercises commit, CTL Zs, permutation Zs, quotient, FRI, and full
verification — the same machinery the 12 OlaVM tables use."""

import numpy as np
import pytest

from olavm_tpu.field import goldilocks as g
from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.cross_table_lookup import (
    Column,
    CrossTableLookup,
    TableWithColumns,
)
from olavm_tpu.stark.prover import prove_with_traces
from olavm_tpu.stark.stark_base import PermutationPair, Stark
from olavm_tpu.stark.verifier import VerificationError, verify_proof


class FibStark(Stark):
    """Columns: [a, b, c, c_rev]; a'=b, b'=a+b; c_rev is a permutation of c."""

    COLUMNS = 4

    def eval_packed(self, local, nxt, consumer):
        F = consumer.F
        consumer.constraint_first_row(F.sub(local[0], F.constant(1)))
        consumer.constraint_first_row(F.sub(local[1], F.constant(1)))
        consumer.constraint_transition(F.sub(nxt[0], local[1]))
        consumer.constraint_transition(F.sub(nxt[1], F.add(local[0], local[1])))

    def constraint_degree(self):
        return 3

    def permutation_pairs(self):
        return [PermutationPair.singletons(2, 3)]


class CopyStark(Stark):
    """Single column, no constraints of its own (CTL-bound to FibStark.a)."""

    COLUMNS = 1

    def eval_packed(self, local, nxt, consumer):
        pass

    def constraint_degree(self):
        return 3


class ToySystem:
    def __init__(self):
        self.starks = [FibStark(), CopyStark()]
        self.cross_table_lookups = [
            CrossTableLookup(
                looking_tables=[
                    TableWithColumns(0, [Column.single(0)], None)
                ],
                looked_table=TableWithColumns(1, [Column.single(0)], None),
            )
        ]

    def compress_challenges(self):
        return [0, 0]


def build_traces(n=32):
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    a[0], b[0] = 1, 1
    for i in range(1, n):
        a[i] = b[i - 1]
        b[i] = g.add(int(a[i - 1]), int(b[i - 1]))
    rng = np.random.RandomState(0)
    c = rng.randint(0, 1 << 32, size=n).astype(np.uint64)
    c_rev = c[::-1].copy()
    fib_trace = np.stack([a, b, c, c_rev])
    copy_trace = a.copy().reshape(1, n)
    return [fib_trace, copy_trace]


def test_prove_and_verify_roundtrip():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(32)
    proof = prove_with_traces(system, config, traces)
    verify_proof(system, proof, config)  # should not raise


def test_tampered_proof_fails():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(32)
    proof = prove_with_traces(system, config, traces)
    # corrupt an opened value
    proof.stark_proofs[0].openings.local_values[0][0] ^= np.uint64(1)
    with pytest.raises((VerificationError, ValueError)):
        verify_proof(system, proof, config)


def test_bad_trace_caught_by_debug_check():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(32)
    traces[0][1][5] = 12345  # break the fibonacci recurrence
    with pytest.raises(ValueError, match="constraint"):
        prove_with_traces(system, config, traces, debug_check=True)


def test_bad_trace_proof_fails_verification():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(32)
    traces[0][1][5] = 12345
    proof = prove_with_traces(system, config, traces)
    with pytest.raises((VerificationError, ValueError)):
        verify_proof(system, proof, config)
