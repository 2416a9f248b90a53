"""Single-table CPU constraint tests: run a real program, build the CPU
trace, evaluate every constraint on the subgroup rows, expect all zeros
(the reference's per-table harness, circuits/src/test_utils.rs:20)."""

import numpy as np
import pytest

from olavm_tpu.tables.cpu import CpuStark, generate_cpu_trace, NUM_CPU_COLS
from olavm_tpu.stark.consumer import ConstraintConsumer
from olavm_tpu.stark.ops import BaseOps
from tests.test_executor import run_program


def eval_on_subgroup(stark, trace):
    """Evaluate constraints on all rows (next = roll); returns failure list."""
    n = trace.shape[1]
    local = list(trace)
    nxt = list(np.roll(trace, -1, axis=1))
    lagrange_first = np.zeros(n, dtype=np.uint64)
    lagrange_first[0] = 1
    lagrange_last = np.zeros(n, dtype=np.uint64)
    lagrange_last[-1] = 1
    z_last = np.ones(n, dtype=np.uint64)
    z_last[-1] = 0

    failures = []

    class Probe(ConstraintConsumer):
        def __init__(self):
            super().__init__(BaseOps, [np.uint64(1)], z_last, lagrange_first,
                             lagrange_last)
            self.idx = 0

        def constraint(self, c):
            bad = np.nonzero(np.asarray(c) != 0)[0]
            if len(bad):
                failures.append((self.idx, [int(b) for b in bad[:4]]))
            self.idx += 1

    stark.eval_packed(local, nxt, Probe())
    return failures


@pytest.mark.parametrize(
    "name,calldata",
    [
        ("memory.json", None),
        ("call.json", None),
        ("comparison.json", None),
        ("fibo_loop.json", [10, 1, 2, 1015130275]),
        ("fib_asm.json", [10, 1, 2, 4185064725]),
        ("malloc.json", None),
        ("sqrt_prophet_asm.json", [144, 10, 2, 3509365327]),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_cpu_constraints(name, calldata):
    _, program, _ = run_program(name, calldata)
    trace = generate_cpu_trace(program.trace.exec)
    assert trace.shape[0] == NUM_CPU_COLS
    failures = eval_on_subgroup(CpuStark(), trace)
    assert not failures, f"constraints failing: {failures[:10]}"


@pytest.mark.parametrize(
    "name,calldata",
    [
        ("memory.json", None),
        ("fibo_loop.json", [10, 1, 2, 1015130275]),
        ("fib_asm.json", [10, 1, 2, 4185064725]),
        ("malloc.json", None),
        ("sqrt_prophet_asm.json", [144, 10, 2, 3509365327]),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_memory_constraints(name, calldata):
    from olavm_tpu.tables.memory import MemoryStark, generate_memory_trace
    _, program, _ = run_program(name, calldata)
    trace = generate_memory_trace(program.trace.memory)
    failures = eval_on_subgroup(MemoryStark(), trace)
    assert not failures, f"constraints failing: {failures[:10]}"


def test_rangecheck_constraints():
    from olavm_tpu.tables.rangecheck import RangeCheckStark, generate_rc_trace
    _, program, _ = run_program("range_check.json", None)
    trace = generate_rc_trace(program.trace.builtin_rangecheck)
    assert trace.shape[1] >= 1 << 16
    failures = eval_on_subgroup(RangeCheckStark(), trace)
    assert not failures, failures[:5]


def test_cmp_constraints():
    from olavm_tpu.tables.cmp import CmpStark, generate_cmp_trace
    _, program, _ = run_program("comparison.json", None)
    trace = generate_cmp_trace(program.trace.builtin_cmp)
    failures = eval_on_subgroup(CmpStark(), trace)
    assert not failures, failures[:5]


def test_bitwise_constraints():
    from olavm_tpu.tables.bitwise import BitwiseStark, generate_bitwise_trace
    _, program, _ = run_program("bitwise.json", None)
    trace, beta = generate_bitwise_trace(program.trace.builtin_bitwise_combined)
    assert trace.shape[1] == 1 << 18
    stark = BitwiseStark()
    stark.compress_challenge = beta
    failures = eval_on_subgroup(stark, trace)
    assert not failures, failures[:5]


def test_poseidon_table_constraints():
    from olavm_tpu.tables.poseidon import PoseidonStark, generate_poseidon_trace
    _, program, _ = run_program("poseidon.json", None)
    trace = generate_poseidon_trace(program.trace.builtin_poseidon)
    failures = eval_on_subgroup(PoseidonStark(), trace)
    assert not failures, failures[:5]
