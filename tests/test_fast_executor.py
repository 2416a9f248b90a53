"""Fast (native SoA) pipeline vs the row-based Python pipeline: the 12 table
matrices must match bit-for-bit (fast_executor.py + fast_gen.py vs
process.py + tables/*.generate_*)."""

import numpy as np
import pytest

from olavm_tpu.runtime import fast_executor as fx
from olavm_tpu.runtime.harness import run_program_fast, run_program_full
from olavm_tpu.tables.fast_gen import generate_traces_fast
from olavm_tpu.tables.ola_stark import OlaStark, generate_traces

TABLE_NAMES = [
    "cpu", "memory", "bitwise", "cmp", "rangecheck", "poseidon",
    "poseidon_chunk", "storage_access", "tape", "sccall", "program",
    "prog_chunk",
]

FIB = "/root/reference/assembler/test_data/asm/fib_asm.json"
SQRT = "/root/reference/circuits/benches/asm/sqrt_prophet_asm.json"

pytestmark = [
    pytest.mark.skipif(not fx.available,
                       reason="native gl_executor unavailable"),
    pytest.mark.smoke,  # host-only: no jit, fast cold
]


@pytest.mark.parametrize(
    "asm,calldata",
    [
        (FIB, [47, 5, 2, 4185064725]),
        (SQRT, [1073741824, 5, 2, 3509365327]),
    ],
    ids=["fib", "sqrt_prophet"],
)
def test_fast_traces_match_slow(asm, calldata):
    fast_run, fproc, fprog, _ = run_program_fast(asm, list(calldata))
    ola_f = OlaStark()
    traces_f = generate_traces_fast(fast_run, fprog, ola_f, fproc)

    sproc, sprog, _ = run_program_full(asm, list(calldata))
    ola_s = OlaStark()
    traces_s = generate_traces(sprog, ola_s)

    assert ola_f.bitwise_stark.compress_challenge == \
        ola_s.bitwise_stark.compress_challenge
    assert ola_f.program_stark.compress_challenge == \
        ola_s.program_stark.compress_challenge
    for name, tf, ts in zip(TABLE_NAMES, traces_f, traces_s):
        assert tf.shape == ts.shape, f"{name}: {tf.shape} != {ts.shape}"
        if not np.array_equal(tf, ts):
            bad = np.argwhere(tf != ts)
            col, row = bad[0]
            raise AssertionError(
                f"{name}: {len(bad)} mismatches, first at col {col} row "
                f"{row}: fast={tf[col, row]} slow={ts[col, row]}"
            )
