"""Device prover vs host prover: same transcript => byte-identical proofs.

VERDICT round 2 weak #2: prover_device.py had no test coverage and its first
end-to-end exercise was the 2^20 bench on real hardware (it OOMed). This
test runs the FULL device pipeline (streamed commit, device quotient on the
small coset, device Z polys, device FRI) on the CPU backend at tiny degree
in the DEFAULT suite, asserting the serialized device proof byte-equals the
host proof and verifies.

Reference transcript being matched: circuits/src/stark/prover.rs:79-150.
"""

import numpy as np
import pytest

from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.prover import prove_with_traces
from olavm_tpu.stark.prover_device import prove_with_traces_device
from olavm_tpu.stark.serialization import serialize_all_proof
from olavm_tpu.stark.verifier import verify_proof

from test_stark_framework import ToySystem, build_traces


def test_device_proof_byte_equals_host():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    traces = build_traces(64)
    host_proof = prove_with_traces(system, config, traces)
    dev_proof = prove_with_traces_device(system, config, traces)
    verify_proof(system, dev_proof, config)
    assert serialize_all_proof(dev_proof) == serialize_all_proof(host_proof)


@pytest.mark.slow
def test_device_proof_full_olavm_byte_equals_host():
    """All 12 real tables (incl. permutation-arg tables) through the device
    prover at tiny degree; byte-equal vs host and verifies."""
    from olavm_tpu.runtime.harness import run_program_full
    from olavm_tpu.stark.proof import PublicValues
    from olavm_tpu.tables.ola_stark import OlaStark, generate_traces

    process, program, tree = run_program_full(
        "/root/reference/assembler/test_data/asm/fib_asm.json",
        [10, 1, 2, 4185064725],
    )
    ola = OlaStark()
    traces = generate_traces(program, ola)
    config = StarkConfig.standard_fast_config()
    pre, post = program.trace.start_end_roots
    pv = PublicValues(tuple(pre), tuple(post), 0)
    host_proof = prove_with_traces(ola, config, traces, public_values=pv)
    dev_proof = prove_with_traces_device(ola, config, traces,
                                         public_values=pv)
    verify_proof(ola, dev_proof, config)
    assert serialize_all_proof(dev_proof) == serialize_all_proof(host_proof)
