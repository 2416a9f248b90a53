"""Proof byte serialization round-trip + CLI stage plumbing."""

import os

import numpy as np

from olavm_tpu.stark.config import StarkConfig
from olavm_tpu.stark.prover import prove_with_traces
from olavm_tpu.stark.serialization import (
    deserialize_all_proof,
    serialize_all_proof,
)
from olavm_tpu.stark.verifier import verify_proof

from tests.test_stark_framework import ToySystem, build_traces
import pytest

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold


def test_proof_roundtrip_bytes():
    system = ToySystem()
    config = StarkConfig.standard_fast_config()
    proof = prove_with_traces(system, config, build_traces(32))
    data = serialize_all_proof(proof)
    assert isinstance(data, bytes) and len(data) > 1000
    proof2 = deserialize_all_proof(data)
    # identical bytes when re-serialized
    assert serialize_all_proof(proof2) == data
    verify_proof(system, proof2, config)


def test_trace_json_roundtrip():
    from olavm_tpu.runtime.harness import run_program_full
    from olavm_tpu.runtime.trace_io import trace_from_json, trace_to_json

    asm = "/root/reference/assembler/test_data/asm/memory.json"
    _, program, _ = run_program_full(asm)
    s = trace_to_json(program.trace)
    t2 = trace_from_json(s)
    assert trace_to_json(t2) == s
    assert len(t2.exec) == len(program.trace.exec)
    assert len(t2.memory) == len(program.trace.memory)


def test_cli_pipeline(tmp_path):
    from olavm_tpu.cli.main import main

    asm_src = "/root/reference/assembler/test_data/asm/fibo_loop.json"
    binp = str(tmp_path / "fib_bin.json")
    tracep = str(tmp_path / "fib_trace.json")
    proofp = str(tmp_path / "fib.proof")
    argsp = str(tmp_path / "calldata.txt")
    with open(argsp, "w") as f:
        f.write("\n".join(map(str, [5, 1, 2, 1015130275])))

    main(["asm", "-i", asm_src, "-o", binp])
    assert os.path.exists(binp)
    main(["run", "-i", binp, "-a", argsp, "-o", tracep])
    assert os.path.exists(tracep)
    main(["prove", "-i", tracep, "-o", proofp])
    assert os.path.getsize(proofp) > 10000
    main(["verify", "-i", proofp])
