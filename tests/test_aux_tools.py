"""Auxiliary subsystems: crash dumps + trace analyzer (SURVEY.md §5)."""

import json
import os

import pytest

from olavm_tpu.runtime.harness import run_program_full

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold

ASM_DIR = "/root/reference/assembler/test_data/asm"


def test_crash_dump_on_failure(tmp_path):
    dump_path = str(tmp_path / "crash.dump.json")
    # fibo_loop without calldata -> tape visit error mid-run -> dump
    with pytest.raises(Exception):
        run_program_full(
            f"{ASM_DIR}/fibo_loop.json", None, dump_on_failure=dump_path
        )
    assert os.path.exists(dump_path)
    from olavm_tpu.runtime.dump import load_dump_file

    dump = load_dump_file(dump_path)
    assert dump["error"]
    assert isinstance(dump["registers"], list) and len(dump["registers"]) == 10
    assert "exec" in dump and "memory" in dump


def test_trace_analyzer_dump(tmp_path):
    from olavm_tpu.utils.trace_analyzer import dump_trace, trace_to_frames

    _, program, _ = run_program_full(f"{ASM_DIR}/memory.json")
    frames = trace_to_frames(program.trace)
    assert frames["exec"].shape[0] == len(program.trace.exec)
    assert "regs[0]" in frames["exec"].columns
    written = dump_trace(program.trace, str(tmp_path / "tables"), fmt="csv")
    assert len(written) == 12
    for p in written:
        assert os.path.getsize(p) >= 0
