"""Assembler tests: encode all reference test programs, round-trip decode."""

import glob
import json
import os

import pytest

from olavm_tpu.assembler.encoder import encode_asm_bundle, encode_asm_from_json_file
from olavm_tpu.isa.instruction import decode_to_asm, instruction_length
from olavm_tpu.isa.opcodes import Opcode

pytestmark = pytest.mark.smoke  # host-only: no jit, fast cold

ASM_DIR = "/root/reference/assembler/test_data/asm"

# These three use a legacy 2-operand `assert` form the reference assembler
# itself rejects (their e2e tests are commented out in
# circuits/src/stark/ola_stark.rs:729-731,814-816).
LEGACY = {"prophet_sqrt.json", "hand_write_prophet.json", "string_assert.json"}

ALL_PROGRAMS = [
    p
    for p in sorted(glob.glob(os.path.join(ASM_DIR, "*.json")))
    if os.path.basename(p) not in LEGACY
]


@pytest.mark.parametrize("path", ALL_PROGRAMS, ids=[os.path.basename(p) for p in ALL_PROGRAMS])
def test_encode_reference_programs(path):
    prog = encode_asm_from_json_file(path)
    words = prog.bytecode_u64()
    assert len(words) > 0
    # walk the bytecode: every instruction must decode
    pc = 0
    n_insts = 0
    while pc < len(words):
        length = instruction_length(words[pc])
        imm = words[pc + 1] if length == 2 else None
        text, step = decode_to_asm(words[pc], imm)
        assert step == length
        assert text
        pc += length
        n_insts += 1
    assert n_insts > 0


def test_simple_program_encoding():
    bundle = {
        "program": "main:\n.LBL0_0:\n  add r8 r8 2\n  mov r0 20\n  mov r1 5\n"
        "  add r0 r0 r1\n  end\n",
        "prophets": [],
    }
    prog = encode_asm_bundle(bundle)
    words = prog.bytecode_u64()
    # add r8 r8 2: opcode ADD(31), op0=r8(52+8), dst=r8(32+8), imm flag
    assert words[0] == (1 << 62) | (1 << 60) | (1 << 40) | (1 << 31)
    assert words[1] == 2
    text, step = decode_to_asm(words[0], words[1])
    assert text == "add r8 r8 2"
    # mov r0 20
    assert words[2] == (1 << 62) | (1 << 32) | (1 << 27)
    assert words[3] == 20
    # add r0 r0 r1 (1 word)
    assert words[6] == (1 << 52) | (1 << 43) | (1 << 32) | (1 << 31)
    # end
    assert words[7] == 1 << 20


def test_label_relocation_and_prophets():
    bundle = {
        "program": (
            "main:\n.LBL0_0:\n  add r8 r8 2\n  mov r7 r8\n  mov r8 psp\n"
            ".PROPHET0_0:\n  mload r1 [r8,1]\n  jmp .LBL0_1\n.LBL0_1:\n"
            "  call foo\n  end\nfoo:\n  ret\n"
        ),
        "prophets": [
            {
                "label": ".PROPHET0_0",
                "code": "%{ entry() { } %}",
                "inputs": [],
                "outputs": [],
            }
        ],
    }
    prog = encode_asm_bundle(bundle)
    words = prog.bytecode_u64()
    # prophet attaches to pc of instruction BEFORE the mload (mov r8 psp @ pc 3)
    assert len(prog.prophets) == 1
    assert prog.prophets[0].host == 3
    # layout: add(2) mov(2, imm? no -> mov r7 r8 is 1 word)...
    # pcs: add=0(len2), mov r7 r8=2(len1), mov r8 psp=3(len1), mload=4(len2),
    # jmp=6(len2), call=8(len2), end=10(len1), ret=11
    text, _ = decode_to_asm(words[6], words[7])
    assert text == "jmp 8"  # .LBL0_1 -> pc of call
    text, _ = decode_to_asm(words[8], words[9])
    assert text == "call 11"  # foo -> pc of ret


def test_mstore_mload_forms():
    bundle = {
        "program": (
            "main:\n  mstore [r9,-1] r0\n  mload r1 [r9,-2]\n"
            "  mload r2 [r8,r1,3]\n  mstore [r7,r2] r3\n  end\n"
        ),
        "prophets": [],
    }
    prog = encode_asm_bundle(bundle)
    words = prog.bytecode_u64()
    from olavm_tpu.field import goldilocks as g

    # mstore [r9,-1] r0: op0=r9, op1=imm -1 (p-1), dst=r0, imm flag set
    text, _ = decode_to_asm(words[0], words[1])
    assert text == f"mstore r9 {g.P - 1} r0"
    assert words[1] == g.P - 1
    text, _ = decode_to_asm(words[2], words[3])
    assert text == f"mload r1 r9 {g.P - 2}"
    # factored: mload r2 [r8,r1,3]: op0=r8 anchor, op1=r1 with factor 3
    text, _ = decode_to_asm(words[4], words[5])
    assert text == "mload r2 r8 r1 3"
    assert words[5] == 3
    # [r7,r2] -> factor 1
    text, _ = decode_to_asm(words[6], words[7])
    assert text == "mstore r7 r2 1 r3"
