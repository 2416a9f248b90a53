from .opcodes import Opcode
from .instruction import Instruction, Operand
from .binary_program import BinaryProgram, Prophet

__all__ = ["Opcode", "Instruction", "Operand", "BinaryProgram", "Prophet"]
