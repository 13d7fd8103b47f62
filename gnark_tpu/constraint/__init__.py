"""Constraint IR + witness solver (reference L2/L3, constraint/)."""

from gnark_tpu.constraint.system import (
    ConstraintSystem, Instruction, R1C, SparseR1C,
)
from gnark_tpu.constraint.solver import Solution, SolverError, solve
from gnark_tpu.constraint.hints import register_hint, get_hint

__all__ = ["ConstraintSystem", "Instruction", "R1C", "SparseR1C",
           "Solution", "SolverError", "solve", "register_hint", "get_hint"]
