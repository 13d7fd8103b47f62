"""Finite-field limb arithmetic for TPU.

The TPU equivalent of gnark-crypto's generated field assembly
(SURVEY.md §2.1 L0): batched multi-limb Montgomery arithmetic over
uint32 lanes, shaped (..., nlimbs), traced/jitted with JAX.
"""

from gnark_tpu.ff.mont import FF, get_ff

__all__ = ["FF", "get_ff"]
