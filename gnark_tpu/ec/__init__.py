"""Elliptic-curve layer: registry, host oracle, device kernels.

  curves.py      — validated constants for the 5 gnark curves
  host.py        — pure-Python oracle (fields, affine ops, sqrt)
  fp2.py         — device Fp2 over gnark_tpu.ff.FF
  weierstrass.py — batched Jacobian add/double/mixed-add/normalize
"""

from gnark_tpu.ec.curves import CURVES, Curve
from gnark_tpu.ec.fp2 import FF2, get_ff2

__all__ = ["CURVES", "Curve", "FF2", "get_ff2"]
