"""Proof-system backends (reference L4, backend/)."""

from gnark_tpu.backend import groth16

__all__ = ["groth16"]
