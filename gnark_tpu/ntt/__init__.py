from gnark_tpu.ntt.domain import Domain

__all__ = ["Domain"]
