from gnark_tpu.msm.pippenger import msm, window_digits

__all__ = ["msm", "window_digits"]
