from gnark_tpu.parallel.sharded import msm_sharded, ntt_batch_sharded

__all__ = ["msm_sharded", "ntt_batch_sharded"]
