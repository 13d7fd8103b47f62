from gnark_tpu.pairing.tate import Pairing, get_pairing

__all__ = ["Pairing", "get_pairing"]
