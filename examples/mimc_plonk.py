"""Prove knowledge of a MiMC preimage with PLONK (reference
examples/mimc + examples/plonk).

Run: python examples/mimc_plonk.py
"""

import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import kzg, plonk
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.std.hash.mimc import MiMCGadget, mimc_hash


class MimcPre(Circuit):
    pre: Secret
    h: Public

    def define(self, api):
        g = MiMCGadget(api)
        g.write(self.pre)
        api.assert_is_equal(g.sum(), self.h)


def main():
    cs = compile_circuit(MimcPre(), fields.BN254_FR, builder_cls=SCSBuilder)
    print("compiled:", cs.summary())
    srs = kzg.setup_srs("bn254", 2048, rng=random.Random(0))
    pk, vk = plonk.setup(cs, srs)
    pre = 0xDEADBEEF
    pub, sec = witness(MimcPre(pre=pre, h=mimc_hash([pre])), cs)
    proof = plonk.prove(cs, pk, pub, sec)
    ok = plonk.verify(proof, vk, pub)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main()
