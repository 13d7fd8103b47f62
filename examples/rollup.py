"""Mini-rollup: a batch of EdDSA-signed transfers over a Merkle account
tree, proven with Groth16 (the reference's flagship example,
examples/rollup: signature check + balance check + two Merkle updates
per transfer, root chained across the batch).

Run: python examples/rollup.py
"""

import os
import random
import sys

sys.path.insert(0, ".")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, \
    witness
from gnark_tpu.std.hash.mimc import mimc_hash
from gnark_tpu.std.signature import eddsa

# BASELINE config #4's first rung: scale with ROLLUP_DEPTH/ROLLUP_TXS
# (depth 8 x 16 txs ~ 2^16+ constraints; reference examples/rollup)
DEPTH = int(os.environ.get("ROLLUP_DEPTH", "2"))
NB_TX = int(os.environ.get("ROLLUP_TXS", "1"))
Q = fields.BN254_FR.modulus


# -- host-side state ----------------------------------------------------------

class Account:
    """Keys are derived LAZILY: at depth 16 the batch has 65k
    accounts but only the transfer participants ever sign."""

    def __init__(self, seed: bytes, balance: int):
        self._seed = seed
        self._kp = None
        self.balance = balance
        self.nonce = 0

    def ensure_key(self):
        """Derive the real keypair (participants must call this
        BEFORE the tree is built so their leaf commits to the real
        public key)."""
        if self._kp is None:
            self._kp = eddsa.keygen(self._seed)

    @property
    def key(self):
        self.ensure_key()
        return self._kp[0]

    @property
    def pub(self):
        if self._kp is None:
            # non-participants appear only as sibling hashes: a cheap
            # deterministic surrogate stands in for the (expensive)
            # real public key — ~7ms/keygen x 65k accounts otherwise
            sd = int.from_bytes(self._seed, "big")
            return (mimc_hash([sd, 1]), mimc_hash([sd, 2]))
        return self._kp[1]

    def leaf(self) -> int:
        return mimc_hash([self.pub[0], self.pub[1],
                          self.balance, self.nonce])


class MerkleTree:
    """Incremental tree: O(n) build once, O(depth) path/update (the
    per-transfer full rebuilds made a depth-16 batch take ~20 min)."""

    def __init__(self, leaves):
        self.levels = [list(leaves)]
        cur = self.levels[0]
        while len(cur) > 1:
            cur = [mimc_hash([cur[i], cur[i + 1]])
                   for i in range(0, len(cur), 2)]
            self.levels.append(cur)

    @property
    def root(self):
        return self.levels[-1][0]

    def path(self, idx):
        sibs, dirs = [], []
        i = idx
        for lvl in self.levels[:-1]:
            if i % 2 == 0:
                sibs.append(lvl[i + 1])
                dirs.append(0)
            else:
                sibs.append(lvl[i - 1])
                dirs.append(1)
            i //= 2
        return sibs, dirs

    def update(self, idx, leaf):
        i = idx
        self.levels[0][i] = leaf
        for d in range(len(self.levels) - 1):
            lvl = self.levels[d]
            j = i - (i % 2)
            self.levels[d + 1][i // 2] = mimc_hash([lvl[j], lvl[j + 1]])
            i //= 2


def tree_root(leaves):
    return MerkleTree(leaves).root


def tree_path(leaves, idx):
    """(siblings, dirs): dirs[d] = 1 if the node is the RIGHT child."""
    return MerkleTree(leaves).path(idx)


# -- the circuit ---------------------------------------------------------------

def _root_from(api, mimc_pair, leaf, sibs, dirs):
    h = leaf
    for s, d in zip(sibs, dirs):
        api.assert_is_boolean(d)
        left = api.select(d, s, h)
        right = api.select(d, h, s)
        h = mimc_pair(left, right)
    return h


class Rollup(Circuit):
    old_root: Public
    new_root: Public
    # per-tx witness data (flattened)
    tx: list[Secret]

    PER_TX = (4            # sender pub(2), balance, nonce
              + 4          # receiver pub(2), balance, nonce
              + 1          # amount
              + 3          # signature: R.x, R.y, S
              + 2 * DEPTH  # sender path + dirs
              + 2 * DEPTH)  # receiver path + dirs

    def __init__(self, **kw):
        self.tx = [None] * (NB_TX * self.PER_TX)
        super().__init__(**kw)

    def define(self, api):
        from gnark_tpu.std.hash.mimc import MiMCGadget

        def mimc(*vals):
            m = MiMCGadget(api)
            m.write(*vals)
            return m.sum()

        root = self.old_root
        off = 0
        for _ in range(NB_TX):
            t = self.tx[off:off + self.PER_TX]
            off += self.PER_TX
            (spx, spy, sbal, snon, rpx, rpy, rbal, rnon,
             amount) = t[:9]
            sig_rx, sig_ry, sig_s = t[9:12]
            spath = t[12:12 + DEPTH]
            sdirs = t[12 + DEPTH:12 + 2 * DEPTH]
            rpath = t[12 + 2 * DEPTH:12 + 3 * DEPTH]
            rdirs = t[12 + 3 * DEPTH:12 + 4 * DEPTH]

            # 1. signature over the transfer (sender key; msg binds
            #    receiver, amount and the sender nonce)
            msg = mimc(rpx, rpy, amount, snon)
            eddsa.verify_gadget(api, (spx, spy), msg,
                                (sig_rx, sig_ry), sig_s)

            # 2. sender leaf is in the current root; enough balance
            sleaf = mimc(spx, spy, sbal, snon)
            got = _root_from(api, lambda a, b: mimc(a, b),
                             sleaf, spath, sdirs)
            api.assert_is_equal(got, root)
            api.assert_is_less_or_equal(amount, sbal)

            # 3. update sender: balance -= amount, nonce += 1
            sleaf2 = mimc(spx, spy, api.sub(sbal, amount),
                          api.add(snon, 1))
            root = _root_from(api, lambda a, b: mimc(a, b),
                              sleaf2, spath, sdirs)

            # 4. receiver leaf in the UPDATED root; credit it
            rleaf = mimc(rpx, rpy, rbal, rnon)
            got2 = _root_from(api, lambda a, b: mimc(a, b),
                              rleaf, rpath, rdirs)
            api.assert_is_equal(got2, root)
            rleaf2 = mimc(rpx, rpy, api.add(rbal, amount), rnon)
            root = _root_from(api, lambda a, b: mimc(a, b),
                              rleaf2, rpath, rdirs)

        api.assert_is_equal(root, self.new_root)


# -- host batch construction ---------------------------------------------------

def build_batch(accounts, transfers):
    """transfers: list of (from_idx, to_idx, amount). Returns
    (old_root, new_root, flat tx witness)."""
    flat = []
    for (fi, ti, _amt) in transfers:
        accounts[fi].ensure_key()
        accounts[ti].ensure_key()
    tree = MerkleTree([a.leaf() for a in accounts])
    old_root = tree.root
    for (fi, ti, amount) in transfers:
        snd, rcv = accounts[fi], accounts[ti]
        msg = mimc_hash([rcv.pub[0], rcv.pub[1], amount, snd.nonce])
        sig_r, sig_s = eddsa.sign(snd.key, snd.pub, msg)

        spath, sdirs = tree.path(fi)
        flat += [snd.pub[0], snd.pub[1], snd.balance, snd.nonce,
                 rcv.pub[0], rcv.pub[1], rcv.balance, rcv.nonce,
                 amount, sig_r[0], sig_r[1], sig_s]
        # apply sender update
        snd.balance -= amount
        snd.nonce += 1
        tree.update(fi, snd.leaf())
        rpath, rdirs = tree.path(ti)
        rcv.balance += amount
        tree.update(ti, rcv.leaf())
        flat += spath + sdirs + rpath + rdirs
    return old_root, tree.root, flat


def main(prove: bool = False, dummy: bool = False):
    rng = random.Random(7)
    n_acc = 1 << DEPTH
    accounts = [Account(bytes([i % 251 + 1] * 8), 1000 + 10 * i)
                for i in range(n_acc)]
    transfers = [((2 * i + 1) % n_acc, (2 * i + 3) % n_acc, 1 + i)
                 for i in range(NB_TX)]
    old_root, new_root, flat = build_batch(accounts, transfers)

    inst = Rollup(old_root=old_root, new_root=new_root)
    inst.tx = flat

    cs = compile_circuit(Rollup(), fields.BN254_FR)
    print(f"rollup({NB_TX} txs, depth {DEPTH}): "
          f"{cs.nb_constraints} constraints", flush=True)

    if not prove:
        # default: engine check (a full Groth16 prove at this size is
        # for real hardware — rerun with --prove)
        from gnark_tpu.test_engine import is_solved
        ok = is_solved(inst, fields.BN254_FR)
        print("verified:", ok)
        assert ok
        return

    import time
    pub, sec = witness(inst, cs)
    if dummy:
        # timing-only run with fake keys (reference groth16.DummySetup)
        pk = groth16.dummy_setup(cs, "bn254")
        groth16.prove(cs, pk, pub, sec, rng=rng)   # warm/compile
        t0 = time.perf_counter()
        groth16.prove(cs, pk, pub, sec, rng=rng)
        dt = time.perf_counter() - t0
        print(f"prove({cs.nb_constraints}c): {dt*1e3:.1f} ms "
              f"({cs.nb_constraints/dt:.0f} constraints/s)")
        return dt, cs.nb_constraints
    pk, vk = groth16.setup(cs, "bn254", rng=rng)
    proof = groth16.prove(cs, pk, pub, sec, rng=rng)
    ok = groth16.verify(proof, vk, pub)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main(prove="--prove" in sys.argv or "--dummy" in sys.argv,
         dummy="--dummy" in sys.argv)
