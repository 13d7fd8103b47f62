"""GKR protocol: prove/verify roundtrip + tamper rejection."""

import random

from gnark_tpu import gkr

RNG = random.Random(777)
Q = gkr.Q

# 2-layer circuit over 4 inputs:
#   layer1 (width 4): [x0*x1, x2+x3, x0+x3, x1*x2]
#   layer0 (width 2): [g0+g1, g2*g3]
LAYERS = [
    [("add", 0, 1), ("mul", 2, 3)],
    [("mul", 0, 1), ("add", 2, 3), ("add", 0, 3), ("mul", 1, 2)],
]


def test_evaluate():
    x = [3, 5, 7, 11]
    vals = gkr.evaluate(LAYERS, x)
    assert vals[1] == [15, 18, 14, 35]
    assert vals[0] == [(15 + 18) % Q, 14 * 35 % Q]


def test_gkr_roundtrip():
    for _ in range(3):
        x = [RNG.randrange(Q) for _ in range(4)]
        outs, proof = gkr.prove(LAYERS, x)
        assert gkr.verify(LAYERS, x, outs, proof)


def test_gkr_tamper():
    x = [RNG.randrange(Q) for _ in range(4)]
    outs, proof = gkr.prove(LAYERS, x)
    # wrong output
    bad_outs = [outs[0], (outs[1] + 1) % Q]
    assert not gkr.verify(LAYERS, x, bad_outs, proof)
    # tampered round polynomial
    p2 = [dict(p) for p in proof]
    s0, s1, s2 = p2[0]["rounds"][0]
    p2[0]["rounds"] = [(s0, s1, (s2 + 1) % Q)] + p2[0]["rounds"][1:]
    assert not gkr.verify(LAYERS, x, outs, p2)
    # wrong inputs
    x2 = list(x)
    x2[0] = (x2[0] + 1) % Q
    assert not gkr.verify(LAYERS, x2, outs, proof)


def test_gkr_deeper():
    layers = [
        [("mul", 0, 1)] + [("add", 0, 1)],
        [("mul", 0, 1), ("add", 1, 2), ("mul", 2, 3), ("add", 3, 0)],
        [("add", i, (i + 1) % 8) for i in range(4)]
        + [("mul", i, (i + 3) % 8) for i in range(4)],
    ]
    x = [RNG.randrange(Q) for _ in range(8)]
    outs, proof = gkr.prove(layers, x)
    assert gkr.verify(layers, x, outs, proof)
