"""AKY24-style functional encryption round-trip."""

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.func_enc import Aky24FuncEnc


def build_func(num_bits):
    circuit = PolyCircuit()
    bits = circuit.input(num_bits)
    out = circuit.xor_gate(bits[0], bits[1])
    circuit.output([out])
    return circuit


def test_aky24_fe_roundtrip():
    params = RingParams.default()
    fe = Aky24FuncEnc(msg_bits=2, error_sigma=0.0, seed=101)
    func = build_func(2)
    enc_key, msk = fe.setup(params)
    fsk = fe.keygen(params, msk, func)
    for b0 in (0, 1):
        for b1 in (0, 1):
            ct = fe.enc(params, msk, [b0, b1])
            assert fe.dec(params, ct, fsk, func) == (b0 ^ b1), (b0, b1)


@pytest.mark.slow
def test_aky24_fe_with_noise():
    params = RingParams.new(16, 3, 20, 5)
    fe = Aky24FuncEnc(msg_bits=2, error_sigma=3.0, seed=102)
    func = build_func(2)
    _, msk = fe.setup(params)
    fsk = fe.keygen(params, msk, func)
    ct = fe.enc(params, msk, [1, 0])
    assert fe.dec(params, ct, fsk, func) == 1
