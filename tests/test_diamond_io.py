"""Diamond iO end-to-end: obfuscate boolean functions, evaluate on all
inputs; outputs decode through the k-channel masked decoder exactly."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.lookup import PublicLut
from mxx_tpu.io_protocols import DiamondIO


def and_builder(circuit, bits):
    acc = bits[0]
    for b in bits[1:]:
        acc = circuit.and_gate(acc, b)
    return [acc]


def make_lut_builder(params):
    def builder(circuit, bits):
        acc = bits[0]
        for b in bits[1:]:
            acc = circuit.and_gate(acc, b)
        lut = PublicLut.from_dict(params, {x: (x, x % 2) for x in range(4)})
        lut_id = circuit.register_public_lut(lut)
        return [circuit.public_lookup_gate(acc, lut_id)]

    return builder


def xor_and_builder(circuit, bits):
    return [circuit.xor_gate(bits[0], bits[1]), circuit.and_gate(bits[0], bits[1])]


def test_diamond_io_and_function(tmp_path):
    params = RingParams.default()
    dio = DiamondIO(params, input_count=2, batch_bits=1, seed=81)
    obf = dio.obfuscate(tmp_path, and_builder)
    assert obf.num_outputs == 1
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, and_builder, [b0, b1])
            assert out == [b0 & b1], (b0, b1, out)


def test_diamond_io_two_outputs(tmp_path):
    params = RingParams.default()
    dio = DiamondIO(params, input_count=1, batch_bits=2, seed=83)
    obf = dio.obfuscate(tmp_path, xor_and_builder)
    assert obf.num_outputs == 2
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, xor_and_builder, [b0, b1])
            assert out == [b0 ^ b1, b0 & b1], (b0, b1, out)


def test_diamond_io_with_lut(tmp_path):
    params = RingParams.new(4, 3, 17, 6)
    dio = DiamondIO(params, input_count=2, batch_bits=1, seed=82)
    builder = make_lut_builder(params)
    obf = dio.obfuscate(tmp_path, builder)
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, builder, [b0, b1])
            assert out == [b0 & b1], (b0, b1, out)
