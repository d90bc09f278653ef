"""Diamond iO end-to-end: obfuscate a boolean function, evaluate on all
inputs, decoded outputs must match the plaintext function."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut
from mxx_tpu.io_protocols import DiamondIO


def build_and_circuit(params, num_bits, with_lut=False):
    """f(b0, b1, ...) = AND of all bits (bit-valued output wire)."""
    circuit = PolyCircuit()
    bits = circuit.input(num_bits)
    acc = bits[0]
    for b in bits[1:]:
        acc = circuit.and_gate(acc, b)
    if with_lut:
        # mod-2 identity LUT exercises the LWE bridge path
        lut = PublicLut.from_dict(params, {x: (x, x % 2) for x in range(4)})
        lut_id = circuit.register_public_lut(lut)
        acc = circuit.public_lookup_gate(acc, lut_id)
    circuit.output([acc])
    return circuit


def test_diamond_io_and_function(tmp_path):
    params = RingParams.default()
    dio = DiamondIO(params, input_count=2, batch_bits=1, seed=81)
    circuit = build_and_circuit(params, dio.num_input_bits)
    obf = dio.obfuscate(tmp_path, circuit)
    assert obf.num_outputs == 1
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, circuit, [b0, b1])
            assert out == [b0 & b1], (b0, b1, out)


def test_diamond_io_with_lut(tmp_path):
    params = RingParams.new(4, 3, 17, 6)
    dio = DiamondIO(params, input_count=2, batch_bits=1, seed=82)
    circuit = build_and_circuit(params, dio.num_input_bits, with_lut=True)
    obf = dio.obfuscate(tmp_path, circuit)
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, circuit, [b0, b1])
            assert out == [b0 & b1], (b0, b1, out)


def test_diamond_io_batch_bits_2(tmp_path):
    params = RingParams.default()
    dio = DiamondIO(params, input_count=1, batch_bits=2, seed=83)
    circuit = build_and_circuit(params, dio.num_input_bits)
    obf = dio.obfuscate(tmp_path, circuit)
    for b0 in (0, 1):
        for b1 in (0, 1):
            out = dio.eval(tmp_path, obf, circuit, [b0, b1])
            assert out == [b0 & b1], (b0, b1, out)
