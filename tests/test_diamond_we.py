"""Diamond witness encryption round-trips (mirrors diamond_we.rs tests)."""

import pytest

import mxx_tpu  # noqa: F401

pytestmark = pytest.mark.slow

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.input_injector import DiamondInjector
from mxx_tpu.we import DiamondWE


def test_diamond_we_constant_one_circuit(tmp_path):
    params = RingParams.default()
    witness_size = 2
    instance = [True]
    circuit = PolyCircuit()
    circuit.input(witness_size + len(instance))
    circuit.output([circuit.const_one_gate()])
    witness = [False, True]
    for i, msg in enumerate([False, True]):
        d = tmp_path / f"m{i}"
        injector = DiamondInjector(params, 1, 4, 2, 4.578, 0.0, seed=90 + i)
        we = DiamondWE(injector, witness_size, d, b"diamond_we_test", seed=91 + i)
        ct = we.enc(msg, circuit, instance)
        assert we.dec(ct, witness) == msg


def test_diamond_we_witness_dependent_circuit(tmp_path):
    params = RingParams.default()
    witness_size = 2
    instance = [False]
    circuit = PolyCircuit()
    inputs = circuit.input(witness_size + len(instance))
    circuit.output([circuit.or_gate(inputs[0], inputs[1])])
    # witness with w0 | w1 == 1 satisfies; decode succeeds
    for i, msg in enumerate([False, True]):
        d = tmp_path / f"w{i}"
        injector = DiamondInjector(params, 1, 4, 2, 4.578, 0.0, seed=94 + i)
        we = DiamondWE(injector, witness_size, d, b"diamond_we_test2", seed=95 + i)
        ct = we.enc(msg, circuit, instance)
        assert we.dec(ct, [False, True]) == msg
