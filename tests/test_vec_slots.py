"""Vector wire types, slot transfer/reduce, and slotwise LUT tests."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit, SlotTransferSpec
from mxx_tpu.circuit.poly_vec import PolyVec
from mxx_tpu.bgg.vec import BGGEncodingVecSampler, BGGPublicKeyVecSampler
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup.vec_eval import PolyVecPltEvaluator
from mxx_tpu.sampler import TernaryDist, UniformSampler
from mxx_tpu.slot_transfer import BGGVecSlotTransferEvaluator, PolyVecSlotTransferEvaluator

KEY = bytes(range(32))


def test_polyvec_slot_transfer_and_reduce():
    params = RingParams.default()
    ev = PolyVecSlotTransferEvaluator()
    v = PolyVec.const(params, [5, 6, 7])
    out = ev.slot_transfer(params, v, [(2, None), (0, 3), (1, None)], 0)
    assert out.slots[0].const_coeff() == 7
    assert out.slots[1].const_coeff() == 15
    assert out.slots[2].const_coeff() == 6
    # rotation spec
    spec = SlotTransferSpec.rotation(1, 3)
    rot = ev.slot_transfer(params, v, spec.materialize(), 0)
    assert [p.const_coeff() for p in rot.slots] == [7, 5, 6]
    # reduce: out[i] = sum_s inputs[i][s] * x^s
    red = ev.slot_reduce(params, [v, v], 3, 0)
    assert len(red.slots) == 2
    coeffs = red.slots[0].coeffs()
    assert coeffs[:3] == [5, 6, 7]


def test_polyvec_circuit_slot_gates():
    params = RingParams.default()
    circuit = PolyCircuit()
    w = circuit.input(1)
    t = circuit.slot_transfer_gate(w[0], [(1, None), (0, None)])
    circuit.output([t])
    v = PolyVec.const(params, [10, 20])
    one = PolyVec.const(params, [1, 1])
    out = circuit.eval(
        params, one, [v], slot_transfer_evaluator=PolyVecSlotTransferEvaluator()
    )[0]
    assert [p.const_coeff() for p in out.slots] == [20, 10]


def test_bgg_vec_slotwise_homomorphism():
    params = RingParams.default()
    num_slots = 2
    us = UniformSampler(seed=21)
    secrets = [us.sample_poly(params, TernaryDist())]
    pk_sampler = BGGPublicKeyVecSampler(KEY, 1, num_slots)
    pubkeys = pk_sampler.sample(params, b"vec_tag", [True, True])
    pts = [PolyVec.const(params, [1, 0]), PolyVec.const(params, [1, 1])]
    enc_sampler = BGGEncodingVecSampler(params, secrets, None, num_slots, seed=22)
    encodings = enc_sampler.sample(params, pubkeys, pts)
    # slotwise mul preserves plaintexts
    prod = encodings[1] * encodings[2]
    got = [p.const_coeff() for p in prod.plaintexts().slots]
    assert got == [1, 0]
    # slot transfer on encodings swaps slots
    ev = BGGVecSlotTransferEvaluator()
    swapped = ev.slot_transfer(params, encodings[1], [(1, None), (0, None)], 0)
    assert [e.plaintext.const_coeff() for e in swapped.encodings] == [0, 1]


def test_polyvec_lut():
    params = RingParams.default()
    lut = PublicLut.from_dict(params, {x: (x, x % 3) for x in range(9)})
    v = PolyVec.const(params, [4, 8])
    ev = PolyVecPltEvaluator()
    out = ev.public_lookup(params, lut, None, v, 0, 0)
    assert [p.const_coeff() for p in out.slots] == [1, 2]
