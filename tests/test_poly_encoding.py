"""Packed slot-wise BGG encodings: batched invariants, homomorphic ops,
circuit eval, and the packed LWE lookup path."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import TernaryDist, TrapdoorSampler, UniformSampler
from mxx_tpu.bgg import BGGPublicKeySampler
from mxx_tpu.bgg.poly_encoding import (
    BGGPolyEncodingSampler,
    BggPolyEncoding,
    LWEBGGPolyEncodingPltEvaluator,
    LWEBGGPolyPubKeyPltEvaluator,
)
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

KEY = bytes(range(32))
S = 3  # slots


def make_packed(params, slot_values, seed=42):
    us = UniformSampler(seed=seed)
    secrets = [us.sample_poly(params, TernaryDist())]
    pk_sampler = BGGPublicKeySampler(KEY, 1)
    pubkeys = pk_sampler.sample(params, b"packed", [True] * len(slot_values))
    sampler = BGGPolyEncodingSampler(params, secrets, S, None, seed=seed + 1)
    slot_pts = [[Poly.const(params, v) for v in vals] for vals in slot_values]
    encodings = sampler.sample(params, pubkeys, slot_pts)
    return sampler, pubkeys, encodings


def check_slot_invariant(params, enc: BggPolyEncoding, sampler):
    """Row s: c_s == sigma_s A - x_s sigma_s G (exact, zero error)."""
    g = PolyMatrix.gadget_matrix(params, 1)
    sg = sampler.secret_mat @ g
    sa = sampler.secret_mat @ enc.pubkey.matrix
    for s in range(enc.num_slots):
        x = enc.plaintext(s)
        want = sa.slice_rows(s, s + 1) - sg.slice_rows(s, s + 1).mul_poly_scalar(x)
        assert enc.vector(s) == want, f"slot {s}"


def test_packed_invariant_and_ops():
    params = RingParams.default()
    sampler, pubkeys, encs = make_packed(params, [[1, 0, 1], [0, 1, 1]])
    for e in encs:
        check_slot_invariant(params, e, sampler)
    one, e1, e2 = encs
    add = e1 + e2
    check_slot_invariant(params, add, sampler)
    assert [p.const_coeff() for p in add.plaintexts] == [1, 1, 2]
    mul = e1 * e2
    check_slot_invariant(params, mul, sampler)
    assert [p.const_coeff() for p in mul.plaintexts] == [0, 0, 1]


def test_packed_circuit_eval():
    params = RingParams.default()
    sampler, pubkeys, encs = make_packed(params, [[1, 0, 1], [1, 1, 0]], seed=50)
    circuit = PolyCircuit()
    w = circuit.input(2)
    out = circuit.add_gate(circuit.mul_gate(w[0], w[1]), w[0])
    circuit.output([out])
    got = circuit.eval(params, encs[0], encs[1:])[0]
    check_slot_invariant(params, got, sampler)
    assert [p.const_coeff() for p in got.plaintexts] == [2, 0, 1]


def test_packed_lwe_lookup(tmp_path):
    params = RingParams.new(16, 4, 28, 7)
    p_mod = 5
    sampler, pubkeys, encs = make_packed(params, [[1, 3, 4]], seed=60)
    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, (x * x) % p_mod) for x in range(p_mod)})
    lid = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(w[0], lid)])

    init_storage_system(tmp_path)
    ts = TrapdoorSampler(params, 4.578, seed=61)
    td, b0 = ts.trapdoor(params, 1)
    pk_eval = LWEBGGPolyPubKeyPltEvaluator(KEY, ts, b0, td, tmp_path, S)
    result_pk = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)[0]
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    c_b_rows = sampler.secret_mat @ b0  # per-slot sigma_s * B
    enc_eval = LWEBGGPolyEncodingPltEvaluator(KEY, tmp_path, c_b_rows)
    got = circuit.eval(params, encs[0], encs[1:], plt_evaluator=enc_eval)[0]
    assert got.pubkey == result_pk
    assert [p.const_coeff() for p in got.plaintexts] == [1, 4, 1]
    check_slot_invariant(params, got, sampler)


def test_packed_ggh15_lookup(tmp_path):
    from mxx_tpu.lookup.ggh15 import (
        GGH15BGGPolyEncodingPltEvaluator,
        GGH15BGGPubKeyPltEvaluator,
    )

    params = RingParams.default()
    sampler, pubkeys, encs = make_packed(params, [[3, 5, 9]], seed=70)
    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, x % 4) for x in range(16)})
    lid = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(w[0], lid)])

    init_storage_system(tmp_path)
    pk_eval = GGH15BGGPubKeyPltEvaluator(KEY, 1, 4.578, 0.0, tmp_path, seed=71)
    result_pk = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)[0]
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    b0 = pk_eval.load_b0_matrix_checkpoint(params)
    c_b0_rows = sampler.secret_mat @ b0
    enc_eval = GGH15BGGPolyEncodingPltEvaluator(
        KEY, tmp_path, pk_eval.checkpoint_prefix(params), params, c_b0_rows
    )
    got = circuit.eval(params, encs[0], encs[1:], plt_evaluator=enc_eval)[0]
    assert got.pubkey == result_pk
    assert [p.const_coeff() for p in got.plaintexts] == [3, 1, 1]
    check_slot_invariant(params, got, sampler)
