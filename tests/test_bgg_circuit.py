"""BGG+ homomorphism identity tests + circuit oracle tests.

Mirrors the reference's algebraic tests (/root/reference/src/bgg/mod.rs:25-111)
and the three-way oracle strategy (plaintext / encoding evaluation).
"""

import numpy as np

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import TernaryDist, BitDist, UniformSampler
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator, PublicLut

KEY = bytes(range(32))


def make_bgg(params, d=1, num_inputs=2, plaintext_dist=None, seed=42):
    us = UniformSampler(seed=seed)
    secrets = [us.sample_poly(params, TernaryDist()) for _ in range(d)]
    pk_sampler = BGGPublicKeySampler(KEY, d)
    pubkeys = pk_sampler.sample(params, b"test_tag", [True] * num_inputs)
    dist = plaintext_dist or BitDist()
    plaintexts = [us.sample_poly(params, dist) for _ in range(num_inputs)]
    enc_sampler = BGGEncodingSampler(params, secrets, gauss_sigma=None, seed=seed + 1)
    encodings = enc_sampler.sample(params, pubkeys, plaintexts)
    return secrets, pubkeys, plaintexts, encodings, enc_sampler


def check_invariant(params, enc, secret_vec):
    """c == s*A - x*(s*G) must hold exactly (zero encoding error)."""
    d = secret_vec.ncol
    g = PolyMatrix.gadget_matrix(params, d)
    s_a = secret_vec @ enc.pubkey.matrix
    s_g = (secret_vec @ g).mul_poly_scalar(enc.plaintext)
    assert enc.vector == (s_a - s_g), "BGG invariant violated"


def test_bgg_encoding_invariant_and_homomorphisms():
    params = RingParams.default()
    secrets, pubkeys, plaintexts, encodings, es = make_bgg(params, d=1, num_inputs=2)
    sv = es.secret_vec
    for enc in encodings:
        check_invariant(params, enc, sv)
    one, e1, e2 = encodings
    # Add
    add = e1 + e2
    assert add.plaintext == (plaintexts[0] + plaintexts[1])
    check_invariant(params, add, sv)
    # Sub
    sub = e1 - e2
    assert sub.plaintext == (plaintexts[0] - plaintexts[1])
    check_invariant(params, sub, sv)
    # Mul
    mul = e1 * e2
    assert mul.plaintext == (plaintexts[0] * plaintexts[1])
    check_invariant(params, mul, sv)


def test_bgg_d2_mul():
    params = RingParams.new(4, 2, 17, 4)
    secrets, pubkeys, plaintexts, encodings, es = make_bgg(params, d=2, num_inputs=2, seed=7)
    sv = es.secret_vec
    mul = encodings[1] * encodings[2]
    check_invariant(params, mul, sv)


def test_circuit_eval_poly_wires():
    params = RingParams.default()
    us = UniformSampler(seed=3)
    circuit = PolyCircuit()
    wires = circuit.input(2)  # gate 0 is the reserved one-wire
    w_add = circuit.add_gate(wires[0], wires[1])
    w_mul = circuit.mul_gate(w_add, wires[0])
    w_s = circuit.small_scalar_mul(w_mul, [3])
    circuit.output([w_add, w_mul, w_s])
    x1 = us.sample_poly(params, BitDist())
    x2 = us.sample_poly(params, BitDist())
    outs = circuit.eval(params, Poly.one(params), [x1, x2])
    assert outs[0] == x1 + x2
    assert outs[1] == (x1 + x2) * x1
    assert outs[2] == (x1 + x2) * x1 * Poly.const(params, 3)


def test_circuit_boolean_gates():
    params = RingParams.default()
    circuit = PolyCircuit()
    w = circuit.input(2)
    outs_ids = [
        circuit.and_gate(w[0], w[1]),
        circuit.or_gate(w[0], w[1]),
        circuit.xor_gate(w[0], w[1]),
        circuit.not_gate(w[0]),
        circuit.nand_gate(w[0], w[1]),
        circuit.nor_gate(w[0], w[1]),
        circuit.xnor_gate(w[0], w[1]),
    ]
    circuit.output(outs_ids)
    for a in (0, 1):
        for b in (0, 1):
            outs = circuit.eval(
                params, Poly.one(params), [Poly.const(params, a), Poly.const(params, b)]
            )
            want = [a & b, a | b, a ^ b, 1 - a, 1 - (a & b), 1 - (a | b), 1 - (a ^ b)]
            got = [o.const_coeff() for o in outs]
            assert got == want, (a, b, got, want)


def test_circuit_lut_gate_poly():
    params = RingParams.default()
    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, (x * x + 1) % 7) for x in range(8)})
    lut_id = circuit.register_public_lut(lut)
    w_out = circuit.public_lookup_gate(w[0], lut_id)
    circuit.output([w_out])
    for x in range(8):
        outs = circuit.eval(
            params,
            Poly.one(params),
            [Poly.const(params, x)],
            plt_evaluator=PolyPltEvaluator(),
        )
        assert outs[0].const_coeff() == (x * x + 1) % 7


def test_circuit_eval_bgg_encoding_vs_plaintext():
    """The same circuit evaluated over plain polys and BGG encodings agrees,
    and the output encoding satisfies the BGG invariant."""
    params = RingParams.default()
    circuit = PolyCircuit()
    w = circuit.input(2)
    w1 = circuit.mul_gate(w[0], w[1])
    w2 = circuit.add_gate(w1, w[0])
    w3 = circuit.small_scalar_mul(w2, [2])
    circuit.output([w3])
    secrets, pubkeys, plaintexts, encodings, es = make_bgg(params, d=1, num_inputs=2, seed=11)
    # plaintext oracle
    pt_out = circuit.eval(params, Poly.one(params), plaintexts)[0]
    # encoding path
    enc_out = circuit.eval(params, encodings[0], encodings[1:])[0]
    assert enc_out.plaintext == pt_out
    check_invariant(params, enc_out, es.secret_vec)


def test_levels_and_counts():
    circuit = PolyCircuit()
    w = circuit.input(2)
    a = circuit.add_gate(w[0], w[1])
    m = circuit.mul_gate(a, w[0])
    circuit.output([m])
    levels = circuit.compute_levels()
    assert levels == [[a], [m]]
    assert circuit.gate_counts()["Input"] == 3
    assert circuit.non_free_depth() == 1
