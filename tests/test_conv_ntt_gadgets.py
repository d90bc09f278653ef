"""conv_mul and in-circuit NTT gadget tests over PolyVec slot wires."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.circuit.poly_vec import PolyVec
from mxx_tpu.gadgets.conv_mul import negacyclic_conv_mul
from mxx_tpu.gadgets.ntt_circuit import (
    forward_ntt,
    inverse_ntt,
    register_mod_p_lut,
)
from mxx_tpu.lookup.vec_eval import PolyVecPltEvaluator
from mxx_tpu.slot_transfer import PolyVecSlotTransferEvaluator
from mxx_tpu.utils import numth

from reference_impl import negacyclic_mul


def run_polyvec(circuit, params, inputs, outputs):
    circuit.output(outputs)
    one = PolyVec.const(params, [1] * len(inputs[0]))
    outs = circuit.eval(
        params,
        one,
        [PolyVec.const(params, v) for v in inputs],
        plt_evaluator=PolyVecPltEvaluator(),
        slot_transfer_evaluator=PolyVecSlotTransferEvaluator(),
    )
    return [[p.const_coeff() for p in o.slots] for o in outs]


def test_conv_mul_matches_negacyclic():
    params = RingParams.default()
    q = params.modulus
    n_slots = 4
    rng = random.Random(11)
    a = [rng.randrange(1000) for _ in range(n_slots)]
    b = [rng.randrange(1000) for _ in range(n_slots)]
    circuit = PolyCircuit()
    w = circuit.input(2)
    out = negacyclic_conv_mul(circuit, w[0], w[1], n_slots)
    (got,) = run_polyvec(circuit, params, [a, b], [out])
    want = negacyclic_mul(a, b, q)
    assert got == want


def host_ntt(vals, p, inverse=False):
    n = len(vals)
    psi = numth.find_primitive_2n_root(p, n)
    if inverse:
        psi = numth.modinv(psi, p)
    ln = n.bit_length() - 1
    table = [pow(psi, numth.bit_reverse(i, ln), p) for i in range(n)]
    x = list(vals)
    if not inverse:
        m, t = 1, n
        while m < n:
            t //= 2
            for i in range(m):
                w = table[m + i]
                for j in range(2 * i * t, 2 * i * t + t):
                    u, v = x[j], x[j + t] * w % p
                    x[j], x[j + t] = (u + v) % p, (u - v) % p
            m *= 2
    else:
        t, m = 1, n
        while m > 1:
            h = m // 2
            for i in range(h):
                w = table[h + i]
                j1 = 2 * i * t
                for j in range(j1, j1 + t):
                    u, v = x[j], x[j + t]
                    x[j], x[j + t] = (u + v) % p, (u - v) * w % p
            t *= 2
            m = h
        ninv = numth.modinv(n, p)
        x = [v * ninv % p for v in x]
    return x


def test_in_circuit_ntt_forward_and_roundtrip():
    params = RingParams.new(8, 2, 17, 1)  # ring dim must cover the slot count
    n_slots = 8
    p = 17  # 17 = 1 mod 16
    rng = random.Random(12)
    vals = [rng.randrange(p) for _ in range(n_slots)]

    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = register_mod_p_lut(circuit, params, p, 2 * p * p)
    fwd = forward_ntt(circuit, w[0], n_slots, p, lut)
    back = inverse_ntt(circuit, fwd, n_slots, p, lut)
    got_fwd, got_back = run_polyvec(circuit, params, [vals], [fwd, back])
    assert got_fwd == host_ntt(vals, p)
    assert got_back == vals


def test_conv_mul_plaintext_matches_negacyclic():
    """Public-rhs convolution: slot transfers + adds only (no Mul gates)."""
    from mxx_tpu.gadgets.conv_mul import negacyclic_conv_mul_plaintext
    from mxx_tpu.gadgets.ntt_circuit import register_mod_p_lut

    params = RingParams.default()
    n_slots = 4
    p = 257
    rng = random.Random(13)
    a = [rng.randrange(p) for _ in range(n_slots)]
    b = [rng.randrange(p) for _ in range(n_slots)]
    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = register_mod_p_lut(circuit, params, p, n_slots * p * p)
    out = negacyclic_conv_mul_plaintext(circuit, w[0], b, n_slots, p, lut)
    from mxx_tpu.circuit.gate import MUL
    assert all(g.kind != MUL for g in circuit.gates), "no Mul gates"
    (got,) = run_polyvec(circuit, params, [a], [out])
    want = [v % p for v in negacyclic_mul(a, b, p)]
    assert got == want
