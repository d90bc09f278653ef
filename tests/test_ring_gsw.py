"""RingGSW in-circuit FHE: encrypt natively, evaluate homomorphic circuits
over nested-RNS wires, decrypt, compare against plaintext booleans.

Mirrors the correctness pattern of /root/reference/src/gadgets/fhe/ring_gsw.rs
tests with zero error for exact relation checks.
"""

import random

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator
from mxx_tpu.gadgets.fhe import RingGswCiphertext, RingGswContext
from mxx_tpu.gadgets.fhe.ring_gsw import (
    decode_ciphertext_outputs,
    encode_ciphertext_inputs,
    native_decrypt_value,
    native_encrypt,
    native_gadget_row,
)

P_BITS = 7


def relation_holds(ctx, native_ct, s, m):
    """Check (-s,1).C == m * ((-s,1).G) exactly (zero error)."""
    q = ctx.q_big
    g = native_gadget_row(ctx)
    L = ctx.gadget_len
    for col in range(2 * L):
        got = native_decrypt_value(ctx, native_ct, s, col)
        want_g = (-s * g[col]) % q if col < L else g[col - L]
        if got != (m * want_g) % q:
            return False, (col, got, (m * want_g) % q)
    return True, None


def test_native_encrypt_relation():
    params = RingParams.new(4, 1, 14, 1)  # single small q-level keeps the circuit compact
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    rng = random.Random(3)
    s = -1
    for m in (0, 1):
        ct = native_encrypt(ctx, s, m, rng)
        ok, info = relation_holds(ctx, ct, s, m)
        assert ok, info


@pytest.mark.slow
def test_gsw_homomorphic_ops_in_circuit():
    params = RingParams.new(4, 1, 14, 1)  # single small q-level keeps the circuit compact
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    rng = random.Random(5)
    s = 1
    m1, m2 = 1, 1
    ct1 = native_encrypt(ctx, s, m1, rng)
    ct2 = native_encrypt(ctx, s, m2, rng)

    w1 = RingGswCiphertext.input(ctx, circuit)
    w2 = RingGswCiphertext.input(ctx, circuit)
    prod = w1.mul(w2, circuit)
    circuit.output(prod.flatten())

    inputs = encode_ciphertext_inputs(ctx, ct1) + encode_ciphertext_inputs(ctx, ct2)
    results = circuit.eval(
        params, Poly.one(params), inputs, plt_evaluator=PolyPltEvaluator()
    )
    native_out, _ = decode_ciphertext_outputs(ctx, prod, results)
    ok, info = relation_holds(ctx, native_out, s, m1 * m2)
    assert ok, info


@pytest.mark.slow
def test_gsw_xor_and():
    params = RingParams.new(4, 1, 14, 1)  # single small q-level keeps the circuit compact
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    rng = random.Random(7)
    s = -1
    m1, m2 = 1, 0
    ct1 = native_encrypt(ctx, s, m1, rng)
    ct2 = native_encrypt(ctx, s, m2, rng)

    w1 = RingGswCiphertext.input(ctx, circuit)
    w2 = RingGswCiphertext.input(ctx, circuit)
    x = w1.xor(w2, circuit)
    a = w1.and_(w2, circuit)
    circuit.output(x.flatten() + a.flatten())

    inputs = encode_ciphertext_inputs(ctx, ct1) + encode_ciphertext_inputs(ctx, ct2)
    results = circuit.eval(
        params, Poly.one(params), inputs, plt_evaluator=PolyPltEvaluator()
    )
    xor_native, pos = decode_ciphertext_outputs(ctx, x, results)
    and_native, _ = decode_ciphertext_outputs(ctx, a, results, pos)
    ok, info = relation_holds(ctx, xor_native, s, m1 ^ m2)
    assert ok, ("xor", info)
    ok, info = relation_holds(ctx, and_native, s, m1 & m2)
    assert ok, ("and", info)


@pytest.mark.slow
def test_gsw_slot_parallel_vec():
    """SIMD GSW: one xor circuit evaluated over PolyVec wires runs an
    independent GSW instance per slot (reference ring_gsw packed path,
    ring_gsw.rs num_slots batching)."""
    from mxx_tpu.circuit.poly_vec import PolyVec
    from mxx_tpu.lookup.vec_eval import PolyVecPltEvaluator

    params = RingParams.new(4, 1, 14, 1)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    rng = random.Random(9)
    s = -1
    # slot 0: xor(1, 0); slot 1: xor(1, 1)
    cts_a = [native_encrypt(ctx, s, 1, rng), native_encrypt(ctx, s, 1, rng)]
    cts_b = [native_encrypt(ctx, s, 0, rng), native_encrypt(ctx, s, 1, rng)]

    w1 = RingGswCiphertext.input(ctx, circuit)
    w2 = RingGswCiphertext.input(ctx, circuit)
    out = w1.xor(w2, circuit)
    circuit.output(out.flatten())

    def packed_inputs(slot_cts):
        per_slot = [encode_ciphertext_inputs(ctx, c) for c in slot_cts]
        return [
            PolyVec.new([per_slot[0][i], per_slot[1][i]])
            for i in range(len(per_slot[0]))
        ]

    inputs = packed_inputs(cts_a) + packed_inputs(cts_b)
    one = PolyVec.const(params, [1, 1])
    results = circuit.eval(
        params, one, inputs, plt_evaluator=PolyVecPltEvaluator()
    )
    for slot, want in ((0, 1), (1, 0)):
        slot_res = [v.slots[slot] for v in results]
        native_out, _ = decode_ciphertext_outputs(ctx, out, slot_res)
        ok, info = relation_holds(ctx, native_out, s, want)
        assert ok, (slot, info)
