"""Ring-GSW with POLYNOMIAL payload keys over slot-packed wires: in-circuit
split decryption and the external product, verified against host ring
algebra (the remaining Diamond-iO payload-type delta's core construction)."""

import math
import random

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.circuit.poly_vec import PolyVec
from mxx_tpu.gadgets.fhe.packed_ring_gsw import (
    PackedRingGswCiphertext,
    native_decrypt_poly,
    native_encrypt_poly,
    packed_input_values,
    ring_mul,
)
from mxx_tpu.gadgets.fhe.ring_gsw import RingGswContext
from mxx_tpu.lookup.vec_eval import PolyVecPltEvaluator
from mxx_tpu.ring.params import RingParams
from mxx_tpu.slot_transfer import PolyVecSlotTransferEvaluator
from mxx_tpu.utils.rng import Drbg

N_SLOTS = 4


def _run(circuit, params, vec_inputs):
    one = PolyVec.const(params, [1] * N_SLOTS)
    return circuit.eval(
        params, one,
        [PolyVec.const(params, v) for v in vec_inputs],
        plt_evaluator=PolyVecPltEvaluator(),
        slot_transfer_evaluator=PolyVecSlotTransferEvaluator(),
    )


def test_packed_gsw_poly_key_decrypt():
    params = RingParams.new(4, 1, 10, 10)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, 5, 2)
    q = ctx.q_big
    assert q == params.modulus
    rng = Drbg(11)
    k_poly = [1, q - 1, 0, 1]  # ternary ring poly
    m_poly = [1, 0, 1, 0]
    t_mod = 4
    ct = native_encrypt_poly(ctx, k_poly, m_poly, rng)
    want = native_decrypt_poly(ctx, ct, k_poly, t_mod)
    assert want == [m_poly[s] * (q // t_mod) % q for s in range(N_SLOTS)]

    w = PackedRingGswCiphertext.input(ctx, circuit, N_SLOTS)
    key = circuit.input(1)[0]
    sd, pb = w.decrypt(circuit, key, t_mod)
    circuit.output([circuit.add_gate(sd, pb)])

    neg_k = [(-c) % q for c in k_poly]
    outs = _run(circuit, params, packed_input_values(ctx, ct) + [neg_k])
    got = [int(p.const_coeff()) for p in outs[0].slots]
    assert got == want, (got, want)


@pytest.mark.slow
def test_packed_gsw_external_product():
    # 2 slots keep the conv fan-out CI-sized; the negacyclic wrap is still
    # exercised (X * X = -1 mod X^2 + 1)
    params = RingParams.new(4, 1, 10, 10)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, 5, 2)
    q = ctx.q_big
    rng = Drbg(12)
    k_poly = [1, q - 1]
    m1 = [0, 1]  # X
    m2 = [0, 1]  # X
    t_mod = 4
    ct1 = native_encrypt_poly(ctx, k_poly, m1, rng)
    ct2 = native_encrypt_poly(ctx, k_poly, m2, rng)

    ns = 2
    w1 = PackedRingGswCiphertext.input(ctx, circuit, ns)
    w2 = PackedRingGswCiphertext.input(ctx, circuit, ns)
    key = circuit.input(1)[0]
    w3 = w1.mul(w2, circuit)
    sd, pb = w3.decrypt(circuit, key, t_mod)
    circuit.output([circuit.add_gate(sd, pb)])

    neg_k = [(-c) % q for c in k_poly]
    one = PolyVec.const(params, [1] * ns)
    outs = circuit.eval(
        params, one,
        [PolyVec.const(params, v) for v in
         packed_input_values(ctx, ct1) + packed_input_values(ctx, ct2) + [neg_k]],
        plt_evaluator=PolyVecPltEvaluator(),
        slot_transfer_evaluator=PolyVecSlotTransferEvaluator(),
    )
    got = [int(p.const_coeff()) for p in outs[0].slots]
    want_m = ring_mul(m1, m2, q)  # X*X = -1: the wrap
    want = [c * (q // t_mod) % q for c in want_m]
    assert got == want, (got, want)


@pytest.mark.slow
def test_packed_gsw_goldreich_prg():
    """Goldreich PRG over PACKED Ring-GSW ciphertexts with a polynomial key:
    seed bits as degree-0 plaintexts under ring-element ciphertext entries
    (the reference's seed-bit semantics); outputs decrypt to the host PRG
    bits — the packed PRF-pipeline integration step for poly-k Diamond."""
    from mxx_tpu.gadgets.fhe_prg import GoldreichFhePrg

    params = RingParams.new(4, 1, 10, 10)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, 5, 2)
    q = ctx.q_big
    ns = 2
    rng = Drbg(21)
    k_poly = [1, q - 1]
    seed_bits = [1, 0, 1, 1, 0]
    t_mod = 4

    cts = [
        native_encrypt_poly(ctx, k_poly, [b] + [0] * (ns - 1), rng)
        for b in seed_bits
    ]
    ws = [PackedRingGswCiphertext.input(ctx, circuit, ns) for _ in seed_bits]
    key = circuit.input(1)[0]
    prg = GoldreichFhePrg.setup(len(seed_bits), 1, bytes(range(32)))
    outs_ct = prg.evaluate(ws, circuit)
    out_wires = []
    for ct in outs_ct:
        sd, pb = ct.decrypt(circuit, key, t_mod)
        out_wires.append(circuit.add_gate(sd, pb))
    circuit.output(out_wires)

    neg_k = [(-c) % q for c in k_poly]
    vec_inputs = []
    for ct in cts:
        vec_inputs.extend(packed_input_values(ctx, ct))
    vec_inputs.append(neg_k)
    one = PolyVec.const(params, [1] * ns)
    outs = circuit.eval(
        params, one,
        [PolyVec.const(params, v) for v in vec_inputs],
        plt_evaluator=PolyVecPltEvaluator(),
        slot_transfer_evaluator=PolyVecSlotTransferEvaluator(),
    )
    want_bits = prg.evaluate_uniform(seed_bits)
    got_bits = [
        int(o.slots[0].const_coeff()) // (q // t_mod) for o in outs
    ]
    assert got_bits == list(want_bits), (got_bits, want_bits)


def test_packed_bit_decomposed_decrypt_embedded():
    """Subring-embedded packed decrypt (phi: X' -> X^{n/ns}): the batch
    decrypt of a bit-decomposed PACKED mask under a ternary RING-POLY key,
    with the key multiplication riding ONE plain mul against the phi(-k)
    wire — the Diamond poly-payload mask channel's decrypt."""
    from mxx_tpu.decoder.mask_circuit import mask_plaintext_moduli_from_full_modulus
    from mxx_tpu.gadgets.fhe.packed_ring_gsw import (
        embed_coeffs,
        native_combined_halves_poly,
        packed_decrypt_bit_decomposed_parts,
    )
    from mxx_tpu.ring.poly import Poly

    params = RingParams.new(8, 1, 10, 10)
    ns = 4  # stride 2
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, 5, 2)
    q = ctx.q_big
    rng = Drbg(31)
    k_rp = [1, q - 1, 0, 1]  # ternary key over R'
    coeff_bits = 2
    moduli = mask_plaintext_moduli_from_full_modulus(q, coeff_bits)
    mask = [3, 1, 0, 2]  # per-R'-coefficient mask values < 2^coeff_bits

    cts = []
    for i in range(ns):
        for b in range(coeff_bits):
            bit = (mask[i] >> b) & 1
            cts.append(native_encrypt_poly(ctx, k_rp, [bit] + [0] * (ns - 1), rng))

    w_cts = [PackedRingGswCiphertext.input(ctx, circuit, ns) for _ in cts]
    negk = circuit.input(1)[0]
    sd, pb = packed_decrypt_bit_decomposed_parts(circuit, params, w_cts, negk, moduli, ns)
    circuit.output([circuit.add_gate(sd, pb)])

    neg_k = [(-c) % q for c in k_rp]
    negk_poly = Poly.from_int_coeffs(params, embed_coeffs(params, neg_k, ns))
    vec_inputs = []
    for ct in cts:
        vec_inputs.extend(packed_input_values(ctx, ct))
    one = PolyVec.const(params, [1] * ns)
    outs = circuit.eval(
        params, one,
        [PolyVec.const(params, v) for v in vec_inputs]
        + [PolyVec.new([negk_poly] * ns)],
        plt_evaluator=PolyVecPltEvaluator(),
        slot_transfer_evaluator=PolyVecSlotTransferEvaluator(),
    )
    got = [int(c) for c in outs[0].slots[0].coeffs()]

    # host oracle: total_R' = sum_b (-k (x) TOP_b + BOT_b) with TOP_b/BOT_b
    # monomial-packed over R' coefficients; expected wire = phi(total_R')
    total = [0] * ns
    for b in range(coeff_bits):
        top_b = [0] * ns
        bot_b = [0] * ns
        for i in range(ns):
            t, bo = native_combined_halves_poly(ctx, cts[i * coeff_bits + b], moduli[b])
            mono = [0] * ns
            mono[i] = 1
            t = ring_mul(mono, t, q)
            bo = ring_mul(mono, bo, q)
            top_b = [(x + y) % q for x, y in zip(top_b, t)]
            bot_b = [(x + y) % q for x, y in zip(bot_b, bo)]
        sd_b = ring_mul(neg_k, top_b, q)
        total = [(x + s + y) % q for x, s, y in zip(total, sd_b, bot_b)]
    want = embed_coeffs(params, total, ns)
    assert got == want, (got, want)

    # noiseless: R' coefficient 0 recovers the mask value sum_b (q>>b scaled)
    want_val = sum((q // moduli[b]) * ((mask[0] >> b) & 1) for b in range(coeff_bits))
    assert total[0] == want_val % q
