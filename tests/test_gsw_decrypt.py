"""In-circuit GSW split decryption + mask circuits (the noise-refresh /
masked-decode material)."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator
from mxx_tpu.gadgets.fhe import RingGswCiphertext, RingGswContext
from mxx_tpu.gadgets.fhe.ring_gsw import encode_ciphertext_inputs, native_encrypt
from mxx_tpu.decoder.mask_circuit import (
    decrypt_bit_decomposed_parts,
    decrypt_error_as_value,
    mask_plaintext_moduli_from_full_modulus,
)

P_BITS = 7


def setup():
    params = RingParams.new(4, 1, 14, 1)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    return params, circuit, ctx


def run(circuit, params, cts, s, out_wires):
    ctx = cts[0][0]
    inputs = []
    for c, native in cts:
        inputs.extend(encode_ciphertext_inputs(c, native))
    inputs.append(Poly.const(params, -s))  # key wire carries -s
    return [
        w.const_coeff()
        for w in circuit.eval(
            params, Poly.one(params), inputs, plt_evaluator=PolyPltEvaluator()
        )
    ]


def test_gsw_in_circuit_decrypt():
    params, circuit, ctx = setup()
    rng = random.Random(21)
    s, m, t = 1, 1, 2
    native = native_encrypt(ctx, s, m, rng)
    w_ct = RingGswCiphertext.input(ctx, circuit)
    key_wire = circuit.input(1)[0]
    sd, pb = w_ct.decrypt(circuit, key_wire, t)
    total = circuit.add_gate(sd, pb)
    circuit.output([total])
    (got,) = run(circuit, params, [(ctx, native)], s, None)
    assert got == m * (ctx.q_big // t) % ctx.q_big


def test_mask_bit_decomposed_decrypt():
    params, circuit, ctx = setup()
    rng = random.Random(22)
    s = -1
    bits = [1, 0, 1]  # mask value 0b101 = 5
    moduli = mask_plaintext_moduli_from_full_modulus(ctx.q_big, len(bits))
    natives = [native_encrypt(ctx, s, b, rng) for b in bits]
    w_cts = [RingGswCiphertext.input(ctx, circuit) for _ in bits]
    key_wire = circuit.input(1)[0]
    sd, pb = decrypt_bit_decomposed_parts(circuit, w_cts, key_wire, moduli)
    circuit.output([circuit.add_gate(sd, pb)])
    (got,) = run(circuit, params, list(zip([ctx] * 3, natives)), s, None)
    # sum_j b_j * (q / (q >> j)) ~ sum_j b_j * 2^j = mask value (exact: q/2^j
    # scaling uses floor(q / (q >> j)) which is exactly 2^j for 2^j | q? q is
    # odd, so the scale is floor-based; with zero error the decrypted value is
    # sum_j b_j * floor(q / (q >> j))
    want = sum(b * (ctx.q_big // (ctx.q_big >> j)) for j, b in enumerate(bits)) % ctx.q_big
    assert got == want


def test_error_decrypt_value():
    params, circuit, ctx = setup()
    rng = random.Random(23)
    s, m = 0, 1
    native = native_encrypt(ctx, s, m, rng)
    w_ct = RingGswCiphertext.input(ctx, circuit)
    key_wire = circuit.input(1)[0]
    out = decrypt_error_as_value(circuit, w_ct, key_wire, ctx.q_big)  # t = q: scale 1
    circuit.output([out])
    (got,) = run(circuit, params, [(ctx, native)], s, None)
    assert got == m  # scale q/t = 1 recovers the raw value
