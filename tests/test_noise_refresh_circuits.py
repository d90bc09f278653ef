"""Noise-refresh material circuits: PRG output sizing, batched polynomial
GSW decryption (monomial packing), centered mask decode, and the merge
circuit (reference noise_refresh/{circuit_prg,circuit_decrypt,
circuit_merge}.rs)."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator
from mxx_tpu.gadgets.fhe import RingGswCiphertext, RingGswContext
from mxx_tpu.gadgets.fhe.ring_gsw import encode_ciphertext_inputs, native_encrypt
from mxx_tpu.decoder.mask_circuit import mask_plaintext_moduli_from_full_modulus
from mxx_tpu.noise_refresh.circuit_decrypt import (
    decrypt_centered_bit_decomposed_polynomial,
    decrypt_error_coefficients_as_polynomial,
)
from mxx_tpu.noise_refresh.circuit_merge import (
    build_refreshed_wire_digit_all_crt_merge,
    build_refreshed_wire_merge_subcircuit,
)
from mxx_tpu.noise_refresh.circuit_prg import (
    build_noise_refresh_prg_material,
    goldreich_noise_refresh_output_sizes,
    goldreich_noise_refresh_uniform_output_bits,
)

P_BITS = 7


def setup():
    params = RingParams.new(4, 1, 14, 1)
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, P_BITS)
    return params, circuit, ctx


def run(circuit, params, ctx, natives, s):
    inputs = []
    for native in natives:
        inputs.extend(encode_ciphertext_inputs(ctx, native))
    inputs.append(Poly.const(params, -s))
    return circuit.eval(
        params, Poly.one(params), inputs, plt_evaluator=PolyPltEvaluator()
    )


def test_output_sizes():
    sizes = goldreich_noise_refresh_output_sizes(16, 3, 2, 4)
    assert sizes.cbd_values == 48
    assert sizes.mask_bits == 48 * 4 * 2
    assert sizes.total == 48 + 384
    bits = goldreich_noise_refresh_uniform_output_bits(16, 3, 2, 4, cbd_n=2)
    assert bits == 48 * 4 + 384


def test_decrypt_batch_polynomial():
    params, circuit, ctx = setup()
    rng = random.Random(31)
    s = 1
    msgs = [1, 0, 1, 1]
    natives = [native_encrypt(ctx, s, m, rng) for m in msgs]
    w_cts = [RingGswCiphertext.input(ctx, circuit) for _ in msgs]
    key_wire = circuit.input(1)[0]
    # t = q: scale 1, so the decoded polynomial is exactly sum m_i x^i
    out = decrypt_error_coefficients_as_polynomial(circuit, w_cts, key_wire, ctx.q_big)
    circuit.output([out])
    (got,) = run(circuit, params, ctx, natives, s)
    assert got.coeffs() == msgs


def test_centered_mask_polynomial():
    params, circuit, ctx = setup()
    rng = random.Random(32)
    s = -1
    v_bits = 1
    # coeff-major layout: bits[coeff * v_bits + bit]
    bits = [1, 0, 1, 0]
    moduli = mask_plaintext_moduli_from_full_modulus(ctx.q_big, v_bits)
    natives = [native_encrypt(ctx, s, b, rng) for b in bits]
    w_cts = [RingGswCiphertext.input(ctx, circuit) for _ in bits]
    key_wire = circuit.input(1)[0]
    out = decrypt_centered_bit_decomposed_polynomial(circuit, w_cts, key_wire, moduli)
    circuit.output([out])
    (got,) = run(circuit, params, ctx, natives, s)
    q = ctx.q_big
    midpoint = 1 << (v_bits - 1)
    want = [(b * (q // (q >> 0)) + midpoint) % q for b in bits]
    assert got.coeffs() == want


def test_merge_circuit():
    params = RingParams.default()
    circuit = build_refreshed_wire_merge_subcircuit(3)
    errors = [Poly.const(params, v) for v in (1, 2, 3)]
    masks = [Poly.const(params, v) for v in (10, 20, 30)]
    got = circuit.eval(params, Poly.one(params), errors + masks)
    assert [p.const_coeff() for p in got] == [11, 22, 33]
    crt_merge = build_refreshed_wire_digit_all_crt_merge(params)
    got2 = crt_merge.eval(
        params, Poly.one(params),
        [Poly.const(params, v) for v in (5, 6)] + [Poly.const(params, v) for v in (1, 1)],
    )
    assert [p.const_coeff() for p in got2] == [6, 7]


def test_prg_material_structure():
    """Material builder wires the right ciphertext counts (tiny config; the
    homomorphic PRG itself is exercised in test_goldreich)."""
    params, circuit, ctx = setup()
    seed_cts = [RingGswCiphertext.input(ctx, circuit) for _ in range(9)]
    material = build_noise_refresh_prg_material(
        circuit, seed_cts, b"seed", ring_dim=1, log_base_q=1, crt_depth=1,
        v_bits=2, cbd_n=1,
    )
    sizes = goldreich_noise_refresh_output_sizes(1, 1, 1, 2)
    assert len(material.errors) == sizes.cbd_values
    assert len(material.masks) == sizes.mask_bits
