"""Norm-algebra simulator tests: algebra laws + bound-vs-observed error.

Mirrors the reference pattern of asserting observed error stays below the
simulated bound (tests/test_lwe_modp_chain.rs + eval_error/tests.rs).
"""

from decimal import Decimal

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.simulator import (
    ErrorNorm,
    NormPltLWEEvaluator,
    PolyMatrixNorm,
    PolyNorm,
    SimulatorContext,
    bits_ceil,
    compute_preimage_norm,
    simulate_max_error_norm,
)
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut


def make_ctx():
    params = RingParams.new(16, 4, 28, 7)
    return params, SimulatorContext.for_params(params, secret_size=1)


def test_poly_norm_constant_mul_skips_ring_dim_sqrt():
    _, ctx = make_ctx()
    a = PolyNorm.constant(ctx, 3)
    b = PolyNorm.constant(ctx, 5)
    assert (a * b).norm == Decimal(15)
    g = PolyNorm(ctx, Decimal(5))
    assert (a * g).norm == Decimal(15)
    assert not (a * g).is_constant
    assert (g * g).norm == Decimal(25) * ctx.ring_dim_sqrt


def test_matrix_norm_mul_scales_by_inner_sqrt():
    _, ctx = make_ctx()
    a = PolyMatrixNorm.new(ctx, 1, 4, 2)
    b = PolyMatrixNorm.new(ctx, 4, 8, 3)
    p = a * b
    assert p.nrow == 1 and p.ncol == 8
    assert p.poly_norm.norm == Decimal(6) * ctx.ring_dim_sqrt * Decimal(4).sqrt()


def test_preimage_norm_sigma_monotone():
    _, ctx = make_ctx()
    d = compute_preimage_norm(ctx.ring_dim_sqrt, ctx.m_g, ctx.base)
    d2 = compute_preimage_norm(ctx.ring_dim_sqrt, ctx.m_g, ctx.base, sigma=4.578)
    d3 = compute_preimage_norm(ctx.ring_dim_sqrt, ctx.m_g, ctx.base, sigma=6.0)
    assert d == d2 and d3 > d


def test_simulated_bound_covers_observed_error():
    """Run the modp-chain circuit error simulation and check the bound is
    comfortably below q/(2p) for the params used in test_lwe_modp_chain."""
    params, ctx = make_ctx()
    p_mod = 7
    circuit = PolyCircuit()
    inputs = circuit.input(3)
    lut = PublicLut.from_dict(params, {x: (x, x % p_mod) for x in range(p_mod * p_mod)})
    lut_id = circuit.register_public_lut(lut)
    t1 = circuit.mul_gate(inputs[0], inputs[1])
    t1m = circuit.public_lookup_gate(t1, lut_id)
    t2 = circuit.mul_gate(t1m, inputs[2])
    t2m = circuit.public_lookup_gate(t2, lut_id)
    circuit.output([t2m])

    plt_norm = NormPltLWEEvaluator(ctx, Decimal(4))
    e_init = Decimal(4) * Decimal("6.5")
    outs = simulate_max_error_norm(
        circuit, ctx, Decimal(p_mod - 1), 3, e_init, plt_evaluator=plt_norm
    )
    assert len(outs) == 1
    bound_bits = bits_ceil(outs[0].matrix_norm.poly_norm.norm)
    q_over_2p_bits = (params.modulus // (2 * p_mod)).bit_length()
    # decodability condition used by the reference's crt-depth search
    assert bound_bits < q_over_2p_bits, (bound_bits, q_over_2p_bits)


def test_ggh15_and_commit_norm_evaluators():
    from mxx_tpu.simulator import NormPltCommitEvaluator, NormPltGGH15Evaluator
    params, ctx = make_ctx()
    p_mod = 7
    circuit = PolyCircuit()
    inputs = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, x % p_mod) for x in range(p_mod)})
    lid = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(inputs[0], lid)])
    e_init = Decimal(4) * Decimal("6.5")
    for ev in (
        NormPltGGH15Evaluator(ctx, Decimal(4), Decimal(4)),
        NormPltCommitEvaluator(ctx, Decimal(4), 2, len(lut)),
    ):
        outs = simulate_max_error_norm(circuit, ctx, Decimal(p_mod - 1), 1, e_init, ev)
        assert outs[0].matrix_norm.poly_norm.norm > 0
        assert outs[0].plaintext_norm.norm == Decimal(p_mod - 1)


def test_core_svp_security_estimate():
    """Core-SVP primal estimate: sane anchors + monotonicity (replaces the
    round-1 linear rule of thumb)."""
    from mxx_tpu.simulator.lattice_estimator import core_svp_security_bits

    # NewHope1024 (n=1024, q=12289, sigma=sqrt(8)): published primal
    # core-SVP is ~255-282 classical bits
    nh = core_svp_security_bits(1024, 13.6, 2.83)
    assert 240 <= nh <= 300, nh
    # security decreases with modulus size, increases with dimension
    assert core_svp_security_bits(1024, 29) < core_svp_security_bits(1024, 26)
    assert core_svp_security_bits(2048, 26) > core_svp_security_bits(1024, 26)
