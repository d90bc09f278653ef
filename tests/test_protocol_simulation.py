"""Composed protocol error budget + protocol bench estimators
(VERDICT r2 directives #5/#6/#7): the Diamond/AKY24 per-phase error
composition (injector/fresh input -> PRF rounds -> refresh -> mask decrypt ->
decode margin) and the keygen/dec/WE/decoder bench estimation surfaces."""

from decimal import Decimal

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.io_protocols.prf_mask import PrfConfig, PrfMaskPipeline
from mxx_tpu.io_protocols.protocol_simulation import (
    diamond_compose_input_error,
    simulate_prf_protocol_error,
)
from mxx_tpu.ring.params import RingParams
from mxx_tpu.sampler import TrapdoorSampler


def _xor_circuit():
    c = PolyCircuit()
    bits = c.input(2)
    c.output([c.xor_gate(bits[0], bits[1])])
    return c


def _make_prf(params, mask_bits: int = 1):
    cfg = PrfConfig(
        seed_bits=5,
        prf_mask_output_coeff_bits=mask_bits,
        p_moduli_bits=8,
        max_unreduced_muls=2,
        p_basis="wide",
        noise_refresh_v_bits=1,
    )
    return PrfMaskPipeline(
        params, cfg, b"\0" * 32, TrapdoorSampler(params, 4.578, seed=0),
        input_count=2, batch_bits=1,
    )


@pytest.mark.slow
def test_composed_budget_phases_and_margin():
    """The composed budget produces every phase bound, the steady-state
    refreshed error is input-independent, and the margin arithmetic is
    consistent. (At toy depth the margin is legitimately negative: worst-case
    plaintext values inside GSW-over-BGG muls reach the nested-RNS budget
    scale, which is exactly why the reference's production configs carry
    50+ CRT limbs.)"""
    params = RingParams.new(4, 3, 24, 12)
    prf = _make_prf(params)
    sim = simulate_prf_protocol_error(
        params, prf, _xor_circuit(),
        input_error_norm=Decimal(26), error_sigma=4.0,
    )
    # two representative rounds: first + steady state
    assert len(sim.prg_round_error_bits) == 2
    assert len(sim.refreshed_error_bits) == 2
    # refresh kills input-error dependence: steady state <= first round
    assert sim.refreshed_error_bits[1] <= sim.refreshed_error_bits[0] + 1
    assert sim.total_error_bits >= max(
        sim.function_error_bits, sim.mask_error_bits
    )
    assert sim.margin_bits == (params.modulus // 4).bit_length() - sim.total_error_bits
    assert not sim.ok  # toy depth cannot clear a 400+-bit worst-case bound


@pytest.mark.slow
def test_composed_budget_monotone_in_depth():
    """More CRT depth -> more margin, once past the toy regime: the error
    grows ~66 bits per DOUBLING of depth (gadget width ~ depth enters each
    chained GSW mul), while q gains crt_bits per added limb — so the search
    knob converges from depth ~4 up at 24-bit limbs (the reference's
    production points sit at 50+ limbs where a +1 limb costs ~1 error bit)."""
    sims = []
    for depth in (4, 8):
        params = RingParams.new(4, depth, 24, 12)
        prf = _make_prf(params)
        sims.append(
            simulate_prf_protocol_error(
                params, prf, _xor_circuit(),
                input_error_norm=Decimal(26), error_sigma=4.0,
            )
        )
    assert sims[1].margin_bits > sims[0].margin_bits


def test_diamond_compose_input_error():
    from mxx_tpu.input_injector import DiamondInjector

    params = RingParams.new(4, 3, 24, 12)
    inj = DiamondInjector(params, 2, 2, 1, 4.578, 4.0, seed=9)
    e_enc, state = diamond_compose_input_error(params, inj, 4.578)
    assert e_enc > state > 0


@pytest.mark.slow
def test_aky24_fe_bench_and_simulation():
    from mxx_tpu.func_enc.bench import (
        estimate_aky24_dec,
        estimate_aky24_keygen,
        simulate_aky24_dec_error,
    )

    params = RingParams.new(4, 3, 24, 12)
    circuit = _xor_circuit()
    kg = estimate_aky24_keygen(params, circuit)
    assert kg.total_secs > kg.circuit_latency_secs > 0
    dec = estimate_aky24_dec(params, circuit)
    assert dec.total_secs > dec.circuit_latency_secs > 0
    sim = simulate_aky24_dec_error(params, circuit, _make_prf(params))
    assert sim.total_error_bits > 0 and len(sim.refreshed_error_bits) == 2


@pytest.mark.slow
def test_aky24_io_and_we_bench_estimators():
    from mxx_tpu.input_injector import DiamondInjector
    from mxx_tpu.io_protocols.aky24_io import Aky24IO, estimate_aky24_io
    from mxx_tpu.we.bench_estimator import estimate_diamond_we

    params = RingParams.new(4, 2, 24, 12)
    circuit = _xor_circuit()
    io = Aky24IO(
        params=params, bgg_tag=b"t", input_size=2, output_size=1,
        seed_bits=5, prf_batch_bits=1, prf_mask_output_coeff_bits=1,
        noise_refresh_v_bits=1, noise_refresh_cbd_n=1,
    )
    est = estimate_aky24_io(io, circuit)
    assert est.obfuscate_latency_secs > est.eval_latency_secs > 0
    assert est.prf_preimage_count == 2 * 2 * 5 * (1 + params.crt_depth)

    inj = DiamondInjector(params, 2, 2, 1, 4.578, 0.0, seed=4)
    we = estimate_diamond_we(inj, circuit)
    assert we.enc_latency_secs > 0 and we.dec_latency_secs > 0
    assert we.injector_preimage_count > 0


def test_decoder_bench_scaling():
    from mxx_tpu.decoder.bench import estimate_decoder_scaling

    params = RingParams.new(4, 2, 24, 12)
    est = estimate_decoder_scaling(params, [1, 4, 16])
    assert est.per_output_secs > 0
    assert est.latency_secs[2] > est.latency_secs[0]
    assert abs(est.latency_secs[1] - 4 * est.per_output_secs) < 1e-9
