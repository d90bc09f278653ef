"""Debug preimage shortcut, relation-checking evaluator, injector simulation."""

from decimal import Decimal

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, TernaryDist, TrapdoorSampler, UniformSampler
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup.debug import RelationCheckingPltEvaluator, debug_trapdoor_preimage
from mxx_tpu.lookup.lwe import LWEBGGEncodingPltEvaluator, LWEBGGPubKeyPltEvaluator
from mxx_tpu.input_injector import DiamondInjector
from mxx_tpu.input_injector.simulation import simulate_output_error_bounds
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

KEY = bytes(range(32))


def test_debug_preimage_is_exact_preimage():
    params = RingParams.default()
    ts = TrapdoorSampler(params, 4.578, seed=131)
    td, a = ts.trapdoor(params, 1)
    target = UniformSampler(seed=132).sample_uniform(params, 1, 2, FinRingDist())
    x = debug_trapdoor_preimage(params, td, target)
    assert (a @ x) == target


def test_relation_checking_evaluator(tmp_path):
    params = RingParams.new(16, 4, 28, 7)
    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, x % 3) for x in range(9)})
    lid = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(w[0], lid)])

    us = UniformSampler(seed=133)
    secrets = [us.sample_poly(params, TernaryDist())]
    pubkeys = BGGPublicKeySampler(KEY, 1).sample(params, b"dbg", [True])
    es = BGGEncodingSampler(params, secrets, None, seed=134)
    encodings = es.sample(params, pubkeys, [Poly.const(params, 7)])

    init_storage_system(tmp_path)
    ts = TrapdoorSampler(params, 4.578, seed=135)
    td, b0 = ts.trapdoor(params, 1)
    pk_eval = LWEBGGPubKeyPltEvaluator(KEY, ts, b0, td, tmp_path)
    circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    enc_eval = RelationCheckingPltEvaluator(
        LWEBGGEncodingPltEvaluator(KEY, tmp_path, es.secret_vec @ b0), es.secret_vec
    )
    out = circuit.eval(params, encodings[0], encodings[1:], plt_evaluator=enc_eval)[0]
    assert out.plaintext.const_coeff() == 7 % 3


def test_injector_error_simulation():
    params = RingParams.new(16, 4, 28, 7)
    injector = DiamondInjector(params, 3, 4, 2, 4.578, 4.0, seed=136)
    sim = simulate_output_error_bounds(injector)
    assert len(sim.state_errors) == 1 + 3 * 2
    # deeper levels accumulate more error
    assert sim.state_errors[1].poly_norm.norm > 0
    assert sim.output_preimage.poly_norm.norm > 0
    # error grows monotonically with input_count
    sim2 = simulate_output_error_bounds(
        DiamondInjector(params, 5, 4, 2, 4.578, 4.0, seed=137)
    )
    assert sim2.state_errors[0].poly_norm.norm > sim.state_errors[0].poly_norm.norm


@pytest.mark.slow
def test_diamond_io_find_crt_depth():
    """Diamond CRT-depth search under the COMPOSED budget (injector ->
    PRF rounds -> refresh -> mask decrypt -> decode; reference
    diamond_io_find_crt_depth + io/utils/simulation.rs). The composed
    worst-case bound honestly reflects in-circuit GSW evaluation, so small
    depths must be rejected — the reference's production configs carry
    50+ x 28-bit limbs for exactly this reason; a positive search runs
    offline at production scale, not in CI."""
    from mxx_tpu.io_protocols.diamond_io import diamond_io_find_crt_depth
    from mxx_tpu.io_protocols.protocol_simulation import (
        simulate_prf_protocol_error,
    )
    from mxx_tpu.io_protocols.prf_mask import PrfConfig, PrfMaskPipeline
    from mxx_tpu.sampler import TrapdoorSampler
    from mxx_tpu.circuit import PolyCircuit
    from mxx_tpu.lookup import PublicLut
    from mxx_tpu.ring.params import RingParams
    from decimal import Decimal

    def make_circuit(params):
        c = PolyCircuit()
        bits = c.input(2)
        lut = PublicLut.from_dict(params, {x: (x, x % 2) for x in range(4)})
        lid = c.register_public_lut(lut)
        c.output([c.public_lookup_gate(c.add_gate(bits[0], bits[1]), lid)])
        return c

    got = diamond_io_find_crt_depth(
        16, 28, 7, max_depth=3, input_count=2, batch_bits=1,
        make_circuit=make_circuit,
    )
    assert got is None  # composed budget: 3 x 28-bit limbs cannot suffice

    # the composed budget exposes every phase (injector input, PRF rounds,
    # refresh, mask, decode) and its margin arithmetic is consistent
    params = RingParams.new(16, 3, 28, 7)
    cfg = PrfConfig(max_unreduced_muls=2, p_moduli_bits=16, p_basis="wide")
    prf = PrfMaskPipeline(
        params, cfg, b"\0" * 32, TrapdoorSampler(params, 4.578, seed=0), 2, 1,
    )
    sim = simulate_prf_protocol_error(
        params, prf, make_circuit(params),
        input_error_norm=Decimal(100), error_sigma=4.0,
    )
    assert len(sim.prg_round_error_bits) == 2
    assert sim.margin_bits == (
        (params.modulus // 4).bit_length() - sim.total_error_bits
    )
    # monotonicity in depth holds past the toy regime — covered by the slow
    # test_composed_budget_monotone_in_depth (depths 4 -> 8)
