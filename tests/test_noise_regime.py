"""Noise-regime end-to-end tests (VERDICT r1 item 3): every protocol layer
exercised with real Gaussian error (sigma >= 4.0) at ring dimension n >= 256,
asserting (a) correct decode and (b) observed error <= the simulated norm
bound — the reference's three-way-oracle-plus-norms pattern
(/root/reference/tests/test_lwe_modp_chain.rs:29-90,
/root/reference/src/simulator/error_norm.rs:16).
"""

import random
from decimal import Decimal

import pytest

import mxx_tpu  # noqa: F401

pytestmark = pytest.mark.slow

from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator, PublicLut
from mxx_tpu.lookup.ggh15 import (
    GGH15BGGEncodingPltEvaluator,
    GGH15BGGPubKeyPltEvaluator,
)
from mxx_tpu.lookup.lwe import LWEBGGEncodingPltEvaluator, LWEBGGPubKeyPltEvaluator
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.sampler import TernaryDist, TrapdoorSampler, UniformSampler
from mxx_tpu.simulator import (
    NormPltGGH15Evaluator,
    NormPltLWEEvaluator,
    SimulatorContext,
    simulate_max_error_norm,
)
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

ERROR_SIGMA = 4.0
TRAPDOOR_SIGMA = 4.578
KEY = bytes([0xA7, 0x31, 0x58, 0xEE] * 8)
E_INIT = Decimal(ERROR_SIGMA) * Decimal("6.5")  # sigma * gaussian tail factor


def _max_centered_coeff(params, matrix: PolyMatrix) -> int:
    """max |coeff| over all entries, coefficients centered around 0 mod q."""
    q = params.modulus
    worst = 0
    for r in range(matrix.nrow):
        for c in range(matrix.ncol):
            for v in matrix.entry(r, c).coeffs():
                worst = max(worst, min(int(v), q - int(v)))
    return worst


def test_ggh15_noise_arbitrary_table_n256(tmp_path):
    """GGH15 chain at n=256 with sigma=4 noise everywhere and an ARBITRARY
    x -> (k, y) table (non-identity row map, k != x): decode + norm bound."""
    params = RingParams.new(256, 3, 28, 14)
    t_n = 8
    # arbitrary rows: k is a permuted, offset row index; y a nonlinear map
    table = {x: ((5 * x + 3) % t_n, (x * x + 1) % 6) for x in range(t_n)}
    lut = PublicLut.from_dict(params, table)
    assert any(k != x for x, (k, _) in table.items())

    circuit = PolyCircuit()
    inputs = circuit.input(1)
    lut_id = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(inputs[0], lut_id)])

    d = 1
    x_in = 6
    us = UniformSampler(seed=1041)
    secrets = [us.sample_poly(params, TernaryDist()) for _ in range(d)]
    pk_sampler = BGGPublicKeySampler(KEY, d)
    pubkeys = pk_sampler.sample(params, b"noise_ggh15", [True])
    es = BGGEncodingSampler(params, secrets, gauss_sigma=ERROR_SIGMA, seed=1042)
    encodings = es.sample(params, pubkeys, [Poly.const(params, x_in)])
    s_vec = es.secret_vec

    init_storage_system(tmp_path)
    pk_eval = GGH15BGGPubKeyPltEvaluator(
        KEY, d, TRAPDOOR_SIGMA, ERROR_SIGMA, tmp_path, seed=1043
    )
    result_pubkey = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    b0 = pk_eval.load_b0_matrix_checkpoint(params)
    c_b0 = s_vec @ b0
    enc_eval = GGH15BGGEncodingPltEvaluator(
        KEY, tmp_path, pk_eval.checkpoint_prefix(params), params, c_b0
    )
    enc = circuit.eval(params, encodings[0], encodings[1:], plt_evaluator=enc_eval)[0]

    expected_k, expected_y = table[x_in]
    assert enc.plaintext.const_coeff() == expected_y
    assert enc.pubkey.matrix == result_pubkey[0].matrix

    # observed BGG relation error: c - s*A_out + y*(s*G)
    g = PolyMatrix.gadget_matrix(params, d)
    diff = (
        enc.vector
        - s_vec @ enc.pubkey.matrix
        + (s_vec @ g).mul_poly_scalar(Poly.const(params, expected_y))
    )
    observed = _max_centered_coeff(params, diff)

    ctx = SimulatorContext.for_params(params, d)
    norm_eval = NormPltGGH15Evaluator(
        ctx, Decimal(ERROR_SIGMA), Decimal(ERROR_SIGMA)
    )
    outs = simulate_max_error_norm(
        circuit, ctx, Decimal(t_n - 1), 1, E_INIT, plt_evaluator=norm_eval
    )
    bound = int(outs[0].matrix_norm.poly_norm.norm)
    assert 0 < observed <= bound, (observed, bound)
    # the bound must also be usable: far below q
    assert bound < params.modulus // 4


def test_lwe_lookup_noise_n256(tmp_path):
    """LWE LUT at n=256 with sigma=4: decode + norm bound (the n=16 chain in
    test_lwe_modp_chain covers depth; this covers ring dimension)."""
    params = RingParams.new(256, 3, 28, 14)
    p_mod = 5
    lut = PublicLut.from_dict(params, {x: (x, x % p_mod) for x in range(p_mod * 2)})

    circuit = PolyCircuit()
    inputs = circuit.input(1)
    lut_id = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(inputs[0], lut_id)])

    d = 1
    x_in = 7
    us = UniformSampler(seed=2041)
    secrets = [us.sample_poly(params, TernaryDist()) for _ in range(d)]
    pk_sampler = BGGPublicKeySampler(KEY, d)
    pubkeys = pk_sampler.sample(params, b"noise_lwe", [True])
    es = BGGEncodingSampler(params, secrets, gauss_sigma=ERROR_SIGMA, seed=2042)
    encodings = es.sample(params, pubkeys, [Poly.const(params, x_in)])
    s_vec = es.secret_vec

    trap = TrapdoorSampler(params, TRAPDOOR_SIGMA, seed=2043)
    b0_trapdoor, b0_matrix = trap.trapdoor(params, d)
    init_storage_system(tmp_path)

    pt = circuit.eval(
        params, Poly.one(params), [Poly.const(params, x_in)],
        plt_evaluator=PolyPltEvaluator(),
    )[0]
    assert pt.const_coeff() == x_in % p_mod

    pk_eval = LWEBGGPubKeyPltEvaluator(KEY, trap, b0_matrix, b0_trapdoor, tmp_path)
    result_pubkey = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    c_b = s_vec @ b0_matrix
    enc_eval = LWEBGGEncodingPltEvaluator(KEY, tmp_path, c_b)
    enc = circuit.eval(params, encodings[0], encodings[1:], plt_evaluator=enc_eval)[0]
    assert enc.plaintext.const_coeff() == x_in % p_mod
    assert enc.pubkey.matrix == result_pubkey[0].matrix

    g = PolyMatrix.gadget_matrix(params, d)
    diff = (
        enc.vector
        - s_vec @ enc.pubkey.matrix
        + (s_vec @ g).mul_poly_scalar(enc.plaintext)
    )
    observed = _max_centered_coeff(params, diff)

    ctx = SimulatorContext.for_params(params, d)
    outs = simulate_max_error_norm(
        circuit, ctx, Decimal(p_mod * 2 - 1), 1, E_INIT,
        plt_evaluator=NormPltLWEEvaluator(ctx, Decimal(ERROR_SIGMA)),
    )
    bound = int(outs[0].matrix_norm.poly_norm.norm)
    assert 0 < observed <= bound, (observed, bound)


def test_injector_noise_bound_n256(tmp_path):
    """Diamond injector at n=256 with sigma=4 transition errors: the final
    one-wire relation error stays within the simulated state bound."""
    from mxx_tpu.input_injector import DiamondInjector
    from mxx_tpu.input_injector.simulation import simulate_output_error_bounds

    params = RingParams.new(256, 4, 28, 14)
    inj = DiamondInjector(params, 2, 2, 1, TRAPDOOR_SIGMA, ERROR_SIGMA, seed=3041)
    k = Poly.const(params, 1)
    pre_out = inj.preprocess(tmp_path, k)
    digits = [1, 0]
    states = inj.online_eval(tmp_path, pre_out, digits)

    # relation: the k-branch keeps the payload, so
    # state0 = [sigma_final, k] @ B_final(0) + accumulated error
    sigma = inj.debug_final_secret_matrix(tmp_path, digits)
    want_row = PolyMatrix.from_poly_row(params, [sigma.entry(0, 0), k])
    b_final = pre_out.final_pub_matrices[0]
    diff = states[0] - want_row @ b_final
    observed = _max_centered_coeff(params, diff)

    sim = simulate_output_error_bounds(inj)
    bound = int(sim.state_errors[0].poly_norm.norm)
    assert 0 < observed <= bound, (observed, bound)
    assert bound < params.modulus // 4


def test_diamond_we_noise_n256(tmp_path):
    """Diamond WE at n=256 with sigma=4 injector + encoding noise."""
    from mxx_tpu.input_injector import DiamondInjector
    from mxx_tpu.we import DiamondWE

    # base 2^7, 5 limbs: the decoder's extra G^{-1}(r) multiplication and the
    # n-fold polynomial products must leave the error below q/4 after the
    # injector chain + circuit eval growth (the reference pins its own WE
    # tests to injector sigma=0, diamond_we.rs:579 — this asserts the noisy
    # regime instead, with the payload-row error zeroed by construction in
    # the injector)
    params = RingParams.new(256, 5, 28, 7)
    witness_size = 2
    instance = [False]
    circuit = PolyCircuit()
    inputs = circuit.input(witness_size + len(instance))
    circuit.output([circuit.or_gate(inputs[0], inputs[1])])
    for i, msg in enumerate([False, True]):
        d = tmp_path / f"w{i}"
        injector = DiamondInjector(
            params, 1, 4, 2, TRAPDOOR_SIGMA, ERROR_SIGMA, seed=4090 + i
        )
        we = DiamondWE(injector, witness_size, d, b"noise_we", seed=4091 + i)
        ct = we.enc(msg, circuit, instance)
        assert we.dec(ct, [False, True]) == msg


def test_diamond_io_packed_noise_n256(tmp_path):
    """PACKED-payload Diamond iO at n=256 with sigma=4 noise everywhere
    (VERDICT r2 directive #2 'done' condition): the TERNARY RING-POLY payload
    k over R' = Z_Q[X']/(X'^4 + 1), per-R'-coeff mask channel (4 mask cts per
    output instead of 256), per-round per-slot rebase + PACKED noise refresh,
    and a deterministic decode-margin assert. The per-R'-coeff channel is
    exactly what makes n=256 CI-feasible — the scalar mask channel scales
    with n (see test_diamond_io_noise below)."""
    from mxx_tpu.io_protocols import DiamondIO
    from mxx_tpu.io_protocols.prf_mask import PrfConfig
    from mxx_tpu.lookup.debug import (
        DebugBGGEncodingPltEvaluator,
        DebugBGGPubKeyPltEvaluator,
    )

    params = RingParams.new(256, 3, 24, 5)
    prf_config = PrfConfig(
        seed_bits=5,
        prf_mask_output_coeff_bits=1,
        p_moduli_bits=5,
        max_unreduced_muls=1,
        noise_refresh_v_bits=1,
        debug_encrypt_random_prg_wires=True,
        debug_reuse_single_material=True,
        refresh_wire_limit=1,
    )
    dio = DiamondIO(
        params, input_count=2, batch_bits=1, seed=6042,
        error_sigma=ERROR_SIGMA,
        prf_config=prf_config,
        payload_slots=4,
        pk_plt_evaluator_factory=lambda s, d, hk, pre: DebugBGGPubKeyPltEvaluator(hk),
        enc_plt_evaluator_factory=lambda s, d, obf, states, digits:
            DebugBGGEncodingPltEvaluator(
                obf.hash_key, s.injector.debug_final_secret_matrix(d, digits)
            ),
    )

    def builder(circuit, bits):
        return [circuit.xor_gate(bits[0], bits[1])]

    obf = dio.obfuscate(tmp_path, builder)
    # per-R'-coeff mask channel: 4 mask cts per output, NOT n=256
    assert dio._mask_bits_per_output() == 4
    observed_worst = 0
    for bits in ([0, 1], [1, 1]):
        out = dio.eval(tmp_path, obf, builder, bits)
        assert out == [bits[0] ^ bits[1]], (bits, out)
        for coeff, err, q in dio.last_decode_margins:
            assert err < (q // 4) >> 4, (coeff, err, q)
            observed_worst = max(observed_worst, int(err))

    # Composed budget vs observed error (VERDICT r4 directive #5): the
    # replay-mode budget prices exactly the pipeline this test runs (the
    # reference's own e2e test mode, diamond_io.rs:122-134 — fresh PRG/mask
    # ciphertexts, no PRG round evolution). Soundness: observed <= bound.
    # Non-vacuity: bound within SLACK_BITS of the observation (the measured
    # gap is ~45-60 bits of worst-case (observed 60-66-bit errors vs the 110-bit bound in rounds 3-5 records) 6.5-sigma tail compounding through the
    # ~70-gate-deep mask decrypt; a budget regression to astronomically
    # loose — the round-1 CSV fiction class — or to unsound trips one side).
    from mxx_tpu.circuit import PolyCircuit
    from mxx_tpu.io_protocols.protocol_simulation import (
        diamond_compose_input_error,
        simulate_prf_protocol_error,
    )

    fn_circuit = PolyCircuit()
    ins = fn_circuit.input(2)
    fn_circuit.output([fn_circuit.xor_gate(ins[0], ins[1])])
    e_enc, worst_state = diamond_compose_input_error(params, dio.injector, TRAPDOOR_SIGMA)
    sim = simulate_prf_protocol_error(
        params, dio._prf_pipeline(), fn_circuit,
        input_error_norm=e_enc, state_error_norm=worst_state,
        error_sigma=ERROR_SIGMA, trapdoor_sigma=TRAPDOOR_SIGMA,
        secret_size=dio.secret_size, replay_mode=True,
    )
    observed_bits = observed_worst.bit_length()
    SLACK_BITS = 80
    assert observed_bits <= sim.total_error_bits, (
        f"composed bound unsound: observed {observed_bits} bits > "
        f"bound {sim.total_error_bits} bits"
    )
    assert sim.total_error_bits <= observed_bits + SLACK_BITS, (
        f"composed bound vacuous: bound {sim.total_error_bits} bits vs "
        f"observed {observed_bits} bits"
    )


def test_diamond_io_noise(tmp_path):
    """Diamond iO e2e with sigma=4 noise EVERYWHERE (injector transitions,
    BGG encodings, GSW seed/mask/material ciphertexts). Ring dimension is 16,
    not 256: the SCALAR-wire mask channel needs n mask ciphertexts per output
    (each a full nested-RNS wire lift); the packed-payload mode covers n=256
    (test_diamond_io_packed_noise_n256 above) via the per-R'-coeff channel."""
    from mxx_tpu.io_protocols import DiamondIO
    from mxx_tpu.io_protocols.prf_mask import PrfConfig
    from mxx_tpu.lookup.debug import (
        DebugBGGEncodingPltEvaluator,
        DebugBGGPubKeyPltEvaluator,
    )

    # base 2^5: the injector chain error scales with preimage_norm^2 * sigma
    # and must stay under Q/4 after the output projection. crt_bits=24 (not
    # 20): at 20 bits the measured decode error at sigma=4 is ~0.9*Q/4 —
    # decode success was a coin flip over the noise realization (round-3
    # margin probes: coeff error 2.6e17 vs Q/4 = 2.9e17); 24-bit limbs give
    # ~12 bits of deterministic margin for the same circuit
    params = RingParams.new(16, 3, 24, 5)
    prf_config = PrfConfig(
        seed_bits=5,
        prf_mask_output_coeff_bits=1,
        p_moduli_bits=5,
        max_unreduced_muls=1,
        noise_refresh_v_bits=1,
        debug_encrypt_random_prg_wires=True,
        debug_reuse_single_material=True,
        refresh_wire_limit=1,
    )
    dio = DiamondIO(
        params, input_count=2, batch_bits=1, seed=5042,
        error_sigma=ERROR_SIGMA,
        prf_config=prf_config,
        pk_plt_evaluator_factory=lambda s, d, hk, pre: DebugBGGPubKeyPltEvaluator(hk),
        enc_plt_evaluator_factory=lambda s, d, obf, states, digits:
            DebugBGGEncodingPltEvaluator(
                obf.hash_key, s.injector.debug_final_secret_matrix(d, digits)
            ),
    )

    def builder(circuit, bits):
        return [circuit.xor_gate(bits[0], bits[1])]

    obf = dio.obfuscate(tmp_path, builder)
    for bits in ([0, 1], [1, 1]):
        out = dio.eval(tmp_path, obf, builder, bits)
        assert out == [bits[0] ^ bits[1]], (bits, out)
        # decode margin: error must clear Q/4 with at least 4 bits to spare,
        # so the pass is deterministic across noise realizations rather than
        # a coin flip (the round-2 config failed exactly this way)
        for coeff, err, q in dio.last_decode_margins:
            assert err < (q // 4) >> 4, (coeff, err, q)
