"""GGH15 lookup end-to-end: offline pubkey chain + online encoding + resume.

Mirror of /root/reference/src/lookup/ggh15/mod.rs tests
(test_ggh15_plt_eval_single_input) with zero error for exact assertions.
"""

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import TernaryDist, UniformSampler
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup.ggh15 import GGH15BGGEncodingPltEvaluator, GGH15BGGPubKeyPltEvaluator
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

SIGMA = 4.578
KEY = bytes([0x5A] * 32)


def test_ggh15_checkpoint_prefix_marker():
    params = RingParams.default()
    ev = GGH15BGGPubKeyPltEvaluator(KEY, 2, SIGMA, 0.0, "/tmp/unused")
    assert "_ins0_key" in ev.checkpoint_prefix(params)


def test_ggh15_plt_eval_single_input(tmp_path):
    params = RingParams.default()
    t_n = 16
    lut = PublicLut.from_dict(params, {x: (x, x % 2) for x in range(t_n)})

    circuit = PolyCircuit()
    inputs = circuit.input(1)
    plt_id = circuit.register_public_lut(lut)
    out = circuit.public_lookup_gate(inputs[0], plt_id)
    circuit.output([out])

    d = 2
    us = UniformSampler(seed=41)
    secrets = [us.sample_poly(params, TernaryDist()) for _ in range(d)]
    rand_int = 11
    plaintexts = [Poly.const(params, rand_int)]

    pk_sampler = BGGPublicKeySampler(KEY, d)
    pubkeys = pk_sampler.sample(params, b"ggh15_tag", [True])
    es = BGGEncodingSampler(params, secrets, None, seed=42)
    encodings = es.sample(params, pubkeys, plaintexts)
    s_vec = es.secret_vec

    init_storage_system(tmp_path)
    pk_eval = GGH15BGGPubKeyPltEvaluator(KEY, d, SIGMA, 0.0, tmp_path, seed=43)
    result_pubkey = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)
    assert len(result_pubkey) == 1
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()

    b0_matrix = pk_eval.load_b0_matrix_checkpoint(params)
    assert b0_matrix is not None
    c_b0 = s_vec @ b0_matrix
    cp = pk_eval.checkpoint_prefix(params)

    enc_eval = GGH15BGGEncodingPltEvaluator(KEY, tmp_path, cp, params, c_b0)
    result_encoding = circuit.eval(params, encodings[0], encodings[1:], plt_evaluator=enc_eval)
    assert len(result_encoding) == 1
    enc = result_encoding[0]
    assert enc.pubkey == result_pubkey[0]

    expected_plaintext = Poly.const(params, rand_int % 2)
    assert enc.plaintext == expected_plaintext

    # exact relation with zero error: c = s*(A_out - G*y)
    g = PolyMatrix.gadget_matrix(params, d)
    expected_vector = s_vec @ (enc.pubkey.matrix - g.mul_poly_scalar(expected_plaintext))
    assert enc.vector == expected_vector


@pytest.mark.slow
def test_ggh15_resume_skips_existing(tmp_path):
    """A second sample_aux_matrices run with the same prefix resumes (no
    re-sampling) and the online path still decodes correctly."""
    params = RingParams.default()
    lut = PublicLut.from_dict(params, {x: (x, (x * 3) % 5) for x in range(8)})
    circuit = PolyCircuit()
    inputs = circuit.input(1)
    plt_id = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(inputs[0], plt_id)])

    d = 1
    us = UniformSampler(seed=51)
    secrets = [us.sample_poly(params, TernaryDist())]
    plaintexts = [Poly.const(params, 6)]
    pk_sampler = BGGPublicKeySampler(KEY, d)
    pubkeys = pk_sampler.sample(params, b"resume_tag", [True])
    es = BGGEncodingSampler(params, secrets, None, seed=52)
    encodings = es.sample(params, pubkeys, plaintexts)

    init_storage_system(tmp_path)
    pk_eval = GGH15BGGPubKeyPltEvaluator(KEY, d, SIGMA, 0.0, tmp_path, seed=53)
    circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval)
    pk_eval.sample_aux_matrices(params)
    wait_for_all_writes()
    files_before = sorted(p.name for p in tmp_path.iterdir())

    # fresh evaluator, same deterministic prefix: everything resumed
    pk_eval2 = GGH15BGGPubKeyPltEvaluator(KEY, d, SIGMA, 0.0, tmp_path, seed=99)
    circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=pk_eval2)
    pk_eval2.sample_aux_matrices(params)
    wait_for_all_writes()
    files_after = sorted(p.name for p in tmp_path.iterdir())
    assert files_before == files_after, "resume must not write new artifacts"

    b0 = pk_eval2.load_b0_matrix_checkpoint(params)
    c_b0 = es.secret_vec @ b0
    enc_eval = GGH15BGGEncodingPltEvaluator(
        KEY, tmp_path, pk_eval2.checkpoint_prefix(params), params, c_b0
    )
    enc = circuit.eval(params, encodings[0], encodings[1:], plt_evaluator=enc_eval)[0]
    assert enc.plaintext.const_coeff() == (6 * 3) % 5
