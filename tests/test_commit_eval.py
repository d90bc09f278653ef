"""WEE25-backed LUT commit evaluation: offline commit pass, online open pass,
exact decode (reference commit_eval.rs tests, zero-error encodings)."""

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.commit import Wee25Commit
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup.commit_eval import (
    CommitBGGEncodingPltEvaluator,
    CommitBGGPubKeyPltEvaluator,
    derive_a_out_matrix,
)
from mxx_tpu.sampler import TernaryDist, TrapdoorSampler, UniformSampler
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

KEY = bytes([3] * 32)
SIGMA = 4.578


def run_commit_lut(tmp_path, params, table, x_val, n_inputs=1, lookup_wire=0):
    """Offline+online commit-LUT pipeline on a 1-lookup circuit; returns
    (result_encoding, result_pubkey, secret_vec, expected_y)."""
    k = params.modulus_digits
    scheme = Wee25Commit(1, 2, k + 2, k, SIGMA)
    pp = scheme.sample_public_params(params, KEY, seed=111)

    circuit = PolyCircuit()
    w = circuit.input(n_inputs)
    lut = PublicLut.from_dict(params, table)
    lut_id = circuit.register_public_lut(lut)
    circuit.output([circuit.public_lookup_gate(w[lookup_wire], lut_id)])

    us = UniformSampler(seed=112)
    secrets = [us.sample_poly(params, TernaryDist())]
    pk_sampler = BGGPublicKeySampler(KEY, 1)
    pubkeys = pk_sampler.sample(params, b"ce", [True] * n_inputs)
    enc_sampler = BGGEncodingSampler(params, secrets)  # zero error: exact decode
    pts = [Poly.const(params, x_val)] * n_inputs
    encs = enc_sampler.sample(params, pubkeys, pts)

    ts = TrapdoorSampler(params, SIGMA, seed=113)
    b0_td, b0 = ts.trapdoor(params, 1)
    s_vec = enc_sampler.secret_vec
    c_b0 = s_vec @ b0
    c_b = s_vec @ pp.b

    init_storage_system(tmp_path)
    off = CommitBGGPubKeyPltEvaluator(params, scheme, pp, KEY)
    result_pk = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=off)[0]
    off.commit_all_lut_matrices(ts, b0_td, b0)
    wait_for_all_writes()

    on = CommitBGGEncodingPltEvaluator(
        params, scheme, pp, KEY, circuit, pubkeys[0], pubkeys[1:], c_b0, c_b, tmp_path
    )
    got = circuit.eval(params, encs[0], encs[1:], plt_evaluator=on)[0]
    return got, result_pk, s_vec, table[x_val][1]


@pytest.mark.slow
def test_commit_eval_exact_decode(tmp_path):
    params = RingParams.new(4, 2, 17, 17)
    table = {x: (x, (5 * x + 1) % 11) for x in range(4)}
    x_val = 2
    got, result_pk, s_vec, y = run_commit_lut(tmp_path, params, table, x_val)

    assert got.pubkey == result_pk
    assert got.pubkey.matrix == derive_a_out_matrix(params, 1, KEY, 2)
    assert got.plaintext.const_coeff() == y
    # zero-error inputs + exact preimages => exact BGG invariant on the output
    g = PolyMatrix.gadget_matrix(params, 1)
    want = s_vec @ (got.pubkey.matrix - g.mul_poly_scalar(Poly.const(params, y)))
    assert got.vector == want


def test_commit_eval_other_input(tmp_path):
    """x=0 exercises the (idx+1)^{-1} guard at idx=0."""
    params = RingParams.new(4, 2, 17, 17)
    table = {x: (x, (3 * x + 7) % 13) for x in range(4)}
    got, result_pk, s_vec, y = run_commit_lut(tmp_path, params, table, 0)
    assert got.plaintext.const_coeff() == y
    g = PolyMatrix.gadget_matrix(params, 1)
    want = s_vec @ (got.pubkey.matrix - g.mul_poly_scalar(Poly.const(params, y)))
    assert got.vector == want
