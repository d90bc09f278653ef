"""Preimage-backed slot transfer on packed BGG encodings: exact re-encode
under the destination slot secret (reference slot_transfer/bgg_pubkey.rs +
bgg_poly_encoding.rs tests, zero-error aux)."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import TernaryDist, UniformSampler
from mxx_tpu.bgg import BGGPublicKeySampler
from mxx_tpu.bgg.poly_encoding import BGGPolyEncodingSampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.slot_transfer.preimage import (
    BggPolyEncodingSTEvaluator,
    BggPublicKeySTEvaluator,
)
from mxx_tpu.storage import init_storage_system, wait_for_all_writes

KEY = bytes([5] * 32)
S = 3


def setup(params, slot_values, seed):
    us = UniformSampler(seed=seed)
    secrets = [us.sample_poly(params, TernaryDist())]
    pk_sampler = BGGPublicKeySampler(KEY, 1)
    pubkeys = pk_sampler.sample(params, b"st", [True] * len(slot_values))
    sampler = BGGPolyEncodingSampler(params, secrets, S, None, seed=seed + 1)
    slot_pts = [[Poly.const(params, v) for v in vals] for vals in slot_values]
    encs = sampler.sample(params, pubkeys, slot_pts)
    t_row = PolyMatrix.from_poly_row(params, secrets)
    s_mats = [PolyMatrix.from_polys(params, [[m]]) for m in sampler.masks]
    return sampler, pubkeys, encs, t_row, s_mats


def check_invariant(params, enc, sampler):
    g = PolyMatrix.gadget_matrix(params, 1)
    sg = sampler.secret_mat @ g
    sa = sampler.secret_mat @ enc.pubkey.matrix
    for s in range(enc.num_slots):
        want = sa.slice_rows(s, s + 1) - sg.slice_rows(s, s + 1).mul_poly_scalar(
            enc.plaintext(s)
        )
        assert enc.vector(s) == want, f"slot {s}"


def run_offline_online(tmp_path, params, circuit, pubkeys, encs, t_row, s_mats):
    init_storage_system(tmp_path)
    st_pk = BggPublicKeySTEvaluator(KEY, S, 4.578, 0.0, tmp_path, seed=91)
    result_pk = circuit.eval(
        params, pubkeys[0], pubkeys[1:], slot_transfer_evaluator=st_pk
    )[0]
    st_pk.sample_aux_matrices(params, s_mats)
    wait_for_all_writes()
    c_b0 = t_row @ st_pk.load_b0_matrix_checkpoint(params)
    enc_eval = BggPolyEncodingSTEvaluator(
        KEY, tmp_path, st_pk.checkpoint_prefix(params), params, c_b0
    )
    got = circuit.eval(params, encs[0], encs[1:], slot_transfer_evaluator=enc_eval)[0]
    return got, result_pk


def test_slot_transfer_exact(tmp_path):
    params = RingParams.default()
    sampler, pubkeys, encs, t_row, s_mats = setup(params, [[2, 5, 7]], seed=90)
    circuit = PolyCircuit()
    w = circuit.input(1)
    # dst0 <- slot2, dst1 <- slot0 * 3, dst2 <- slot1
    out = circuit.slot_transfer_gate(w[0], [(2, None), (0, 3), (1, None)])
    circuit.output([out])
    got, result_pk = run_offline_online(
        tmp_path, params, circuit, pubkeys, encs, t_row, s_mats
    )
    assert got.pubkey == result_pk
    assert [p.const_coeff() for p in got.plaintexts] == [7, 6, 5]
    check_invariant(params, got, sampler)


def test_slot_reduce_exact(tmp_path):
    params = RingParams.default()
    sampler, pubkeys, encs, t_row, s_mats = setup(params, [[1, 2, 3]], seed=95)
    circuit = PolyCircuit()
    w = circuit.input(1)
    out = circuit.slot_reduce_gate([w[0]], S)
    circuit.output([out])
    got, result_pk = run_offline_online(
        tmp_path, params, circuit, pubkeys, encs, t_row, s_mats
    )
    assert got.pubkey == result_pk
    # slot 0 plaintext packs 1 + 2 X + 3 X^2
    assert got.plaintext(0).coeffs()[:3] == [1, 2, 3]
    check_invariant(params, got, sampler)
