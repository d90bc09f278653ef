"""WEE25-backed LUT commit evaluation: collect, commit, open, verify."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.commit import Wee25Commit
from mxx_tpu.bgg import BGGPublicKeySampler
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup.commit_eval import CommitBGGPubKeyPltEvaluator, derive_a_out_matrix

KEY = bytes([3] * 32)


def test_commit_eval_two_pass(tmp_path):
    params = RingParams.new(4, 2, 17, 17)
    k = params.modulus_digits
    scheme = Wee25Commit(1, 2, k + 2, k, 4.578)
    pp = scheme.sample_public_params(params, KEY, seed=111)

    circuit = PolyCircuit()
    w = circuit.input(1)
    lut = PublicLut.from_dict(params, {x: (x, (5 * x + 1) % 11) for x in range(4)})
    lut_id = circuit.register_public_lut(lut)
    out = circuit.public_lookup_gate(w[0], lut_id)
    circuit.output([out])

    ev = CommitBGGPubKeyPltEvaluator(params, scheme, pp, KEY)
    pubkeys = BGGPublicKeySampler(KEY, 1).sample(params, b"ce", [True])
    result = circuit.eval(params, pubkeys[0], pubkeys[1:], plt_evaluator=ev)
    # pass 1 returned the hash-derived output pubkey and recorded state
    assert result[0].matrix == derive_a_out_matrix(params, 1, KEY, out)
    assert lut_id in ev.collector.luts

    # pass 2: commit + open a row + verify
    ev.commit_all_tables()
    row = 2
    opening = ev.open_row(lut_id, row)
    y = (5 * row + 1) % 11
    assert ev.verify_row(lut_id, row, y, opening)
    assert not ev.verify_row(lut_id, row, y + 1, opening)
