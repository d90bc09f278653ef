"""Level-batched circuit evaluation must be bit-identical to sequential
evaluation on a LUT-heavy multi-thousand-gate circuit over BGG wires
(reference eval.rs level-parallel evaluator / GroupedExecutionPlan)."""

import random

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.gadgets.fhe import RingGswCiphertext, RingGswContext
from mxx_tpu.gadgets.fhe.ring_gsw import encode_ciphertext_inputs, native_encrypt
from mxx_tpu.bgg import BGGPublicKeySampler, BGGEncodingSampler
from mxx_tpu.lookup.debug import DebugBGGPubKeyPltEvaluator, DebugBGGEncodingPltEvaluator
from mxx_tpu.sampler import TernaryDist, UniformSampler


def test_batched_eval_bit_identical():
    params = RingParams.new(4, 3, 10, 10)
    circuit0 = PolyCircuit()
    ctx = RingGswContext(circuit0, params, 5, 1)
    c = ctx.fresh_circuit()
    w = RingGswCiphertext.input(ctx, c)
    key = c.input(1)[0]
    sd, pb = w.decrypt(c, key, 2)
    c.output([sd, pb])
    assert c.num_gates() > 4000  # LUT-heavy gate soup
    n_in = c.num_input

    hash_key = bytes(32)
    pks = BGGPublicKeySampler(hash_key, 1).sample(params, b"be", [True] * n_in)
    pk_eval = DebugBGGPubKeyPltEvaluator(hash_key)
    seq = c.eval(params, pks[0], pks[1:], plt_evaluator=pk_eval)
    bat = c.eval(params, pks[0], pks[1:], plt_evaluator=pk_eval, batched=True)
    for a, b in zip(seq, bat):
        assert a.matrix == b.matrix

    rng = random.Random(5)
    ct = native_encrypt(ctx, -1, 1, rng)
    sec = UniformSampler(seed=9).sample_poly(params, TernaryDist())
    es = BGGEncodingSampler(params, [sec], gauss_sigma=None, seed=9)
    in_vals = encode_ciphertext_inputs(ctx, ct) + [Poly.const(params, 1)]
    encs = es.sample(params, pks, in_vals)
    enc_eval = DebugBGGEncodingPltEvaluator(hash_key, es.secret_vec)
    seq_e = c.eval(params, encs[0], encs[1:], plt_evaluator=enc_eval)
    bat_e = c.eval(params, encs[0], encs[1:], plt_evaluator=enc_eval, batched=True)
    for a, b in zip(seq_e, bat_e):
        assert a.vector == b.vector
        assert a.pubkey.matrix == b.pubkey.matrix


@pytest.mark.slow
def test_budgeted_eval_spills_and_matches():
    """>=10k-gate circuit under a live-bytes budget: peak device-resident
    wire bytes stay bounded, spills actually happen, and results match the
    unbudgeted evaluation bit-exactly (VERDICT r1 item 5)."""
    from mxx_tpu.circuit.batched_eval import eval_batched

    params = RingParams.new(4, 3, 10, 10)
    circuit0 = PolyCircuit()
    ctx = RingGswContext(circuit0, params, 5, 1)
    c = ctx.fresh_circuit()
    w1 = RingGswCiphertext.input(ctx, c)
    w2 = RingGswCiphertext.input(ctx, c)
    key = c.input(1)[0]
    s = w1.add(w2, c)
    sd, pb = s.decrypt(c, key, 2)
    sd2, pb2 = w1.decrypt(c, key, 2)
    c.output([sd, pb, sd2, pb2])
    assert c.num_gates() >= 10_000
    n_in = c.num_input

    hash_key = bytes(32)
    pks = BGGPublicKeySampler(hash_key, 1).sample(params, b"bd", [True] * n_in)
    pk_eval = DebugBGGPubKeyPltEvaluator(hash_key)

    free = eval_batched(c, params, pks[0], pks[1:], plt_evaluator=pk_eval)

    store_out = []
    budget = 1 << 16  # 64 KiB device budget: far below the live wire set
    got = eval_batched(
        c, params, pks[0], pks[1:], plt_evaluator=pk_eval,
        live_bytes_budget=budget, wire_store_out=store_out,
    )
    st = store_out[0]
    assert st.spill_count > 0, "budget must force spills"
    # insert-then-enforce: peak exceeds the budget by at most one wire
    max_wire = max(st._wire_bytes(w) for w in [*free])
    assert st.peak_live_bytes <= budget + max_wire, (st.peak_live_bytes, budget)
    for a, b in zip(free, got):
        assert a.matrix == b.matrix
