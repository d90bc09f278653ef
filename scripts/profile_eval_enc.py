"""cProfile the batched evaluator on one GSW external product over ENCODING
wires (the real-mode eval hot path — VERDICT r4: eval 2465 s vs obfuscate
956 s at n=2; encoding gates must not cost 2.6x the pubkey gates)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # kernel env pins axon; must overwrite
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cProfile
import pstats
import random
import time

import mxx_tpu  # noqa: F401
from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.gadgets.fhe.ring_gsw import (
    RingGswCiphertext,
    RingGswContext,
    native_encrypt,
)
from mxx_tpu.lookup.debug import DebugBGGEncodingPltEvaluator
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.sampler import TernaryDist, UniformSampler
from mxx_tpu.io_protocols.prf_mask import PrfMaskPipeline


def main():
    params = RingParams.new(4, 2, 9, 9)
    ctx = RingGswContext(PolyCircuit(), params, 8, 2, p_basis="wide")
    print(f"k={ctx.nested.k} L={ctx.gadget_len}")
    circuit = ctx.fresh_circuit()
    a = RingGswCiphertext.input(ctx, circuit)
    b = RingGswCiphertext.input(ctx, circuit)
    out = a.and_(b, circuit)
    circuit.output(out.flatten())
    print(f"gates={circuit.num_gates()} levels={len(circuit.compute_levels())}")

    hash_key = b"\x07" * 32
    us = UniformSampler(seed=5)
    secrets = [us.sample_poly(params, TernaryDist())]
    one_pk = BGGPublicKeySampler(hash_key, 1).sample(params, b"probe", [])[0]
    es = BGGEncodingSampler(params, secrets, gauss_sigma=None, seed=6)
    one_enc = es.sample(params, [one_pk], [])[0]

    rng = random.Random(1)
    cts = [native_encrypt(ctx, 1, i % 2, rng, 0.0) for i in range(2)]
    prf = PrfMaskPipeline.__new__(PrfMaskPipeline)
    prf.ctx = ctx
    prf.params = params
    wires = prf.lift_values(one_enc, prf._ct_wire_values(cts))
    ev = DebugBGGEncodingPltEvaluator(hash_key, es.secret_vec)

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    circuit.eval(params, one_enc, wires, plt_evaluator=ev, batched=True)
    pr.disable()
    print(f"eval={time.time() - t0:.1f}s")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(30)
    st.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
