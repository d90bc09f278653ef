"""Micro-probe: time ONE in-circuit GSW xor (1 external product) at candidate
real-mode configs, to size the real-mode Diamond e2e (VERDICT r2 #1).

    JAX_PLATFORMS=cpu python scripts/gsw_mul_probe.py
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"  # kernel env pins axon; must overwrite
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mxx_tpu  # noqa: F401
from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.gadgets.fhe.ring_gsw import (
    RingGswCiphertext,
    RingGswContext,
    native_encrypt,
)
from mxx_tpu.lookup.debug import DebugBGGPubKeyPltEvaluator
from mxx_tpu.bgg import BGGPublicKeySampler
from mxx_tpu.io_protocols.prf_mask import PrfMaskPipeline, PrfConfig
from mxx_tpu.sampler import TrapdoorSampler
import random


def probe(n, depth, crt_bits, base_bits, p_bits, p_basis, muls):
    params = RingParams.new(n, depth, crt_bits, base_bits)
    try:
        ctx = RingGswContext(PolyCircuit(), params, p_bits, muls, p_basis=p_basis)
    except (ValueError, AssertionError) as e:
        print(f"n={n} crt={depth}x{crt_bits} p_bits={p_bits} {p_basis}: SKIP ({e})")
        return
    k = ctx.nested.k
    L = ctx.gadget_len
    circuit = ctx.fresh_circuit()
    a = RingGswCiphertext.input(ctx, circuit)
    b = RingGswCiphertext.input(ctx, circuit)
    t0 = time.time()
    out = a.xor(b, circuit)
    circuit.output(out.flatten())
    t_build = time.time() - t0
    gates = circuit.num_gates()

    hash_key = b"\x07" * 32
    pk_sampler = BGGPublicKeySampler(hash_key, 1)
    one_pk = pk_sampler.sample(params, b"probe", [])[0]
    rng = random.Random(1)
    cts = [native_encrypt(ctx, 1, i % 2, rng, 0.0) for i in range(2)]
    prf = PrfMaskPipeline.__new__(PrfMaskPipeline)
    prf.ctx = ctx
    prf.params = params
    vals = prf._ct_wire_values(cts)
    t0 = time.time()
    wires = prf.lift_values(one_pk, vals)
    t_lift = time.time() - t0
    ev = DebugBGGPubKeyPltEvaluator(hash_key)
    t0 = time.time()
    res = circuit.eval(params, one_pk, wires, plt_evaluator=ev, batched=True)
    t_eval = time.time() - t0
    print(
        f"n={n} crt={depth}x{crt_bits} base={base_bits} p_bits={p_bits} "
        f"{p_basis}: k={k} L={L} width={2*L} gates={gates} "
        f"build={t_build:.1f}s lift={t_lift:.1f}s eval={t_eval:.1f}s"
    )


if __name__ == "__main__":
    for cfg in [
        # (n, depth, crt_bits, base_bits, p_bits, basis, muls)
        (4, 3, 6, 6, 8, "wide", 2),
        (4, 2, 9, 9, 8, "wide", 2),
        (4, 3, 8, 8, 7, "wide", 2),
        (4, 3, 10, 10, 8, "wide", 2),
    ]:
        probe(*cfg)
