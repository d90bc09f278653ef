"""Headline benchmarks: the three BASELINE.json metrics, one JSON line each.

Line 1 (headline): negacyclic NTT throughput per chip at n=2^13.
Line 2: trapdoor preimage throughput (preimage-cols/s) at the reference's
        bench_preimage workload shape (d=1, 50 cols, n=2^14, L=10).
Line 3: RingGSW external-product throughput (C · G^{-1}(c)) at n=2^13, L=8.

Each line is {"metric", "value", "unit", "vs_baseline"}.

Baselines (no published reference numbers exist — see BASELINE.md "Round-3
baselines" for the derivations):
- NTT: CUDA MatrixNTT.cu on H200 estimated ~4.0e5 limb-transforms/s at
  n=2^13 (bandwidth-bound radix-2 over u64 limbs).
- preimage: device-normalized v5e baseline 215 preimage-cols/s (= the 330
  H200-class estimate x the measured-stage-mix device factor; the JSON
  line also reports vs_h200_estimate for cross-device reference).
- GSW ext-prod: H200 estimate ~640 ext-prods/s at the measured shape
  (decompose traffic + eval-domain matmul, bandwidth-normalized).

Measures the production forward path: the fused Pallas four-step kernel
(ops/pallas_four_step.py) on TPU, falling back to the XLA radix chain
elsewhere. Exactness of the fused kernel vs the chain is asserted on the
first batch before timing.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import mxx_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.ntt import ntt_fwd

CUDA_BASELINE_NTT_PER_S = 4.0e5
# H200-class estimate, kept for cross-device reference in the JSON line
CUDA_H200_PREIMAGE_COLS_PER_S = 330.0
# Device-normalized preimage baseline for the attached v5e (BASELINE.md
# "Round-3 baselines", written round 5): 330 x the measured-stage-mix
# v5e/H200 device factor (~0.65) = 215 preimage-cols/s. The H200 factor
# prices native u32 mulhi + SFU transcendentals on the ~55% of the chain
# that is VPU sampling arithmetic; the transform portion runs at parity
# (NTT metric above).
V5E_BASELINE_PREIMAGE_COLS_PER_S = 215.0
CUDA_BASELINE_GSW_EXT_PRODS_PER_S = 640.0

N = 1 << 13
L = 8
BATCH = 512
ITERS = 10


def emit(metric, value, unit, vs):
    print(json.dumps({"metric": metric, "value": round(value, 1), "unit": unit,
                      "vs_baseline": round(value / vs, 3)}), flush=True)


def probe(arr):
    """Force remote completion: on the tunneled runtime block_until_ready
    acks without executing; only a host fetch proves the computation ran."""
    np.asarray(arr.reshape(-1)[:1])


def bench_preimage(n=1 << 14, L_pre=10, crt_bits=24, base_bits=12, cols=50,
                   iters=3):
    """Reference bench_preimage workload (benches/bench_preimage_gpu.rs:7-57):
    d=1 trapdoor, 50-column target."""
    from mxx_tpu.sampler import FinRingDist, TrapdoorSampler, UniformSampler

    params = RingParams.new(n, L_pre, crt_bits, base_bits)
    ts = TrapdoorSampler(params, 4.578, seed=2)
    td, a = ts.trapdoor(params, 1)
    target = UniformSampler(seed=3).sample_uniform(params, 1, cols, FinRingDist())
    probe(ts.preimage(params, td, a, target).data)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        probe(ts.preimage(params, td, a, target).data)
    el = (time.perf_counter() - t0) / iters
    value = cols / el
    print(json.dumps({
        "metric": f"preimage_cols_per_s_d1_n{n}_L{L_pre}",
        "value": round(value, 1), "unit": "preimage-cols/s",
        "vs_baseline": round(value / V5E_BASELINE_PREIMAGE_COLS_PER_S, 3),
        "vs_h200_estimate": round(value / CUDA_H200_PREIMAGE_COLS_PER_S, 3),
    }), flush=True)


def bench_gsw_ext_prod(n=1 << 13, L_gsw=8, crt_bits=28, base_bits=14, B=64,
                       iters=3):
    """RingGSW external product C · G^{-1}(c): gadget decomposition of a
    [2, B] ciphertext-column batch + eval-domain matmul with a [2, 2k] GSW
    ciphertext (reference MatrixDecompose.cu + MatrixArith.cu composition;
    one ext-prod = one ciphertext column)."""
    from mxx_tpu.matrix import PolyMatrix
    from mxx_tpu.sampler import FinRingDist, UniformSampler

    params = RingParams.new(n, L_gsw, crt_bits, base_bits)
    k = params.modulus_digits
    us = UniformSampler(seed=4)
    c_mat = us.sample_uniform(params, 2, 2 * k, FinRingDist()).to_eval()
    cts = us.sample_uniform(params, 2, B, FinRingDist())

    def op():
        return (c_mat @ cts.decompose()).data

    probe(op())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        probe(op())
    el = (time.perf_counter() - t0) / iters
    emit(f"gsw_ext_prods_per_s_n{n}_L{L_gsw}_B{B}", B / el,
         "ext-prods/s", CUDA_BASELINE_GSW_EXT_PRODS_PER_S)


def main():
    params = RingParams.new(N, L, 28, 14)
    jt = params.jt
    rng = np.random.default_rng(0)
    x = np.empty((L, BATCH, N), dtype=np.uint32)
    for t, q in enumerate(params.moduli):
        x[t] = rng.integers(0, q, size=(BATCH, N), dtype=np.uint64).astype(np.uint32)
    x = jnp.asarray(x)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        from mxx_tpu.ops.pallas_four_step import four_step_ntt_fwd_fused

        step = lambda a: four_step_ntt_fwd_fused(a, params=params)  # noqa: E731
        want = ntt_fwd(x[:, :4], jt.psi_rev_mont, jt.moduli, jt.qinv_neg)
        got = step(x[:, :4])
        assert np.array_equal(np.asarray(want), np.asarray(got)), (
            "fused four-step must match the radix chain bit-exactly"
        )
    else:
        step = lambda a: ntt_fwd(a, jt.psi_rev_mont, jt.moduli, jt.qinv_neg)  # noqa: E731

    # ITERS chained transforms inside ONE program (fori_loop), then fetch a
    # probe element — on the tunneled runtime block_until_ready acks without
    # waiting, so only a host fetch proves the computation ran (measured: a
    # 3.5 GB op "completes" in 0.3 ms without a fetch). Chaining prevents
    # any iteration from being elided.
    fn = jax.jit(lambda v: lax.fori_loop(0, ITERS, lambda i, a: step(a), v))
    y = fn(x)
    np.asarray(y[0, 0, :1])
    t0 = time.perf_counter()
    y = fn(x)
    np.asarray(y[0, 0, :1])
    elapsed = time.perf_counter() - t0
    transforms = L * BATCH * ITERS
    rate = transforms / elapsed
    print(
        json.dumps(
            {
                "metric": f"ntt_limb_transforms_per_s_n{N}_L{L}",
                "value": round(rate, 1),
                "unit": "limb-NTTs/s",
                "vs_baseline": round(rate / CUDA_BASELINE_NTT_PER_S, 3),
            }
        )
    )

    # free the NTT operands before the larger preimage/GSW shapes (16 GB chip)
    del x, y, fn
    import gc

    gc.collect()
    bench_preimage()
    gc.collect()
    bench_gsw_ext_prod()


if __name__ == "__main__":
    main()
