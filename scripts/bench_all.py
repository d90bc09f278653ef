"""Extended benchmark sweep on the real TPU (one JSON line per metric).

Covers the reference's bench harness workloads (SURVEY.md §6):
- poly matrix mul 1x30 @ 30x120, n=16384, L=15, crt_bits=24, base_bits=12
  (bench_matrix_mul_{cpu,gpu}.rs)
- trapdoor preimage d=1, 50 target cols, n=16384, L=10, sigma=4.578
  (bench_preimage_{cpu,gpu}.rs)
- NTT throughput at n=2^13 (BASELINE.json headline)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import mxx_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.ntt import ntt_fwd
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, TrapdoorSampler, UniformSampler


def probe(arr):
    """Force remote completion: block_until_ready acks without executing on
    the tunneled runtime; only a host fetch proves the computation ran."""
    np.asarray(arr.ravel()[:1])


def emit(metric, value, unit, vs=None):
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit,
                      "vs_baseline": vs}), flush=True)


def bench_ntt():
    N, L, B, IT = 1 << 13, 8, 32, 20
    params = RingParams.new(N, L, 28, 14)
    jt = params.jt
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.stack([rng.integers(0, q, (B, N), dtype=np.uint64).astype(np.uint32)
                  for q in params.moduli])
    )
    f = jax.jit(lambda v: ntt_fwd(v, jt.psi_rev_mont, jt.moduli, jt.qinv_neg))
    probe(f(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(IT):
        y = f(y)  # chained so no iteration can be elided
    probe(y)
    emit(f"ntt_limb_transforms_per_s_n{N}_L{L}", L * B * IT / (time.perf_counter() - t0),
         "limb-NTTs/s", None)


def bench_matmul(n=16384, L=10, crt_bits=24, base_bits=12, r=1, k=30, c=120, iters=3):
    params = RingParams.new(n, L, crt_bits, base_bits)
    us = UniformSampler(seed=1)
    a = us.sample_uniform(params, r, k, FinRingDist()).to_eval()
    b = us.sample_uniform(params, k, c, FinRingDist()).to_eval()
    probe((a @ b).data)
    t0 = time.perf_counter()
    for _ in range(iters):
        probe((a @ b).data)
    el = (time.perf_counter() - t0) / iters
    emit(f"poly_matmul_{r}x{k}x{c}_n{n}_L{L}_wall_s", el, "s/op", None)


def bench_preimage(n=16384, L=10, crt_bits=24, base_bits=12, cols=50, iters=2):
    params = RingParams.new(n, L, crt_bits, base_bits)
    ts = TrapdoorSampler(params, 4.578, seed=2)
    td, a = ts.trapdoor(params, 1)
    target = UniformSampler(seed=3).sample_uniform(params, 1, cols, FinRingDist())
    probe(ts.preimage(params, td, a, target).data)
    t0 = time.perf_counter()
    for _ in range(iters):
        probe(ts.preimage(params, td, a, target).data)
    el = (time.perf_counter() - t0) / iters
    emit(f"trapdoor_preimage_d1_cols{cols}_n{n}_L{L}_wall_s", el, "s/op", None)
    emit("preimage_samples_per_s", cols / el, "preimages/s", None)


if __name__ == "__main__":
    bench_ntt()
    try:
        bench_matmul()
    except Exception as e:  # memory-bound fallback
        print(f"# matmul full-size failed ({type(e).__name__}); halving", flush=True)
        bench_matmul(n=8192, L=8)
    try:
        bench_preimage()
    except Exception as e:
        print(f"# preimage full-size failed ({type(e).__name__}); halving", flush=True)
        bench_preimage(n=8192, L=5)
