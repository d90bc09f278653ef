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
    from jax import lax

    N, L, B, IT = 1 << 13, 8, 512, 10
    params = RingParams.new(N, L, 28, 14)
    jt = params.jt
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.stack([rng.integers(0, q, (B, N), dtype=np.uint64).astype(np.uint32)
                  for q in params.moduli])
    )
    if jax.devices()[0].platform != "cpu":
        from mxx_tpu.ops.pallas_four_step import four_step_ntt_fwd_fused

        step = lambda a: four_step_ntt_fwd_fused(a, params=params)  # noqa: E731
    else:
        step = lambda a: ntt_fwd(a, jt.psi_rev_mont, jt.moduli, jt.qinv_neg)  # noqa: E731
    # iterations chained inside ONE program — per-dispatch chaining measures
    # tunnel latency, not device throughput
    f = jax.jit(lambda v: lax.fori_loop(0, IT, lambda i, a: step(a), v))
    probe(f(x))
    t0 = time.perf_counter()
    probe(f(x))
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
    for args in ((), (8192, 8)):
        try:
            bench_matmul(*args) if args == () else bench_matmul(n=args[0], L=args[1])
            break
        except Exception as e:  # memory-bound fallback (16 GB chip + layout padding)
            print(f"# matmul at {args or 'full size'} failed ({type(e).__name__})", flush=True)
            import gc

            gc.collect()  # drop the failed attempt's device buffers
    for args in ((), (8192, 5)):
        try:
            bench_preimage(*args) if args == () else bench_preimage(n=args[0], L=args[1])
            break
        except Exception as e:
            print(f"# preimage at {args or 'full size'} failed ({type(e).__name__})", flush=True)
