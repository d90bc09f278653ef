"""Headline benchmark: negacyclic NTT throughput per chip at n=2^13.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's CUDA NTT (MatrixNTT.cu) on an H200 is estimated at
~4.0e5 limb-transforms/s at n=2^13 (bandwidth-bound radix-2 over u64 limbs;
no published numbers exist — see BASELINE.md). vs_baseline = value / 4.0e5.

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

N = 1 << 13
L = 8
BATCH = 512
ITERS = 10


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


if __name__ == "__main__":
    main()
