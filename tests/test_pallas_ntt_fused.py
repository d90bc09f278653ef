"""Fused Pallas four-step NTT: bit-exact against ring/ntt on CPU (interpret
mode) — forward, inverse, and roundtrip. The TPU perf numbers live in
BENCHMARKS.md; bench.py exercises the compiled path on hardware."""

import numpy as np

import mxx_tpu  # noqa: F401
import jax.numpy as jnp

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.ntt import ntt_fwd, ntt_inv
from mxx_tpu.ops.pallas_four_step import (
    four_step_ntt_fwd_fused,
    four_step_ntt_inv_fused,
)


def _rand(params, B, seed):
    rng = np.random.default_rng(seed)
    L, n = params.crt_depth, params.n
    x = np.empty((L, B, n), dtype=np.uint32)
    for t, q in enumerate(params.moduli):
        x[t] = rng.integers(0, q, size=(B, n), dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(x)


def test_fused_four_step_fwd_inv_exact():
    params = RingParams.new(1024, 2, 28, 14)
    jt = params.jt
    x = _rand(params, 4, 7)
    want = ntt_fwd(x, jt.psi_rev_mont, jt.moduli, jt.qinv_neg)
    got = four_step_ntt_fwd_fused(x, params=params, n1=16, p_polys=2, interpret=True)
    assert jnp.array_equal(want, got)

    back = four_step_ntt_inv_fused(got, params=params, n1=16, p_polys=2, interpret=True)
    assert jnp.array_equal(back, x)
    want_back = ntt_inv(got, jt.psi_inv_rev_mont, jt.n_inv_mont, jt.moduli, jt.qinv_neg)
    assert jnp.array_equal(back, want_back)
