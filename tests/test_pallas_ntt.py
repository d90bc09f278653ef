"""Pallas NTT kernel correctness (interpret mode on CPU)."""

import numpy as np

import mxx_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.ntt import ntt_fwd
from mxx_tpu.ops.pallas_ntt import ntt_fwd_hybrid


def test_hybrid_ntt_matches_jnp():
    params = RingParams.new(512, 2, 28, 1)
    jt = params.jt
    rng = np.random.default_rng(9)
    x = np.stack(
        [
            rng.integers(0, q, size=(8, 512), dtype=np.uint64).astype(np.uint32)
            for q in params.moduli
        ]
    )
    xj = jnp.asarray(x)
    want = ntt_fwd(xj, jt.psi_rev_mont, jt.moduli, jt.qinv_neg)
    got = ntt_fwd_hybrid(xj, jt.psi_rev_mont, jt.moduli, jt.qinv_neg, tile=8, interpret=True)
    assert jnp.array_equal(want, got)
