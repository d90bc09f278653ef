import sys; sys.path.insert(0, ".")
import time
import numpy as np
import mxx_tpu
from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.lookup import PublicLut
from mxx_tpu.lookup import lwe as lwe_mod
from mxx_tpu.sampler import FinRingDist, HashSampler, TrapdoorSampler, UniformSampler

params = RingParams.new(8192, 8, 28, 14)
trap = TrapdoorSampler(params, 4.578, seed=7)
t0=time.perf_counter(); td, b = trap.trapdoor(params, 1); b.data.block_until_ready()
print(f"trapdoor: {time.perf_counter()-t0:.1f}s")
lut = PublicLut.from_dict(params, {x: (x, x % 7) for x in range(49)})
hs = HashSampler()
us = UniformSampler(seed=8)
a_z = us.sample_uniform(params, 1, 16, FinRingDist())
a_lt = us.sample_uniform(params, 1, 16, FinRingDist())

ev = lwe_mod.LWEBGGPubKeyPltEvaluator(bytes(32), trap, b, td, "/tmp/unused_khigh")
# monkey-timing: split assembly vs preimage
orig = trap.preimage_batched_chunked
calls = []
def timed(*a, **kw):
    t0 = time.perf_counter()
    out = orig(*a, **kw)
    out[0].data.block_until_ready()
    calls.append(time.perf_counter() - t0)
    return out
trap.preimage_batched_chunked = timed
t0 = time.perf_counter()
buf = ev._sample_k_high_buffer(params, lut, a_z, a_lt, 0, 0, None)
total = time.perf_counter() - t0
print(f"k_high gate total: {total:.1f}s, preimage calls: {[round(c,1) for c in calls]}")
print(f"assembly (non-preimage): {total - sum(calls):.1f}s")
# second gate: steady state
calls.clear()
t0 = time.perf_counter()
buf = ev._sample_k_high_buffer(params, lut, a_z, a_lt, 1, 0, None)
total = time.perf_counter() - t0
print(f"gate2 total: {total:.1f}s, preimage: {sum(calls):.1f}s, assembly: {total-sum(calls):.1f}s")
