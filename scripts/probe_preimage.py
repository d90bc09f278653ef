import sys; sys.path.insert(0, ".")
import time
import numpy as np
import mxx_tpu
import jax
from mxx_tpu.ring.params import RingParams
from mxx_tpu.sampler import FinRingDist, TrapdoorSampler, UniformSampler

params = RingParams.new(8192, 8, 28, 14)
ts = TrapdoorSampler(params, 4.578, seed=1)
t0 = time.perf_counter()
td, pub = ts.trapdoor(params, 1)
pub.data.block_until_ready()
print(f"trapdoor: {time.perf_counter()-t0:.1f}s")
us = UniformSampler(seed=2)
for w in (256, 256, 256, 32):
    tgt = us.sample_uniform(params, 1, w, FinRingDist())
    np.asarray(tgt.data[:1,:1,:1,:1])
    t0 = time.perf_counter()
    out = ts.preimage(params, td, pub, tgt)
    np.asarray(out.data[:1,:1,:1,:1])
    print(f"preimage {w} cols: {time.perf_counter()-t0:.1f}s")
