import sys; sys.path.insert(0, ".")
import time
import numpy as np
import mxx_tpu
import jax.numpy as jnp
from mxx_tpu.ring.params import RingParams
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, HashSampler, UniformSampler
from mxx_tpu.circuit.batched_eval import _batched_decompose, _vmapped_matmul

params = RingParams.new(8192, 8, 28, 14)
hs = HashSampler()

def t(label, fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    el = (time.perf_counter() - t0) / reps
    print(f"{label}: {el*1e3:.0f} ms")

def hash4():
    mats = hs.sample_hash_batch(params, bytes(32), [f"t{i}" for i in range(4)], 1, 16, FinRingDist())
    mats[-1].data.block_until_ready()
    return mats
t("sample_hash_batch 4x(1x16)", hash4)

mats = hash4()
def dec():
    d = _batched_decompose(params, mats)
    d.block_until_ready()
    return d
t("batched_decompose 4", dec)

us = UniformSampler(seed=1)
ext = [us.sample_uniform(params, 1, 16, FinRingDist()) for _ in range(4)]
d4 = dec()
from mxx_tpu.circuit.batched_eval import _to_eval_stackb
eb = _to_eval_stackb(params, ext)
def mm():
    out = _vmapped_matmul(params, eb, d4)
    out.block_until_ready()
    return out
t("vmapped matmul 4", mm)

def hash1():
    m = hs.sample_hash(params, bytes(32), "x", 1, 16, FinRingDist())
    m.data.block_until_ready()
    return m
t("sample_hash 1x16", hash1)
