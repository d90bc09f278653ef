"""Component-level timing of the preimage program at the bench shape
(d=1, cols=50, n=2^14, L=10, crt_bits=24, base_bits=12) to find where the
0.53 s/op goes (round-4: preimage is 0.29x the H200 estimate).

Runs on the attached TPU. Each stage is timed as its own jitted program with
a host probe fetch (block_until_ready does not block on the tunneled
runtime — see BENCHMARKS.md measurement-integrity note).
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
import mxx_tpu
from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import COEFF, EVAL
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, TrapdoorSampler, UniformSampler
from mxx_tpu.sampler import chacha
from mxx_tpu.sampler.trapdoor import (
    _gauss_samp_gq, _matrix_from_signed, _centered_lift_f64, _sample_p1_ints,
)

n, L, crt_bits, base_bits, cols, d = 1 << 14, 10, 24, 12, 50, 1
params = RingParams.new(n, L, crt_bits, base_bits)
k = params.modulus_digits
print(f"n={n} L={L} k={k} dpt={params.digits_per_tower} cols={cols}")

ts = TrapdoorSampler(params, 4.578, seed=1)
td, pub = ts.trapdoor(params, d)
us = UniformSampler(seed=2)
tgt = us.sample_uniform(params, d, cols, FinRingDist())
key = chacha.fold_in(ts._key, 1)


def probe(x):
    # device-side 1-element slice, THEN host fetch: np.asarray on the full
    # output would measure the tunnel D2H transfer (~minutes for a 67 MB
    # plane), not execution
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    probe(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        probe(out)
    el = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {el*1e3:9.1f} ms")
    return out


# 1. normal generation for p2: (d*k, cols, n)
f_norm_p2 = jax.jit(lambda kk: chacha.normal(kk, (d * k, cols, n), jnp.float32))
timeit("chacha.normal p2 (k*cols*n)", f_norm_p2, key)

# 2. normals for gauss_samp_gq: (2, L, dpt, d, cols, n)
dpt = params.digits_per_tower
f_norm_g = jax.jit(lambda kk: chacha.normal(kk, (2, L, dpt, d, cols, n), jnp.float32))
timeit("chacha.normal gq (2*L*dpt*cols*n)", f_norm_g, key)

# 3. p2 construction + to_eval (NTT of [k, cols])
sigma_large = 1000.0


def f_p2(kk):
    gn = chacha.normal(kk, (d * k, cols, n), jnp.float32)
    p2i = jnp.rint(gn * jnp.float32(sigma_large))
    return _matrix_from_signed(params, p2i).to_eval().data


timeit("p2 sample+scatter+NTT [k,cols]", jax.jit(f_p2), key)

# 4. r|e @ p2 matmul (COEFF-domain @: includes NTTs)
r_data = td.r.to_coeff().data
e_data = td.e.to_coeff().data


def f_mm(kk):
    gn = chacha.normal(kk, (d * k, cols, n), jnp.float32)
    p2i = jnp.rint(gn * jnp.float32(sigma_large))
    p2 = _matrix_from_signed(params, p2i)
    r_mat = PolyMatrix(r_data, COEFF, params)
    e_mat = PolyMatrix(e_data, COEFF, params)
    return _centered_lift_f64(r_mat.concat_rows([e_mat]) @ p2)


timeit("p2 + (r|e)@p2 + lift_f64", jax.jit(f_mm), key)

# 5. gauss_samp_gq alone on a uniform syndrome
syn = us.sample_uniform(params, d, cols, FinRingDist()).to_coeff().data


def f_gq(sd, kk):
    return _gauss_samp_gq(sd, kk, base_bits=base_bits, dpt=dpt,
                          moduli=tuple(params.moduli), sigma=4.578, c=10.0)


timeit("gauss_samp_gq", jax.jit(f_gq), syn, key)

# 6. gq digits -> matrix + NTT + two matmuls [d,k]@[k,cols]
def f_tail(sd, kk):
    z_i = f_gq(sd, kk)
    z = _matrix_from_signed(params, z_i)
    r_mat = PolyMatrix(r_data, COEFF, params)
    e_mat = PolyMatrix(e_data, COEFF, params)
    top = r_mat @ z
    mid = e_mat @ z
    return top.concat_rows([mid, z]).to_eval().data


timeit("gq + scatter + r@z|e@z + NTT out", jax.jit(f_tail), syn, key)

# 7. pub @ p_hat: [d, 2d+k] @ [2d+k, cols] in eval
pub_e = pub.to_eval()
phat = us.sample_uniform(params, 2 * d + d * k, cols, FinRingDist())
phat_e = phat.to_eval().data


def f_pub(pe):
    return (pub_e @ PolyMatrix(pe, EVAL, params)).data


timeit("pub@p_hat (eval matmul only)", jax.jit(f_pub), phat_e)

# 8. full preimage for comparison
def f_full():
    return ts.preimage(params, td, pub, tgt).data


timeit("FULL preimage", f_full, iters=3)
