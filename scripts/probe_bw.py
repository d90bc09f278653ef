import sys; sys.path.insert(0, ".")
import time
import numpy as np
import mxx_tpu
import jax, jax.numpy as jnp
from jax import lax

x = jnp.asarray(np.random.randint(0, 1<<30, size=(64, 1024, 2048), dtype=np.uint32))  # 512MB
nbytes = x.size * 4

@jax.jit
def chain_add(v):
    return lax.fori_loop(0, 10, lambda i, a: a + jnp.uint32(1), v)

y = chain_add(x); np.asarray(y.ravel()[:1])
t0=time.perf_counter(); y = chain_add(x); np.asarray(y.ravel()[:1]); el=time.perf_counter()-t0
print(f'elementwise add x10 on 512MB: {el*1e3:.1f} ms -> {10*2*nbytes/el/1e9:.0f} GB/s effective (r+w)')

@jax.jit
def chain_mul(v):
    return lax.fori_loop(0, 10, lambda i, a: a * jnp.uint32(2654435761) + jnp.uint32(1), v)
y = chain_mul(x); np.asarray(y.ravel()[:1])
t0=time.perf_counter(); y = chain_mul(x); np.asarray(y.ravel()[:1]); el=time.perf_counter()-t0
print(f'mul+add x10 on 512MB: {el*1e3:.1f} ms -> {10*2*nbytes/el/1e9:.0f} GB/s')

# bf16 matmul TFLOPs probe
a = jnp.asarray(np.random.randn(8192, 8192).astype(jnp.bfloat16))
@jax.jit
def mm(a):
    return lax.fori_loop(0, 10, lambda i, m: jnp.dot(m, m, preferred_element_type=jnp.bfloat16), a)
y = mm(a); np.asarray(y[:1,:1].astype(jnp.float32))
t0=time.perf_counter(); y=mm(a); np.asarray(y[:1,:1].astype(jnp.float32)); el=time.perf_counter()-t0
print(f'bf16 8k matmul x10: {el*1e3:.1f} ms -> {10*2*8192**3/el/1e12:.1f} TFLOPs')

# int8 matmul probe
ai = jnp.asarray(np.random.randint(-127,127,size=(8192,8192),dtype=np.int8))
@jax.jit
def mmi(a):
    def body(i, m):
        p = lax.dot_general(m, m, (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
        return (p & 127).astype(jnp.int8)
    return lax.fori_loop(0, 10, body, a)
y = mmi(ai); np.asarray(y[:1,:1])
t0=time.perf_counter(); y=mmi(ai); np.asarray(y[:1,:1]); el=time.perf_counter()-t0
print(f'int8 8k matmul x10: {el*1e3:.1f} ms -> {10*2*8192**3/el/1e12:.1f} TOPS')
