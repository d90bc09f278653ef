"""Four-step negacyclic NTT on the MXU (experimental forward path).

The radix-2/4 stage chain is HBM-bound (~14 materialized passes at large
batch; see BENCHMARKS.md). The four-step factorization n = n1 * n2 turns the
transform into two small constant-matrix multiplies plus one twiddle pass:

    X[k2 + n2 k1] = sum_{i1} psi^{i1} omega^{i1 k2} omega^{n2 i1 k1}
                    * [ sum_{i2} x[i1 + n1 i2] (psi omega^{k2})^{n1 i2} ]

with omega = psi^2 (so X[k] = sum_i x_i psi^{i(2k+1)} — the same evaluation
set as the merged-twist chain in ring/ntt.py). Ordering: building the W2 DFT
matrix with bit-reversed ROW order (rev over log2 n2 bits) and the W1 matrix
with bit-reversed COLUMN order makes the output land exactly in the EVAL
(bit-reversed) convention used everywhere else — no permutation pass.

The two matrix multiplies ride the MXU through the same balanced int8-digit
planes as ops/zq_matmul.py (exact for contraction <= 32768; here n1, n2 <=
a few hundred), so total HBM traffic is ~4 passes instead of ~14.

Status: forward transform, validated bit-exact against ring/ntt.ntt_fwd on
TPU — but measured 3x SLOWER than the radix chain at n=8192/batch 512 (the
int8 recombination traffic outweighs the saved passes; BENCHMARKS.md). Kept
as the scaffold for a Pallas-fused recombine in round 2; not wired into any
production path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.numth import bit_reverse, find_primitive_2n_root
from ..utils.u32 import addmod, montmul, submod
from .zq_matmul import _balanced_digits_i8

R32 = 1 << 32


@functools.lru_cache(maxsize=None)
def _tables(params, n1: int):
    """Per-limb W2 [L, n2, n2], T_mont [L, n2, n1], W1 [L, n1, n1] (numpy)."""
    n = params.n
    n2 = n // n1
    assert n1 * n2 == n and n1 & (n1 - 1) == 0 and n2 & (n2 - 1) == 0
    a_bits = n1.bit_length() - 1
    b_bits = n2.bit_length() - 1
    L = params.crt_depth
    w2 = np.empty((L, n2, n2), dtype=np.uint32)
    t_mont = np.empty((L, n2, n1), dtype=np.uint32)
    w1 = np.empty((L, n1, n1), dtype=np.uint32)
    for t, q in enumerate(params.moduli):
        psi = find_primitive_2n_root(q, n)
        om = psi * psi % q
        for r in range(n2):
            k2 = bit_reverse(r, b_bits)
            base = pow(psi, n1, q) * pow(om, n1 * k2, q) % q  # (psi om^{k2})^{n1}
            v = 1
            for i2 in range(n2):
                w2[t, r, i2] = v
                v = v * base % q
            tw = pow(psi, 1, q) * pow(om, k2, q) % q  # psi om^{k2}
            u = 1
            for i1 in range(n1):
                t_mont[t, r, i1] = u * R32 % q
                u = u * tw % q
        for i1 in range(n1):
            for c in range(n1):
                k1 = bit_reverse(c, a_bits)
                w1[t, i1, c] = pow(om, n2 * i1 * k1 % n, q)
    return w2, t_mont, w1


def _const_matmul_left(w, x, q, qinv_neg, combine_pows_mont, sign_corr_pows):
    """out[L, r, M] = W[L, r, k] @ x[L, k, M] mod q (exact int8-digit planes)."""
    L = x.shape[0]
    w_planes = _balanced_digits_i8(w)
    x_planes = _balanced_digits_i8(x)
    dn = (((2,), (1,)), ((0,), (0,)))
    plane_sums = [None] * 7
    for i in range(4):
        for j in range(4):
            p = lax.dot_general(
                w_planes[i], x_planes[j], dn, preferred_element_type=jnp.int32
            )
            s = i + j
            plane_sums[s] = p if plane_sums[s] is None else plane_sums[s] + p
    qb = q.reshape(L, 1, 1)
    qib = qinv_neg.reshape(L, 1, 1)
    acc = jnp.zeros(plane_sums[0].shape, dtype=jnp.uint32)
    for s in range(7):
        p = plane_sums[s]
        u = p.astype(jnp.uint32)
        neg = p < 0
        pos = montmul(u, combine_pows_mont[s].reshape(L, 1, 1), qb, qib)
        corr = sign_corr_pows[s].reshape(L, 1, 1)
        acc = addmod(
            acc,
            jnp.where(neg, submod(pos, jnp.broadcast_to(corr, pos.shape), qb), pos),
            qb,
        )
    return acc


@functools.partial(jax.jit, static_argnames=("params", "n1"))
def four_step_ntt_fwd(x, *, params, n1: int):
    """Forward negacyclic NTT via two MXU matmuls; output in the same
    bit-reversed EVAL order as ring/ntt.ntt_fwd. x: uint32[L, ..., n]."""
    shape = x.shape
    n = shape[-1]
    L = shape[0]
    n2 = n // n1
    jt = params.jt
    q, qib = jt.moduli, jt.qinv_neg
    cp, sc = jt.combine_pows_mont, jt.sign_corr_pows
    w2, t_mont, w1 = (jnp.asarray(a) for a in _tables(params, n1))
    x3 = x.reshape(L, -1, n)
    B = x3.shape[1]
    # [L, B, n2, n1] -> [L, n2, B*n1]: step-a contraction layout
    xa = jnp.transpose(x3.reshape(L, B, n2, n1), (0, 2, 1, 3)).reshape(L, n2, B * n1)
    ya = _const_matmul_left(w2, xa, q, qib, cp, sc)  # [L, n2, B*n1]
    # twiddle: T[r, i1] broadcast over B
    y = ya.reshape(L, n2, B, n1)
    qb = q.reshape(L, 1, 1, 1)
    qibb = qib.reshape(L, 1, 1, 1)
    y = montmul(y, t_mont[:, :, None, :], qb, qibb)
    # step c: contract i1 on the right: out[r2, B, c1] = sum y[r2, B, i1] W1[i1, c1]
    yc = y.reshape(L, n2 * B, n1)
    out = _const_matmul_left(
        jnp.transpose(w1, (0, 2, 1)), jnp.transpose(yc, (0, 2, 1)), q, qib, cp, sc
    )  # W1^T [L, c, i1] @ y^T [L, i1, n2*B] -> [L, c, n2*B]
    out = jnp.transpose(out, (0, 2, 1)).reshape(L, n2, B, n1)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(shape)
