"""Negacyclic NTT over CRT limbs (vectorized jnp; Pallas fused variant in ops/).

TPU-native replacement for the reference's CUDA NTT kernels
(/root/reference/cuda/src/matrix/MatrixNTT.cu:39-152) and OpenFHE's CPU NTT.
Uses the merged-twist algorithm (Longa-Naehrig 2016): the psi twist is folded
into bit-reversed twiddle tables, so the forward transform maps natural-order
coefficients to bit-reversed-order evaluations ("EVAL" format) and the inverse
maps back; pointwise products in EVAL realize negacyclic convolution.

Shapes: x is uint32[L, ..., n] (any number of middle dims); twiddle tables are
uint32[L, n] in Montgomery form; per-limb constants are uint32[L].

Batches are flattened to [L, P, n] before the stage chain: measured on v5e
(n=16384, 720 MB operand) the 4-D chain touches ~114 GB of HBM vs ~59 GB for
the flattened 3-D chain (2.1x wall win). lax.map chunking over the poly axis
cuts HLO-level bytes further (~20 GB) but loses to per-iteration overhead at
every chunk size tried, so it is disabled by default (_CHUNK_ELEMS sentinel);
the remaining gap to the 2-pass HBM minimum is an XLA fusion limit on large
radix-2 chains — the four-step MXU NTT is the planned successor
(BENCHMARKS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.u32 import addmod, montmul, submod

# elements (limbs * polys * n) per fused chunk; effectively disabled (see
# module docstring — chunking measured slower than the flattened chain)
_CHUNK_ELEMS = 1 << 30


def _bc(c: jnp.ndarray, ndim: int, extra_dims: int = 0) -> jnp.ndarray:
    """Broadcast per-limb const [L] against [L, ...] with `ndim`+extra dims."""
    return c.reshape((c.shape[0],) + (1,) * (ndim - 1 + extra_dims))


def _fwd_stages(x, psi_rev_mont, q, qinv_neg):
    """Forward stage chain on [L, P, n]."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    nd = x.ndim
    qb = _bc(q, nd, 1)
    qib = _bc(qinv_neg, nd, 1)
    m = 1
    t = n
    while m < n:
        t //= 2
        v = x.reshape(lead + (m, 2, t))
        a = v[..., 0, :]
        b = v[..., 1, :]
        w = psi_rev_mont[:, m : 2 * m].reshape((x.shape[0],) + (1,) * (nd - 2) + (m, 1))
        wb = montmul(b, w, qb, qib)
        x = jnp.stack((addmod(a, wb, qb), submod(a, wb, qb)), axis=-2).reshape(lead + (n,))
        m *= 2
    return x


def _inv_stages(x, psi_inv_rev_mont, n_inv_mont, q, qinv_neg):
    """Inverse stage chain on [L, P, n]."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    nd = x.ndim
    qb = _bc(q, nd, 1)
    qib = _bc(qinv_neg, nd, 1)
    t = 1
    m = n
    while m > 1:
        h = m // 2
        v = x.reshape(lead + (h, 2, t))
        u = v[..., 0, :]
        w_ = v[..., 1, :]
        tw = psi_inv_rev_mont[:, h : 2 * h].reshape((x.shape[0],) + (1,) * (nd - 2) + (h, 1))
        x = jnp.stack(
            (addmod(u, w_, qb), montmul(submod(u, w_, qb), tw, qb, qib)), axis=-2
        ).reshape(lead + (n,))
        t *= 2
        m = h
    return montmul(x, _bc(n_inv_mont, nd), _bc(q, nd), _bc(qinv_neg, nd))


def _chunked(stages, x, *tables):
    """Apply a stage chain over [L, ..., n], chunking the flattened poly axis
    so every chunk's chain fuses in one pass."""
    shape = x.shape
    n = shape[-1]
    L = shape[0]
    x3 = x.reshape(L, -1, n)
    p = x3.shape[1]
    chunk = max(1, _CHUNK_ELEMS // (n * L))
    if p <= chunk:
        return stages(x3, *tables).reshape(shape)
    nc = -(-p // chunk)
    pad = nc * chunk - p
    if pad:
        x3 = jnp.concatenate(
            [x3, jnp.zeros((L, pad, n), dtype=x3.dtype)], axis=1
        )
    xs = jnp.transpose(x3.reshape(L, nc, chunk, n), (1, 0, 2, 3))
    out = jax.lax.map(lambda c: stages(c, *tables), xs)
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(L, nc * chunk, n)
    if pad:
        out = out[:, :p]
    return out.reshape(shape)


@jax.jit
def ntt_fwd(x, psi_rev_mont, q, qinv_neg):
    """Forward negacyclic NTT along the last axis (natural -> bit-reversed)."""
    return _chunked(_fwd_stages, x, psi_rev_mont, q, qinv_neg)


@jax.jit
def ntt_inv(x, psi_inv_rev_mont, n_inv_mont, q, qinv_neg):
    """Inverse negacyclic NTT along the last axis (bit-reversed -> natural)."""
    return _chunked(_inv_stages, x, psi_inv_rev_mont, n_inv_mont, q, qinv_neg)


@jax.jit
def pointwise_mul(a, b, q, qinv_neg, r2):
    """Exact a*b mod q for standard-form operands (elementwise)."""
    qb = _bc(q, a.ndim)
    qib = _bc(qinv_neg, a.ndim)
    return montmul(montmul(a, b, qb, qib), _bc(r2, a.ndim), qb, qib)
