"""Jitted elementwise Z_q ops on limb-leading arrays (uint32[L, ...])."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.u32 import addmod, limb_bcast, montmul, negmod, submod


@jax.jit
def ew_add(a, b, q):
    return addmod(a, b, limb_bcast(q, a.ndim))


@jax.jit
def ew_sub(a, b, q):
    return submod(a, b, limb_bcast(q, a.ndim))


@jax.jit
def ew_neg(a, q):
    return negmod(a, limb_bcast(q, a.ndim))


@jax.jit
def ew_mul(a, b, q, qinv_neg, r2):
    """Exact elementwise a*b mod q (standard-form operands)."""
    qb = limb_bcast(q, a.ndim)
    qib = limb_bcast(qinv_neg, a.ndim)
    return montmul(montmul(a, b, qb, qib), limb_bcast(r2, a.ndim), qb, qib)


@jax.jit
def ew_mul_mont_const(a, c_mont, q, qinv_neg):
    """a * c mod q where c_mont = c*R mod q is a per-limb constant [L]."""
    qb = limb_bcast(q, a.ndim)
    return montmul(a, limb_bcast(c_mont, a.ndim), qb, limb_bcast(qinv_neg, a.ndim))


@jax.jit
def reduce_once(a, q):
    """Reduce values in [0, 2q) to [0, q)."""
    qb = limb_bcast(q, a.ndim)
    return jnp.where(a >= qb, a - qb, a)
