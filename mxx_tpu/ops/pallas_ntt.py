"""Pallas TPU kernels for the negacyclic NTT (exploratory alternative path).

Mosaic constraint: vector reshapes must preserve the 128-lane dimension, so a
single kernel cannot run butterfly stages whose pair distance drops below 128
lanes. The hybrid transform fuses the lane-preserving stages (t >= 128) into
one VMEM-resident Pallas kernel and finishes the sub-lane stages in jnp.

MEASURED (v5e, n=2^13, L=8, B=32): the XLA-fused jnp path (`ring.ntt`)
reaches ~11.9M limb-NTTs/s while this Pallas formulation reaches only ~81k —
Mosaic lowers the stage reshuffles to scalar-heavy code, whereas XLA fuses
the 13 elementwise stages into efficient VPU programs. `ring.ntt` is
therefore the production path; the planned speed-of-light successor is a
four-step NTT that rides the MXU via the int8-digit exact matmul
(`ops.zq_matmul`), not a butterfly kernel. Kept as working, tested
infrastructure for future kernel work (grid/BlockSpec layout, SMEM per-limb
constants, x64-safe tracing).

Layout: x uint32[L, B, n]; per-limb twiddles uint32[L, n] (Montgomery form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring import ntt as jnp_ntt
from ..utils.u32 import addmod, montmul, submod

DEFAULT_TILE = 8
LANE = 128


def _fwd_head_kernel(q_ref, qinv_ref, psi_ref, x_ref, o_ref):
    """Butterfly stages with pair distance t >= LANE (lane-preserving)."""
    limb = pl.program_id(0)
    q = q_ref[limb]
    qinv = qinv_ref[limb]
    psi = psi_ref[0]  # [1, n]
    x = x_ref[0]  # [TB, n]
    tb, n = x.shape
    m, t = 1, n
    while t > LANE:
        t //= 2
        v = x.reshape(tb, m, 2, t)
        a = v[:, :, 0, :]
        b = v[:, :, 1, :]
        w = jax.lax.slice(psi, (0, m), (1, 2 * m)).reshape(1, m, 1)
        wb = montmul(b, w, q, qinv)
        x = jnp.concatenate(
            (addmod(a, wb, q)[:, :, None, :], submod(a, wb, q)[:, :, None, :]), axis=2
        ).reshape(tb, n)
        m *= 2
    o_ref[0] = x


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def ntt_fwd_head_pallas(x, psi_rev_mont, q, qinv_neg, tile: int = DEFAULT_TILE,
                        interpret: bool = False):
    L, B, n = x.shape
    tb = min(tile, B)
    assert B % tb == 0, f"batch {B} must divide by tile {tb}"
    # Mosaic rejects i64 index arithmetic; trace the kernel with x64 off
    # (all tensor data is uint32 regardless).
    with jax.enable_x64(False):
        return _head_call(x, psi_rev_mont, q, qinv_neg, L, B, n, tb, interpret)


def _head_call(x, psi_rev_mont, q, qinv_neg, L, B, n, tb, interpret):
    return pl.pallas_call(
        _fwd_head_kernel,
        grid=(L, B // tb),
        in_specs=[
            pl.BlockSpec((L,), lambda l, b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((L,), lambda l, b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda l, b: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, n), lambda l, b: (l, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, n), lambda l, b: (l, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B, n), jnp.uint32),
        interpret=interpret,
    )(q, qinv_neg, psi_rev_mont.reshape(L, 1, n), x)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def ntt_fwd_hybrid(x, psi_rev_mont, q, qinv_neg, tile: int = DEFAULT_TILE,
                   interpret: bool = False):
    """Full forward negacyclic NTT: Pallas head + jnp tail stages."""
    L, B, n = x.shape
    if n <= LANE:
        return jnp_ntt.ntt_fwd(x, psi_rev_mont, q, qinv_neg)
    x = ntt_fwd_head_pallas(x, psi_rev_mont, q, qinv_neg, tile=tile, interpret=interpret)
    # remaining stages: m from n/LANE up, t from LANE/2 down to 1
    qb = q.reshape(L, 1, 1, 1)
    qib = qinv_neg.reshape(L, 1, 1, 1)
    m, t = n // LANE, LANE
    while m < n:
        t //= 2
        v = x.reshape(L, B, m, 2, t)
        a = v[..., 0, :]
        b = v[..., 1, :]
        w = psi_rev_mont[:, m : 2 * m].reshape(L, 1, m, 1)
        wb = montmul(b, w, qb, qib)
        x = jnp.stack((addmod(a, wb, qb), submod(a, wb, qb)), axis=-2).reshape(L, B, n)
        m *= 2
    return x
