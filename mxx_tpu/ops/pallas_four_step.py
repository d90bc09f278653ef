"""Fused Pallas four-step NTT: MXU digit matmuls + VMEM word recombine.

TPU-native successor to the radix stage chain (ring/ntt.py) for large rings,
replacing the reference's CUDA NTT (cuda/src/matrix/MatrixNTT.cu:39-152) on
the performance path. The transform factors n = n1 * n2 into

    step a: W2 [n2, n2] constant matmul        (MXU, int8 digit planes)
    twiddle: elementwise T[k2, i1]             (folded into step-a recombine)
    step c: I_P (x) W1 [C, C] constant matmul  (MXU, int8 digit planes)

run per (limb, P-poly block) entirely in VMEM, so HBM sees only the uint32
operand and result (plus two XLA layout passes). The inverse transform runs
the same pipeline with inverted constant tables (W1^{-1}, T^{-1}, W2^{-1}
mod q) in the opposite order — no separate derivation needed.

Digit-plane recombination is the VPU bottleneck, so instead of seven
Montgomery multiplies per output (one per digit diagonal), the seven biased
plane sums are packed into an exact 96-bit word triple (w0, w1, w2) with
shift/carry arithmetic and reduced with THREE Montgomery multiplies by
2^{32(j+1)} mod q; the between-steps twiddle is folded into those three
constants as per-element tables, making it free. Measured on the attached
v5e: 429k limb-NTTs/s at n=2^13/L=8 vs 374k for the XLA radix chain; both
sit near this device's ~220 GB/s effective HBM / ~1T-op/s VPU roofline (see
BENCHMARKS.md round-2 analysis).

Bit-exact against ring/ntt.{ntt_fwd,ntt_inv} (same merged-twist EVAL
ordering, tables from ops/four_step_ntt.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.u32 import addmod, montmul, submod
from .four_step_ntt import _tables

R32 = 1 << 32
# Plane-sum bound for K <= 128 contraction and crt_bits <= 30: the worst
# digit diagonal (s=2 or s=3) sums at most 3 full +-128 x +-128 pairs plus
# pairs touching the small top digit (<= 64 for q < 2^30), so
# |p_s| <= (3*16384 + 2*128*64)*128 < 2^23 strictly. The +BIAS offset then
# keeps u_s < 2^24 and every shift in the word build carry-exact. K > 128
# (n2 > 128 or p_polys*n1 > 128) would break this — asserted in _run.
BIAS = 1 << 23
DEFAULT_P = 2


def _np_balanced_digits_i8(x: np.ndarray) -> np.ndarray:
    """numpy twin of zq_matmul._balanced_digits_i8: [4, ...] int8 planes."""
    v = x.astype(np.int64)
    planes = []
    for _ in range(3):
        d = ((v + 128) & 255) - 128
        planes.append(d.astype(np.int8))
        v = (v - d) >> 8
    planes.append(v.astype(np.int8))
    return np.stack(planes, axis=0)


def _mod_matinv(m: np.ndarray, q: int) -> np.ndarray:
    """Inverse of a square matrix over Z_q (q prime), Gaussian elimination."""
    n = m.shape[0]
    a = [[int(v) % q for v in row] for row in m]
    inv = [[1 if i == j else 0 for j in range(n)] for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % q != 0)
        a[col], a[piv] = a[piv], a[col]
        inv[col], inv[piv] = inv[piv], inv[col]
        s = pow(a[col][col], -1, q)
        a[col] = [v * s % q for v in a[col]]
        inv[col] = [v * s % q for v in inv[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(v - f * w) % q for v, w in zip(a[r], a[col])]
                inv[r] = [(v - f * w) % q for v, w in zip(inv[r], inv[col])]
    return np.array(inv, dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _fused_tables(params, n1: int, p_polys: int, inverse: bool):
    """Digitized matmul planes + twiddle-folded word-recombine tables.

    Returns (m1_digits [L,4,R1,R1], m2_digits_T [L,4,C,C], cwt [3,L,R,C],
    offt [L,R,C], cw [3,L], off [L]) where the first matmul's recombine uses
    the per-element twiddle-folded tables and the second the per-limb scalars.
    For the forward transform m1 = W2 (step a) and m2 = I_P (x) W1 applied on
    the right; for the inverse m2' = I_P (x) W1^{-1} runs FIRST with the
    T^{-1}-folded recombine, then m1' = W2^{-1}."""
    n = params.n
    n2 = n // n1
    L = params.crt_depth
    C = p_polys * n1
    w2, t_mont, w1 = _tables(params, n1)
    eye = np.eye(p_polys)
    moduli = [int(qq) for qq in params.moduli]

    m1d = np.empty((L, 4, n2, n2), dtype=np.int8)
    m2d_t = np.empty((L, 4, C, C), dtype=np.int8)
    cwt = np.empty((3, L, n2, C), dtype=np.uint32)
    offt = np.empty((L, n2, C), dtype=np.uint32)
    cw = np.empty((3, L), dtype=np.uint32)
    off_s = np.empty((L,), dtype=np.uint32)
    OFF = sum(BIAS << (8 * s) for s in range(7))

    for t, q in enumerate(moduli):
        t_std = (t_mont[t].astype(np.uint64) * pow(R32, -1, q)) % q  # [n2, n1]
        if inverse:
            m1 = _mod_matinv(w2[t], q)
            blk = np.kron(eye, _mod_matinv(w1[t], q)).astype(np.uint64)
            t_use = np.vectorize(lambda v: pow(int(v), -1, q), otypes=[np.uint64])(t_std)
        else:
            m1 = w2[t]
            blk = np.kron(eye, w1[t]).astype(np.uint64)
            t_use = t_std
        m1d[t] = _np_balanced_digits_i8(m1)
        m2d_t[t] = _np_balanced_digits_i8(blk.T.copy())
        t_tile = np.tile(t_use, (1, p_polys)).astype(object)  # [n2, C]
        for j in range(3):
            w = pow(2, 32 * (j + 1), q)
            cwt[j, t] = ((t_tile * w) % q).astype(np.uint64).astype(np.uint32)
            cw[j, t] = w
        offt[t] = ((t_tile * (OFF % q)) % q).astype(np.uint64).astype(np.uint32)
        off_s[t] = OFF % q
    return m1d, m2d_t, cwt, offt, cw, off_s


def _make_kernel(inverse: bool):
    def kernel(q_s, qinv_s, cw_s, off_s, m1d_ref, m2d_ref, cwt_ref, offt_ref,
               xa_ref, o_ref):
        l = pl.program_id(0)
        q = q_s[l]
        qinv = qinv_s[l]

        def digits(v_u32):
            v = v_u32.astype(jnp.int32)
            planes = []
            for _ in range(3):
                d = ((v + 128) & 255) - 128
                planes.append(d.astype(jnp.int8))
                v = (v - d) >> 8
            planes.append(v.astype(jnp.int8))
            return planes

        def words(ps):
            """Pack 7 biased plane sums into the exact 96-bit (w0, w1, w2)."""
            us = [(p + BIAS).astype(jnp.uint32) for p in ps]
            s01 = us[0] + (us[1] << 8)
            c1 = (s01 < us[0]).astype(jnp.uint32)
            s012 = s01 + (us[2] << 16)
            c2 = (s012 < s01).astype(jnp.uint32)
            w0 = s012 + (us[3] << 24)
            c3 = (w0 < s012).astype(jnp.uint32)
            t5 = us[5] << 8
            t6 = us[6] << 16
            a = (us[1] >> 24) + (us[2] >> 16) + (us[3] >> 8) + c1 + c2 + c3
            w1 = a + us[4]
            c4 = (w1 < a).astype(jnp.uint32)
            w1b = w1 + t5
            c5 = (w1b < w1).astype(jnp.uint32)
            w1c = w1b + t6
            c6 = (w1c < w1b).astype(jnp.uint32)
            w2 = (us[5] >> 24) + (us[6] >> 16) + c4 + c5 + c6
            return w0, w1c, w2

        def mm_planes(wref, x_u32):
            xd = digits(x_u32)
            sums = [None] * 7
            for i in range(4):
                wi = wref[0, i]
                for j in range(4):
                    p = jnp.dot(wi, xd[j], preferred_element_type=jnp.int32)
                    s = i + j
                    sums[s] = p if sums[s] is None else sums[s] + p
            return sums

        def reduce_tables(ws):
            w0, w1, w2 = ws
            acc = montmul(w0, cwt_ref[0, 0], q, qinv)
            acc = addmod(acc, montmul(w1, cwt_ref[1, 0], q, qinv), q)
            acc = addmod(acc, montmul(w2, cwt_ref[2, 0], q, qinv), q)
            return submod(acc, offt_ref[0], q)

        def reduce_scalars(ws):
            w0, w1, w2 = ws
            acc = montmul(w0, cw_s[0, l], q, qinv)
            acc = addmod(acc, montmul(w1, cw_s[1, l], q, qinv), q)
            acc = addmod(acc, montmul(w2, cw_s[2, l], q, qinv), q)
            return submod(acc, jnp.broadcast_to(off_s[l], acc.shape), q)

        x = xa_ref[0, 0]
        if not inverse:
            # step a (twiddle folded), then right-multiply by I_P (x) W1
            ya = reduce_tables(words(mm_planes(m1d_ref, x)))
            out = reduce_scalars(words(mm_planes(m2d_ref, jnp.transpose(ya))))
            o_ref[0, 0] = jnp.transpose(out)
        else:
            # right-multiply by I_P (x) W1^{-1} with T^{-1} folded into its
            # recombine, then left-multiply by W2^{-1}
            ya = reduce_tables(words(mm_planes(m2d_ref, jnp.transpose(x))))
            # reduce_tables output is [C, n2]^T-shaped? No: mm over transposed
            # operand yields [C, n2]; the twiddle tables are [n2, C], so the
            # fold happens after transposing back.
            o_ref[0, 0] = reduce_scalars(words(mm_planes(m1d_ref, jnp.transpose(ya))))

    return kernel


_KERNEL_FWD = _make_kernel(False)
_KERNEL_INV = _make_kernel(True)


def _run(x, params, n1, p_polys, inverse, interpret):
    shape = x.shape
    n = shape[-1]
    L = shape[0]
    n2 = n // n1
    C = p_polys * n1
    assert n1 * n2 == n and n2 <= 128 and C <= 128, (
        "fused four-step requires n2 <= 128 and p_polys*n1 <= 128 "
        "(word-recombine overflow bound)"
    )
    assert params.crt_bits <= 30
    jt = params.jt
    m1d, m2d_t, cwt, offt, cw, off_s = _fused_tables(params, n1, p_polys, inverse)
    if inverse:
        # the T^{-1}-folded tables multiply the FIRST matmul's output, which
        # is produced transposed ([C, n2]); pre-transpose the tables instead
        cwt = np.ascontiguousarray(np.transpose(cwt, (0, 1, 3, 2)))
        offt = np.ascontiguousarray(np.transpose(offt, (0, 2, 1)))
    args = [jnp.asarray(a) for a in (cw, off_s, m1d, m2d_t, cwt, offt)]
    cw_j, off_j, m1d_j, m2d_j, cwt_j, offt_j = args

    x3 = x.reshape(L, -1, n)
    B = x3.shape[1]
    assert B % p_polys == 0, f"batch {B} must divide by p_polys {p_polys}"
    x5 = x3.reshape(L, B // p_polys, p_polys, n2, n1)
    xa = jnp.transpose(x5, (0, 1, 3, 2, 4)).reshape(L, B // p_polys, n2, C)

    tab_r, tab_c = (C, n2) if inverse else (n2, C)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _KERNEL_INV if inverse else _KERNEL_FWD,
            grid=(L, B // p_polys),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 + [
                pl.BlockSpec((1, 4, n2, n2), lambda l, b: (l, 0, 0, 0)),
                pl.BlockSpec((1, 4, C, C), lambda l, b: (l, 0, 0, 0)),
                pl.BlockSpec((3, 1, tab_r, tab_c), lambda l, b: (0, l, 0, 0)),
                pl.BlockSpec((1, tab_r, tab_c), lambda l, b: (l, 0, 0)),
                pl.BlockSpec((1, 1, n2, C), lambda l, b: (l, b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, n2, C), lambda l, b: (l, b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((L, B // p_polys, n2, C), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=interpret,
        )(jt.moduli, jt.qinv_neg, cw_j, off_j, m1d_j, m2d_j, cwt_j, offt_j, xa)

    out = jnp.transpose(out.reshape(L, B // p_polys, n2, p_polys, n1), (0, 1, 3, 2, 4))
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("params", "n1", "p_polys", "interpret"))
def four_step_ntt_fwd_fused(x, *, params, n1: int = 64, p_polys: int = DEFAULT_P,
                            interpret: bool = False):
    """Forward negacyclic NTT (bit-reversed EVAL output, ring/ntt convention).
    x: uint32[L, ..., n]."""
    return _run(x, params, n1, p_polys, False, interpret)


@functools.partial(jax.jit, static_argnames=("params", "n1", "p_polys", "interpret"))
def four_step_ntt_inv_fused(x, *, params, n1: int = 64, p_polys: int = DEFAULT_P,
                            interpret: bool = False):
    """Inverse negacyclic NTT (bit-reversed EVAL input -> natural coeffs)."""
    return _run(x, params, n1, p_polys, True, interpret)
