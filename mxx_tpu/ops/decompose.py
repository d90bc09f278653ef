"""Per-tower base-2^b digit decomposition (G^{-1}) as a device op.

Replaces the reference's OpenFHE `Decompose` + `decompose_last_mask` clamping
(/root/reference/src/matrix/dcrt_poly.rs:457-500) and the CUDA decompose
kernels (/root/reference/cuda/src/matrix/MatrixDecompose.cu). Digits are
ordered tower-major: output row block index = tower * digits_per_tower + j,
matching the gadget-vector residues in `RingParams.np_gadget_res`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("base_bits", "dpt", "towers"))
def digit_decompose(data, q, digit_masks, *, base_bits: int, dpt: int, towers: int):
    """data: uint32[L, r, c, n] in COEFF form -> uint32[L, r*k', c, n].

    k' = towers * dpt. For the full G^{-1}, towers == L; for the "small"
    per-tower variant (entries with small norm), towers == 1 (digits of tower
    0 are valid for every tower; reference matrix/dcrt_poly.rs:166-199).
    """
    L, r, c, n = data.shape
    digits = []
    for t in range(towers):
        x = data[t]
        for j in range(dpt):
            digits.append((x >> (j * base_bits)) & digit_masks[j])
    dig = jnp.stack(digits)  # [k', r, c, n], values < 2^crt_bits < 2*q_s
    qb = q[:, None, None, None, None]
    red = jnp.where(dig[None] >= qb, dig[None] - qb, dig[None])  # [L, k', r, c, n]
    kprime = towers * dpt
    return jnp.transpose(red, (0, 2, 1, 3, 4)).reshape(L, r * kprime, c, n)
