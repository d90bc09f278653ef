"""Batched constant lifts: many `one.large_scalar_mul(const)` in one program.

The Diamond PRF pipeline lifts every public Ring-GSW ciphertext component
value onto a BGG wire by scalar-multiplying the one wire (reference
diamond_io.rs:330-388 / utils.rs native_ciphertexts_to_public_key_wires).
At protocol scale that is tens of thousands of lifts of the SAME input wire
with different integer constants — a perfect shared-operand batch:

    A_b = A_one @ G^{-1}(c_b * G)    for a whole chunk of constants c_b

with ONE decompose + ONE vmapped exact matmul per chunk. Results are
bit-identical to per-call large_scalar_mul (same kernels, same order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import PolyMatrix
from ..ops.decompose import digit_decompose
from ..ops.elementwise import ew_mul
from ..ops.zq_matmul import zq_matmul
from ..ring.ntt import ntt_fwd
from ..ring.poly import COEFF, EVAL, Poly, residue_planes_from_ints
from .encoding import BggEncoding
from .public_key import BggPublicKey

LIFT_CHUNK = 512


def _const_eval_polys(params, values):
    """[L, B, n] EVAL-form data of constant polys + per-value Poly views."""
    L, n = params.crt_depth, params.n
    res = residue_planes_from_ints(params, values)  # [L, B]
    coeff = np.zeros((L, len(values), n), dtype=np.uint32)
    coeff[:, :, 0] = res
    jt = params.jt
    data = ntt_fwd(jnp.asarray(coeff), jt.psi_rev_mont, jt.moduli, jt.qinv_neg)
    return data


def _lift_chunk(params, one_matrix_eval, values, with_vector, one_vector_eval):
    jt = params.jt
    B = len(values)
    d = one_matrix_eval.shape[1]
    s_eval = _const_eval_polys(params, values)  # [L, B, n]
    gadget = PolyMatrix.gadget_matrix(params, d).data  # [L, d, m, n] EVAL
    sg = ew_mul(
        jnp.tile(gadget, (1, B, 1, 1)),
        jnp.repeat(s_eval, d, axis=1)[:, :, None, :],
        jt.moduli, jt.qinv_neg, jt.r2,
    )  # [L, B*d, m, n] EVAL
    # decompose needs COEFF
    from ..ring.ntt import ntt_inv

    sg_coeff = ntt_inv(sg, jt.psi_inv_rev_mont, jt.n_inv_mont, jt.moduli, jt.qinv_neg)
    dec = digit_decompose(
        sg_coeff, jt.moduli, jt.digit_masks,
        base_bits=params.base_bits, dpt=params.digits_per_tower,
        towers=params.crt_depth,
    )  # [L, B*d*k, m, n]
    dec = ntt_fwd(dec, jt.psi_rev_mont, jt.moduli, jt.qinv_neg)
    k = params.modulus_digits
    L, _, m, n = dec.shape
    dec_b = jnp.transpose(dec.reshape(L, B, d * k, m, n), (1, 0, 2, 3, 4))
    mm = jax.vmap(zq_matmul, in_axes=(None, 0, None, None, None, None))
    out_pk = mm(one_matrix_eval, dec_b, jt.moduli, jt.qinv_neg,
                jt.combine_pows_mont, jt.sign_corr_pows)  # [B, L, d, m, n]
    out_vec = None
    if with_vector:
        out_vec = mm(one_vector_eval, dec_b, jt.moduli, jt.qinv_neg,
                     jt.combine_pows_mont, jt.sign_corr_pows)
    return s_eval, out_pk, out_vec


def lift_constants_batched(params, one_wire, values: list[int]):
    """Lift integer constants onto BGG wires via the one wire: returns
    BggPublicKey wires if `one_wire` is a BggPublicKey, BggEncoding wires
    (plaintext = the constant) if it is a BggEncoding."""
    is_enc = isinstance(one_wire, BggEncoding)
    one_matrix = (one_wire.pubkey.matrix if is_enc else one_wire.matrix).to_eval()
    one_vector = one_wire.vector.to_eval() if is_enc else None
    outs = []
    for start in range(0, len(values), LIFT_CHUNK):
        chunk = [int(v) for v in values[start : start + LIFT_CHUNK]]
        n_real = len(chunk)
        # pad to a power of two so every chunk hits a cached program shape
        pad = 1
        while pad < n_real:
            pad *= 2
        chunk = chunk + [chunk[-1]] * (pad - n_real)
        s_eval, out_pk, out_vec = _lift_chunk(
            params, one_matrix.data, chunk, is_enc,
            one_vector.data if is_enc else None,
        )
        chunk = chunk[:n_real]
        # ONE host fetch per chunk; per-value slices below are numpy views
        # (a device slice per value was ~50 ms each through dispatch)
        s_eval = np.asarray(s_eval)
        out_pk = np.asarray(out_pk)
        out_vec = np.asarray(out_vec) if out_vec is not None else None
        for i, v in enumerate(chunk):
            pk = BggPublicKey(
                PolyMatrix(out_pk[i], EVAL, params),
                one_wire.pubkey.reveal_plaintext if is_enc else one_wire.reveal_plaintext,
            )
            if is_enc:
                pt = Poly(s_eval[:, i], EVAL, params)
                outs.append(
                    BggEncoding(PolyMatrix(out_vec[i], EVAL, params), pk, pt)
                )
            else:
                outs.append(pk)
    return outs
