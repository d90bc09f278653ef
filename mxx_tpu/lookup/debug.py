"""Debug/test LUT evaluators over BGG wires.

Reference analog: /root/reference/src/lookup/debug.rs (the
DebugNaiveBGGPublicKeyVecPltEvaluator family), whose point is to make
LUT-heavy circuits evaluable in tests without paying the full per-entry
Gaussian-preimage sampling of the production LWE/GGH15 evaluators. The
reference's version swaps in a cheap deterministic trapdoor preimage; this
module goes one step further for CI scale and constructs the output wires
directly from the (test-held) BGG secret:

- pubkey path: output pubkey = Hash(key, "A_LT_{gate}") — IDENTICAL to the
  production evaluator's output pubkey, so artifacts derived from debug-path
  pubkeys (decoder preimages etc.) stay valid against production wires.
- encoding path: output encoding = s (A_LT - y G), the exact relation the
  production evaluator's c_b K_high + c_z K_low telescopes to (lwe.py:14-17)
  with zero lookup error.

Production-path correctness (preimage algebra, storage round-trip) is covered
by test_lwe_modp_chain; these evaluators exist so protocol-level tests with
hundreds of nested-RNS reduce LUT gates stay CI-tractable. NEVER use outside
tests: they require the secret.
"""

from __future__ import annotations

import functools

from ..bgg import BggEncoding, BggPublicKey
from ..matrix import PolyMatrix
from ..ring.poly import Poly
from ..sampler import Trapdoor
from .lwe import derive_a_lt_matrices_batch, derive_a_lt_matrix


def _batched_const_values(params, polys) -> list[int]:
    """Constant-poly values for many wires with ONE device fetch for the
    device-resident ones (a per-gate const_value on a lazy device plaintext
    costs a dispatch+sync each; batched LUT gates arrive thousands at a
    time). Numpy-backed polys read their column directly."""
    import jax.numpy as jnp
    import numpy as np

    out = [None] * len(polys)
    dev = []
    for i, p in enumerate(polys):
        assert p is not None, "LUT input must reveal its plaintext"
        if isinstance(p.data, np.ndarray):
            out[i] = params.reconstruct_coeff(np.asarray(p.data[:, 0]))
        else:
            dev.append(i)
    if dev:
        stacked = np.asarray(
            jnp.stack([polys[i].data for i in dev])[:, :, 0]
        )  # [B_dev, L]
        for j, i in enumerate(dev):
            out[i] = params.reconstruct_coeff(stacked[j])
    return [int(v) for v in out]


def debug_trapdoor_preimage(params, trapdoor: Trapdoor, target: PolyMatrix) -> PolyMatrix:
    """Exact preimage without perturbation (debug.rs DebugTrapdoorPreimage):
    A [R z; E z; z] = (G - AR - E + AR + E) z = target."""
    dec = target.decompose()
    r_part = trapdoor.r @ dec
    e_part = trapdoor.e @ dec
    return r_part.concat_rows([e_part, dec])


class RelationCheckingPltEvaluator:
    """Wraps any encoding-path PltEvaluator and asserts the BGG relation of
    every lookup output against the provided secret vector (zero-error runs).
    """

    def __init__(self, inner, secret_vec: PolyMatrix):
        self.inner = inner
        self.secret_vec = secret_vec

    def public_lookup(self, params, plt, one, input_enc, gate_id, lut_id):
        out = self.inner.public_lookup(params, plt, one, input_enc, gate_id, lut_id)
        if isinstance(out, BggEncoding) and out.plaintext is not None:
            d = self.secret_vec.ncol
            g = PolyMatrix.gadget_matrix(params, d)
            expected = self.secret_vec @ out.pubkey.matrix - (
                self.secret_vec @ g
            ).mul_poly_scalar(out.plaintext)
            assert out.vector == expected, (
                f"debug: LUT output relation violated at gate {gate_id}"
            )
        return out


class DebugBGGPubKeyPltEvaluator:
    """Pubkey-path debug evaluator: hash-derived A_LT, no artifact sampling."""

    def __init__(self, hash_key: bytes):
        self.hash_key = hash_key

    def public_lookup(self, params, plt, one, input_pk: BggPublicKey,
                      gate_id: int, lut_id: int, slot_idx=None) -> BggPublicKey:
        a_lt = derive_a_lt_matrix(
            params, input_pk.matrix.nrow, self.hash_key, gate_id, slot_idx
        )
        return BggPublicKey(a_lt, True)

    def public_lookup_batch(self, params, items) -> list[BggPublicKey]:
        """Batched lookup: items = [(plt, input_pk, gate_id, lut_id)];
        bit-identical to per-gate `public_lookup` (same A_LT streams)."""
        d = items[0][1].matrix.nrow
        assert all(it[1].matrix.nrow == d for it in items)
        a_lts = derive_a_lt_matrices_batch(
            params, d, self.hash_key, [it[2] for it in items]
        )
        return [BggPublicKey(a, True) for a in a_lts]

    def sample_aux_matrices(self, params):
        pass


def _lut_enc_kernel_impl(a_data, y_res, s_data, g_data, moduli, qinv_neg, r2,
                         cp, sc):
    """vec[b] = s @ (A_LT[b] - G * y[b]) for a whole LUT batch.

    a_data [L, B*d, m, n]; y_res [L, B] (constant-poly residues);
    s_data [L, 1, d, n]; g_data [L, d, m, n]. Returns [B, L, 1, m, n]."""
    import jax
    import jax.numpy as jnp

    from ..ops.elementwise import ew_mul, ew_sub
    from ..ops.zq_matmul import zq_matmul

    L, Bd, m, n = a_data.shape
    d = g_data.shape[1]
    B = Bd // d
    g_t = jnp.tile(g_data, (1, B, 1, 1))  # [L, B*d, m, n]
    yb = jnp.repeat(y_res, d, axis=1)[:, :, None, None]  # [L, B*d, 1, 1]
    gy = ew_mul(g_t, jnp.broadcast_to(yb, (L, Bd, 1, n)), moduli, qinv_neg, r2)
    diff = ew_sub(a_data, gy, moduli)
    diff_b = jnp.transpose(diff.reshape(L, B, d, m, n), (1, 0, 2, 3, 4))
    s_b = jnp.broadcast_to(s_data, (B,) + s_data.shape)
    return jax.vmap(zq_matmul, in_axes=(0, 0, None, None, None, None))(
        s_b, diff_b, moduli, qinv_neg, cp, sc
    )


@functools.cache
def _lut_enc_kernel_jit():
    import jax

    return jax.jit(_lut_enc_kernel_impl)


def _lut_enc_kernel(*args):
    return _lut_enc_kernel_jit()(*args)


class DebugBGGEncodingPltEvaluator:
    """Encoding-path debug evaluator: exact output from the test-held secret.

    `secret_vec` is the 1 x d BGG secret row s (for Diamond wires, the final
    state secret sigma reconstructed by the injector debug helper)."""

    def __init__(self, hash_key: bytes, secret_vec: PolyMatrix):
        self.hash_key = hash_key
        self.secret_vec = secret_vec

    def public_lookup(self, params, plt, one, input_enc: BggEncoding,
                      gate_id: int, lut_id: int, slot_idx=None) -> BggEncoding:
        assert input_enc.plaintext is not None, "debug lookup input must reveal plaintext"
        z = int(input_enc.plaintext.const_value())
        got = plt.get(params, z)
        if got is None:
            raise KeyError(f"{z} not found in LUT {lut_id} for gate {gate_id}")
        _k, y = got
        y_poly = Poly.from_elem_to_constant(params, y)
        d = input_enc.pubkey.matrix.nrow
        a_lt = derive_a_lt_matrix(params, d, self.hash_key, gate_id, slot_idx)
        gadget = PolyMatrix.gadget_matrix(params, d)
        vector = self.secret_vec @ (a_lt - gadget.mul_poly_scalar(y_poly))
        return BggEncoding(vector, BggPublicKey(a_lt, True), y_poly)

    def public_lookup_batch(self, params, items) -> list[BggEncoding]:
        """Batched lookup: items = [(plt, input_enc, gate_id, lut_id)].
        ONE jitted program (pow2-padded batch width, so per-level widths hit
        the compile cache) for the G*y subtraction and the secret-row
        matmuls, ONE host fetch, numpy-view outputs — bit-identical to
        per-gate `public_lookup`. The previous version sliced the batched
        result per gate on device (an eager dispatch per gate: 65% of the
        round-5 real-mode encoding-path profile)."""
        import numpy as np

        from ..ring.poly import EVAL, residue_planes_from_ints

        d = items[0][1].pubkey.matrix.nrow
        zs = _batched_const_values(params, [it[1].plaintext for it in items])
        y_vals = []
        for (plt, input_enc, gate_id, lut_id), z in zip(items, zs):
            got = plt.get(params, z)
            if got is None:
                raise KeyError(f"{z} not found in LUT {lut_id} for gate {gate_id}")
            y_vals.append(int(got[1].value))
        # ONE host residue pass + numpy broadcast views for the y polys
        # (a device Poly.const per gate was ~40% of encoding-path LUT time)
        ys_res = residue_planes_from_ints(params, y_vals)  # [L, B]
        L, B = ys_res.shape
        ys = [
            Poly(
                np.broadcast_to(ys_res[:, i : i + 1], (L, params.n)), EVAL, params
            )
            for i in range(B)
        ]
        a_lts = derive_a_lt_matrices_batch(
            params, d, self.hash_key, [it[2] for it in items]
        )  # numpy EVAL views after one fetch
        # pad batch width to pow2 (fresh widths = fresh XLA compiles)
        padB = B
        if B > 16:
            padB = 1
            while padB < B:
                padB *= 2
        a_host = np.concatenate(
            [np.asarray(a.data) for a in a_lts]
            + [np.asarray(a_lts[-1].data)] * (padB - B),
            axis=1,
        )  # [L, padB*d, m, n]
        y_host = np.concatenate(
            [ys_res, np.repeat(ys_res[:, -1:], padB - B, axis=1)], axis=1
        ) if padB != B else ys_res
        jt = params.jt
        g_data = PolyMatrix.gadget_matrix(params, d).to_eval().data
        s_data = self.secret_vec.to_eval().data  # [L, 1, d, n]
        vec = _lut_enc_kernel(
            a_host, y_host, s_data, g_data, jt.moduli, jt.qinv_neg, jt.r2,
            jt.combine_pows_mont, jt.sign_corr_pows,
        )  # [padB, L, 1, m, n]
        host_vec = np.asarray(vec)  # one fetch; slices below are views
        return [
            BggEncoding(
                PolyMatrix(host_vec[i], EVAL, params),
                BggPublicKey(a_lts[i], True),
                ys[i],
            )
            for i in range(B)
        ]
