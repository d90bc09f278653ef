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
        One device program for the A_LT hash batch, the G*y subtraction, and
        the secret-row matmuls — bit-identical to per-gate `public_lookup`."""
        import jax
        import jax.numpy as jnp

        from ..ops.elementwise import ew_mul, ew_sub
        from ..ops.zq_matmul import zq_matmul
        from ..ring.poly import EVAL

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
        L, B_ = ys_res.shape
        ys = [
            Poly(
                np.broadcast_to(ys_res[:, i : i + 1], (L, params.n)), EVAL, params
            )
            for i in range(B_)
        ]
        a_lts = derive_a_lt_matrices_batch(
            params, d, self.hash_key, [it[2] for it in items]
        )
        B = len(items)
        jt = params.jt
        g_data = PolyMatrix.gadget_matrix(params, d).to_eval().data  # [L, d, m, n]
        y_data = jnp.stack([jnp.asarray(y.data) for y in ys], axis=1)  # [L, B, n]
        gy = ew_mul(
            jnp.tile(g_data, (1, B, 1, 1)),
            jnp.repeat(y_data, d, axis=1)[:, :, None, :],
            jt.moduli, jt.qinv_neg, jt.r2,
        )  # [L, B*d, m, n]
        a_data = jnp.concatenate([a.to_eval().data for a in a_lts], axis=1)
        diff = ew_sub(a_data, gy, jt.moduli)  # [L, B*d, m, n]
        L, _, m, n = diff.shape
        diff_b = jnp.transpose(diff.reshape(L, B, d, m, n), (1, 0, 2, 3, 4))
        s_data = self.secret_vec.to_eval().data  # [L, 1, d, n]
        s_b = jnp.broadcast_to(s_data, (B,) + s_data.shape)
        vec = jax.vmap(zq_matmul, in_axes=(0, 0, None, None, None, None))(
            s_b, diff_b, jt.moduli, jt.qinv_neg, jt.combine_pows_mont,
            jt.sign_corr_pows,
        )  # [B, L, 1, m, n]
        return [
            BggEncoding(
                PolyMatrix(vec[i], EVAL, params),
                BggPublicKey(a_lts[i], True),
                ys[i],
            )
            for i in range(B)
        ]
