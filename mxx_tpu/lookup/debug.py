"""Debug LUT evaluators: relation-checking wrappers over real evaluators.

TPU-build of /root/reference/src/lookup/debug.rs: evaluators used as test
oracles that verify the BGG relation of every lookup output against the
(debug-only) secret. The debug trapdoor preimage shortcut
    preimage(T) = [R G^{-1}(T); E G^{-1}(T); G^{-1}(T)]
matches debug.rs:33-49 (exact, non-Gaussian).
"""

from __future__ import annotations

from ..bgg import BggEncoding
from ..matrix import PolyMatrix
from ..sampler import Trapdoor


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
