"""BGG+ public key wire (reference /root/reference/src/bgg/public_key.rs:13)."""

from __future__ import annotations

from dataclasses import dataclass

from ..matrix import PolyMatrix


@dataclass(frozen=True)
class BggPublicKey:
    matrix: PolyMatrix  # d x (d * modulus_digits)
    reveal_plaintext: bool

    def __add__(self, other: "BggPublicKey") -> "BggPublicKey":
        return BggPublicKey(
            self.matrix + other.matrix, self.reveal_plaintext and other.reveal_plaintext
        )

    def __sub__(self, other: "BggPublicKey") -> "BggPublicKey":
        return BggPublicKey(
            self.matrix - other.matrix, self.reveal_plaintext and other.reveal_plaintext
        )

    def concat_columns(self, others: list["BggPublicKey"]) -> "BggPublicKey":
        mat = self.matrix.concat_columns([o.matrix for o in others])
        reveal = all([self.reveal_plaintext] + [o.reveal_plaintext for o in others])
        return BggPublicKey(mat, reveal)

    def __mul__(self, other: "BggPublicKey") -> "BggPublicKey":
        """Homomorphic Mul on pubkey wires: A_out = A1 * G^{-1}(A2)."""
        return BggPublicKey(
            self.matrix.mul_decompose(other.matrix),
            self.reveal_plaintext and other.reveal_plaintext,
        )

    # Evaluable surface (reference public_key.rs:107-157)

    def small_scalar_mul(self, params, scalar: list[int]) -> "BggPublicKey":
        from ..ring.poly import Poly

        coeffs = list(scalar) + [0] * (params.n - len(scalar))
        p = Poly.from_int_coeffs(params, coeffs)
        return BggPublicKey(self.matrix.mul_poly_scalar(p), self.reveal_plaintext)

    def large_scalar_mul(self, params, scalar: list[int]) -> "BggPublicKey":
        from ..matrix import PolyMatrix
        from ..ring.poly import Poly

        coeffs = list(scalar) + [0] * (params.n - len(scalar))
        p = Poly.from_int_coeffs(params, coeffs)
        scalar_gadget = PolyMatrix.gadget_matrix(params, self.matrix.nrow).mul_poly_scalar(p)
        return BggPublicKey(self.matrix.mul_decompose(scalar_gadget), self.reveal_plaintext)

    def matrix_mul(self, params, rhs_matrix: PolyMatrix) -> "BggPublicKey":
        return BggPublicKey(self.matrix.mul_decompose(rhs_matrix), self.reveal_plaintext)

    def __eq__(self, other):
        if not isinstance(other, BggPublicKey):
            return NotImplemented
        return self.reveal_plaintext == other.reveal_plaintext and self.matrix == other.matrix

    def __hash__(self):
        return id(self)
