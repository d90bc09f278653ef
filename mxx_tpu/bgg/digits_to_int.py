"""Recompose base-digit wires into an integer wire.

Reference: /root/reference/src/bgg/digits_to_int.rs. For plain polys this is
sum_i digits[i] * b^i; for BGG pubkey/encoding wires each digit is projected
by mul_decompose with a scaled unit column (b^i at the last row), yielding
d x 1 projected wires that sum to the integer projection used by decoders.
"""

from __future__ import annotations

from ..matrix import PolyMatrix
from ..ring.poly import Poly
from .encoding import BggEncoding
from .public_key import BggPublicKey


def power_of_base(wire, params, k: int):
    scalar = Poly.from_power_of_base_to_constant(params, k)
    if isinstance(wire, Poly):
        return wire * scalar
    if isinstance(wire, BggPublicKey):
        d1 = wire.matrix.nrow
        unit = PolyMatrix.scaled_unit_column_vector(params, d1, d1 - 1, scalar)
        return BggPublicKey(wire.matrix.mul_decompose(unit), wire.reveal_plaintext)
    if isinstance(wire, BggEncoding):
        d1 = wire.pubkey.matrix.nrow
        unit = PolyMatrix.scaled_unit_column_vector(params, d1, d1 - 1, scalar)
        return BggEncoding(
            wire.vector.mul_decompose(unit),
            BggPublicKey(wire.pubkey.matrix.mul_decompose(unit), wire.pubkey.reveal_plaintext),
            wire.plaintext * scalar if wire.plaintext is not None else None,
        )
    raise TypeError(type(wire))


def digits_to_int(digits: list, params):
    assert len(digits) == params.modulus_digits
    acc = None
    for i, digit in enumerate(digits):
        term = power_of_base(digit, params, i)
        acc = term if acc is None else acc + term
    return acc
