"""Plaintext-level LUT evaluator — ground truth for the circuit oracles.

Reference: /root/reference/src/lookup/poly.rs:8-45. Looks up the constant
coefficient of the input polynomial and returns the constant polynomial y_k.
"""

from __future__ import annotations

from ..ring.poly import Poly


class PolyPltEvaluator:
    def public_lookup(self, params, plt, one: Poly, input_poly: Poly, gate_id: int, lut_id: int):
        x = input_poly.const_value()
        out = plt.get(params, int(x))
        if out is None:
            raise KeyError(
                f"lookup output not found; gate_id={gate_id} lut_id={lut_id} input={x}"
            )
        return Poly.from_elem_to_constant(params, out[1])
