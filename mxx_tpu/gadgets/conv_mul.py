"""Negacyclic convolution gadget over slot-packed wires (NTT-free).

TPU-build of /root/reference/src/gadgets/conv_mul/mod.rs: for packed wires
a, b carrying N slot values, computes c = a * b in Z[X]/(X^N + 1) via

- signed diagonals diag_d[i] = a_d (i >= d), -a_d (i < d), built as
  3*rep - 2*rep_prefix2 from two Repeated slot transfers (the reference's
  "a_d - 2 * wrap_prefix(a_d)" trick with small scalars only);
- rotated views rot_d[i] = b[(i - d) mod N] via Rotation slot transfers;
- pointwise products and a balanced reduction tree.

Works over any Evaluable with a slot-transfer evaluator (PolyVec ground
truth, BGG vectors, nested-RNS packed wires).
"""

from __future__ import annotations

from ..circuit import PolyCircuit, SlotTransferSpec


def negacyclic_conv_mul(circuit: PolyCircuit, a_wire: int, b_wire: int, num_slots: int) -> int:
    terms = []
    for d in range(num_slots):
        rep = circuit.slot_transfer_gate_spec(
            a_wire, SlotTransferSpec.repeated(d, num_slots, 0, None)
        )
        if d == 0:
            diag = rep
        else:
            rep2 = circuit.slot_transfer_gate_spec(
                a_wire, SlotTransferSpec.repeated(d, num_slots, d, 2)
            )
            three_rep = circuit.small_scalar_mul(rep, [3])
            two_rep2 = circuit.small_scalar_mul(rep2, [2])
            diag = circuit.sub_gate(three_rep, two_rep2)
        rot = circuit.slot_transfer_gate_spec(
            b_wire, SlotTransferSpec.rotation(d, num_slots)
        )
        terms.append(circuit.mul_gate(diag, rot))
    # balanced reduction tree
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms) - 1, 2):
            nxt.append(circuit.add_gate(terms[i], terms[i + 1]))
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]
