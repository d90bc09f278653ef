"""Circuit DAG IR + builder + evaluation.

Reference: /root/reference/src/circuit/poly_circuit/{mod.rs,construction.rs,
eval.rs}. The builder API mirrors the reference (wire ids are gate indices;
gate 0 is the implicit constant-one input wire supplied separately at eval).

Evaluation runs over any `Evaluable`-like wire type: objects supporting
__add__/__sub__/__mul__ plus small_scalar_mul/large_scalar_mul (and optional
matrix_mul). Plain `Poly`, `BggPublicKey`, `BggEncoding`, norm wires etc. all
qualify — the same three-way oracle pattern as the reference (SURVEY.md §4).

The host-side scheduler evaluates gates in topological (id) order, freeing
wires by use count (reference eval.rs:210-230). Gate-level batching onto the
device is handled inside the wire ops themselves (arrays are device-resident).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from .gate import (
    ADD,
    INPUT,
    LARGE_SCALAR_MUL,
    MUL,
    PUB_LUT,
    SLOT_REDUCE,
    SLOT_TRANSFER,
    SMALL_SCALAR_MUL,
    SUB,
    Gate,
    SlotTransferSpec,
)


@dataclass
class PolyCircuit:
    """Gate 0 is the reserved constant-one input wire (reference
    construction.rs:4-10); `input(n)` creates the n user-input wires after it
    and `num_input` counts user inputs only."""

    gates: list[Gate] = field(default_factory=lambda: [Gate(0, INPUT, ())])
    num_input: int = 0
    output_ids: list[int] = field(default_factory=list)
    luts: dict[int, Any] = field(default_factory=dict)

    # ------------------------------------------------------------- builder

    def _new_gate(self, kind: str, inputs: list[int], payload=None) -> int:
        gid = len(self.gates)
        for i in inputs:
            assert 0 <= i < gid, f"gate {gid} references future wire {i}"
        self.gates.append(Gate(gid, kind, tuple(inputs), payload))
        return gid

    def input(self, num_input: int) -> list[int]:
        assert all(g.kind == INPUT for g in self.gates), "inputs must be created first"
        start = len(self.gates)
        for _ in range(num_input):
            self._new_gate(INPUT, [])
        self.num_input += num_input
        return list(range(start, start + num_input))

    def num_gates(self) -> int:
        return len(self.gates)

    @property
    def num_output(self) -> int:
        return len(self.output_ids)

    def output(self, outputs: list[int]):
        self.output_ids.extend(outputs)

    def const_one_gate(self) -> int:
        return 0

    def const_zero_gate(self) -> int:
        return self.not_gate(0)

    def const_minus_one_gate(self) -> int:
        zero = self.const_zero_gate()
        return self.sub_gate(zero, 0)

    def const_digits(self, digits: list[int]) -> int:
        return self.small_scalar_mul(self.const_one_gate(), digits)

    def const_poly(self, poly) -> int:
        return self.large_scalar_mul(self.const_one_gate(), poly.coeffs())

    def add_gate(self, left: int, right: int) -> int:
        return self._new_gate(ADD, [left, right])

    def sub_gate(self, left: int, right: int) -> int:
        return self._new_gate(SUB, [left, right])

    def mul_gate(self, left: int, right: int) -> int:
        return self._new_gate(MUL, [left, right])

    def small_scalar_mul(self, input_id: int, scalar: list[int]) -> int:
        return self._new_gate(SMALL_SCALAR_MUL, [input_id], tuple(int(s) for s in scalar))

    def large_scalar_mul(self, input_id: int, scalar: list[int]) -> int:
        return self._new_gate(LARGE_SCALAR_MUL, [input_id], tuple(int(s) for s in scalar))

    def poly_scalar_mul(self, input_id: int, poly) -> int:
        return self.large_scalar_mul(input_id, poly.coeffs())

    def rotate_gate(self, input_id: int, shift: int) -> int:
        scalar = [0] * (shift + 1)
        scalar[shift] = 1
        return self.small_scalar_mul(input_id, scalar)

    # boolean helpers over bit-valued wires (construction.rs:147-230)

    def and_gate(self, l: int, r: int) -> int:
        return self.mul_gate(l, r)

    def not_gate(self, i: int) -> int:
        return self.sub_gate(0, i)

    def or_gate(self, l: int, r: int) -> int:
        return self.sub_gate(self.add_gate(l, r), self.mul_gate(l, r))

    def nand_gate(self, l: int, r: int) -> int:
        return self.not_gate(self.and_gate(l, r))

    def nor_gate(self, l: int, r: int) -> int:
        return self.not_gate(self.or_gate(l, r))

    def xor_gate(self, l: int, r: int) -> int:
        s = self.add_gate(l, r)
        two_lr = self.add_gate(self.mul_gate(l, r), self.mul_gate(l, r))
        return self.sub_gate(s, two_lr)

    def xnor_gate(self, l: int, r: int) -> int:
        return self.not_gate(self.xor_gate(l, r))

    def register_public_lut(self, lut) -> int:
        lut_id = len(self.luts)
        self.luts[lut_id] = lut
        return lut_id

    def public_lookup_gate(self, input_id: int, lut_id: int) -> int:
        return self._new_gate(PUB_LUT, [input_id], lut_id)

    def slot_transfer_gate(self, input_id: int, src_slots: list[tuple[int, int | None]]) -> int:
        return self._new_gate(SLOT_TRANSFER, [input_id], SlotTransferSpec.explicit(src_slots))

    def slot_transfer_gate_spec(self, input_id: int, spec: SlotTransferSpec) -> int:
        return self._new_gate(SLOT_TRANSFER, [input_id], spec)

    def slot_reduce_gate(self, input_ids: list[int], num_slots: int) -> int:
        assert 0 < len(input_ids) <= num_slots
        return self._new_gate(SLOT_REDUCE, list(input_ids), num_slots)

    # ------------------------------------------------------------ analysis

    def gate_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for g in self.gates:
            out[g.kind] = out.get(g.kind, 0) + 1
        return out

    def use_counts(self) -> list[int]:
        uses = [0] * len(self.gates)
        for g in self.gates:
            for i in g.inputs:
                uses[i] += 1
        for o in self.output_ids:
            uses[o] += 1
        return uses

    def compute_levels(self) -> list[list[int]]:
        """Topological levels (gates with equal depth), reference eval.rs:210."""
        depth = [0] * len(self.gates)
        for g in self.gates:
            if g.inputs:
                depth[g.gate_id] = 1 + max(depth[i] for i in g.inputs)
        levels: dict[int, list[int]] = {}
        for g in self.gates:
            if g.kind != INPUT:
                levels.setdefault(depth[g.gate_id], []).append(g.gate_id)
        return [levels[d] for d in sorted(levels)]

    def non_free_depth(self) -> int:
        """Depth counting only Mul/PubLut/SlotTransfer gates (non-free ops)."""
        costly = {MUL, PUB_LUT, SLOT_TRANSFER}
        depth = [0] * len(self.gates)
        for g in self.gates:
            base = max((depth[i] for i in g.inputs), default=0)
            depth[g.gate_id] = base + (1 if g.kind in costly else 0)
        return max((depth[o] for o in self.output_ids), default=0)

    # ---------------------------------------------------------------- eval

    def eval(
        self,
        params,
        one,
        inputs: list,
        plt_evaluator=None,
        slot_transfer_evaluator=None,
    ) -> list:
        """Evaluate the circuit over wires of any Evaluable-like type.

        `one` feeds wire 0 (the reserved constant-one input); `inputs` feed
        the user Input gates in order (reference eval.rs:232-264).
        """
        assert len(inputs) == self.num_input, (
            f"expected {self.num_input} inputs, got {len(inputs)}"
        )
        uses = self.use_counts()
        wires: dict[int, Any] = {0: one}
        for i, v in enumerate(inputs):
            wires[i + 1] = v
        remaining = list(uses)

        def consume(i: int):
            remaining[i] -= 1
            if remaining[i] == 0 and i not in self.output_ids:
                wires.pop(i, None)

        for g in self.gates:
            if g.kind == INPUT:
                continue
            ins = [wires[i] for i in g.inputs]
            if g.kind == ADD:
                out = ins[0] + ins[1]
            elif g.kind == SUB:
                out = ins[0] - ins[1]
            elif g.kind == MUL:
                out = ins[0] * ins[1]
            elif g.kind == SMALL_SCALAR_MUL:
                out = ins[0].small_scalar_mul(params, list(g.payload))
            elif g.kind == LARGE_SCALAR_MUL:
                out = ins[0].large_scalar_mul(params, list(g.payload))
            elif g.kind == PUB_LUT:
                assert plt_evaluator is not None, "PubLut gate requires a plt_evaluator"
                lut = self.luts[g.payload]
                out = plt_evaluator.public_lookup(params, lut, one, ins[0], g.gate_id, g.payload)
            elif g.kind == SLOT_TRANSFER:
                assert slot_transfer_evaluator is not None, (
                    "SlotTransfer gate requires a slot_transfer_evaluator"
                )
                out = slot_transfer_evaluator.slot_transfer(
                    params, ins[0], g.payload.materialize(), g.gate_id
                )
            elif g.kind == SLOT_REDUCE:
                assert slot_transfer_evaluator is not None, (
                    "SlotReduce gate requires a slot_transfer_evaluator"
                )
                out = slot_transfer_evaluator.slot_reduce(params, ins, g.payload, g.gate_id)
            else:
                raise NotImplementedError(f"gate kind {g.kind}")
            for i in g.inputs:
                consume(i)
            wires[g.gate_id] = out

        return [wires[o] for o in self.output_ids]
