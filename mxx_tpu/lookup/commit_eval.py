"""WEE25-commitment-backed LUT evaluation (two-pass).

TPU-build of /root/reference/src/lookup/commit_eval.rs: pass 1 runs the
circuit over pubkey wires with a `GateStateCollector` that records each LUT
gate's (lut_id, one/input pubkeys) and returns the hash-derived output
pubkey; pass 2 commits every registered table through `Wee25Commit` and
produces openings for the rows the online path will select, so the evaluator
can later verify the looked-up row against the short commitment instead of
storing the whole table.

Round-1 scope: the collector, batch table commitment (one message block per
LUT row embedding G*y_k), row openings, and verification. The online
encoding-side evaluator that consumes these commitments is next-round work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bgg import BggPublicKey
from ..commit import MsgMatrixStream, Wee25Commit, Wee25PublicParams
from ..matrix import PolyMatrix
from ..ring.poly import Poly
from ..sampler import FinRingDist, HashSampler
from .public_lut import PublicLut


def derive_a_out_matrix(params, row_size: int, hash_key: bytes, gate_id: int) -> PolyMatrix:
    return HashSampler().sample_hash(
        params, hash_key, f"COMMIT_A_OUT_{gate_id}", row_size,
        row_size * params.modulus_digits, FinRingDist(),
    )


@dataclass
class _GateState:
    gate_id: int
    lut_id: int
    one_pubkey: BggPublicKey
    input_pubkey: BggPublicKey


class GateStateCollector:
    """Pass-1 PltEvaluator: records gate states, returns hash-derived A_out
    (commit_eval.rs:22-77)."""

    def __init__(self, hash_key: bytes):
        self.hash_key = hash_key
        self.gate_states: dict[int, _GateState] = {}
        self.luts: dict[int, PublicLut] = {}

    def public_lookup(self, params, plt, one, input_pk, gate_id, lut_id):
        self.luts.setdefault(lut_id, plt)
        self.gate_states[gate_id] = _GateState(gate_id, lut_id, one, input_pk)
        return BggPublicKey(
            derive_a_out_matrix(params, input_pk.matrix.nrow, self.hash_key, gate_id), True
        )


@dataclass
class CommittedLut:
    commitment: PolyMatrix
    cache: dict
    num_blocks: int


class CommitBGGPubKeyPltEvaluator:
    """Two-pass WEE25 LUT committer: collect, then commit + open."""

    def __init__(self, params, scheme: Wee25Commit, pp: Wee25PublicParams, hash_key: bytes):
        self.params = params
        self.scheme = scheme
        self.pp = pp
        self.collector = GateStateCollector(hash_key)
        self.committed: dict[int, CommittedLut] = {}

    def public_lookup(self, params, plt, one, input_pk, gate_id, lut_id):
        return self.collector.public_lookup(params, plt, one, input_pk, gate_id, lut_id)

    def _lut_message_blocks(self, plt: PublicLut) -> list[PolyMatrix]:
        """One d x m_b message block per LUT row: y_k embedded in column 0,
        padded to a power of tree_base."""
        params = self.params
        d, m_b = self.scheme.d, self.scheme.m_b
        blocks = []
        for _x, (_k, y) in plt.entries(params):
            y_poly = Poly.from_elem_to_constant(params, y)
            col = PolyMatrix.scaled_unit_column_vector(params, d, 0, y_poly)
            blocks.append(col.concat_columns([PolyMatrix.zero(params, d, m_b - 1)]))
        n = len(blocks)
        tb = self.scheme.tree_base
        size = tb
        while size < n:
            size *= tb
        while len(blocks) < size:
            blocks.append(PolyMatrix.zero(params, d, m_b))
        return blocks

    def commit_all_tables(self):
        """Pass 2: commit every registered LUT (commit_eval.rs batch phase)."""
        for lut_id, plt in self.collector.luts.items():
            blocks = self._lut_message_blocks(plt)
            stream = MsgMatrixStream.from_blocks(blocks)
            commitment, cache = self.scheme.commit(self.params, stream, self.pp)
            self.committed[lut_id] = CommittedLut(commitment, cache, len(blocks))

    def open_row(self, lut_id: int, row: int) -> PolyMatrix:
        c = self.committed[lut_id]
        plt = self.collector.luts[lut_id]
        blocks = self._lut_message_blocks(plt)
        stream = MsgMatrixStream.from_blocks(blocks)
        return self.scheme.open(self.params, stream, range(row, row + 1), self.pp, c.cache)

    def verify_row(self, lut_id: int, row: int, y_value: int, opening: PolyMatrix) -> bool:
        c = self.committed[lut_id]
        params = self.params
        d, m_b = self.scheme.d, self.scheme.m_b
        y_poly = Poly.const(params, y_value)
        block = PolyMatrix.scaled_unit_column_vector(params, d, 0, y_poly).concat_columns(
            [PolyMatrix.zero(params, d, m_b - 1)]
        )
        # full message only needed for its committed shape; verify on the slice
        plt = self.collector.luts[lut_id]
        blocks = self._lut_message_blocks(plt)
        blocks[row] = block
        msg = blocks[0].concat_columns(blocks[1:])
        return self.scheme.verify(
            params, msg, c.commitment, opening, range(row, row + 1), self.pp
        )
