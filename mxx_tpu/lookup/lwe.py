"""LWE-style public lookup-table evaluators over BGG+ wires.

TPU-native build of the reference LWE lookup
(/root/reference/src/lookup/lwe/{pubkey.rs,encoding.rs,utils.rs};
SURVEY.md A.1). For a gate g with input pubkey A_z and hash-derived output
pubkey A_LT, each LUT entry (x_k -> row k, y_k) gets:

    ext      = A_z  - G * x_k
    target   = A_LT - G * y_k
    K_low(k) = HashDecomposed(key, "LWE_R_G_{gate}_{lut}_{k}_slot{s}")
    K_high(k)= Preimage_{B,T}(target - ext * K_low(k))

Offline, the pubkey evaluator records gate states during circuit evaluation
and `sample_aux_matrices` persists the K_high rows to the artifact store.
Online, the encoding evaluator reads K_high(k) back, re-derives K_low(k) from
the hash, and outputs c_out = c_b * K_high(k) + c_z * K_low(k), which encodes
y_k under A_LT (c_b = s*B is the evaluator's stored base encoding).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from ..bgg import BggEncoding, BggPublicKey
from ..matrix import PolyMatrix
from ..ring.poly import Poly
from ..sampler import FinRingDist, HashSampler, Trapdoor, TrapdoorSampler
from ..storage import add_lookup_buffer, get_lookup_buffer, read_matrix_from_multi_batch
from ..utils.tracing import span
from .public_lut import PublicLut


def _ctx_tag(context: str) -> str:
    # empty context keeps the historical tag/prefix formats (single-circuit
    # protocols and existing artifacts stay valid)
    return f"{context}|" if context else ""


def derive_a_lt_matrix(params, row_size: int, hash_key: bytes, gate_id: int,
                       slot_idx=None, context: str = ""):
    m_g = row_size * params.modulus_digits
    tag = f"A_LT_{_ctx_tag(context)}{gate_id}_slot{slot_idx or 0}"
    return HashSampler().sample_hash(params, hash_key, tag, row_size, m_g, FinRingDist())


_A_LT_CACHE: dict = {}
_A_LT_CACHE_BYTES = [0]
_A_LT_CACHE_LIMIT = 1 << 28  # 256 MB of numpy planes; FIFO-evicted


def derive_a_lt_matrices_batch(params, row_size: int, hash_key: bytes,
                               gate_ids: list[int], slot_idx=None,
                               context: str = "") -> list[PolyMatrix]:
    """Many gates' A_LT in ONE device program — bit-identical per-gate to
    `derive_a_lt_matrix` (same tags/streams). LUT-heavy nested-RNS circuits
    evaluate thousands of PubLut gates per level; per-gate hash dispatch was
    the dominant eval cost before batching (round-3 profile).

    Results are memoized in a bounded FIFO cache: a protocol derives the SAME
    hash-determined A_LT planes once per pass (obfuscate pubkey pass, then
    every eval) — at real-mode test scale the re-derivation was ~20% of the
    encoding-path eval (round-5 profile). Entries are immutable numpy views,
    safe to share across passes."""
    ck = (
        params.n, params.crt_depth, params.crt_bits, params.base_bits,
        row_size, hash_key, slot_idx or 0, context, tuple(gate_ids),
    )
    hit = _A_LT_CACHE.get(ck)
    if hit is not None:
        return list(hit[0])
    m_g = row_size * params.modulus_digits
    tags = [f"A_LT_{_ctx_tag(context)}{g}_slot{slot_idx or 0}" for g in gate_ids]
    out = HashSampler().sample_hash_batch(
        params, hash_key, tags, row_size, m_g, FinRingDist(), eval_form=True
    )
    nbytes = sum(int(m.data.nbytes) for m in out)
    if nbytes <= _A_LT_CACHE_LIMIT:
        while _A_LT_CACHE and _A_LT_CACHE_BYTES[0] + nbytes > _A_LT_CACHE_LIMIT:
            oldest = next(iter(_A_LT_CACHE))
            _, old_bytes = _A_LT_CACHE.pop(oldest)
            _A_LT_CACHE_BYTES[0] -= old_bytes
        _A_LT_CACHE[ck] = (out, nbytes)
        _A_LT_CACHE_BYTES[0] += nbytes
    return list(out)


def _k_low_tag(gate_id: int, lut_id: int, lut_entry_idx: int, slot_idx=None,
               context: str = "") -> str:
    return (f"LWE_R_G_{_ctx_tag(context)}{gate_id}_{lut_id}_{lut_entry_idx}"
            f"_slot{slot_idx or 0}")


def derive_k_low(params, row_size: int, hash_key: bytes, gate_id: int, lut_id: int,
                 lut_entry_idx: int, slot_idx=None, context: str = "") -> PolyMatrix:
    m_g = row_size * params.modulus_digits
    raw = HashSampler().sample_hash(
        params, hash_key, _k_low_tag(gate_id, lut_id, lut_entry_idx, slot_idx, context),
        row_size, m_g, FinRingDist(),
    )
    return raw.decompose()


def k_high_checkpoint_prefix(gate_id: int, lut_id: int, slot_idx=None,
                             context: str = "") -> str:
    ctx = context.replace("/", ".") if context else ""
    return f"LWE_K_H_{ctx + '.' if ctx else ''}{gate_id}_{lut_id}_slot{slot_idx or 0}"


def set_plt_context(evaluator, context: str) -> None:
    """Namespace the storage-backed LUT evaluator for the NEXT circuit eval.

    Gate/lut ids are per-circuit (gate 0 restarts in every PolyCircuit), but
    a protocol evaluates MANY circuits through ONE evaluator instance: the
    wrapped circuit, per-(round, branch) refresh decrypt circuits, per-digit
    material circuits. Without a namespace the recorded gate states and the
    persisted K_high artifacts collide across circuits (round-4 bug: the
    wrapped circuit's gate 8100 overwrote a refresh decrypt circuit's record
    — "missing stored K_high" at eval). The reference avoids this by building
    ONE global circuit (diamond_io.rs); the TPU build evaluates phase-local
    circuits for program-size control, so the context must carry the phase.

    Both sides of a protocol MUST set the same context string around the
    matching circuit eval. No-op for debug/oracle evaluators (no `context`
    attribute — nothing persisted)."""
    seen = set()
    while evaluator is not None and id(evaluator) not in seen:
        seen.add(id(evaluator))
        if hasattr(evaluator, "context"):
            evaluator.context = context
        # unwrap slotwise / vec wrappers
        evaluator = getattr(evaluator, "scalar", None)


@dataclass
class _GateState:
    lut_id: int
    input_pubkey: PolyMatrix
    output_pubkey: PolyMatrix
    plt: PublicLut = None
    context: str = ""


class LWEBGGPubKeyPltEvaluator:
    """Offline (pubkey-path) evaluator (reference lwe/pubkey.rs:217-608)."""

    def __init__(
        self,
        hash_key: bytes,
        trap_sampler: TrapdoorSampler,
        pub_matrix: PolyMatrix,
        trapdoor: Trapdoor,
        dir_path,
        mesh=None,
    ):
        self.hash_key = hash_key
        self.trap_sampler = trap_sampler
        self.pub_matrix = pub_matrix
        self.trapdoor = trapdoor
        self.dir_path = Path(dir_path)
        self.mesh = mesh  # offline K_high sampling shards over mesh 'col' axis
        self.context: str = ""  # per-circuit namespace (set_plt_context)
        self.gate_state: dict[tuple[str, int, int], _GateState] = {}

    def public_lookup(self, params, plt: PublicLut, one, input_pk: BggPublicKey,
                      gate_id: int, lut_id: int, slot_idx=None) -> BggPublicKey:
        row_size = input_pk.matrix.nrow
        ctx = self.context
        a_lt = derive_a_lt_matrix(
            params, row_size, self.hash_key, gate_id, slot_idx, ctx
        )
        self.gate_state[(ctx, gate_id, slot_idx or 0)] = _GateState(
            lut_id, input_pk.matrix, a_lt, plt, ctx
        )
        return BggPublicKey(a_lt, True)

    def sample_aux_matrices(self, params):
        """Sample + persist K_high preimage rows for every recorded gate."""
        with span("lwe_lut.sample_aux_matrices", gates=len(self.gate_state)):
            for (ctx, gate_id, slot_idx), state in list(self.gate_state.items()):
                with span("lwe_lut.k_high_gate", gate_id=gate_id, slot=slot_idx,
                          ctx=ctx):
                    buffer = self._sample_k_high_buffer(
                        params, state.plt, state.input_pubkey, state.output_pubkey,
                        gate_id, state.lut_id, slot_idx, ctx,
                    )
                add_lookup_buffer(buffer)
            self.gate_state.clear()

    def _sample_k_high_buffer(self, params, plt, a_z, a_lt, gate_id, lut_id,
                              slot_idx, context=""):
        """Per-entry targets `A_LT - G*y - (A_z - G*x) @ K_low` assembled as a
        handful of BATCHED device programs (one hash program for every K_low,
        one batched decompose, one vmapped matmul, elementwise the rest) —
        per-entry dispatch dominated the realistic-scale run through the
        high-latency tunnel (BENCHMARKS.md round 2)."""
        import jax.numpy as jnp

        from ..circuit.batched_eval import _batched_decompose, _vmapped_matmul
        from ..ops.elementwise import ew_mul, ew_sub
        from ..ring.poly import EVAL, residue_planes_from_ints

        d = self.pub_matrix.nrow
        k_dig = params.modulus_digits
        m_g = d * k_dig
        n = params.n
        L = params.crt_depth
        jt = params.jt
        entries = list(plt.entries(params))
        ks = [int(kk) for _, (kk, _) in entries]

        g_eval = PolyMatrix.gadget_matrix(params, d).to_eval().data  # [L, d, m_g, n]
        az_eval = a_z.to_eval().data
        alt_eval = a_lt.to_eval().data

        # assembly chunk: keep the batched-decompose intermediate
        # [L, E*m_g, m_g, n] under ~64M elements (device-memory bound at
        # n=2^13; a 49-entry batch allocated 26 GB)
        chunk_e = max(1, (64 << 20) // (L * m_g * m_g * n))

        def assemble(chunk):
            E = len(chunk)
            xs = [int(x) for x, _ in chunk]
            cks = [int(kk) for _, (kk, _) in chunk]
            ys = [int(y_k.value) for _, (_, y_k) in chunk]
            k_low_raw = HashSampler().sample_hash_batch(
                params, self.hash_key,
                [_k_low_tag(gate_id, lut_id, kk, slot_idx, context) for kk in cks],
                d, m_g, FinRingDist(),
            )
            dec = _batched_decompose(params, k_low_raw)  # [E, L, m_g, m_g, n]
            xs_res = residue_planes_from_ints(params, xs)  # [L, E]
            ys_res = residue_planes_from_ints(params, ys)

            def tile(v):
                return jnp.tile(v, (1, E, 1, 1))  # [L, E*d, m_g, n]

            def scal(res):
                # constant polys are slot-constant in EVAL form
                r = jnp.repeat(res, d, axis=1)[:, :, None, None]
                return jnp.broadcast_to(r, (L, E * d, 1, n))

            gx = ew_mul(tile(g_eval), scal(xs_res), jt.moduli, jt.qinv_neg, jt.r2)
            gy = ew_mul(tile(g_eval), scal(ys_res), jt.moduli, jt.qinv_neg, jt.r2)
            ext = ew_sub(tile(az_eval), gx, jt.moduli)
            tgt = ew_sub(tile(alt_eval), gy, jt.moduli)
            ext_b = jnp.transpose(ext.reshape(L, E, d, m_g, n), (1, 0, 2, 3, 4))
            prod = _vmapped_matmul(params, ext_b, dec)  # [E, L, d, m_g, n]
            prod_flat = jnp.transpose(prod, (1, 0, 2, 3, 4)).reshape(L, E * d, m_g, n)
            adj = ew_sub(tgt, prod_flat, jt.moduli)
            return [
                PolyMatrix(adj[:, i * d : (i + 1) * d], EVAL, params)
                for i in range(E)
            ]

        # out-of-core budget (reference disk-backed matrices as a drop-in
        # backend, matrix/base/disk.rs:18-40): once accumulated targets
        # exceed MXX_OFFLOAD_BUDGET_BYTES of device memory, further chunks
        # spill to host/disk memmaps and rehydrate inside the batched
        # preimage pass chunk-by-chunk
        from .. import config
        from ..matrix.offload import offload_matrix

        budget = config.offload_budget_bytes()
        entry_bytes = L * d * m_g * n * 4
        targets = []
        live_bytes = 0
        self.last_offloaded_targets = 0
        for start in range(0, len(entries), chunk_e):
            for t in assemble(entries[start : start + chunk_e]):
                if budget and live_bytes + entry_bytes > budget:
                    targets.append(offload_matrix(t))
                    self.last_offloaded_targets += 1
                else:
                    targets.append(t)
                    live_bytes += entry_bytes

        # all rows share (B, T): one batched program family, column axis
        # sharded over the mesh (reference multi-GPU k_high fan-out,
        # lwe/pubkey_gpu.rs)
        k_highs = self.trap_sampler.preimage_batched_chunked(
            params, self.trapdoor, self.pub_matrix, targets, mesh=self.mesh
        )
        for t in targets:
            if hasattr(t, "delete"):
                t.delete()
        rows = list(zip(ks, k_highs))
        return get_lookup_buffer(
            rows, k_high_checkpoint_prefix(gate_id, lut_id, slot_idx, context)
        )


class LWEBGGEncodingPltEvaluator:
    """Online (encoding-path) evaluator (reference lwe/encoding.rs:32-283)."""

    def __init__(self, hash_key: bytes, dir_path, c_b: PolyMatrix):
        self.hash_key = hash_key
        self.dir_path = Path(dir_path)
        self.c_b = c_b
        self.context: str = ""  # per-circuit namespace (set_plt_context)

    def public_lookup(self, params, plt: PublicLut, one, input_enc: BggEncoding,
                      gate_id: int, lut_id: int, slot_idx=None) -> BggEncoding:
        assert input_enc.plaintext is not None, "LWE lookup input must reveal its plaintext"
        z = input_enc.plaintext.const_value()
        got = plt.get(params, int(z))
        if got is None:
            raise KeyError(f"{z} does not exist in public lookup table {lut_id}")
        k, y_k = got
        y_poly = Poly.from_elem_to_constant(params, y_k)
        row_size = input_enc.pubkey.matrix.nrow
        ctx = self.context
        a_lt = derive_a_lt_matrix(
            params, row_size, self.hash_key, gate_id, slot_idx, ctx
        )
        k_high = read_matrix_from_multi_batch(
            params, self.dir_path,
            k_high_checkpoint_prefix(gate_id, lut_id, slot_idx, ctx), k,
        )
        assert k_high is not None, (
            f"missing stored K_high for gate {gate_id} row {k} ctx={ctx!r}"
        )
        k_low = derive_k_low(
            params, row_size, self.hash_key, gate_id, lut_id, k, slot_idx, ctx
        )
        vector = self.c_b @ k_high + input_enc.vector @ k_low
        return BggEncoding(vector, BggPublicKey(a_lt, True), y_poly)
