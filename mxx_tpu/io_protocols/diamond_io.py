"""Diamond iO (eprint 2025/236): obfuscation + evaluation pipeline.

TPU-build of /root/reference/src/io/diamond_io.rs (SURVEY.md §3.4-3.5).

Pipeline (obfuscation):
- ternary payload k, hash-derived BGG pubkeys, Diamond injector preprocessing
  (trapdoor transition chains)
- Ring-GSW seed-bit encryption under k; ciphertext values are PUBLIC and ride
  the obfuscation (diamond_io.rs:330-388)
- the PRF mask pipeline over PUBLIC-KEY wires (prf_mask.py): per injector
  digit round, Goldreich-PRG seed evolution with branch-rebase preimages and
  noise-refresh decoder preimages persisted against the final Diamond state
  (diamond_io.rs:425-470)
- the wrapped function circuit evaluated over pubkey wires: user outputs are
  pushed into the absolute channel by the unit-ciphertext decrypt and masked
  by the PRF-derived mask decrypts (NOT host-encrypted masks); output
  projection + masked-decoder preimages persisted

Pipeline (eval):
- injector online digit threading; one/k/input output encodings from stored
  preimages (c = sigma (A - x G); diamond_io.rs:661-744)
- PRF mask pipeline over ENCODING wires: selected-branch PRG (or debug
  replay), stored rebase preimages, noise-refresh online with stored decoders
- wrapped circuit over encodings; masked high-bit decode with the PRF mask's
  centered public bottom added as plaintext (diamond_io.rs:1053-1146)

Masked decode (the k-channel mechanism, diamond_io.rs:963-1150): every
function output f is pushed into the absolute plaintext channel by
multiplying with the decrypt combination of a GSW unit ciphertext
Enc_{(-k,1)}(1), and the PRF mask's secret-dependent half is added:

  decode = proj - c_sd_total G^{-1}(e_0) + pb_plaintext + pb_mask_plaintext
         = f * (Q/2) + centered_mask + noise,

rounded mod 2.

Payload modes:
- scalar (payload_slots=1): k restricted to {-1, +1} (integer-GSW payload);
  wires are scalar (num_slots>1 lifts slot-wise over duplicated vec wires).
- PACKED (payload_slots=ns>1): k is a TERNARY RING POLY over
  R' = Z_Q[X']/(X'^ns + 1) — the reference's payload type
  (diamond_io.rs:278). Seed/mask ciphertexts are packed Ring-GSW over R'
  (entries = R' elements riding vec-wire slots, coefficient per slot); the
  key multiplication rides phi: X' -> X^{n/ns} (an exact subring
  homomorphism), so the in-circuit decrypt is slot-fold + ONE plain mul
  against the k wire, whose injector-channel plaintext is phi(k). Per-round
  seed evolution rebases EVERY slot through stored preimages and then
  noise-REFRESHES every slot through stored per-(slot, crt) decoder
  preimages (packed NoiseRefresherNaiveVec path: ONE packed material
  decode per (round, branch) shared across wires and slots — the
  per-R'-coeff channel, so refresh material does not scale with n).

Other deviations (documented): the obfuscated function is an arbitrary
builder circuit (the reference's FuncType is the Goldreich PRF itself; the
builder generalizes it — a PRF builder reproduces the reference exactly).
LUT evaluators are injected: production uses the storage-backed LWE
evaluators, CI tests the secret-oracle debug evaluators (lookup/debug.py).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from pathlib import Path

from ..bgg import BGGPublicKeySampler, BggEncoding, BggPublicKey
from ..decoder.masked_high_bit import decode_centered_masked_integer_coeff
from ..decoder.mask_circuit import (
    center_public_bottom,
    mask_plaintext_moduli_from_full_modulus,
)
from ..gadgets.fhe.packed_ring_gsw import (
    PackedRingGswCiphertext,
    embed_coeffs,
    packed_decrypt_bit_decomposed_parts,
)
from ..gadgets.fhe.packed_ring_gsw import native_encrypt_poly as packed_native_encrypt
from ..gadgets.fhe.plain_gsw import decrypt_constants, decrypt_constants_poly
from ..gadgets.fhe.plain_gsw import native_encrypt as plain_native_encrypt
from ..gadgets.fhe.plain_gsw import native_encrypt_poly as plain_native_encrypt_poly
from ..gadgets.fhe.ring_gsw import RingGswCiphertext, encode_ciphertext_inputs, native_encrypt
from ..gadgets.fhe_prg.goldreich import GoldreichFhePrg
from ..input_injector import DiamondInjector, DiamondInjectorPreprocessOut
from ..lookup.lwe import LWEBGGEncodingPltEvaluator, LWEBGGPubKeyPltEvaluator
from ..matrix import PolyMatrix
from ..noise_refresh.circuit_decrypt import decrypt_bit_decomposed_polynomial_parts
from ..ring.poly import Poly
from ..sampler import TernaryDist, TrapdoorSampler, UniformSampler
from ..storage import init_storage_system, wait_for_all_writes
from ..utils.rng import Drbg
from ..utils.tracing import span
from .prf_mask import PrfConfig, PrfDebugArtifacts, PrfMaskPipeline

DIAMOND_SECRET_SIZE = 1


@dataclass
class DiamondIOObf:
    hash_key: bytes
    preprocess_out: DiamondInjectorPreprocessOut
    num_outputs: int
    unit_ct_consts: tuple[int, int]  # (top_u, bottom_u): -k*top_u + bottom_u = Q/2
    seed_cts: list  # native Ring-GSW seed-bit ciphertexts (public values)
    prf_debug: PrfDebugArtifacts | None  # replayed PRG material (debug mode)


class DiamondIO:
    def __init__(
        self,
        params,
        input_count: int,
        batch_bits: int,
        trapdoor_sigma: float = 4.578,
        error_sigma: float = 0.0,
        seed: int | None = None,
        prf_config: PrfConfig | None = None,
        pk_plt_evaluator_factory=None,
        enc_plt_evaluator_factory=None,
        secret_size: int = DIAMOND_SECRET_SIZE,
        num_slots: int = 1,
        payload_slots: int = 1,
        mesh=None,
    ):
        self.params = params
        self.input_count = input_count
        self.batch_bits = batch_bits
        self.base = 1 << batch_bits
        self.trapdoor_sigma = trapdoor_sigma
        self.error_sigma = error_sigma
        self.secret_size = secret_size
        # payload_slots > 1 = PACKED payload mode: k is a TERNARY RING POLY
        # over R' = Z_Q[X']/(X'^ns + 1) (the reference's payload type,
        # diamond_io.rs:278), embedded into R via phi: X' -> X^{n/ns}; seed
        # and mask ciphertexts are packed Ring-GSW over R' riding vec-wire
        # slots, and the whole protocol evaluates over vec wires.
        self.payload_slots = payload_slots
        if payload_slots > 1:
            assert params.n % payload_slots == 0, (params.n, payload_slots)
            assert num_slots in (1, payload_slots), (
                "packed payload mode fixes the vec slot count to payload_slots"
            )
            num_slots = payload_slots
        self.num_slots = num_slots
        self.mesh = mesh
        self.injector = DiamondInjector(
            params, input_count, self.base, batch_bits, trapdoor_sigma, error_sigma,
            seed, mesh=mesh, secret_size=secret_size,
        )
        self._seed = seed
        self._trap = TrapdoorSampler(params, trapdoor_sigma, seed=seed)
        self.prf_config = prf_config or PrfConfig()
        # LUT evaluator factories: production default = storage-backed LWE;
        # tests inject the secret-oracle debug evaluators.
        self._pk_plt_factory = pk_plt_evaluator_factory
        self._enc_plt_factory = enc_plt_evaluator_factory

    @property
    def num_input_bits(self) -> int:
        return self.input_count * self.batch_bits

    # ----------------------------------------------------------- artifacts

    def _write(self, d, mid, m: PolyMatrix):
        (Path(d) / f"diamond_io_{mid}.matrixbin").write_bytes(m.to_compact_bytes())

    def _read(self, d, mid) -> PolyMatrix:
        return PolyMatrix.from_compact_bytes(
            self.params, (Path(d) / f"diamond_io_{mid}.matrixbin").read_bytes()
        )

    # ------------------------------------------------------ circuit wrapper

    def _mask_moduli(self):
        prf = self._prf_pipeline()
        return mask_plaintext_moduli_from_full_modulus(
            prf.ctx.q_big, self.prf_config.prf_mask_output_coeff_bits
        )

    def _mask_bits_per_output(self) -> int:
        # packed mode: masks live in R' (one packed ciphertext per R'
        # coefficient); scalar mode: one scalar ciphertext per R coefficient
        n_coeffs = self.payload_slots if self.payload_slots > 1 else self.params.n
        return n_coeffs * self.prf_config.prf_mask_output_coeff_bits

    def _build_wrapped_circuit(self, prf: PrfMaskPipeline, builder, unit_consts,
                               num_outputs: int, debug: PrfDebugArtifacts | None):
        """User circuit + k-channel masked outputs + in-circuit PRF mask
        decrypts. Inputs: num_bits bit wires, then the k wire, then (real
        mode) the final seed ciphertext component wires. In debug-replay mode
        the mask ciphertext values are circuit constants from the recorded
        final_mask_cts; in real mode they come from the final-round Goldreich
        PRG over the seed wires (diamond_io/circuits.rs build_prf_mask_circuit
        + build_goldreich_prg_range_circuit)."""
        cfg = self.prf_config
        params = self.params
        packed = self.payload_slots > 1
        ns = self.payload_slots
        bits_per_output = self._mask_bits_per_output()
        circuit = prf.ctx.fresh_circuit()
        if packed and cfg.debug_encrypt_random_prg_wires:
            # packed replay: mask ciphertexts carry DISTINCT slot values, so
            # they enter as lifted INPUT wires (consts are slot-uniform)
            num_extra_wires = num_outputs * bits_per_output * prf.wires_per_ct
        elif cfg.debug_encrypt_random_prg_wires:
            num_extra_wires = 0
        else:
            num_extra_wires = cfg.seed_bits * prf.wires_per_ct
        wires = circuit.input(self.num_input_bits + 1 + num_extra_wires)
        bit_wires = wires[: self.num_input_bits]
        k_wire = wires[self.num_input_bits]
        extra_wires = list(wires)[self.num_input_bits + 1 :]

        f_outs = builder(circuit, bit_wires)
        assert len(f_outs) == num_outputs
        zero = circuit.sub_gate(k_wire, k_wire)
        negk = circuit.sub_gate(zero, k_wire)
        top_u, bottom_u = unit_consts
        top_u_coeffs = list(top_u) if packed else [top_u]
        bottom_u_coeffs = list(bottom_u) if packed else [bottom_u]
        sd_u = circuit.mul_gate(
            circuit.large_scalar_mul(circuit.const_one_gate(), top_u_coeffs), negk
        )

        # mask-bit ciphertext wires per output
        if packed and cfg.debug_encrypt_random_prg_wires:
            per_ct = prf.wires_per_ct
            mask_cts_per_output = []
            pos = 0
            for out_idx in range(num_outputs):
                cts = []
                for _ in range(bits_per_output):
                    cts.append(
                        PackedRingGswCiphertext.from_wires(
                            prf.ctx, extra_wires[pos : pos + per_ct], ns
                        )
                    )
                    pos += per_ct
                mask_cts_per_output.append(cts)
        elif cfg.debug_encrypt_random_prg_wires:
            assert debug is not None and len(debug.final_mask_cts) == num_outputs
            mask_cts_per_output = []
            for out_idx in range(num_outputs):
                cts = []
                for native in debug.final_mask_cts[out_idx]:
                    vals = encode_ciphertext_inputs(prf.ctx, native)
                    const_wires = [circuit.const_poly(v.to_coeff()) for v in vals]
                    cts.append(
                        RingGswCiphertext.from_wires(prf.ctx, const_wires)
                    )
                mask_cts_per_output.append(cts)
        else:
            # canonical=False: the final seed wires are refreshed round
            # outputs crossing the circuit boundary in full-reduced form
            if packed:
                seed_cts_wires = [
                    PackedRingGswCiphertext.from_wires(
                        prf.ctx,
                        extra_wires[i * prf.wires_per_ct : (i + 1) * prf.wires_per_ct],
                        ns, canonical=False,
                    )
                    for i in range(cfg.seed_bits)
                ]
            else:
                seed_cts_wires = [
                    RingGswCiphertext.from_wires(
                        prf.ctx,
                        extra_wires[i * prf.wires_per_ct : (i + 1) * prf.wires_per_ct],
                        canonical=False,
                    )
                    for i in range(cfg.seed_bits)
                ]
            total_bits = num_outputs * bits_per_output
            g = GoldreichFhePrg.setup(
                cfg.seed_bits, total_bits,
                prf.graph_seed_for_round(self.input_count),
            )
            all_cts = g.evaluate(seed_cts_wires, circuit)
            mask_cts_per_output = [
                all_cts[o * bits_per_output : (o + 1) * bits_per_output]
                for o in range(num_outputs)
            ]

        moduli = self._mask_moduli()
        outputs = []
        for o, f in enumerate(f_outs):
            # coeff-major chunk layout (bits[coeff * bit_size + bit])
            if packed:
                sd_mask, pb_mask = packed_decrypt_bit_decomposed_parts(
                    circuit, params, mask_cts_per_output[o], negk, moduli, ns
                )
            else:
                sd_mask, pb_mask = decrypt_bit_decomposed_polynomial_parts(
                    circuit, mask_cts_per_output[o], negk, moduli
                )
            pb_mask_centered = center_public_bottom(
                circuit, params, pb_mask, cfg.prf_mask_output_coeff_bits
            )
            sd_out = circuit.mul_gate(f, sd_u)
            sd_total = circuit.add_gate(sd_out, sd_mask)
            pb_out = circuit.mul_gate(
                f, circuit.large_scalar_mul(circuit.const_one_gate(), bottom_u_coeffs)
            )
            outputs.extend([sd_total, pb_out, pb_mask_centered])
        circuit.output(outputs)
        return circuit

    def _probe_num_outputs(self, builder) -> int:
        from ..circuit import PolyCircuit

        probe = PolyCircuit()
        bits = probe.input(self.num_input_bits)
        return len(builder(probe, bits))

    def _prf_pipeline(self) -> PrfMaskPipeline:
        # Keyed cache: rebuilt whenever _hash_key changes so a pipeline built
        # before obfuscate() (e.g. for shape probing) can never leak the
        # zero fallback key into branch-mask/rebase material derivation.
        hk = getattr(self, "_hash_key", b"\0" * 32)
        if getattr(self, "_prf_hash_key", None) != hk:
            self._prf = PrfMaskPipeline(
                self.params, self.prf_config, hk,
                self._trap, self.input_count, self.batch_bits,
                secret_size=self.secret_size, num_slots=self.payload_slots,
                mesh=self.mesh,
            )
            self._prf_hash_key = hk
        return self._prf

    # ----------------------------------------------------- vec-slot helpers

    def _wrap_vec(self, wires):
        """Duplicate scalar wires across num_slots ring slots (the reference's
        duplicate_public_key -> NaiveBGGPublicKeyVec inputs,
        diamond_io.rs:295-310). Slots only diverge through slot gates, which
        the wrapped circuit does not use, so duplication is exact."""
        from ..bgg.vec import BGGEncodingVec, BGGPublicKeyVec

        ns = self.num_slots
        out = []
        for w in wires:
            if isinstance(w, (BGGEncodingVec, BGGPublicKeyVec)):
                out.append(w)  # already a vec (packed-mode lifted wires)
            elif isinstance(w, BggEncoding):
                out.append(BGGEncodingVec.new([w] * ns))
            else:
                out.append(BGGPublicKeyVec.new([w] * ns))
        return out

    def _unwrap_vec(self, results):
        """Collapse vec outputs back to scalar wires, asserting slot
        agreement (no slot gates in the wrapped circuit)."""
        from ..bgg.vec import BGGEncodingVec, BGGPublicKeyVec

        out = []
        for r in results:
            if isinstance(r, BGGPublicKeyVec):
                assert all(k.matrix == r.keys[0].matrix for k in r.keys[1:])
                out.append(r.keys[0])
            elif isinstance(r, BGGEncodingVec):
                assert all(
                    e.vector == r.encodings[0].vector for e in r.encodings[1:]
                )
                out.append(r.encodings[0])
            else:
                out.append(r)
        return out

    # -------------------------------------------------------------- offline

    def _sample_final_output_preimage(self, pre_out, state_idx, pubkey,
                                      top_plaintext, bottom_plaintext,
                                      k_channel: bool = False):
        params = self.params
        d = self.secret_size
        g = PolyMatrix.gadget_matrix(params, d)
        top = pubkey.matrix
        if top_plaintext is not None:
            top = top - g.mul_poly_scalar(top_plaintext)
        if bottom_plaintext is None:
            bottom = PolyMatrix.zero(params, d, top.ncol)
        elif k_channel and d > 1:
            # the payload rides k*e_1 in the state's second block, so only the
            # FIRST bottom row carries -G's first row block
            row0 = -g.slice_rows(0, 1).mul_poly_scalar(bottom_plaintext)
            bottom = row0.concat_rows([PolyMatrix.zero(params, d - 1, top.ncol)])
        else:
            bottom = -g.mul_poly_scalar(bottom_plaintext)
        td, b = pre_out.final_checkpoint(state_idx)
        return self._trap.preimage(params, td, b, top.concat_rows([bottom]))

    def _selector_pubkeys(self, one_pk, input_pubkeys):
        """Digit selector wires: sum_b 2^b * bit wire per injector input
        (reference build_prf_digit_public_key_vecs, utils.rs:119-154)."""
        params = self.params
        out = []
        for digit_idx in range(self.input_count):
            acc = None
            for b in range(self.batch_bits):
                w = input_pubkeys[digit_idx * self.batch_bits + b]
                term = w.small_scalar_mul(params, [1 << b])
                acc = term if acc is None else acc + term
            out.append(acc)
        return out

    def obfuscate(self, dir_path, builder) -> DiamondIOObf:
        with span("diamond_io.obfuscate", input_bits=self.num_input_bits):
            return self._obfuscate(dir_path, builder)

    def _obfuscate(self, dir_path, builder) -> DiamondIOObf:
        params = self.params
        cfg = self.prf_config
        d = Path(dir_path)
        d.mkdir(parents=True, exist_ok=True)
        hash_key = (
            os.urandom(32)
            if self._seed is None
            else hashlib.sha256(
                b"diamond_io_hash_key"
                + self._seed.to_bytes(8, "little", signed=True)
            ).digest()
        )
        self._hash_key = hash_key
        num_bits = self.num_input_bits

        # payload k. Packed mode: a TERNARY RING POLY over R' (the reference's
        # payload type, diamond_io.rs:278), phi-embedded into R for the
        # injector and the key wire. Scalar mode: ternary constant restricted
        # to +-1. CSPRNG when unseeded: ciphertext a-values are published.
        rng = Drbg(self._seed)
        packed = self.payload_slots > 1
        ns = self.payload_slots
        q = params.modulus
        if packed:
            k_int = None
            k_coeffs = [rng.choice([-1, 0, 1]) for _ in range(ns)]
            if all(c == 0 for c in k_coeffs):
                k_coeffs[0] = 1  # a zero key would publish the seed bits
            k_modq = [c % q for c in k_coeffs]
            k = Poly.from_int_coeffs(params, embed_coeffs(params, k_modq, ns))
        else:
            k_int = rng.choice([-1, 1])
            k = Poly.const(params, k_int)
        pre_out = self.injector.preprocess(d, k)

        num_outputs = self._probe_num_outputs(builder)
        prf = self._prf_pipeline()

        # unit ciphertext (absolute-channel push of builder outputs): a valid
        # Enc_{(-k,1)}(1) whose decrypt constants the circuit consumes
        if packed:
            unit_ct = plain_native_encrypt_poly(
                params, k_modq, 1, rng, 2, self.error_sigma
            )
            top_u, bottom_u = decrypt_constants_poly(params, unit_ct, 2)
            unit_consts = (
                tuple(embed_coeffs(params, top_u, ns)),
                tuple(embed_coeffs(params, bottom_u, ns)),
            )
        else:
            unit_ct = plain_native_encrypt(params, k_int, 1, rng, 2, self.error_sigma)
            unit_consts = decrypt_constants(params, unit_ct, 2)

        # seed-bit encryption (diamond_io.rs:330-388)
        seed_cts = []
        original_seed_bits = []
        for _ in range(cfg.seed_bits):
            bit = rng.randrange(2)
            original_seed_bits.append(bit)
            if packed:
                seed_cts.append(
                    packed_native_encrypt(
                        prf.ctx, k_modq, [bit] + [0] * (ns - 1), rng, self.error_sigma
                    )
                )
            else:
                seed_cts.append(native_encrypt(prf.ctx, k_int, bit, rng, self.error_sigma))

        pk_sampler = BGGPublicKeySampler(hash_key, self.secret_size)
        pubkeys = pk_sampler.sample(params, b"diamond_bgg", [True] * num_bits)
        one_pubkey, input_pubkeys = pubkeys[0], pubkeys[1:]
        k_pubkey = pk_sampler.sample(params, b"diamond_k", [False])[1]
        negk_pubkey = BggPublicKey(
            PolyMatrix.zero(params, self.secret_size, k_pubkey.matrix.ncol)
            - k_pubkey.matrix,
            False,
        )
        selector_pks = self._selector_pubkeys(one_pubkey, input_pubkeys)

        init_storage_system(d)
        if self._pk_plt_factory is not None:
            pk_eval = self._pk_plt_factory(self, d, hash_key, pre_out)
        else:
            lut_trapdoor, lut_b = self._trap.trapdoor(params, self.secret_size)
            bridge_target = lut_b.concat_rows(
                [PolyMatrix.zero(params, self.secret_size, lut_b.ncol)]
            )
            td0, b0 = pre_out.final_checkpoint(0)
            bridge = self._trap.preimage(params, td0, b0, bridge_target)
            self._write(d, "lut_bridge", bridge)
            pk_eval = LWEBGGPubKeyPltEvaluator(hash_key, self._trap, lut_b, lut_trapdoor, d)

        # PRF mask pipeline over pubkey wires (rounds + rebase + refresh)
        if packed:
            final_seed_pks, prf_debug = prf.compute_public_key_path_packed(
                lambda mid, m: self._write(d, mid, m),
                pre_out, one_pubkey, negk_pubkey, selector_pks, seed_cts,
                k_modq, rng, self.error_sigma, pk_eval,
            )
        else:
            final_seed_pks, prf_debug = prf.compute_public_key_path(
                lambda mid, m: self._write(d, mid, m),
                pre_out, one_pubkey, k_pubkey, negk_pubkey, selector_pks, seed_cts,
                k_int, rng, self.error_sigma, pk_eval,
            )
        prf_debug.original_seed_bits = original_seed_bits

        # final mask ciphertexts (debug replay mode: fresh valid encryptions)
        if cfg.debug_encrypt_random_prg_wires:
            bits_per_output = self._mask_bits_per_output()
            for _ in range(num_outputs):
                prf_debug.final_mask_cts.append(
                    prf._sample_debug_prg_cts_packed(
                        k_modq, bits_per_output, rng, self.error_sigma
                    )
                    if packed
                    else prf._sample_debug_prg_cts(
                        k_int, bits_per_output, rng, self.error_sigma
                    )
                )

        circuit = self._build_wrapped_circuit(
            prf, builder, unit_consts, num_outputs, prf_debug
        )
        circuit_inputs = list(input_pubkeys) + [k_pubkey]
        if packed and cfg.debug_encrypt_random_prg_wires:
            # packed replay: mask ciphertext values enter as lifted vec wires
            all_mask_cts = [ct for cts in prf_debug.final_mask_cts for ct in cts]
            circuit_inputs += prf.lift_slot_values(
                one_pubkey, prf._ct_slot_values(all_mask_cts)
            )
        elif not cfg.debug_encrypt_random_prg_wires:
            circuit_inputs += final_seed_pks
        from ..lookup.lwe import set_plt_context

        set_plt_context(pk_eval, "wrapped")
        with span("diamond_io.pk_circuit_eval", gates=circuit.num_gates(),
                  slots=self.num_slots):
            if self.num_slots > 1:
                from ..lookup.vec_eval import SlotwisePltEvaluator
                from ..slot_transfer import BGGVecSlotTransferEvaluator

                result_pubkeys = self._unwrap_vec(circuit.eval(
                    params, self._wrap_vec([one_pubkey])[0],
                    self._wrap_vec(circuit_inputs),
                    plt_evaluator=SlotwisePltEvaluator(pk_eval),
                    slot_transfer_evaluator=BGGVecSlotTransferEvaluator(),
                ))
            else:
                result_pubkeys = circuit.eval(
                    params, one_pubkey, circuit_inputs, plt_evaluator=pk_eval,
                    batched=True,
                )
        set_plt_context(pk_eval, "")
        if hasattr(pk_eval, "sample_aux_matrices"):
            pk_eval.sample_aux_matrices(params)
        wait_for_all_writes()

        one_plaintext = Poly.one(params)
        self._write(
            d, "one_preimage",
            self._sample_final_output_preimage(pre_out, 0, one_pubkey, one_plaintext, None),
        )
        # k-wire preimage: target [A_k; -G] gives c_k = sigma*(A_k - k*G)
        self._write(
            d, "k_preimage",
            self._sample_final_output_preimage(
                pre_out, 0, k_pubkey, None, one_plaintext, k_channel=True
            ),
        )
        for bit_idx, pubkey in enumerate(input_pubkeys):
            digit_idx = bit_idx // self.batch_bits
            bit_in_digit = bit_idx % self.batch_bits
            state_idx = self.injector.bit_state_idx(digit_idx, bit_in_digit)
            self._write(
                d, f"input_preimage_{bit_idx}",
                self._sample_final_output_preimage(pre_out, state_idx, pubkey, None, one_plaintext),
            )

        # masked decoder preimages on the sd_total output pubkeys
        sel = PolyMatrix.identity(params, self.secret_size).slice_columns(0, 1)
        td0, b0 = pre_out.final_checkpoint(0)
        for out_idx in range(num_outputs):
            sd_pk = result_pubkeys[3 * out_idx]
            top = sd_pk.matrix.mul_decompose(sel)
            bottom = PolyMatrix.zero(params, self.secret_size, top.ncol)
            pre = self._trap.preimage(params, td0, b0, top.concat_rows([bottom]))
            self._write(d, f"decoder_preimage_{out_idx}", pre)

        return DiamondIOObf(
            hash_key, pre_out, num_outputs, unit_consts, seed_cts, prf_debug
        )

    # --------------------------------------------------------------- online

    def eval(self, dir_path, obf: DiamondIOObf, builder, input_bits: list[int]) -> list[int]:
        with span("diamond_io.eval", input_bits=len(input_bits)):
            return self._eval(dir_path, obf, builder, input_bits)

    def _eval(self, dir_path, obf: DiamondIOObf, builder, input_bits: list[int]) -> list[int]:
        params = self.params
        cfg = self.prf_config
        d = Path(dir_path)
        self._hash_key = obf.hash_key
        assert len(input_bits) == self.num_input_bits
        digits = []
        for i in range(self.input_count):
            v = 0
            for b in range(self.batch_bits):
                v |= (input_bits[i * self.batch_bits + b] & 1) << b
            digits.append(v)

        states = self.injector.online_eval(d, obf.preprocess_out, digits)

        pk_sampler = BGGPublicKeySampler(obf.hash_key, self.secret_size)
        pubkeys = pk_sampler.sample(params, b"diamond_bgg", [True] * self.num_input_bits)
        one_pubkey, input_pubkeys = pubkeys[0], pubkeys[1:]
        k_pubkey = pk_sampler.sample(params, b"diamond_k", [False])[1]

        one_encoding = BggEncoding(
            states[0] @ self._read(d, "one_preimage"), one_pubkey, Poly.one(params)
        )
        k_encoding = BggEncoding(states[0] @ self._read(d, "k_preimage"), k_pubkey, None)
        negk_encoding = BggEncoding(
            PolyMatrix.zero(params, 1, k_encoding.vector.ncol) - k_encoding.vector,
            BggPublicKey(
                PolyMatrix.zero(params, 1, k_pubkey.matrix.ncol) - k_pubkey.matrix,
                False,
            ),
            None,
        )
        input_encodings = []
        for bit_idx, pubkey in enumerate(input_pubkeys):
            digit_idx = bit_idx // self.batch_bits
            bit_in_digit = bit_idx % self.batch_bits
            state_idx = self.injector.bit_state_idx(digit_idx, bit_in_digit)
            bit = self.injector.digit_bit_value(digits[digit_idx], bit_in_digit)
            input_encodings.append(
                BggEncoding(
                    states[state_idx] @ self._read(d, f"input_preimage_{bit_idx}"),
                    pubkey,
                    Poly.const(params, bit),
                )
            )
        selector_encs = self._selector_pubkeys(one_encoding, input_encodings)

        init_storage_system(d)
        if self._enc_plt_factory is not None:
            enc_eval = self._enc_plt_factory(self, d, obf, states, digits)
        else:
            c_b = states[0] @ self._read(d, "lut_bridge")
            enc_eval = LWEBGGEncodingPltEvaluator(obf.hash_key, d, c_b)

        prf = self._prf_pipeline()
        packed = self.payload_slots > 1
        if packed:
            final_seed_encs = prf.compute_seed_encoding_path_packed(
                lambda mid: self._read(d, mid),
                states[0], one_encoding, negk_encoding, selector_encs, digits,
                obf.seed_cts, obf.prf_debug, enc_eval,
            )
        else:
            final_seed_encs = prf.compute_seed_encoding_path(
                lambda mid: self._read(d, mid),
                states[0], one_encoding, k_encoding, negk_encoding, selector_encs,
                digits, obf.seed_cts, obf.prf_debug, enc_eval,
            )

        circuit = self._build_wrapped_circuit(
            prf, builder, obf.unit_ct_consts, obf.num_outputs, obf.prf_debug
        )
        circuit_inputs = input_encodings + [k_encoding]
        if packed and cfg.debug_encrypt_random_prg_wires:
            all_mask_cts = [ct for cts in obf.prf_debug.final_mask_cts for ct in cts]
            circuit_inputs += prf.lift_slot_values(
                one_encoding, prf._ct_slot_values(all_mask_cts)
            )
        elif not cfg.debug_encrypt_random_prg_wires:
            circuit_inputs += final_seed_encs
        from ..lookup.lwe import set_plt_context

        set_plt_context(enc_eval, "wrapped")
        with span("diamond_io.enc_circuit_eval", gates=circuit.num_gates(),
                  slots=self.num_slots):
            if self.num_slots > 1:
                from ..lookup.vec_eval import SlotwisePltEvaluator
                from ..slot_transfer import BGGVecSlotTransferEvaluator

                result = self._unwrap_vec(circuit.eval(
                    params, self._wrap_vec([one_encoding])[0],
                    self._wrap_vec(circuit_inputs),
                    plt_evaluator=SlotwisePltEvaluator(enc_eval),
                    slot_transfer_evaluator=BGGVecSlotTransferEvaluator(),
                ))
            else:
                result = circuit.eval(
                    params, one_encoding, circuit_inputs, plt_evaluator=enc_eval,
                    batched=True,
                )

        # masked decode: proj - c_sd G^{-1}(e0) + pb_plaintext + pb_mask
        sel = PolyMatrix.identity(params, self.secret_size).slice_columns(0, 1)
        q = params.modulus
        out_bits = []
        # per-output decode margins (coeff, centered error vs the nearest
        # q/2-codeword, q) recorded for margin diagnostics and the
        # noise-regime margin asserts
        self.last_decode_margins = []
        for out_idx in range(obf.num_outputs):
            sd_enc = result[3 * out_idx]
            pb_enc = result[3 * out_idx + 1]
            pb_mask_enc = result[3 * out_idx + 2]
            assert pb_enc.plaintext is not None, "public-bottom wire must reveal its plaintext"
            assert pb_mask_enc.plaintext is not None, "mask public bottom must be plaintext-known"
            proj = states[0] @ self._read(d, f"decoder_preimage_{out_idx}")
            noisy = proj - sd_enc.vector.mul_decompose(sel)
            coeff = (
                noisy.entry(0, 0).coeffs()[0]
                + pb_enc.plaintext.coeffs()[0]
                + pb_mask_enc.plaintext.coeffs()[0]
            ) % q
            r = coeff % (q // 2)
            self.last_decode_margins.append((coeff, min(r, q // 2 - r), q))
            out_bits.append(int(decode_centered_masked_integer_coeff(coeff, q, 2)))
        return out_bits


def diamond_io_find_crt_depth(
    ring_dimension: int,
    crt_bits: int,
    base_bits: int,
    max_depth: int,
    input_count: int,
    batch_bits: int,
    make_circuit,
    error_sigma: float = 4.0,
    trapdoor_sigma: float = 4.578,
    secret_size: int = DIAMOND_SECRET_SIZE,
    plt_norm_factory=None,
    prf_config=None,
):
    """Smallest crt_depth with a positive decode margin under the COMPOSED
    protocol budget: injector transition bounds -> stored output projection
    -> per-round PRF evolution (PRG circuit over norms, rebase preimage term,
    refresh rounding) -> final mask PRG/decrypt -> function circuit ->
    masked-decode projection, against q/4 (reference
    diamond_io_find_crt_depth, io/diamond_io/simulation.rs +
    io/utils/simulation.rs). Returns (depth, params) or None."""
    from ..input_injector import DiamondInjector
    from ..ring.params import RingParams
    from .prf_mask import PrfConfig, PrfMaskPipeline
    from .protocol_simulation import (
        diamond_compose_input_error,
        simulate_prf_protocol_error,
    )
    from ..sampler import TrapdoorSampler

    for depth in range(1, max_depth + 1):
        params = RingParams.new(ring_dimension, depth, crt_bits, base_bits)
        injector = DiamondInjector(
            params, input_count, 1 << batch_bits, batch_bits,
            trapdoor_sigma, error_sigma, secret_size=secret_size,
        )
        e_enc, worst_state = diamond_compose_input_error(
            params, injector, trapdoor_sigma
        )
        # the simulated circuit shapes come from the PRF config; the default
        # wide p-basis keeps the nested-RNS budget constructible at large
        # crt_bits with a small basis (the GSW-mul budget needs muls=2) —
        # pass the production config to price a real deployment
        cfg = prf_config or PrfConfig(
            max_unreduced_muls=2, p_moduli_bits=16, p_basis="wide"
        )
        try:
            prf = PrfMaskPipeline(
                params, cfg, b"\0" * 32,
                TrapdoorSampler(params, trapdoor_sigma, seed=0),
                input_count, batch_bits, secret_size=secret_size,
            )
        except (ValueError, AssertionError):
            # the candidate modulus cannot even host the nested-RNS basis
            # (LUT domain or budget) — depth insufficient
            continue
        sim = simulate_prf_protocol_error(
            params, prf, make_circuit(params),
            input_error_norm=e_enc,
            state_error_norm=worst_state,
            error_sigma=error_sigma,
            trapdoor_sigma=trapdoor_sigma,
            secret_size=secret_size,
            plt_norm_factory=plt_norm_factory,
        )
        if sim.ok:
            return depth, params
    return None
