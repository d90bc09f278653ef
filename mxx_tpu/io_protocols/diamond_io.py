"""Diamond iO (eprint 2025/236): obfuscation + evaluation pipeline.

TPU-build of /root/reference/src/io/diamond_io.rs (SURVEY.md §3.4-3.5).

Pipeline:
- obfuscation: hash-derived BGG pubkeys for [one]+input bits+k, ternary
  payload k, Diamond injector preprocessing (trapdoor transition chains), the
  LUT bridge preimage (state0 -> sigma*B_lut for online LWE lookups), GSW
  mask ciphertexts under the key (-k, 1), offline pubkey-path evaluation of
  the wrapped circuit, final output projection preimages (one / k / input
  bits), and masked-decoder preimages per output.
- eval: injector online digit threading, output encodings rebuilt from stored
  preimages (c = sigma*(A - x*G); the k-wire carries the ABSOLUTE channel
  c_k = sigma*A_k - k*G, diamond_io.rs:671-697), encoding-path evaluation,
  masked high-bit decode.

Masked decode (the reference's k-channel mechanism, diamond_io.rs:963-1150):
every function output is pushed into the absolute plaintext channel by
multiplying with the decrypt combination of a GSW "unit" ciphertext
Enc_{(-k,1)}(1): sd_u = const(top_u) * (-k wire) has absolute plaintext
-k*top_u, and -k*top_u + bottom_u = (Q/2)*1 exactly. Adding a per-output
zero-mask ciphertext channel (-k*top_m + bottom_m = 0 + e) yields

  decode = proj - c_sd_total G^{-1}(e_0) + pb_plaintext + bottom_m
         = f * (Q/2) + noise,

rounded mod 2. The PRG expansion of the mask (Goldreich over nested-RNS GSW,
all built in gadgets/) replaces the fresh mask ciphertexts in a later round —
the in-circuit homomorphic PRG is too expensive for CI-scale parameters.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from pathlib import Path

from ..bgg import BGGPublicKeySampler, BggEncoding, BggPublicKey
from ..decoder.masked_high_bit import decode_centered_masked_integer_coeff
from ..gadgets.fhe.plain_gsw import decrypt_constants, native_encrypt
from ..input_injector import DiamondInjector, DiamondInjectorPreprocessOut
from ..lookup.lwe import LWEBGGEncodingPltEvaluator, LWEBGGPubKeyPltEvaluator
from ..matrix import PolyMatrix
from ..ring.poly import Poly
from ..sampler import TernaryDist, TrapdoorSampler, UniformSampler
from ..storage import init_storage_system, wait_for_all_writes
from ..utils.rng import Drbg

DIAMOND_SECRET_SIZE = 1


@dataclass
class DiamondIOObf:
    hash_key: bytes
    preprocess_out: DiamondInjectorPreprocessOut
    num_outputs: int
    has_luts: bool
    unit_ct_consts: tuple[int, int]  # (top_u, bottom_u): -k*top_u + bottom_u = Q/2
    mask_ct_consts: list[tuple[int, int]]  # per output: -k*top_m + bottom_m = 0 + e


class DiamondIO:
    def __init__(
        self,
        params,
        input_count: int,
        batch_bits: int,
        trapdoor_sigma: float = 4.578,
        error_sigma: float = 0.0,
        seed: int | None = None,
    ):
        self.params = params
        self.input_count = input_count
        self.batch_bits = batch_bits
        self.base = 1 << batch_bits
        self.trapdoor_sigma = trapdoor_sigma
        self.error_sigma = error_sigma
        self.injector = DiamondInjector(
            params, input_count, self.base, batch_bits, trapdoor_sigma, error_sigma, seed
        )
        self._seed = seed
        self._trap = TrapdoorSampler(params, trapdoor_sigma, seed=seed)

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

    def _build_wrapped_circuit(self, builder, unit_consts, mask_consts):
        """Deterministic wrapper: user circuit + k-channel masked outputs.
        Inputs: num_bits bit wires followed by the k wire."""
        from ..circuit import PolyCircuit

        params = self.params
        circuit = PolyCircuit()
        wires = circuit.input(self.num_input_bits + 1)
        bit_wires, k_wire = wires[:-1], wires[-1]
        f_outs = builder(circuit, bit_wires)
        zero = circuit.sub_gate(k_wire, k_wire)
        negk = circuit.sub_gate(zero, k_wire)
        top_u, bottom_u = unit_consts
        sd_u = circuit.mul_gate(circuit.large_scalar_mul(circuit.const_one_gate(), [top_u]), negk)
        outputs = []
        for o, f in enumerate(f_outs):
            top_m, _bottom_m = mask_consts[o]
            sd_mask = circuit.mul_gate(
                circuit.large_scalar_mul(circuit.const_one_gate(), [top_m]), negk
            )
            sd_out = circuit.mul_gate(f, sd_u)
            sd_total = circuit.add_gate(sd_out, sd_mask)
            pb_out = circuit.mul_gate(
                f, circuit.large_scalar_mul(circuit.const_one_gate(), [bottom_u])
            )
            outputs.extend([sd_total, pb_out])
        circuit.output(outputs)
        return circuit

    def _probe_num_outputs(self, builder) -> int:
        from ..circuit import PolyCircuit

        probe = PolyCircuit()
        bits = probe.input(self.num_input_bits)
        return len(builder(probe, bits))

    # -------------------------------------------------------------- offline

    def _sample_final_output_preimage(self, pre_out, state_idx, pubkey,
                                      top_plaintext, bottom_plaintext):
        params = self.params
        g = PolyMatrix.gadget_matrix(params, DIAMOND_SECRET_SIZE)
        top = pubkey.matrix
        if top_plaintext is not None:
            top = top - g.mul_poly_scalar(top_plaintext)
        bottom = (
            -g.mul_poly_scalar(bottom_plaintext)
            if bottom_plaintext is not None
            else PolyMatrix.zero(params, DIAMOND_SECRET_SIZE, top.ncol)
        )
        td, b = pre_out.final_checkpoint(state_idx)
        return self._trap.preimage(params, td, b, top.concat_rows([bottom]))

    def obfuscate(self, dir_path, builder) -> DiamondIOObf:
        params = self.params
        d = Path(dir_path)
        d.mkdir(parents=True, exist_ok=True)
        hash_key = (
            os.urandom(32)
            if self._seed is None
            else hashlib.sha256(b"diamond_io_hash_key" + self._seed.to_bytes(8, "little", signed=True)).digest()
        )
        num_bits = self.num_input_bits

        # payload k: ternary CONSTANT (the GSW mask key must be an integer for
        # the host encryptions; the injector carries it as a constant poly).
        # CSPRNG when unseeded: ciphertext a-values are published (ADVICE r1).
        rng = Drbg(self._seed)
        k_int = rng.choice([-1, 1])
        k = Poly.const(params, k_int)
        pre_out = self.injector.preprocess(d, k)

        num_outputs = self._probe_num_outputs(builder)
        unit_ct = native_encrypt(params, k_int, 1, rng, 2, self.error_sigma)
        unit_consts = decrypt_constants(params, unit_ct, 2)
        mask_cts = [
            native_encrypt(params, k_int, 0, rng, 2, self.error_sigma)
            for _ in range(num_outputs)
        ]
        mask_consts = [decrypt_constants(params, ct, 2) for ct in mask_cts]

        circuit = self._build_wrapped_circuit(builder, unit_consts, mask_consts)

        pk_sampler = BGGPublicKeySampler(hash_key, DIAMOND_SECRET_SIZE)
        pubkeys = pk_sampler.sample(params, b"diamond_bgg", [True] * num_bits)
        one_pubkey, input_pubkeys = pubkeys[0], pubkeys[1:]
        k_pubkey = pk_sampler.sample(params, b"diamond_k", [False])[1]

        has_luts = bool(circuit.luts)
        if has_luts:
            init_storage_system(d)
            lut_trapdoor, lut_b = self._trap.trapdoor(params, DIAMOND_SECRET_SIZE)
            bridge_target = lut_b.concat_rows(
                [PolyMatrix.zero(params, DIAMOND_SECRET_SIZE, lut_b.ncol)]
            )
            td0, b0 = pre_out.final_checkpoint(0)
            bridge = self._trap.preimage(params, td0, b0, bridge_target)
            self._write(d, "lut_bridge", bridge)
            pk_eval = LWEBGGPubKeyPltEvaluator(hash_key, self._trap, lut_b, lut_trapdoor, d)
        else:
            pk_eval = None

        result_pubkeys = circuit.eval(
            params, one_pubkey, input_pubkeys + [k_pubkey], plt_evaluator=pk_eval
        )
        if has_luts:
            pk_eval.sample_aux_matrices(params)
            wait_for_all_writes()

        one_plaintext = Poly.one(params)
        self._write(
            d, "one_preimage",
            self._sample_final_output_preimage(pre_out, 0, one_pubkey, one_plaintext, None),
        )
        # k-wire preimage: target [A_k; -G] gives c_k = sigma*A_k - k*G
        self._write(
            d, "k_preimage",
            self._sample_final_output_preimage(pre_out, 0, k_pubkey, None, one_plaintext),
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
        sel = PolyMatrix.identity(params, DIAMOND_SECRET_SIZE).slice_columns(0, 1)
        td0, b0 = pre_out.final_checkpoint(0)
        for out_idx in range(num_outputs):
            sd_pk = result_pubkeys[2 * out_idx]
            top = sd_pk.matrix.mul_decompose(sel)
            bottom = PolyMatrix.zero(params, DIAMOND_SECRET_SIZE, top.ncol)
            pre = self._trap.preimage(params, td0, b0, top.concat_rows([bottom]))
            self._write(d, f"decoder_preimage_{out_idx}", pre)

        return DiamondIOObf(
            hash_key, pre_out, num_outputs, has_luts, unit_consts, mask_consts
        )

    # --------------------------------------------------------------- online

    def eval(self, dir_path, obf: DiamondIOObf, builder, input_bits: list[int]) -> list[int]:
        params = self.params
        d = Path(dir_path)
        assert len(input_bits) == self.num_input_bits
        digits = []
        for i in range(self.input_count):
            v = 0
            for b in range(self.batch_bits):
                v |= (input_bits[i * self.batch_bits + b] & 1) << b
            digits.append(v)

        states = self.injector.online_eval(d, obf.preprocess_out, digits)

        pk_sampler = BGGPublicKeySampler(obf.hash_key, DIAMOND_SECRET_SIZE)
        pubkeys = pk_sampler.sample(params, b"diamond_bgg", [True] * self.num_input_bits)
        one_pubkey, input_pubkeys = pubkeys[0], pubkeys[1:]
        k_pubkey = pk_sampler.sample(params, b"diamond_k", [False])[1]

        one_encoding = BggEncoding(
            states[0] @ self._read(d, "one_preimage"), one_pubkey, Poly.one(params)
        )
        k_encoding = BggEncoding(states[0] @ self._read(d, "k_preimage"), k_pubkey, None)
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

        circuit = self._build_wrapped_circuit(builder, obf.unit_ct_consts, obf.mask_ct_consts)
        if obf.has_luts:
            c_b = states[0] @ self._read(d, "lut_bridge")
            enc_eval = LWEBGGEncodingPltEvaluator(obf.hash_key, d, c_b)
        else:
            enc_eval = None

        result = circuit.eval(
            params, one_encoding, input_encodings + [k_encoding], plt_evaluator=enc_eval
        )

        # masked decode: proj - c_sd G^{-1}(e0) + pb_plaintext + bottom_m
        sel = PolyMatrix.identity(params, DIAMOND_SECRET_SIZE).slice_columns(0, 1)
        q = params.modulus
        out_bits = []
        for out_idx in range(obf.num_outputs):
            sd_enc = result[2 * out_idx]
            pb_enc = result[2 * out_idx + 1]
            assert pb_enc.plaintext is not None, "public-bottom wire must reveal its plaintext"
            proj = states[0] @ self._read(d, f"decoder_preimage_{out_idx}")
            noisy = proj - sd_enc.vector.mul_decompose(sel)
            _top_m, bottom_m = obf.mask_ct_consts[out_idx]
            coeff = (
                noisy.entry(0, 0).coeffs()[0]
                + pb_enc.plaintext.coeffs()[0]
                + bottom_m
            ) % q
            out_bits.append(int(decode_centered_masked_integer_coeff(coeff, q, 2)))
        return out_bits
