"""Diamond iO (eprint 2025/236): obfuscation + evaluation pipeline.

TPU-build of /root/reference/src/io/diamond_io.rs (SURVEY.md §3.4-3.5).
Round-1 scope implements the full structural pipeline:

- obfuscation: hash-derived BGG pubkeys for [one]+input bits, ternary payload
  k, Diamond injector preprocessing (trapdoor transition chains), the LUT
  bridge preimage (state0 -> sigma*B_lut for online LWE lookups), offline
  pubkey-path circuit evaluation with the LWE LUT evaluator, final output
  projection preimages (one / k / input bits; diamond_io.rs:470-556), and
  masked-decoder preimages for every output pubkey.
- eval: injector online digit threading, output encodings rebuilt from stored
  preimages (satisfying c = sigma*(A - x*G) exactly at zero error;
  diamond_io.rs:660-744), encoding-path circuit evaluation, and masked
  high-bit decode.

Round-1 simplification (documented): the PRF mask pipeline (Goldreich PRG
over RingGSW + noise refresh, diamond_io.rs:428-469) is not yet folded into
the decode; outputs decode through the sigma-scaled half-q channel directly,
so an output bit reads from max |coeff| of (q/2)*y*sigma. The PRG/GSW/nested-
RNS building blocks all exist (gadgets/) — wiring them through the mask path
is the next-round milestone.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

from ..bgg import BGGEncodingSampler, BGGPublicKeySampler, BggEncoding, BggPublicKey
from ..input_injector import DiamondInjector, DiamondInjectorPreprocessOut
from ..lookup.lwe import LWEBGGEncodingPltEvaluator, LWEBGGPubKeyPltEvaluator
from ..matrix import PolyMatrix
from ..ring.poly import Poly
from ..sampler import TernaryDist, TrapdoorSampler, UniformSampler
from ..storage import init_storage_system, wait_for_all_writes

DIAMOND_SECRET_SIZE = 1


@dataclass
class DiamondIOObf:
    hash_key: bytes
    preprocess_out: DiamondInjectorPreprocessOut
    num_outputs: int
    has_luts: bool


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

    # -------------------------------------------------------------- offline

    def _sample_final_output_preimage(
        self,
        pre_out: DiamondInjectorPreprocessOut,
        state_idx: int,
        pubkey: BggPublicKey,
        top_plaintext: Poly | None,
        bottom_plaintext: Poly | None,
    ) -> PolyMatrix:
        """Preimage of [[A - G*top_pt], [-G*bottom_pt]] under the final base of
        `state_idx` (diamond_io.rs sample_final_output_preimage)."""
        params = self.params
        g = PolyMatrix.gadget_matrix(params, DIAMOND_SECRET_SIZE)
        top = pubkey.matrix
        if top_plaintext is not None:
            top = top - g.mul_poly_scalar(top_plaintext)
        if bottom_plaintext is not None:
            bottom = -g.mul_poly_scalar(bottom_plaintext)
        else:
            bottom = PolyMatrix.zero(params, DIAMOND_SECRET_SIZE, top.ncol)
        target = top.concat_rows([bottom])
        trapdoor, b = pre_out.final_checkpoint(state_idx)
        return self._trap.preimage(params, trapdoor, b, target)

    def obfuscate(self, dir_path, circuit) -> DiamondIOObf:
        params = self.params
        d = Path(dir_path)
        d.mkdir(parents=True, exist_ok=True)
        hash_key = os.urandom(32) if self._seed is None else bytes([self._seed % 256] * 32)
        num_bits = self.num_input_bits
        assert circuit.num_input == num_bits, (
            f"function circuit must take {num_bits} bit inputs"
        )

        pk_sampler = BGGPublicKeySampler(hash_key, DIAMOND_SECRET_SIZE)
        pubkeys = pk_sampler.sample(params, b"diamond_bgg", [True] * num_bits)
        one_pubkey, input_pubkeys = pubkeys[0], pubkeys[1:]

        k = UniformSampler(self._seed).sample_poly(params, TernaryDist())
        pre_out = self.injector.preprocess(d, k)

        # LUT support: shared lookup trapdoor base + bridge preimage so the
        # online evaluator can obtain c_b = sigma * B_lut from state0
        # (diamond_io.rs:396-427 lookup bridge preimage).
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
            pk_eval = LWEBGGPubKeyPltEvaluator(
                hash_key, self._trap, lut_b, lut_trapdoor, d
            )
        else:
            pk_eval = None

        result_pubkeys = circuit.eval(
            params, one_pubkey, input_pubkeys, plt_evaluator=pk_eval
        )
        if has_luts:
            pk_eval.sample_aux_matrices(params)
            wait_for_all_writes()

        one_plaintext = Poly.one(params)
        self._write(
            d,
            "one_preimage",
            self._sample_final_output_preimage(pre_out, 0, one_pubkey, one_plaintext, None),
        )
        k_pubkey = pk_sampler.sample(params, b"diamond_k", [True])[1]
        self._write(
            d,
            "k_preimage",
            self._sample_final_output_preimage(pre_out, 0, k_pubkey, None, one_plaintext),
        )
        for bit_idx, pubkey in enumerate(input_pubkeys):
            digit_idx = bit_idx // self.batch_bits
            bit_in_digit = bit_idx % self.batch_bits
            state_idx = self.injector.bit_state_idx(digit_idx, bit_in_digit)
            self._write(
                d,
                f"input_preimage_{bit_idx}",
                self._sample_final_output_preimage(
                    pre_out, state_idx, pubkey, None, one_plaintext
                ),
            )

        # decoder preimages per output pubkey (and for the one-wire, whose
        # decode channel carries sigma itself): target [A G^{-1}(e0); 0]
        sel = PolyMatrix.identity(params, DIAMOND_SECRET_SIZE).slice_columns(0, 1)
        td0, b0 = pre_out.final_checkpoint(0)

        def decoder_preimage(pk_matrix):
            top = pk_matrix.mul_decompose(sel)
            bottom = PolyMatrix.zero(params, DIAMOND_SECRET_SIZE, top.ncol)
            return self._trap.preimage(params, td0, b0, top.concat_rows([bottom]))

        self._write(d, "decoder_preimage_one", decoder_preimage(one_pubkey.matrix))
        for out_idx, out_pk in enumerate(result_pubkeys):
            self._write(d, f"decoder_preimage_{out_idx}", decoder_preimage(out_pk.matrix))

        return DiamondIOObf(hash_key, pre_out, len(result_pubkeys), has_luts)

    # --------------------------------------------------------------- online

    def eval(self, dir_path, obf: DiamondIOObf, circuit, input_bits: list[int]) -> list[int]:
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

        one_encoding = BggEncoding(
            states[0] @ self._read(d, "one_preimage"), one_pubkey, Poly.one(params)
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

        if obf.has_luts:
            c_b = states[0] @ self._read(d, "lut_bridge")
            enc_eval = LWEBGGEncodingPltEvaluator(obf.hash_key, d, c_b)
        else:
            enc_eval = None

        result_encodings = circuit.eval(
            params, one_encoding, input_encodings, plt_evaluator=enc_eval
        )

        # sigma-referenced decode: the one-wire's decode channel yields
        # sigma itself (diff_one = 1 * sigma), and each output channel yields
        # y * sigma; pick y in {0,1} by nearest centered distance. (The
        # q/2-masked PRF channel replaces this next round.)
        sel = PolyMatrix.identity(params, DIAMOND_SECRET_SIZE).slice_columns(0, 1)
        q = params.modulus

        def channel(preimage_id, enc):
            proj = states[0] @ self._read(d, preimage_id)
            diff = proj - enc.vector.mul_decompose(sel)
            return diff.entry(0, 0).coeffs()

        sigma_coeffs = channel("decoder_preimage_one", one_encoding)

        def centered_dist(a, b):
            out = 0
            for x, y in zip(a, b):
                delta = (x - y) % q
                out += min(delta, q - delta)
            return out

        zero = [0] * params.n
        out_bits = []
        for out_idx, enc in enumerate(result_encodings):
            coeffs = channel(f"decoder_preimage_{out_idx}", enc)
            d0 = centered_dist(coeffs, zero)
            d1 = centered_dist(coeffs, sigma_coeffs)
            out_bits.append(0 if d0 <= d1 else 1)
        return out_bits
