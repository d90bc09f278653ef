"""BGG-encoding noise refresh: trait surface + rounding/recompose math +
error-growth simulation.

Reference: /root/reference/src/noise_refresh/{mod.rs,naive_vec.rs,
simulation.rs} (SURVEY.md A.5). The offline path evaluates a material circuit
(Goldreich CBD PRG over RingGSW, decrypt, merge) over pubkey wires and emits
decoder targets ordered slot_idx * crt_depth + crt_idx; the online path
evaluates over encoding wires, subtracts the decoder outputs per CRT level,
rounds keeping `v_bits` low bits, and CRT-recomposes.

Round-1 scope: the `NoiseRefresher` protocol, the exact rounding/recompose
helpers used by that pipeline, and the error-growth simulation. The GSW
material circuits exist as building blocks (gadgets/fhe, gadgets/fhe_prg);
wiring them through `preprocess`/`online_eval` is the next milestone.
"""

from __future__ import annotations

from decimal import Decimal

from ..simulator import PolyMatrixNorm, SimulatorContext


class NoiseRefresher:
    """Offline/online split for refreshing one slotwise encoding wire
    (reference noise_refresh/mod.rs:28-73)."""

    def preprocess(self, refresh_id: bytes, one, refreshed_input, enc_seeds,
                   decryption_key, plt_evaluator, slot_transfer_evaluator):
        raise NotImplementedError

    def online_eval(self, refresh_id: bytes, one, refreshed_input, enc_seeds,
                    decryption_key, decoders, plt_evaluator, slot_transfer_evaluator):
        raise NotImplementedError


def round_keep_low_bits(value: int, modulus: int, v_bits: int) -> int:
    """Round a masked CRT-level term keeping v_bits of precision:
    round(value * 2^v_bits / modulus) (naive_vec.rs online rounding)."""
    scale = 1 << v_bits
    return (value * scale + modulus // 2) // modulus % scale


def crt_recompose(level_values: list[int], moduli: list[int]) -> int:
    """Recompose per-CRT-level rounded values into the refreshed plaintext."""
    from ..utils.numth import crt_reconstruct

    return crt_reconstruct(level_values, list(moduli))


def simulate_noise_refresh_error_growth(
    ctx: SimulatorContext,
    input_error_norm: Decimal,
    v_bits: int,
    crt_depth: int,
    cbd_n: int,
    q_bits: int,
) -> Decimal:
    """Post-refresh error bound: rounding error (q / 2^v_bits scale) plus the
    CBD mask noise, per CRT level, recomposed (reference simulation.rs:127+).

    The refreshed error no longer depends on `input_error_norm` (that is the
    point of the refresh); the input only needs to satisfy the pre-rounding
    correctness bound, which the caller checks separately.
    """
    rounding_err = Decimal(2) ** (q_bits - v_bits)
    cbd_err = Decimal(cbd_n) * ctx.ring_dim_sqrt
    per_level = rounding_err + cbd_err
    return per_level * Decimal(crt_depth)


def pre_rounding_bound_holds(input_error_norm: Decimal, q_bits: int, v_bits: int) -> bool:
    """Input error must be below q / 2^{v_bits+1} for the rounding to be
    correct (reference aky24 simulation
    `max_noise_refresh_v_bits_without_pre_rounding_error`)."""
    return input_error_norm < Decimal(2) ** (q_bits - v_bits - 1)
