"""Diamond input injector: exact state relations with zero error.

Mirror of the reference test
test_diamond_injector_online_eval_returns_exact_bgg_relations
(/root/reference/src/input_injector/mod.rs tests)."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.input_injector import DiamondInjector


def test_diamond_injector_exact_relations(tmp_path):
    params = RingParams.default()
    input_count = 3
    base = 4
    batch_bits = 2
    injector = DiamondInjector(params, input_count, base, batch_bits, 4.578, 0.0, seed=71)
    k = Poly.const(params, 3)

    out = injector.preprocess(tmp_path, k)
    digits = [1, 3, 2]
    states = injector.online_eval(tmp_path, out, digits)
    assert len(states) == 1 + input_count * batch_bits
    assert injector.read_preprocessed_k(tmp_path) == k

    # host-side recomputation: sigma_level = s_eps * prod masks
    s_eps = injector.read_matrix(tmp_path, injector.secret_epsilon_id()).entry(0, 0)
    masks = [
        injector.read_matrix(
            tmp_path, injector.digit_secret_id(i + 1, digits[i])
        ).entry(0, 0)
        for i in range(input_count)
    ]
    sigma_full = s_eps
    for m in masks:
        sigma_full = sigma_full * m

    # state 0: [sigma, k] * B_final_0
    b0 = out.final_pub_matrices[0]
    expected0 = PolyMatrix.from_poly_row(params, [sigma_full, k]) @ b0
    assert states[0] == expected0

    # bit states: [sigma, bit * sigma] * B_final_state
    for input_idx in range(input_count):
        for bit_idx in range(batch_bits):
            sidx = injector.bit_state_idx(input_idx, bit_idx)
            bit = injector.digit_bit_value(digits[input_idx], bit_idx)
            b = out.final_pub_matrices[sidx]
            expected = (
                PolyMatrix.from_poly_row(
                    params, [sigma_full, sigma_full * Poly.const(params, bit)]
                )
                @ b
            )
            assert states[sidx] == expected, (input_idx, bit_idx)


def test_diamond_injector_resume(tmp_path):
    params = RingParams.default()
    injector = DiamondInjector(params, 1, 2, 1, 4.578, 0.0, seed=72)
    k = Poly.const(params, 5)
    out1 = injector.preprocess(tmp_path, k)
    files = sorted(p.name for p in tmp_path.iterdir())
    # second preprocess resumes from checkpoints: identical artifact set
    injector2 = DiamondInjector(params, 1, 2, 1, 4.578, 0.0, seed=99)
    out2 = injector2.preprocess(tmp_path, k)
    assert sorted(p.name for p in tmp_path.iterdir()) == files
    assert out1.final_pub_matrices[0] == out2.final_pub_matrices[0]
