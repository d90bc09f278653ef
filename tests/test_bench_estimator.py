"""Execution plan + bench estimator + lattice estimator bridge + noise refresh helpers."""

from decimal import Decimal

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.circuit.analysis import GroupedExecutionPlan
from mxx_tpu.bench_estimator import GateCostModel, estimate_circuit, measure_poly_costs
from mxx_tpu.simulator.lattice_estimator import (
    LweDistSpec,
    heuristic_security_bits,
    run_lattice_estimator_cli,
)
from mxx_tpu.noise_refresh import round_keep_low_bits, simulate_noise_refresh_error_growth
from mxx_tpu.simulator import SimulatorContext


def build_circuit():
    c = PolyCircuit()
    w = c.input(3)
    a = c.add_gate(w[0], w[1])
    b = c.mul_gate(a, w[2])
    d = c.mul_gate(a, w[0])
    c.output([b, d])
    return c, (a, b, d)


def test_grouped_execution_plan():
    c, (a, b, d) = build_circuit()
    plan = GroupedExecutionPlan.from_circuit(c)
    assert plan.levels[0].groups == {"Add": [a]}
    assert sorted(plan.levels[1].groups["Mul"]) == [b, d]
    assert plan.max_parallelism == 2
    assert plan.total_gates() == 3


def test_estimate_circuit_latency_model():
    c, _ = build_circuit()
    model = GateCostModel({"Add": 1.0, "Mul": 10.0})
    s1 = estimate_circuit(c, model, parallelism=1)
    assert s1.total_time_secs == 21.0
    assert s1.latency_secs == 1.0 + 20.0  # two Mul waves sequentially
    s2 = estimate_circuit(c, model, parallelism=2)
    assert s2.latency_secs == 1.0 + 10.0  # Muls in one wave
    assert s2.max_parallelism == 2


def test_measured_costs_drive_estimate():
    params = RingParams.default()
    model = measure_poly_costs(params, iterations=3)
    c, _ = build_circuit()
    s = estimate_circuit(c, model)
    assert s.total_time_secs > 0 and s.latency_secs > 0


def test_lattice_estimator_bridge_graceful():
    # CLI is absent in this image: bridge must return None, not raise
    out = run_lattice_estimator_cli(
        1024, 60, LweDistSpec("ternary"), LweDistSpec("gaussian", sigma=4.0), timeout_secs=5
    )
    assert out is None
    assert heuristic_security_bits(65536, 1484) > 100


def test_noise_refresh_helpers():
    # rounding keeps v_bits of the scaled value
    q = 1 << 40
    v_bits = 8
    val = (q // 256) * 37 + 12345  # ~ 37/256 of q plus noise
    assert round_keep_low_bits(val, q, v_bits) == 37
    ctx = SimulatorContext(Decimal(64).sqrt(), Decimal(2), 1, 40, 40)
    bound = simulate_noise_refresh_error_growth(ctx, Decimal(2) ** 30, 8, 2, 4, 40)
    assert bound < Decimal(2) ** 35


def test_per_wire_type_cost_models():
    from mxx_tpu.bench_estimator import (
        measure_bgg_poly_encoding_costs,
        measure_naive_vec_costs,
    )

    params = RingParams.new(16, 2, 20, 5)
    packed = measure_bgg_poly_encoding_costs(params, num_slots=2, iterations=2)
    assert packed.cost("Mul") > 0
    vec = measure_naive_vec_costs(params, num_slots=3, iterations=2)
    scalar = measure_poly_costs(params, iterations=2)
    assert vec.cost("Add") > 0 and vec.default_cost > 0
    assert scalar.cost("Add") > 0


@pytest.mark.slow
def test_estimate_diamond_io_real_prf_shape():
    """The protocol estimator builds the REAL-mode wrapped circuit (Goldreich
    PRG over Ring-GSW seed wires, no debug replay) and prices every phase,
    including the PRF rebase/refresh preimage storm (reference
    bench_estimator_shape.rs). Requires max_unreduced_muls >= 2 (the
    reference default) — the PRG predicate overflows the p-CRT budget at 1."""
    from mxx_tpu.io_protocols import DiamondIO
    from mxx_tpu.io_protocols.prf_mask import PrfConfig
    from mxx_tpu.io_protocols.bench_estimator import estimate_diamond_io

    params = RingParams.new(4, 3, 10, 10)
    dio = DiamondIO(params, 2, 1, seed=1, prf_config=PrfConfig(
        seed_bits=5, p_moduli_bits=5, max_unreduced_muls=2))
    est = estimate_diamond_io(dio, lambda c, bits: [c.and_gate(bits[0], bits[1])])
    assert est.obfuscate_latency_secs > 0
    assert est.eval_latency_secs > 0
    assert est.artifact_bytes > 0
    # compact packing: artifact bytes must be far below raw u32-plane volume
    raw_entry = params.crt_depth * params.n * 4
    compact_entry = -(-params.crt_depth * params.crt_bits * params.n // 8)
    assert compact_entry < raw_entry
