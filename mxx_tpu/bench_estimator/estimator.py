"""Predictive performance model: measured per-gate-kind costs aggregated over
the grouped execution plan.

Reference: /root/reference/src/bench_estimator/mod.rs (SURVEY.md A.8):
`benchmark_gate_operation` wall-clocks a representative wire op; the summary
walks the GroupedExecutionPlan with latency = critical path through levels
(each level costs its most expensive group op, groups within a level run in
parallel up to `parallelism`), total_time = sum of all op costs, and
max_parallelism = widest level.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..circuit.analysis import GroupedExecutionPlan
from ..circuit.gate import ADD, LARGE_SCALAR_MUL, MUL, PUB_LUT, SMALL_SCALAR_MUL, SUB


def force(arr):
    """Force device completion with a one-element host fetch. On the tunneled
    TPU runtime `block_until_ready()` acks WITHOUT executing (BENCHMARKS.md
    "Measurement integrity note" — a 3.5 GB op "completes" in 0.3 ms); only a
    host read proves the computation ran. The probe slices one element on
    device first so the fetch itself transfers O(1) bytes."""
    import numpy as np

    return np.asarray(arr.reshape(-1)[:1])


def benchmark_gate_operation(iterations: int, op) -> float:
    """Median-of-iterations wall time (seconds) of one wire operation.
    `op` must end in a `force()` host fetch, NOT `block_until_ready()` —
    see `force`."""
    times = []
    op()  # warmup / compile
    for _ in range(iterations):
        t0 = time.perf_counter()
        op()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@dataclass
class GateCostModel:
    """Seconds per gate kind (unknown kinds fall back to `default_cost`)."""

    costs: dict[str, float] = field(default_factory=dict)
    default_cost: float = 0.0

    def cost(self, kind: str) -> float:
        return self.costs.get(kind, self.default_cost)


@dataclass
class CircuitBenchSummary:
    latency_secs: float  # critical path through levels
    total_time_secs: float  # sum of all op costs
    max_parallelism: int


def estimate_circuit(circuit, cost_model: GateCostModel, parallelism: int = 1
                     ) -> CircuitBenchSummary:
    plan = GroupedExecutionPlan.from_circuit(circuit)
    latency = 0.0
    total = 0.0
    for lvl in plan.levels:
        level_latency = 0.0
        for kind, gids in lvl.groups.items():
            c = cost_model.cost(kind)
            total += c * len(gids)
            # gates of one kind in a level run `parallelism`-wide
            waves = -(-len(gids) // max(parallelism, 1))
            level_latency = max(level_latency, c * waves)
        latency += level_latency
    return CircuitBenchSummary(latency, total, plan.max_parallelism)


def measure_poly_costs(params, iterations: int = 5) -> GateCostModel:
    """Measure representative plain-poly wire op costs on the current device."""
    from ..ring.poly import Poly
    from ..sampler import FinRingDist, UniformSampler

    us = UniformSampler(seed=0)
    a = us.sample_poly(params, FinRingDist()).to_eval()
    b = us.sample_poly(params, FinRingDist()).to_eval()
    costs = {
        ADD: benchmark_gate_operation(iterations, lambda: force((a + b).data)),
        SUB: benchmark_gate_operation(iterations, lambda: force((a - b).data)),
        MUL: benchmark_gate_operation(iterations, lambda: force((a * b).data)),
    }
    costs[SMALL_SCALAR_MUL] = costs[MUL]
    costs[LARGE_SCALAR_MUL] = costs[MUL]
    return GateCostModel(costs, default_cost=costs[MUL])


def measure_lwe_lut_online_cost(params, d: int = 1, iterations: int = 3) -> float:
    """Wall-clock one LWE online lookup's algebra (K_low hash derivation +
    c_b @ K_high + c_z @ K_low) — the PubLut gate cost in the encoding model
    (reference bench_estimator measures the real lookup op instead of
    defaulting it to a Mul)."""
    from ..lookup.lwe import derive_k_low
    from ..sampler import FinRingDist, UniformSampler

    us = UniformSampler(seed=5)
    k = params.modulus_digits
    m_g, m_b = d * k, d * (k + 2)
    c_b = us.sample_uniform(params, 1, m_b, FinRingDist())
    c_z = us.sample_uniform(params, 1, m_g, FinRingDist())
    k_high = us.sample_uniform(params, m_b, m_g, FinRingDist())

    def op():
        k_low = derive_k_low(params, d, bytes(32), 0, 0, 0)
        force((c_b @ k_high + c_z @ k_low).data)

    return benchmark_gate_operation(iterations, op)


def measure_bgg_encoding_costs(params, d: int = 1, iterations: int = 3,
                               lut_cost: float | None = None) -> GateCostModel:
    """Measure representative BGG-encoding wire op costs (the protocol-eval
    cost model; reference bench_estimator/bgg_encoding.rs)."""
    from ..bgg import BGGEncodingSampler, BGGPublicKeySampler
    from ..ring.poly import Poly
    from ..sampler import TernaryDist, UniformSampler

    us = UniformSampler(seed=1)
    secrets = [us.sample_poly(params, TernaryDist()) for _ in range(d)]
    pk = BGGPublicKeySampler(bytes(32), d).sample(params, b"bench", [True, True])
    es = BGGEncodingSampler(params, secrets, None, seed=2)
    encs = es.sample(
        params, pk, [Poly.const(params, 1), Poly.const(params, 0)]
    )
    e1, e2 = encs[1], encs[2]
    costs = {
        ADD: benchmark_gate_operation(
            iterations, lambda: force((e1 + e2).vector.data)
        ),
        MUL: benchmark_gate_operation(
            iterations, lambda: force((e1 * e2).vector.data)
        ),
    }
    costs[SUB] = costs[ADD]
    costs[SMALL_SCALAR_MUL] = costs[ADD]
    costs[LARGE_SCALAR_MUL] = costs[MUL]
    costs[PUB_LUT] = (
        lut_cost if lut_cost is not None
        else measure_lwe_lut_online_cost(params, d, iterations)
    )
    return GateCostModel(costs, default_cost=costs[MUL])


def measure_bgg_poly_encoding_costs(params, num_slots: int = 2, iterations: int = 3,
                                    lut_cost: float | None = None) -> GateCostModel:
    """Packed slot-wise encoding cost model: slot ops are single batched
    matmuls over the stacked rows (reference
    bench_estimator/bgg_poly_encoding.rs)."""
    from ..bgg import BGGPublicKeySampler
    from ..bgg.poly_encoding import BGGPolyEncodingSampler
    from ..ring.poly import Poly
    from ..sampler import TernaryDist, UniformSampler

    us = UniformSampler(seed=3)
    secrets = [us.sample_poly(params, TernaryDist())]
    pk = BGGPublicKeySampler(bytes(32), 1).sample(params, b"bench", [True, True])
    sampler = BGGPolyEncodingSampler(params, secrets, num_slots, None, seed=4)
    pts = [[Poly.const(params, v) for v in range(num_slots)]] * 2
    encs = sampler.sample(params, pk, pts)
    e1, e2 = encs[1], encs[2]
    costs = {
        ADD: benchmark_gate_operation(
            iterations, lambda: force((e1 + e2).vectors.data)
        ),
        MUL: benchmark_gate_operation(
            iterations, lambda: force((e1 * e2).vectors.data)
        ),
    }
    costs[SUB] = costs[ADD]
    costs[SMALL_SCALAR_MUL] = costs[ADD]
    costs[LARGE_SCALAR_MUL] = costs[MUL]
    costs[PUB_LUT] = (
        lut_cost if lut_cost is not None
        else num_slots * measure_lwe_lut_online_cost(params, 1, iterations)
    )
    return GateCostModel(costs, default_cost=costs[MUL])


def measure_naive_vec_costs(params, num_slots: int = 2, iterations: int = 3,
                            lut_cost: float | None = None) -> GateCostModel:
    """Vector-of-scalar-wires cost model: slot ops run per slot (reference
    bench_estimator/naive_vec.rs); costs scale the scalar encoding model by
    the slot count."""
    scalar = measure_bgg_encoding_costs(params, 1, iterations, lut_cost)
    costs = {k: v * num_slots for k, v in scalar.costs.items()}
    return GateCostModel(costs, default_cost=scalar.default_cost * num_slots)
