"""Goldreich PRG tests: graph determinism, range streaming, predicate, CBD."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.gadgets.fhe_prg import (
    GoldreichFheCbdPrg,
    GoldreichFhePrg,
    GoldreichGraph,
    minimum_goldreich_input_size,
)

SEED = bytes(range(32))


def test_graph_deterministic_and_unique():
    g1 = GoldreichGraph.generate(32, 64, SEED)
    g2 = GoldreichGraph.generate(32, 64, SEED)
    assert g1.edges == g2.edges
    keys = {e.role_aware_key() for e in g1.edges}
    assert len(keys) == 64
    for e in g1.edges:
        assert len(set(e.all_inputs())) == 5
        assert all(0 <= i < 32 for i in e.all_inputs())


def test_range_generation_matches_full():
    full = GoldreichGraph.generate(32, 50, SEED)
    part = GoldreichGraph.generate_range(32, 50, 10, 20, SEED)
    assert part.edges == full.edges[10:30]


def test_min_input_size_bound():
    n = minimum_goldreich_input_size(1000)
    assert n**3 >= 1000**2
    assert (n - 1) ** 3 < 1000**2 or n == 5


def test_predicate_plaintext():
    prg = GoldreichFhePrg.setup(16, 32, SEED)
    rng = random.Random(4)
    seed_bits = [rng.randrange(2) for _ in range(16)]
    out = prg.evaluate_uniform(seed_bits)
    for e, y in zip(prg.graph.edges, out):
        a, b, c = (seed_bits[i] for i in e.xor_inputs)
        d, f = (seed_bits[i] for i in e.and_inputs)
        assert y == a ^ b ^ c ^ (d & f)
    # output is not constant (sanity)
    assert 0 < sum(out) < len(out)


class _PlainBit:
    """Minimal Boolean-ciphertext adapter over plain ints (xor/and_ surface)."""

    def __init__(self, b):
        self.b = b

    def xor(self, other, circuit):
        return _PlainBit(self.b ^ other.b)

    def and_(self, other, circuit):
        return _PlainBit(self.b & other.b)


def test_evaluate_matches_uniform_via_adapter():
    prg = GoldreichFhePrg.setup(12, 16, SEED)
    rng = random.Random(5)
    bits = [rng.randrange(2) for _ in range(12)]
    cts = [_PlainBit(b) for b in bits]
    got = [c.b for c in prg.evaluate(cts, None)]
    assert got == prg.evaluate_uniform(bits)


def test_cbd_prg():
    cbd = GoldreichFheCbdPrg(32, num_samples=8, eta=2, graph_seed=SEED)
    rng = random.Random(6)
    bits = [rng.randrange(2) for _ in range(32)]
    samples = cbd.evaluate_uniform(bits)
    assert len(samples) == 8
    assert all(-2 <= s <= 2 for s in samples)
    groups = cbd.evaluate([_PlainBit(b) for b in bits], None)
    recomposed = [
        sum(p.b for p in pos) - sum(n.b for n in neg) for pos, neg in groups
    ]
    assert recomposed == samples
