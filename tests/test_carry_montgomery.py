"""Carry-arith + Montgomery in-circuit big-int tests vs Python ints."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.lookup import PolyPltEvaluator
from mxx_tpu.gadgets.arith.carry_montgomery import (
    CarryArithContext,
    CarryArithPoly,
    MontgomeryContext,
)

LIMB_BITS = 4
NUM_LIMBS = 4


def run(circuit, params, input_values, out_wires):
    circuit.output(out_wires)
    plain = [Poly.const(params, v) for v in input_values]
    res = circuit.eval(params, Poly.one(params), plain, plt_evaluator=PolyPltEvaluator())
    return [r.const_coeff() for r in res]


def test_carry_add_mul():
    params = RingParams.default()
    circuit = PolyCircuit()
    ctx = CarryArithContext(circuit, params, LIMB_BITS, NUM_LIMBS)
    a_val, b_val = 30000, 25000
    a = CarryArithPoly.input(ctx, circuit)
    b = CarryArithPoly.input(ctx, circuit)
    s = a.add(b, circuit).normalize(circuit)
    p = a.mul(b, circuit)  # truncated to num_limbs (mod base^k)
    vals = run(
        circuit,
        params,
        CarryArithPoly.encode(ctx, a_val) + CarryArithPoly.encode(ctx, b_val),
        s.limbs + p.limbs,
    )
    base_k = ctx.base**NUM_LIMBS
    assert CarryArithPoly.decode(ctx, vals[:NUM_LIMBS]) == (a_val + b_val) % base_k
    assert CarryArithPoly.decode(ctx, vals[NUM_LIMBS:]) == (a_val * b_val) % base_k


def test_montgomery_mul():
    params = RingParams.default()
    circuit = PolyCircuit()
    ctx = CarryArithContext(circuit, params, LIMB_BITS, NUM_LIMBS)
    n_mod = 64513  # odd modulus < 2^16
    mont = MontgomeryContext(ctx, n_mod)
    rng = random.Random(13)
    x, y = rng.randrange(n_mod), rng.randrange(n_mod)
    xm, ym = mont.to_mont_value(x), mont.to_mont_value(y)
    a = CarryArithPoly.input(ctx, circuit)
    b = CarryArithPoly.input(ctx, circuit)
    prod = mont.mont_mul(a, b, circuit)
    vals = run(
        circuit,
        params,
        CarryArithPoly.encode(ctx, xm) + CarryArithPoly.encode(ctx, ym),
        prod.limbs,
    )
    got = CarryArithPoly.decode(ctx, vals)
    # result is xm*ym*R^{-1} mod N (up to +N); converting back recovers x*y
    assert mont.from_mont_value(got % n_mod) == x * y % n_mod or (
        mont.from_mont_value((got - n_mod) % n_mod) == x * y % n_mod
    )
