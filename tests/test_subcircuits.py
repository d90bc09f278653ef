"""Sub-circuit calls, parameter binding, summed calls, and JSON serde."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.circuit.circuit import PARAM_SMALL_SCALAR_MUL
from mxx_tpu.circuit.serde import circuit_from_json, circuit_to_json


def test_sub_circuit_call_basic():
    params = RingParams.default()
    main = PolyCircuit()
    w = main.input(2)
    sub = main.fresh_sub_circuit()
    sw = sub.input(2)
    s_out = sub.mul_gate(sub.add_gate(sw[0], sw[1]), sw[0])
    sub.output([s_out])
    cid = main.register_sub_circuit(sub)
    outs = main.call_sub_circuit(cid, [w[0], w[1]])
    outs2 = main.call_sub_circuit(cid, [w[1], w[0]])
    main.output(outs + outs2)

    x, y = Poly.const(params, 3), Poly.const(params, 5)
    got = main.eval(params, Poly.one(params), [x, y])
    assert got[0] == (x + y) * x
    assert got[1] == (y + x) * y


def test_sub_circuit_param_binding():
    params = RingParams.default()
    main = PolyCircuit()
    w = main.input(1)
    sub = main.fresh_sub_circuit()
    sw = sub.input(1)
    pid = sub.register_sub_circuit_param(PARAM_SMALL_SCALAR_MUL)
    s_out = sub.small_scalar_mul_param(sw[0], pid)
    sub.output([s_out])
    cid = main.register_sub_circuit(sub)
    o1 = main.call_sub_circuit(cid, [w[0]], param_bindings=((2,),))
    o2 = main.call_sub_circuit(cid, [w[0]], param_bindings=((7,),))
    main.output(o1 + o2)
    x = Poly.const(params, 3)
    got = main.eval(params, Poly.one(params), [x])
    assert got[0].const_coeff() == 6
    assert got[1].const_coeff() == 21


def test_summed_sub_circuit_call():
    params = RingParams.default()
    main = PolyCircuit()
    w = main.input(4)
    sub = main.fresh_sub_circuit()
    sw = sub.input(2)
    sub.output([sub.mul_gate(sw[0], sw[1])])
    cid = main.register_sub_circuit(sub)
    outs = main.call_sub_circuit_sum_many(cid, [[w[0], w[1]], [w[2], w[3]]])
    main.output(outs)
    vals = [Poly.const(params, v) for v in (2, 3, 4, 5)]
    got = main.eval(params, Poly.one(params), vals)
    assert got[0].const_coeff() == 2 * 3 + 4 * 5


def test_circuit_serde_roundtrip():
    params = RingParams.default()
    main = PolyCircuit()
    w = main.input(2)
    sub = main.fresh_sub_circuit()
    sw = sub.input(2)
    pid = sub.register_sub_circuit_param(PARAM_SMALL_SCALAR_MUL)
    sub.output([sub.small_scalar_mul_param(sub.add_gate(sw[0], sw[1]), pid)])
    cid = main.register_sub_circuit(sub)
    outs = main.call_sub_circuit(cid, [w[0], w[1]], param_bindings=((3,),))
    m = main.mul_gate(outs[0], w[0])
    ls = main.large_scalar_mul(m, [params.modulus - 1])
    main.output([ls])

    raw = circuit_to_json(main)
    back = circuit_from_json(raw)
    x, y = Poly.const(params, 2), Poly.const(params, 4)
    want = main.eval(params, Poly.one(params), [x, y])
    got = back.eval(params, Poly.one(params), [x, y])
    assert want[0] == got[0]
    # second serde pass is stable
    assert circuit_to_json(back) == raw
