"""AKY24-iO carrier: simulation + crt-depth search."""

import mxx_tpu  # noqa: F401

from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.io_protocols import Aky24IO, aky24_io_find_crt_depth, simulate_aky24_io
from mxx_tpu.lookup import PublicLut
from mxx_tpu.ring.params import RingParams


def make_circuit(params):
    c = PolyCircuit()
    w = c.input(2)
    lut = PublicLut.from_dict(params, {x: (x, x % 3) for x in range(9)})
    lid = c.register_public_lut(lut)
    m = c.mul_gate(w[0], w[1])
    c.output([c.public_lookup_gate(m, lid)])
    return c


IO_KW = dict(
    bgg_tag=b"aky24",
    input_size=2,
    output_size=1,
    seed_bits=32,
    prf_batch_bits=1,
    prf_mask_output_coeff_bits=4,
    noise_refresh_v_bits=8,
    noise_refresh_cbd_n=4,
)


def test_simulation_margin():
    params = RingParams.new(16, 4, 28, 7)
    io = Aky24IO(params=params, **IO_KW)
    sim = simulate_aky24_io(io, make_circuit(params))
    assert sim.ok and sim.decode_margin_bits > 0
    assert io.prf_rounds == 2
    assert io.minimum_seed_bits() >= 5


def test_crt_depth_search():
    found = aky24_io_find_crt_depth(make_circuit, 16, 28, 7, 6, IO_KW)
    assert found is not None
    depth, params = found
    assert 1 <= depth <= 6
    # the found depth actually satisfies the margin
    sim = simulate_aky24_io(Aky24IO(params=params, **IO_KW), make_circuit(params))
    assert sim.ok
