"""Concrete Diamond-context noise refresh: a dirty absolute-channel encoding
comes out with FRESH error (exact at zero state error) and the same value."""

import random

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, TernaryDist, TrapdoorSampler, UniformSampler
from mxx_tpu.bgg import BggEncoding, BggPublicKey
from mxx_tpu.noise_refresh import NoiseRefresher
from mxx_tpu.noise_refresh.refresh import DiamondNoiseRefresher

KEY = bytes(range(32))


def test_noise_refresh_removes_error(tmp_path):
    params = RingParams.new(4, 2, 17, 17)
    q = params.modulus
    ts = TrapdoorSampler(params, 4.578, seed=141)
    td0, b0 = ts.trapdoor(params, 2)

    us = UniformSampler(seed=142)
    sigma_poly = us.sample_poly(params, TernaryDist())
    k_int = 1
    state0 = PolyMatrix.from_poly_row(params, [sigma_poly, Poly.const(params, k_int)]) @ b0

    v_bits = 8
    nr = DiamondNoiseRefresher(params, ts, b0, td0, KEY, k_int, v_bits, base_bits=4)
    assert isinstance(nr, NoiseRefresher)
    delta = nr.delta

    # absolute-channel encoding of a Delta-aligned value x, then dirtied
    rng = random.Random(143)
    x = delta * rng.randrange(1, (q // delta) - 1)
    a_c = nr._hash_pk("wire_a_c")
    p_c = nr._abs_encoding_preimage(a_c, x)
    clean_vector = state0 @ p_c
    junk = us.sample_uniform(params, 1, clean_vector.ncol, FinRingDist())
    junk_small = junk.mul_int_scalar(1)  # uniform, then shrink below
    # build a small junk error: values < delta/8 via modulus trick
    import numpy as np
    import jax.numpy as jnp

    arr = np.asarray(junk.to_coeff().data)
    small = np.zeros_like(arr)
    small[:, :, :, 0] = 7  # tiny constant error on every entry
    from mxx_tpu.ring.poly import COEFF

    junk_small = PolyMatrix(jnp.asarray(small % np.array(params.moduli, dtype=np.uint32)[:, None, None, None]), COEFF, params)
    dirty = BggEncoding(clean_vector + junk_small, BggPublicKey(a_c, False), None)

    material = nr.preprocess(b"refresh0", a_c)
    refreshed = nr.online_eval(b"refresh0", state0, dirty, material)

    # exact fresh relation: c' == sigma * A' - x * G (state error is zero)
    g = PolyMatrix.gadget_matrix(params, 1)
    expected = refreshed.pubkey.matrix.mul_poly_scalar(sigma_poly) - g.mul_poly_scalar(
        Poly.const(params, x)
    )
    assert refreshed.vector == expected, "refreshed encoding must be exact (fresh error only)"

    # sanity: the dirty wire did NOT satisfy the exact relation
    dirty_expected = a_c.mul_poly_scalar(sigma_poly) - g.mul_poly_scalar(Poly.const(params, x))
    assert not (dirty.vector == dirty_expected)
