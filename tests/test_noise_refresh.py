"""Concrete Diamond-context noise refresh: a dirty absolute-channel encoding
comes out with FRESH error (exact at zero state error) and the same value."""

import random

import pytest

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


@pytest.mark.slow
def test_naive_vec_crt_split_refresh(tmp_path):
    """CRT-level-split refresh: dirty per-level twisted-residue wires come out
    fresh and recompose into one exact encoding of x_hat ~ x (within the
    q/2^v rounding budget)."""
    import numpy as np
    import jax.numpy as jnp

    from mxx_tpu.bgg import BggEncoding, BggPublicKey
    from mxx_tpu.ring.poly import COEFF
    from mxx_tpu.noise_refresh.refresh import NoiseRefresherNaiveVec

    # small circuit base keeps the G^{-1} error amplification below the
    # per-level rounding grid (pre_rounding_bound_holds)
    params = RingParams.new(4, 2, 17, 4)
    q = params.modulus
    ts = TrapdoorSampler(params, 4.578, seed=151)
    td0, b0 = ts.trapdoor(params, 2)
    us = UniformSampler(seed=152)
    sigma_poly = us.sample_poly(params, TernaryDist())
    state0 = PolyMatrix.from_poly_row(params, [sigma_poly, Poly.const(params, 1)]) @ b0

    v_bits = 6
    nr = NoiseRefresherNaiveVec(params, ts, b0, td0, KEY, 1, v_bits, base_bits=4)
    rng = random.Random(153)
    x = rng.randrange(q)
    ys = nr.encode_values(x)
    assert sum(y * (q // q_i) for y, q_i in zip(ys, params.moduli)) % q == x

    a_cs, encs = [], []
    for i, (lvl, y) in enumerate(zip(nr.levels, ys)):
        a_c = lvl._hash_pk(f"nv_wire_{i}")
        clean = state0 @ lvl._abs_encoding_preimage(a_c, y)
        small = np.zeros((params.crt_depth, 1, clean.ncol, params.n), dtype=np.uint32)
        small[:, :, 0, 0] = 1  # tiny error; amplified by G^{-1} but < delta/2
        dirty = clean + PolyMatrix(jnp.asarray(small), COEFF, params)
        a_cs.append(a_c)
        encs.append(BggEncoding(dirty, BggPublicKey(a_c, False), None))

    materials = nr.preprocess(b"nv", a_cs, rng)
    refreshed, recomposed, x_hat = nr.online_eval(b"nv", state0, encs, materials)
    assert len(refreshed) == params.crt_depth

    g = PolyMatrix.gadget_matrix(params, 1)
    expected = recomposed.pubkey.matrix.mul_poly_scalar(sigma_poly) - g.mul_poly_scalar(
        Poly.const(params, x_hat)
    )
    assert recomposed.vector == expected, "recomposed wire must be exact/fresh"

    # rounding residual bound: sum_i (Delta_i/2 + 1) * (q / q_i)
    bound = sum(
        (lvl.delta // 2 + 1) * (q // q_i)
        for lvl, q_i in zip(nr.levels, params.moduli)
    )
    diff = (x_hat - x) % q
    diff = min(diff, q - diff)
    assert diff <= bound, (diff, bound)
