"""Polynomial-matrix algebra tests against Python-int ground truth."""

import numpy as np
import pytest

import mxx_tpu  # noqa: F401
import jax.numpy as jnp

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import COEFF, EVAL, Poly
from mxx_tpu.matrix import PolyMatrix

from reference_impl import poly_matmul


def rand_matrix(rng, params, nrow, ncol, bound=None):
    """Random COEFF-form matrix + its Python-int coefficient list."""
    q = params.modulus
    hi = bound if bound is not None else q
    rint = lambda: int.from_bytes(rng.bytes(16), "little") % hi
    ints = [
        [[rint() for _ in range(params.n)] for _ in range(ncol)]
        for _ in range(nrow)
    ]
    mat = PolyMatrix.from_polys(
        params, [[Poly.from_int_coeffs(params, c) for c in row] for row in ints]
    )
    return mat, ints


def mat_coeffs(mat):
    """Big-int coefficients [r][c][n] of a PolyMatrix."""
    return [
        [mat.entry(i, j).coeffs() for j in range(mat.ncol)] for i in range(mat.nrow)
    ]


@pytest.mark.parametrize("n,depth,crt_bits,shape", [(4, 2, 17, (2, 3, 2)), (16, 3, 26, (1, 4, 5))])
def test_matmul_exact(n, depth, crt_bits, shape):
    params = RingParams.new(n, depth, crt_bits, 1)
    rng = np.random.default_rng(10)
    r, k, c = shape
    a, a_ints = rand_matrix(rng, params, r, k)
    b, b_ints = rand_matrix(rng, params, k, c)
    got = mat_coeffs((a @ b).to_coeff())
    want = poly_matmul(a_ints, b_ints, params.modulus, n)
    assert got == want


def test_add_sub_neg():
    params = RingParams.default()
    rng = np.random.default_rng(11)
    a, a_ints = rand_matrix(rng, params, 2, 2)
    b, b_ints = rand_matrix(rng, params, 2, 2)
    q = params.modulus
    s = mat_coeffs(a + b)
    d = mat_coeffs(a - b)
    ng = mat_coeffs(-a)
    for i in range(2):
        for j in range(2):
            for t in range(params.n):
                assert s[i][j][t] == (a_ints[i][j][t] + b_ints[i][j][t]) % q
                assert d[i][j][t] == (a_ints[i][j][t] - b_ints[i][j][t]) % q
                assert ng[i][j][t] == (-a_ints[i][j][t]) % q


def test_identity_and_scalar():
    params = RingParams.default()
    rng = np.random.default_rng(12)
    a, _ = rand_matrix(rng, params, 3, 3)
    eye = PolyMatrix.identity(params, 3)
    assert (a @ eye) == a
    assert (eye @ a) == a
    s = Poly.const(params, 7)
    eye7 = PolyMatrix.identity(params, 3, s)
    assert (a @ eye7) == a.mul_int_scalar(7)


def test_gadget_decompose_identity():
    """G @ G^{-1}(X) == X — the core gadget identity."""
    for (n, depth, crt_bits, base_bits) in [(4, 2, 17, 1), (8, 3, 20, 5), (4, 2, 17, 17), (4, 3, 19, 7)]:
        params = RingParams.new(n, depth, crt_bits, base_bits)
        rng = np.random.default_rng(13)
        x, _ = rand_matrix(rng, params, 2, 3)
        g = PolyMatrix.gadget_matrix(params, 2)
        assert g.shape == (2, 2 * params.modulus_digits)
        dec = x.decompose()
        assert dec.shape == (2 * params.modulus_digits, 3)
        assert (g @ dec) == x
        # digits are bounded by the base
        digs = np.asarray(dec.data)
        # each digit < 2^base_bits (as residue, equal across limb after mod)
        assert digs.max() < max(params.base, max(params.moduli))


def test_small_gadget_decompose_identity():
    """G_small @ small_G^{-1}(X) == X for small-norm X (entries < min q_t)."""
    params = RingParams.new(4, 3, 19, 4)
    rng = np.random.default_rng(14)
    bound = min(params.moduli)
    x, _ = rand_matrix(rng, params, 2, 2, bound=bound)
    gs = PolyMatrix.small_gadget_matrix(params, 2)
    assert gs.shape == (2, 2 * params.digits_per_tower)
    dec = x.small_decompose()
    assert dec.shape == (2 * params.digits_per_tower, 2)
    assert (gs @ dec) == x


def test_mul_decompose_matches():
    params = RingParams.new(4, 2, 17, 2)
    rng = np.random.default_rng(15)
    k = params.modulus_digits
    a, _ = rand_matrix(rng, params, 1, 2 * k)
    b, _ = rand_matrix(rng, params, 2, 3)
    got = a.mul_decompose(b)
    want = a @ b.decompose()
    assert got == want
    # column-at-a-time equivalence (the reference's memory-bounded loop)
    cols = [a @ b.get_column_matrix_decompose(j) for j in range(3)]
    assert cols[0].concat_columns(cols[1:]) == want


def test_concat_and_slice():
    params = RingParams.default()
    rng = np.random.default_rng(16)
    a, _ = rand_matrix(rng, params, 2, 2)
    b, _ = rand_matrix(rng, params, 2, 3)
    c = a.concat_columns([b])
    assert c.shape == (2, 5)
    assert c.slice_columns(0, 2) == a
    assert c.slice_columns(2, 5) == b
    d = a.concat_rows([a])
    assert d.shape == (4, 2)
    assert d.slice_rows(2, 4) == a
    e = a.concat_diag([b])
    assert e.shape == (4, 5)
    assert e.slice(0, 2, 0, 2) == a
    assert e.slice(2, 4, 2, 5) == b
    assert e.slice(0, 2, 2, 5) == PolyMatrix.zero(params, 2, 3)


def test_tensor():
    params = RingParams.default()
    rng = np.random.default_rng(17)
    a, a_ints = rand_matrix(rng, params, 2, 1)
    b, b_ints = rand_matrix(rng, params, 1, 2)
    t = a.tensor(b)
    assert t.shape == (2, 2)
    from reference_impl import negacyclic_mul

    for i in range(2):
        for j in range(2):
            want = negacyclic_mul(a_ints[i][0], b_ints[0][j], params.modulus)
            assert t.entry(i, j).coeffs() == want


def test_transpose_and_eq():
    params = RingParams.default()
    rng = np.random.default_rng(18)
    a, _ = rand_matrix(rng, params, 2, 3)
    assert a.transpose().shape == (3, 2)
    assert a.transpose().transpose() == a


def test_compact_bytes_roundtrip():
    params = RingParams.default()
    rng = np.random.default_rng(19)
    a, _ = rand_matrix(rng, params, 2, 2)
    raw = a.to_compact_bytes()
    back = PolyMatrix.from_compact_bytes(params, raw)
    assert back == a
    ae = a.to_eval()
    back_e = PolyMatrix.from_compact_bytes(params, ae.to_compact_bytes())
    assert back_e.fmt == EVAL and back_e == a


def test_poly_roundtrips():
    params = RingParams.new(8, 2, 20, 3)
    rng = np.random.default_rng(20)
    coeffs = [int(rng.integers(0, params.modulus)) for _ in range(8)]
    p = Poly.from_int_coeffs(params, coeffs)
    assert p.coeffs() == coeffs
    assert p.const_coeff() == coeffs[0]
    # eval slots round-trip
    slots = [int(rng.integers(0, params.modulus)) for _ in range(8)]
    pe = Poly.from_ints_eval(params, slots)
    assert pe.eval_slots() == slots
    # decompose_base digit recomposition
    digits = p.decompose_base()
    assert len(digits) == params.modulus_digits
    recomposed = Poly.from_decomposed(params, digits)
    # positional digits only cover modulus_digits*base_bits bits
    covered = params.modulus_digits * params.base_bits
    if covered >= params.modulus_bits:
        assert recomposed == p
    # serde
    assert Poly.from_compact_bytes(params, p.to_compact_bytes()) == p


def test_mul_tensor_identity():
    params = RingParams.new(4, 2, 17, 4)
    rng = np.random.default_rng(21)
    other, _ = rand_matrix(rng, params, 2, 2)
    a, _ = rand_matrix(rng, params, 1, 6)
    got = a.mul_tensor_identity(other, 3)
    ident = PolyMatrix.identity(params, 3)
    want = a @ ident.tensor(other)
    assert got == want


@pytest.mark.parametrize("n,depth,crt_bits,new_mod", [(4, 2, 17, 2), (8, 3, 26, 1 << 16), (4, 2, 20, 3)])
def test_modulus_switch_device_matches_host(n, depth, crt_bits, new_mod):
    """Jitted CRT scale-and-round must match the exact BigInt rule."""
    params = RingParams.new(n, depth, crt_bits, 1)
    q = params.modulus
    rng = np.random.default_rng(7)
    mat, ints = rand_matrix(rng, params, 2, 3)
    got = mat.modulus_switch(new_mod)
    for i in range(2):
        for j in range(3):
            got_coeffs = got.entry(i, j).coeffs()
            for t in range(params.n):
                want = (ints[i][j][t] * new_mod + q // 2) // q % new_mod
                assert got_coeffs[t] == want, (i, j, t, got_coeffs[t], want)


def test_mul_decompose_column_chunking_exact(monkeypatch):
    """MXX_MUL_DECOMPOSE_COLUMN_CHUNK_WIDTH chunks G^{-1} column-wise without
    changing results (reference dcrt_poly.rs:248-274)."""
    from mxx_tpu.sampler import FinRingDist, UniformSampler

    params = RingParams.new(8, 2, 17, 5)
    us = UniformSampler(seed=31)
    k = params.modulus_digits
    a = us.sample_uniform(params, 1, 2 * k, FinRingDist())
    b = us.sample_uniform(params, 2, 7, FinRingDist())
    want = a.mul_decompose(b)
    monkeypatch.setenv("MXX_MUL_DECOMPOSE_COLUMN_CHUNK_WIDTH", "3")
    got = a.mul_decompose(b)
    assert got == want
