"""rlwe_enc, secret_ip, digits_to_int tests (mirroring reference inline tests)."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import BitDist, UniformSampler
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.rlwe_enc import rlwe_encrypt
from mxx_tpu.gadgets import secret_inner_product
from mxx_tpu.bgg import BGGEncodingSampler, BGGPublicKeySampler
from mxx_tpu.bgg.digits_to_int import digits_to_int


def test_rlwe_encrypt_decrypt():
    params = RingParams.default()
    sampler = UniformSampler(seed=31)
    sigma = 3.0
    m = sampler.sample_poly(params, BitDist())
    a = sampler.sample_poly(params, BitDist())
    t = sampler.sample_poly(params, BitDist())
    m_mat = PolyMatrix.from_poly_row(params, [m])
    a_mat = PolyMatrix.from_poly_row(params, [a])
    t_mat = PolyMatrix.from_poly_row(params, [t])
    b = rlwe_encrypt(params, sampler, t_mat, a_mat, m_mat, sigma)
    recovered = (b - a_mat @ t_mat).entry(0, 0)
    assert recovered.extract_bits_with_threshold() == m.to_bool_vec()


def test_secret_ip_three_way():
    params = RingParams.default()
    sampler = UniformSampler(seed=32)
    a = sampler.sample_poly(params, BitDist())
    t = sampler.sample_poly(params, BitDist())
    m = sampler.sample_poly(params, BitDist())
    a_mat = PolyMatrix.from_poly_row(params, [a])
    t_mat = PolyMatrix.from_poly_row(params, [t])
    m_mat = PolyMatrix.from_poly_row(params, [m])
    b = rlwe_encrypt(params, sampler, t_mat, a_mat, m_mat, 3.0).entry(0, 0)
    neg_t = -t

    circuit = PolyCircuit()
    public_inputs = circuit.input(2)
    secret_inputs = circuit.input(2)
    out = secret_inner_product(circuit, public_inputs, secret_inputs)
    circuit.output([out])

    one = Poly.one(params)
    poly_out = circuit.eval(params, one, [a, b, neg_t, one])
    expected = b + a * neg_t
    assert poly_out[0] == expected

    key = bytes(32)
    pk_sampler = BGGPublicKeySampler(key, 1)
    pubkeys = pk_sampler.sample(params, b"SECRET_IP_TEST", [True, True, False, False])
    pk_out = circuit.eval(params, pubkeys[0], pubkeys[1:])
    pk_expected = (pubkeys[1] * pubkeys[3]) + (pubkeys[2] * pubkeys[4])
    assert pk_out[0] == pk_expected

    secrets = [UniformSampler(seed=33).sample_poly(params, BitDist())]
    es = BGGEncodingSampler(params, secrets, None, seed=34)
    encodings = es.sample(params, pubkeys, [a, b, neg_t, one])
    enc_out = circuit.eval(params, encodings[0], encodings[1:])
    enc_expected = (encodings[1] * encodings[3]) + (encodings[2] * encodings[4])
    assert enc_out[0].vector == enc_expected.vector
    assert enc_out[0].pubkey == enc_expected.pubkey


def test_digits_to_int_poly():
    params = RingParams.new(8, 2, 20, 5)
    import random

    rng = random.Random(5)
    covered = params.modulus_digits * params.base_bits
    bound = min(params.modulus, 1 << covered)
    coeffs = [rng.randrange(bound) for _ in range(8)]
    p = Poly.from_int_coeffs(params, coeffs)
    digits = p.decompose_base()
    recomposed = digits_to_int(digits, params)
    assert recomposed == p
