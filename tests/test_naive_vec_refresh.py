"""Reference-style noise refresh (subtract -> round -> CRT recompose) over
scalar BGG wires: a dirty relative-channel encoding comes out FRESH under the
hash-derived A' pubkey with the same value, the input error rounded away, and
only the PRG-material error surviving (naive_vec.rs semantics)."""

import random

import numpy as np

import pytest

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.ring.poly import Poly
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.circuit import PolyCircuit
from mxx_tpu.gadgets.fhe import RingGswContext
from mxx_tpu.gadgets.fhe.ring_gsw import native_encrypt
from mxx_tpu.bgg import BGGPublicKeySampler, BGGEncodingSampler, BggEncoding, BggPublicKey
from mxx_tpu.lookup.debug import DebugBGGPubKeyPltEvaluator, DebugBGGEncodingPltEvaluator
from mxx_tpu.noise_refresh.naive_vec import NoiseRefresherNaiveVec, RefreshMaterialCts
from mxx_tpu.sampler import TernaryDist, UniformSampler
from mxx_tpu.utils.rng import Drbg

KEY = bytes(range(32))


def _material(ctx, params, k_int, v_bits, rng, digits):
    """Valid material ciphertexts: CBD errors (here fixed small values) and
    random mask bits, per gadget digit."""
    n = params.n
    errors, masks = [], []
    for _ in range(digits):
        errors.append([native_encrypt(ctx, k_int, rng.choice([-1, 0, 1]) % 3 - 1 if False else rng.randrange(2), rng) for _ in range(n)])
        masks.append([
            native_encrypt(ctx, k_int, rng.randrange(2), rng)
            for _ in range(params.crt_depth * n * v_bits)
        ])
    return RefreshMaterialCts(errors=errors, masks=masks)


@pytest.mark.slow
def test_refresh_preserves_value_and_strips_input_error():
    # crt_depth=3: the rounding threshold per level is qhat_i/2 = (product of
    # the OTHER limbs)/2; the input error is amplified by G^{-1}(qhat G)'s
    # base-size digits, so qhat must span >= 2 limbs at toy scale (at
    # reference scale qhat_i ~ 2^{50*28} and this is never binding)
    params = RingParams.new(4, 3, 10, 10)
    q = params.modulus
    circuit = PolyCircuit()
    ctx = RingGswContext(circuit, params, 5, max_unreduced_muls=1)
    assert ctx.q_big == q, "nested-RNS modulus must be the ring modulus"

    k_int = -1
    v_bits = 1
    rng = Drbg(71)
    nr = NoiseRefresherNaiveVec(params, ctx, v_bits, KEY)
    # one gadget digit of material keeps the decrypt circuit CI-sized;
    # unmasked digit columns still round correctly (masking is a hiding
    # property, not a correctness requirement)
    material = _material(ctx, params, k_int, v_bits, rng, 1)

    # BGG wires under secret s: one, the refreshed input x, and -k
    us = UniformSampler(seed=72)
    sec = us.sample_poly(params, TernaryDist())
    pks = BGGPublicKeySampler(KEY, 1).sample(params, b"nrv", [True, True])
    one_pk, x_pk, negk_pk = pks[0], pks[1], pks[2]
    x_val = 123457 % q
    es = BGGEncodingSampler(params, [sec], gauss_sigma=None, seed=73)
    encs = es.sample(
        params, pks, [Poly.const(params, x_val), Poly.const(params, -k_int)]
    )
    one_enc, x_enc, negk_enc = encs[0], encs[1], encs[2]

    # offline: refresh keys + decoders (here directly s @ T_i; DiamondIO uses
    # the stored trapdoor preimage of [T_i; 0], which equals this up to the
    # preimage error the rounding absorbs)
    a_prime_pk, refresh_keys = nr.preprocess(
        b"wire0", one_pk, x_pk, negk_pk, material, DebugBGGPubKeyPltEvaluator(KEY)
    )
    s_row = es.secret_vec
    decoders = [s_row @ t for t in refresh_keys]

    # dirty the input encoding with a deliberate sub-threshold error
    junk = np.zeros(
        (params.crt_depth, 1, x_enc.vector.ncol, params.n), dtype=np.uint32
    )
    junk[:, :, :, 0] = 3  # constant error on every column (amplified ~1000x by G^-1)
    from mxx_tpu.ring.poly import COEFF
    import jax.numpy as jnp

    dirty = BggEncoding(
        x_enc.vector + PolyMatrix(jnp.asarray(junk), COEFF, params).to_eval(),
        x_enc.pubkey,
        x_enc.plaintext,
    )

    refreshed = nr.online_eval(
        b"wire0", one_enc, dirty, negk_enc, material, decoders,
        DebugBGGEncodingPltEvaluator(KEY, s_row),
    )

    # fresh-relation check against the secret: refreshed = s(A' - x G) + eps,
    # with eps ONLY from the material CBD errors (small), the 97-junk gone.
    gadget = PolyMatrix.gadget_matrix(params, 1)
    want = s_row @ (
        a_prime_pk.matrix - gadget.mul_poly_scalar(Poly.const(params, x_val))
    )
    diff = refreshed.vector - want
    max_err = 0
    for j in range(diff.ncol):
        for c in diff.entry(0, j).coeffs():
            centered = c if c <= q // 2 else c - q
            max_err = max(max_err, abs(centered))
    # eps = cbd * s per column: |cbd| <= 1, |s poly conv| <= n
    assert max_err <= params.n * 2, f"refreshed error too large: {max_err}"
    assert refreshed.pubkey.matrix == a_prime_pk.matrix
