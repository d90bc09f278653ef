"""WEE25 commitment: binding relation commit*V == msg - B*opening."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, UniformSampler
from mxx_tpu.commit import MsgMatrixStream, Wee25Commit

KEY = bytes([7] * 32)
SIGMA = 4.578


def make_scheme(params, d=1, tree_base=2):
    k = params.modulus_digits
    return Wee25Commit(d, tree_base, d * (k + 2), d * k, SIGMA)


def test_wee25_single_level_commit_open_verify():
    params = RingParams.new(4, 2, 17, 17)  # log_q = 2, tiny sizes
    scheme = make_scheme(params)
    pp = scheme.sample_public_params(params, KEY, seed=61)
    us = UniformSampler(seed=62)
    blocks = [
        us.sample_uniform(params, scheme.d, scheme.m_b, FinRingDist())
        for _ in range(scheme.tree_base)
    ]
    stream = MsgMatrixStream.from_blocks(blocks)
    commitment, cache = scheme.commit(params, stream, pp)
    assert commitment.shape == (scheme.d, scheme.m_b)
    msg = blocks[0].concat_columns(blocks[1:])
    opening = scheme.open(params, stream, None, pp, cache)
    assert scheme.verify(params, msg, commitment, opening, None, pp)
    # single-block opening also verifies
    op0 = scheme.open(params, stream, range(0, 1), pp, cache)
    assert scheme.verify(params, msg, commitment, op0, range(0, 1), pp)
    # tampered message fails
    bad = msg + PolyMatrix.identity(params, scheme.d).concat_columns(
        [PolyMatrix.zero(params, scheme.d, msg.ncol - scheme.d)]
    )
    assert not scheme.verify(params, bad, commitment, opening, None, pp)


def test_wee25_two_level_tree():
    params = RingParams.new(4, 2, 17, 17)
    scheme = make_scheme(params)
    pp = scheme.sample_public_params(params, KEY, seed=63)
    us = UniformSampler(seed=64)
    nblocks = scheme.tree_base**2
    blocks = [
        us.sample_uniform(params, scheme.d, scheme.m_b, FinRingDist())
        for _ in range(nblocks)
    ]
    stream = MsgMatrixStream.from_blocks(blocks)
    commitment, cache = scheme.commit(params, stream, pp)
    msg = blocks[0].concat_columns(blocks[1:])
    opening = scheme.open(params, stream, range(1, 3), pp, cache)
    assert scheme.verify(params, msg, commitment, opening, range(1, 3), pp)
