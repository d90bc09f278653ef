"""Out-of-core matrices: offload round-trip and streamed matmul equal the
in-memory results (reference matrix/base/disk.rs semantics)."""

import mxx_tpu  # noqa: F401

from mxx_tpu.ring.params import RingParams
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.matrix.offload import (
    matmul_offloaded_lhs,
    matmul_streamed,
    offload_matrix,
)
from mxx_tpu.sampler import FinRingDist, UniformSampler


def test_offload_roundtrip_and_streamed_matmul(tmp_path):
    params = RingParams.new(16, 2, 20, 5)
    us = UniformSampler(seed=41)
    a = us.sample_uniform(params, 2, 7, FinRingDist())
    b = us.sample_uniform(params, 7, 13, FinRingDist())
    want = a @ b

    off_b = offload_matrix(b, str(tmp_path / "b.mxmm"))
    assert off_b.load() == b
    got = matmul_streamed(a, off_b, chunk_cols=4)
    assert got == want

    off_a = offload_matrix(a)  # tempfile-owned
    got2 = matmul_offloaded_lhs(off_a, b, chunk_rows=1)
    assert got2 == want
    off_a.delete()

    win = off_b.load_columns(3, 9)
    assert win == b.slice_columns(3, 9)
