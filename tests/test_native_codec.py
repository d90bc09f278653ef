"""Native bit-packing codec: C++ build, roundtrip, compression ratio."""

import numpy as np

import mxx_tpu  # noqa: F401

from mxx_tpu.native import native_available, pack_u32, packed_size, unpack_u32
from mxx_tpu.ring.params import RingParams
from mxx_tpu.matrix import PolyMatrix
from mxx_tpu.sampler import FinRingDist, UniformSampler


def test_native_codec_builds_and_roundtrips():
    assert native_available(), "g++ is baked in; the native codec must build"
    rng = np.random.default_rng(0)
    for bits in (1, 7, 17, 28, 32):
        hi = (1 << bits) if bits < 32 else (1 << 32)
        vals = rng.integers(0, hi, size=1000, dtype=np.uint64).astype(np.uint32)
        raw = pack_u32(vals, bits)
        assert len(raw) == packed_size(1000, bits)
        back = unpack_u32(raw, 1000, bits)
        np.testing.assert_array_equal(back, vals)


def test_numpy_fallback_matches_native():
    from mxx_tpu.native import codec

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 17, size=257, dtype=np.uint64).astype(np.uint32)
    native_raw = pack_u32(vals, 17)
    lib = codec._lib
    codec._lib, codec._tried = None, True  # force fallback
    try:
        fallback_raw = pack_u32(vals, 17)
        assert fallback_raw == native_raw
        np.testing.assert_array_equal(unpack_u32(native_raw, 257, 17), vals)
    finally:
        codec._lib, codec._tried = lib, True


def test_matrix_packed_roundtrip_and_ratio():
    params = RingParams.default()  # crt_bits = 17
    us = UniformSampler(seed=5)
    m = us.sample_uniform(params, 3, 4, FinRingDist())
    raw = m.to_packed_bytes()
    back = PolyMatrix.from_packed_bytes(params, raw)
    assert back == m
    plain = m.to_compact_bytes()
    ratio = len(plain) / len(raw)
    assert ratio > 1.7  # ~32/17 bits per residue minus headers


def test_native_async_writer(tmp_path):
    from mxx_tpu.native.writer import submit_write, wait_all_writes, write_errors, writer_available

    assert writer_available()
    for i in range(32):
        submit_write(tmp_path / f"f{i}.bin", bytes([i]) * 1000)
    wait_all_writes()
    assert write_errors() == 0
    for i in range(32):
        assert (tmp_path / f"f{i}.bin").read_bytes() == bytes([i]) * 1000


def test_storage_buffer_splitting(tmp_path, monkeypatch):
    monkeypatch.setenv("LUT_BYTES_LIMIT", "100")
    from mxx_tpu.storage import (
        BatchLookupBuffer,
        StorageSystem,
    )

    sys_ = StorageSystem(tmp_path)
    payloads = [(i, bytes([i]) * 60) for i in range(5)]  # 300B > 100B limit
    sys_.add_buffer(BatchLookupBuffer("split_test", payloads))
    sys_.wait_for_all_writes()
    assert sys_._index["split_test"]["parts"] >= 3
    for i in range(5):
        assert sys_.read_bytes("split_test", i) == bytes([i]) * 60


def test_prg_range_plan():
    from mxx_tpu.decoder.prg import PrgRangePlan

    plan = PrgRangePlan()
    assert plan.allocate("seed", 32) == (0, 32)
    assert plan.allocate("masks", 16) == (32, 16)
    assert plan.total == 48
    assert plan.range_of("seed") == (0, 32)
