"""ctypes bindings for the native bit-packing codec (native/codec.cpp).

Builds the shared library on first use with g++ (cached beside the source);
falls back to a numpy implementation when no compiler is available, so the
package stays importable everywhere. Role parity:
/root/reference/cuda/src/matrix/MatrixSerde.cu (max-coeff-bits packing).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "codec.cpp"
_LIB = _SRC.parent / "libmxxcodec.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.mxx_pack_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mxx_unpack_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.mxx_packed_size.argtypes = [ctypes.c_uint64, ctypes.c_uint32]
        lib.mxx_packed_size.restype = ctypes.c_uint64
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def packed_size(count: int, bits: int) -> int:
    return (count * bits + 7) // 8


def pack_u32(values: np.ndarray, bits: int) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.uint32).ravel()
    lib = _load()
    if lib is not None:
        out = np.empty(packed_size(values.size, bits), dtype=np.uint8)
        lib.mxx_pack_u32(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            values.size,
            bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.tobytes()
    # numpy fallback: expand to bits then packbits little-endian
    mask = (1 << bits) - 1 if bits < 32 else 0xFFFFFFFF
    v = values & np.uint32(mask)
    bit_planes = ((v[:, None] >> np.arange(bits, dtype=np.uint32)[None, :]) & 1).astype(
        np.uint8
    )
    packed = np.packbits(bit_planes.ravel(), bitorder="little")
    return packed[: packed_size(values.size, bits)].tobytes()


def unpack_u32(raw: bytes, count: int, bits: int) -> np.ndarray:
    lib = _load()
    if lib is not None:
        inp = np.frombuffer(raw, dtype=np.uint8)
        out = np.empty(count, dtype=np.uint32)
        lib.mxx_unpack_u32(
            inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            count,
            bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return out
    bit_arr = np.unpackbits(np.frombuffer(raw, dtype=np.uint8), bitorder="little")
    bit_arr = bit_arr[: count * bits].reshape(count, bits).astype(np.uint32)
    return (bit_arr << np.arange(bits, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32
    )
