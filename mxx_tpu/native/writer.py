"""ctypes bindings for the native async artifact writer (native/writer.cpp).

Falls back to synchronous Python writes when no compiler is available."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_SRC = Path(__file__).resolve().parents[2] / "native" / "writer.cpp"
_LIB = _SRC.parent / "libmxxwriter.so"
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
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", str(_LIB), str(_SRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.mxx_writer_init.argtypes = [ctypes.c_uint32]
        lib.mxx_writer_submit.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        lib.mxx_writer_errors.restype = ctypes.c_uint64
        lib.mxx_writer_init(4)
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def writer_available() -> bool:
    return _load() is not None


def submit_write(path, raw: bytes):
    lib = _load()
    if lib is None:
        Path(path).write_bytes(raw)
        return
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    lib.mxx_writer_submit(str(path).encode(), buf, len(raw))


def wait_all_writes():
    lib = _load()
    if lib is not None:
        lib.mxx_writer_wait_all()


def write_errors() -> int:
    lib = _load()
    return 0 if lib is None else int(lib.mxx_writer_errors())
