"""Native (C++) runtime components, bound via ctypes.

Currently: the jsonl passage loader (jsonl_loader.cpp) — compiled on first use with
g++ into a per-repo shared library. `NativePassageStore` wraps the loaded blob with a
lazy sequence interface (len / getitem -> passage dict), so 33M passages cost one
contiguous allocation instead of 33M python dicts until they are actually touched.

Falls back cleanly: importers should catch ImportError/OSError and use the python
loader (atlas_tpu/index/io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "jsonl_loader.cpp")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB = os.path.join(_LIB_DIR, "libatlas_native.so")

_lib = None


def _compile() -> None:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _compile()
    lib = ctypes.CDLL(_LIB)
    lib.atlas_load_jsonl.restype = ctypes.c_void_p
    lib.atlas_load_jsonl.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.atlas_blob.restype = ctypes.POINTER(ctypes.c_char)
    lib.atlas_blob.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.atlas_offsets.restype = ctypes.POINTER(ctypes.c_int64)
    lib.atlas_offsets.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.atlas_error.restype = ctypes.c_char_p
    lib.atlas_error.argtypes = [ctypes.c_void_p]
    lib.atlas_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativePassageStore(Sequence):
    """Lazy sequence of passage dicts backed by the native loader's blob."""

    def __init__(self, filenames: List[str], world_size: int = 1, rank: int = 0,
                 maxload: int = -1):
        lib = get_lib()
        arr = (ctypes.c_char_p * len(filenames))(*[f.encode() for f in filenames])
        n = ctypes.c_int64()
        self._handle = lib.atlas_load_jsonl(arr, len(filenames), world_size, rank, maxload,
                                            ctypes.byref(n))
        if n.value < 0:
            err = lib.atlas_error(self._handle).decode()
            lib.atlas_free(self._handle)
            self._handle = None
            raise ValueError(f"native jsonl loader: {err}")
        self._n = n.value
        blob_size = ctypes.c_int64()
        blob_ptr = lib.atlas_blob(self._handle, ctypes.byref(blob_size))
        self._blob = bytes(ctypes.cast(blob_ptr, ctypes.POINTER(ctypes.c_char * blob_size.value)).contents)
        off_count = ctypes.c_int64()
        off_ptr = lib.atlas_offsets(self._handle, ctypes.byref(off_count))
        self._offsets = np.ctypeslib.as_array(off_ptr, shape=(off_count.value,)).copy()
        lib.atlas_free(self._handle)
        self._handle = None

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(self._n))]
        if i < 0:
            i += self._n
        if not 0 <= i < self._n:
            raise IndexError(i)
        o = self._offsets[4 * i : 4 * i + 4]
        return {
            "id": self._blob[o[0]:o[1]].decode("utf-8"),
            "title": self._blob[o[1]:o[2]].decode("utf-8"),
            "text": self._blob[o[2]:o[3]].decode("utf-8"),
        }
