"""ctypes wrapper for the C++ mmap safetensors reader
(``native/safetensors_reader.cpp``) — the build's native analogue of the
reference's ``FileBuf``/``read_file`` weight-file machinery
(``helpers/utils.mojo:63-141``).

Returns zero-copy numpy views into the mapped file (valid while the reader is
open); ``load(path)`` materializes an owned dict compatible with
``safetensors.numpy.load_file`` and is used by ``utils/weights.py`` when the
native library is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libsdtpu_native.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled via uint16 view + ml_dtypes
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}

_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.sdtpu_st_open.restype = ctypes.c_void_p
        lib.sdtpu_st_open.argtypes = [ctypes.c_char_p]
        lib.sdtpu_st_count.restype = ctypes.c_int64
        lib.sdtpu_st_count.argtypes = [ctypes.c_void_p]
        lib.sdtpu_st_name.restype = ctypes.c_char_p
        lib.sdtpu_st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.sdtpu_st_info.restype = ctypes.c_void_p
        lib.sdtpu_st_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sdtpu_st_nbytes.restype = ctypes.c_int64
        lib.sdtpu_st_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.sdtpu_st_close.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeSafetensors:
    """Open a .safetensors file with zero-copy tensor access."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        handle = lib.sdtpu_st_open(path.encode())
        if not handle:
            raise IOError(f"cannot open safetensors file: {path}")
        self._handle = ctypes.c_void_p(handle)

    def keys(self) -> List[str]:
        n = self._lib.sdtpu_st_count(self._handle)
        return [
            self._lib.sdtpu_st_name(self._handle, i).decode() for i in range(n)
        ]

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view (valid while this reader is open)."""
        dtype_buf = ctypes.create_string_buffer(16)
        shape = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int64()
        ptr = self._lib.sdtpu_st_info(
            self._handle, name.encode(), dtype_buf, shape, ctypes.byref(ndim)
        )
        if not ptr:
            raise KeyError(name)
        nbytes = self._lib.sdtpu_st_nbytes(self._handle, name.encode())
        dtype_str = dtype_buf.value.decode()
        shp = tuple(shape[i] for i in range(ndim.value))
        raw = (ctypes.c_uint8 * nbytes).from_address(ptr)
        arr = np.frombuffer(raw, dtype=np.uint8)
        if dtype_str == "BF16":
            import ml_dtypes

            return arr.view(ml_dtypes.bfloat16).reshape(shp)
        np_dtype = _DTYPES.get(dtype_str)
        if np_dtype is None:
            raise ValueError(f"unsupported dtype {dtype_str!r}")
        return arr.view(np_dtype).reshape(shp)

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.sdtpu_st_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load(path: str) -> Dict[str, np.ndarray]:
    """Owned-copy load, drop-in for ``safetensors.numpy.load_file``."""
    with NativeSafetensors(path) as f:
        return {k: np.array(f.tensor(k)) for k in f.keys()}
