"""ctypes wrapper for the C++ CLIP BPE encoder (``native/tokenizer.cpp``).

Mirrors the reference's native tokenizer layer (``helpers/utils.mojo:228-327``
is compiled Mojo) with the real CLIP algorithm.  The native path handles
ASCII prompts (the overwhelming serving case); any non-ASCII text — or a
missing/unbuildable .so — transparently falls back to the pure-Python
:class:`sdtpu.tokenizer.bpe.CLIPTokenizer`, which is the behavioral oracle
the native path is tested against token-for-token.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

from sdtpu.tokenizer.bpe import CLIPTokenizer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsdtpu_native.so")


def _load_lib(build: bool = True) -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.sdtpu_tokenizer_create.restype = ctypes.c_void_p
    lib.sdtpu_tokenizer_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.sdtpu_tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.sdtpu_tokenizer_encode.restype = ctypes.c_int64
    lib.sdtpu_tokenizer_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.sdtpu_tokenizer_bos.restype = ctypes.c_int64
    lib.sdtpu_tokenizer_bos.argtypes = [ctypes.c_void_p]
    lib.sdtpu_tokenizer_eos.restype = ctypes.c_int64
    lib.sdtpu_tokenizer_eos.argtypes = [ctypes.c_void_p]
    return lib


class NativeCLIPTokenizer:
    """Drop-in for :class:`CLIPTokenizer.encode` with a native fast path."""

    def __init__(self, vocab_file: str, merges_file: str):
        self.fallback = CLIPTokenizer.from_files(vocab_file, merges_file)
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            handle = self._lib.sdtpu_tokenizer_create(
                vocab_file.encode(), merges_file.encode()
            )
            if handle:
                self._handle = ctypes.c_void_p(handle)

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    @property
    def bos_id(self) -> int:
        return self.fallback.bos_id

    @property
    def eos_id(self) -> int:
        return self.fallback.eos_id

    def encode(
        self, text: str, *, max_length: Optional[int] = 77, pad: bool = True
    ) -> List[int]:
        if (
            self._handle is not None
            and text.isascii()
            and max_length is not None
            and pad
        ):
            buf = (ctypes.c_int64 * max_length)()
            n = self._lib.sdtpu_tokenizer_encode(
                self._handle, text.encode(), buf, max_length
            )
            if n > 0:
                return list(buf[:n])
        return self.fallback.encode(text, max_length=max_length, pad=pad)

    def decode(self, ids, **kw) -> str:
        return self.fallback.decode(ids, **kw)

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.sdtpu_tokenizer_destroy(self._handle)
