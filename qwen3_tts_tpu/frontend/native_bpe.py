"""ctypes binding for the native C++ BPE core (native/qbpe.cpp).

The merge loop and vocab/byte-fallback lookup run in C++ when the shared
library is available (built by `python -m qwen3_tts_tpu.frontend.native_bpe`
or `make -C native`); the pure-Python path in tokenizer.py is the fallback.
Disable with QWEN3TTS_NATIVE_BPE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB_NAME = "libqbpe.so"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, _LIB_NAME)

_lib = None


def build_library(force: bool = False) -> str | None:
    """Compile native/qbpe.cpp -> native/libqbpe.so. Returns the path or None
    when no compiler is available."""
    src = os.path.join(_NATIVE_DIR, "qbpe.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    return _LIB_PATH


def load_library():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("QWEN3TTS_NATIVE_BPE") == "0":
        return None
    path = _LIB_PATH if os.path.exists(_LIB_PATH) else build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.qbpe_new.restype = ctypes.c_void_p
    lib.qbpe_free.argtypes = [ctypes.c_void_p]
    lib.qbpe_add_token.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int32,
    ]
    lib.qbpe_add_merge.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int32,
    ]
    lib.qbpe_encode_word.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.qbpe_encode_word.restype = ctypes.c_int
    _lib = lib
    return lib


class NativeBpe:
    """Owns a C++ BPE handle loaded with a vocab + merge table."""

    MAX_OUT = 4096

    def __init__(self, vocab: dict[str, int], merges: dict[str, int]):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.qbpe_new())
        for token, tid in vocab.items():
            b = token.encode("utf-8")
            lib.qbpe_add_token(self._h, b, len(b), tid)
        for pair, rank in merges.items():
            left, _, right = pair.partition(" ")
            lb, rb = left.encode("utf-8"), right.encode("utf-8")
            lib.qbpe_add_merge(self._h, lb, len(lb), rb, len(rb), rank)
        self._out = (ctypes.c_int32 * self.MAX_OUT)()

    def encode_word(self, word: str) -> list[int] | None:
        """BPE-encode one pre-split, pre-mapped word (Ġ/Ċ already applied).

        Returns None when the word's id count exceeds MAX_OUT (pathological
        unbroken runs); callers fall back to the pure-Python path, which has
        no buffer limit — a valid input must never become a crash."""
        b = word.encode("utf-8")
        n = self._lib.qbpe_encode_word(self._h, b, len(b), self._out, self.MAX_OUT)
        if n < 0:
            return None
        return list(np.frombuffer(self._out, np.int32, n))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.qbpe_free(h)
            self._h = None


if __name__ == "__main__":
    path = build_library(force="--force" in sys.argv)
    print(path if path else "build failed (g++ unavailable?)")
