"""cffi bindings to the native metric kernels (csrc/metrics.cpp).

Builds the shared library on first use (g++, no external deps); all callers
fall back to pure Python automatically when compilation is unavailable.
String tokens are interned to int32 ids before crossing the FFI boundary.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional, Sequence

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_LIB_PATH = os.path.join(_CSRC, "libkvzip_metrics.so")

_ffi = None
_lib = None


def _build() -> str:
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(os.path.join(_CSRC, "metrics.cpp"))
            > os.path.getmtime(_LIB_PATH)):
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load():
    global _ffi, _lib
    if _lib is not None:
        return _lib
    import cffi

    _ffi = cffi.FFI()
    _ffi.cdef("""
        int32_t kvz_lcs_length(const int32_t*, int32_t, const int32_t*, int32_t);
        double kvz_rouge_l_f(const int32_t*, int32_t, const int32_t*, int32_t);
        double kvz_sentence_bleu(const int32_t*, int32_t, const int32_t*, int32_t);
        double kvz_token_f1(const int32_t*, int32_t, const int32_t*, int32_t);
    """)
    _lib = _ffi.dlopen(_build())
    return _lib


def _intern(a: Sequence[str], b: Sequence[str]):
    vocab = {}
    def ids(tokens):
        out = []
        for t in tokens:
            if t not in vocab:
                vocab[t] = len(vocab)
            out.append(vocab[t])
        return out
    return ids(a), ids(b)


def _as_i32(ffi, xs: List[int]):
    return ffi.new("int32_t[]", xs), len(xs)


def lcs_length(a: Sequence[str], b: Sequence[str]) -> int:
    lib = _load()
    ia, ib = _intern(a, b)
    pa, na = _as_i32(_ffi, ia)
    pb, nb = _as_i32(_ffi, ib)
    return int(lib.kvz_lcs_length(pa, na, pb, nb))


def rouge_l_f(pred: Sequence[str], ref: Sequence[str]) -> float:
    lib = _load()
    ia, ib = _intern(pred, ref)
    pa, na = _as_i32(_ffi, ia)
    pb, nb = _as_i32(_ffi, ib)
    return float(lib.kvz_rouge_l_f(pa, na, pb, nb))


def sentence_bleu(reference: Sequence[str], candidate: Sequence[str]) -> float:
    lib = _load()
    ir, ic = _intern(reference, candidate)
    pr, nr = _as_i32(_ffi, ir)
    pc, nc = _as_i32(_ffi, ic)
    return float(lib.kvz_sentence_bleu(pr, nr, pc, nc))


def token_f1(pred: Sequence[str], ref: Sequence[str]) -> float:
    lib = _load()
    ia, ib = _intern(pred, ref)
    pa, na = _as_i32(_ffi, ia)
    pb, nb = _as_i32(_ffi, ib)
    return float(lib.kvz_token_f1(pa, na, pb, nb))


if __name__ == "__main__":
    print("built:", _build())
