"""Native CABAC packer bindings (ctypes; the image has no pybind11).

Builds vvc/packer/libcabac.so from cabac_core.cpp on first import (cached
by mtime).  `lib()` returns the loaded library or None — callers fall back
to the Python oracle engine (vvc.cabac.engine), which is semantically
identical and test-enforced byte-equal.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cabac_core.cpp")
_SO = os.path.join(_DIR, "libcabac.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        l = ctypes.CDLL(_SO)
    except OSError:
        return None
    l.enc_create.restype = ctypes.c_void_p
    l.enc_destroy.argtypes = [ctypes.c_void_p]
    l.enc_bin.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                          ctypes.c_int]
    l.enc_ep.argtypes = [ctypes.c_void_p, ctypes.c_int]
    l.enc_eps.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_int]
    l.enc_trm.argtypes = [ctypes.c_void_p, ctypes.c_int]
    l.enc_residual_c.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_int]
    l.enc_finish.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    l.enc_finish.restype = ctypes.c_int64
    l.enc_bit_count.argtypes = [ctypes.c_void_p]
    l.enc_bit_count.restype = ctypes.c_int64
    l.dec_create.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    l.dec_create.restype = ctypes.c_void_p
    l.dec_destroy.argtypes = [ctypes.c_void_p]
    l.dec_bin.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    l.dec_ep.argtypes = [ctypes.c_void_p]
    l.dec_eps.argtypes = [ctypes.c_void_p, ctypes.c_int]
    l.dec_eps.restype = ctypes.c_uint32
    l.dec_trm.argtypes = [ctypes.c_void_p]
    l.dec_residual_c.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_int]
    _lib = l
    return _lib
