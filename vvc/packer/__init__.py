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
_RSRC = os.path.join(_DIR, "recon_core.cpp")
_RSO = os.path.join(_DIR, "librecon.so")

_lib = None
_tried = False
_rlib = None
_rtried = False


def _build(src, so) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _fresh(src, so) -> bool:
    return os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src)


def recon_lib():
    """Native reconstruction core (librecon.so), or None."""
    global _rlib, _rtried
    if _rtried:
        return _rlib
    _rtried = True
    if not _fresh(_RSRC, _RSO) and not _build(_RSRC, _RSO):
        return None
    try:
        l = ctypes.CDLL(_RSO)
    except OSError:
        return None
    l.recon_init.argtypes = [ctypes.c_void_p] * 13
    l.mip_init.argtypes = [ctypes.c_void_p]
    l.lfnst_init.argtypes = [ctypes.c_void_p]
    l.intra_filt_init.argtypes = [ctypes.c_void_p] * 2
    l.predict_mip_c.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_void_p]
    l.recon_block.restype = ctypes.c_int
    l.recon_block.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    l.recon_leaves.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    l.depquant_init.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_double]
    l.quant_depquant_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_void_p]
    l.dequant_depquant_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    l.recon_leaves_v2.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    l.alf_classify_c.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_void_p,
                                 ctypes.c_void_p]
    l.alf_delta_classified_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p]
    _rlib = l
    return _rlib


def lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _fresh(_SRC, _SO) and not _build(_SRC, _SO):
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
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int]
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
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int]
    l.tw_create.restype = ctypes.c_void_p
    l.tw_create.argtypes = [ctypes.c_int] * 5
    l.tw_destroy.argtypes = [ctypes.c_void_p]
    l.tw_write.restype = ctypes.c_int64
    l.tw_write.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    l.tr_create.restype = ctypes.c_void_p
    l.tr_create.argtypes = [ctypes.c_int] * 9
    l.tr_destroy.argtypes = [ctypes.c_void_p]
    l.tr_read.restype = ctypes.c_int64
    l.tr_read.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    _lib = l
    return _lib
