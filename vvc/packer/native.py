"""Native BinEncoder/BinDecoder wrappers — drop-in replacements for the
Python engine (vvc.cabac.engine) backed by libcabac.so.

Same interface as BinEncoder/BinDecoder plus batched `write_residual` /
`read_residual` fast paths (the reference's residual_coding hot loop runs
entirely native, one ctypes call per TB instead of one per bin).  Context
state lives in the SliceContexts numpy array shared with any Python-side
syntax coding.
"""
from __future__ import annotations

import ctypes

import numpy as np

from vvc.packer import lib


def available() -> bool:
    return lib() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


class NativeBinEncoder:
    def __init__(self, ctxs=None):
        self._l = lib()
        assert self._l is not None, "native packer unavailable"
        self._h = self._l.enc_create()
        self._sp = None
        self._op = None
        self._off = None
        if ctxs is not None:
            self.bind(ctxs)

    def bind(self, ctxs):
        """Cache pointers into the SliceContexts state array (all contexts
        passed to encode_bin must come from this object)."""
        self._states = ctxs.states  # keep alive
        self._sp = _ptr(ctxs.states)
        self._off = np.ascontiguousarray(ctxs.residual_offsets())
        self._op = _ptr(self._off)

    def encode_bin(self, bin_val: int, ctx):
        # ctx is a vvc.cabac.ctx.CtxRef — shared state array + index
        sp = self._sp if self._sp is not None else _ptr(ctx._a)
        self._l.enc_bin(self._h, sp, ctx._i, bin_val)

    def encode_bin_ep(self, bin_val: int):
        self._l.enc_ep(self._h, bin_val)

    def encode_bins_ep(self, value: int, nbits: int):
        self._l.enc_eps(self._h, value, nbits)

    def encode_bin_trm(self, bin_val: int):
        self._l.enc_trm(self._h, bin_val)

    def write_residual(self, ctxs, levels: np.ndarray, is_luma: bool):
        lv = np.ascontiguousarray(levels, dtype=np.int32)
        if self._sp is None:
            self.bind(ctxs)
        self._l.enc_residual_c(self._h, self._sp, self._op,
                               _ptr(lv), lv.shape[0], int(is_luma))

    def finish(self) -> bytes:
        cap = (int(self._l.enc_bit_count(self._h)) >> 3) + 64
        buf = (ctypes.c_uint8 * cap)()
        n = self._l.enc_finish(self._h, buf, cap)
        assert n >= 0, "packer output exceeded buffer"
        return bytes(buf[:n])

    @property
    def bit_count(self) -> int:
        return int(self._l.enc_bit_count(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._l:
            self._l.enc_destroy(self._h)
            self._h = None


class NativeBinDecoder:
    def __init__(self, data: bytes, ctxs=None):
        self._l = lib()
        assert self._l is not None, "native packer unavailable"
        self._buf = np.frombuffer(data, dtype=np.uint8).copy()
        if self._buf.size == 0:
            self._buf = np.zeros(1, dtype=np.uint8)
        self._h = self._l.dec_create(_ptr(self._buf), len(data))
        self._sp = None
        self._op = None
        self._off = None
        if ctxs is not None:
            self.bind(ctxs)

    def bind(self, ctxs):
        self._states = ctxs.states
        self._sp = _ptr(ctxs.states)
        self._off = np.ascontiguousarray(ctxs.residual_offsets())
        self._op = _ptr(self._off)

    def decode_bin(self, ctx) -> int:
        sp = self._sp if self._sp is not None else _ptr(ctx._a)
        return self._l.dec_bin(self._h, sp, ctx._i)

    def decode_bin_ep(self) -> int:
        return self._l.dec_ep(self._h)

    def decode_bins_ep(self, nbits: int) -> int:
        return int(self._l.dec_eps(self._h, nbits))

    def decode_bin_trm(self) -> int:
        return self._l.dec_trm(self._h)

    def read_residual(self, ctxs, size: int, is_luma: bool) -> np.ndarray:
        out = np.zeros((size, size), dtype=np.int32)
        if self._sp is None:
            self.bind(ctxs)
        self._l.dec_residual_c(self._h, self._sp, self._op,
                               _ptr(out), size, int(is_luma))
        return out

    def __del__(self):
        if getattr(self, "_h", None) and self._l:
            self._l.dec_destroy(self._h)
            self._h = None
