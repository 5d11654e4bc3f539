"""Native sequential reconstruction wrapper — mirror of
vvc.model.recon.reconstruct_leaves backed by librecon.so.

One ctypes call per block; planes and availability maps are numpy buffers
mutated in place by the C++ core.  Bit-exact equality with the numpy
oracle is enforced by tests/test_packer.py.
"""
from __future__ import annotations

import ctypes

import numpy as np

from vvc.packer import recon_lib
from vvc.rom.transform_mats import dct2_matrix, dst7_matrix, dct8_matrix

_initialized = False


def available() -> bool:
    global _initialized
    l = recon_lib()
    if l is None:
        return False
    if not _initialized:
        mats = ([np.ascontiguousarray(dct2_matrix(n)) for n in (4, 8, 16, 32, 64)]
                + [np.ascontiguousarray(dst7_matrix(n)) for n in (4, 8, 16, 32)]
                + [np.ascontiguousarray(dct8_matrix(n)) for n in (4, 8, 16, 32)])
        # keep refs alive for the process lifetime (recon_init copies anyway)
        l.recon_init(*[m.ctypes.data_as(ctypes.c_void_p) for m in mats])
        _initialized = True
    return True


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def reconstruct_leaves_native(leaves, recon_planes, qp: int, bit_depth: int,
                              orig_planes=None, chroma_qp_fn=None,
                              lossless: bool = False):
    assert available()
    l = recon_lib()
    y_pl, cb_pl, cr_pl = recon_planes
    h, w = y_pl.shape
    # must be in-place views: tile threads write disjoint regions of the
    # same planes concurrently, so a silent copy here would lose work
    for p in recon_planes:
        assert p.dtype == np.int32 and p.flags.c_contiguous, "recon planes must be contiguous int32"
    coded_y = np.zeros(((h + 3) >> 2, (w + 3) >> 2), dtype=np.uint8)
    coded_c = np.zeros(((h // 2 + 3) >> 2, (w // 2 + 3) >> 2), dtype=np.uint8)
    qpc = chroma_qp_fn(qp) if chroma_qp_fn else min(qp, 63)
    enc = orig_planes is not None
    if enc:
        o_y = np.ascontiguousarray(orig_planes[0], dtype=np.int32)
        o_cb = np.ascontiguousarray(orig_planes[1], dtype=np.int32)
        o_cr = np.ascontiguousarray(orig_planes[2], dtype=np.int32)

    y_pl, cb_pl, cr_pl = recon_planes
    pp = {id(a): _p(a) for a in recon_planes}
    pc = {id(a): _p(a) for a in (coded_y, coded_c)}
    po = ({id(a): _p(a) for a in (o_y, o_cb, o_cr)} if enc else {})
    ll = int(lossless)

    def do(plane, ph, pw, coded, cw4, orig, x0, y0, s, mode, q, lev,
           tr_h=0, tr_v=0):
        buf = lev if lev is not None else (
            np.zeros((s, s), dtype=np.int32) if enc else None)
        if buf is not None:
            buf = np.ascontiguousarray(buf, dtype=np.int32)
        cbf = l.recon_block(pp[id(plane)], ph, pw, pc[id(coded)], cw4,
                            po[id(orig)] if orig is not None else None,
                            x0, y0, s, mode, q, bit_depth, 2,
                            _p(buf) if buf is not None else None, int(enc),
                            tr_h, tr_v, ll)
        return (buf if cbf else None) if enc else None

    from vvc.kernels.transform import MTS_TR
    cw4_y = coded_y.shape[1]
    cw4_c = coded_c.shape[1]
    for leaf in leaves:
        s = leaf.size
        cs = s >> 1
        th, tv = MTS_TR[leaf.mts]
        r = do(y_pl, h, w, coded_y, cw4_y, o_y if enc else None,
               leaf.x0, leaf.y0, s, leaf.luma_mode, qp,
               None if enc else leaf.lev_y, int(th), int(tv))
        if enc:
            leaf.lev_y = r
        r = do(cb_pl, h // 2, w // 2, coded_c, cw4_c, o_cb if enc else None,
               leaf.x0 >> 1, leaf.y0 >> 1, cs, leaf.luma_mode, qpc,
               None if enc else leaf.lev_cb)
        if enc:
            leaf.lev_cb = r
        r = do(cr_pl, h // 2, w // 2, coded_c, cw4_c, o_cr if enc else None,
               leaf.x0 >> 1, leaf.y0 >> 1, cs, leaf.luma_mode, qpc,
               None if enc else leaf.lev_cr)
        if enc:
            leaf.lev_cr = r

