"""ISP (intra sub-partitions): geometry, syntax roundtrip, sequential
sub-TU reconstruction feedback, and RDO integration.

Reference behavior anchors: UnitTools.cpp → CU::canUseISP,
IntraSearch.cpp → estIntraPredLumaQT ISP loops / xIntraCodingLumaISP,
CABACWriter::intra_luma_pred_modes (isp flags) + cbf_luma ISP contexts."""
import random

import numpy as np
import pytest

from vvc.cabac.engine import BinEncoder, BinDecoder
from vvc.cabac.ctx import SliceContexts
from vvc.cabac.cu_syntax import TreeWriter, TreeReader
from vvc.model.frame import Leaf, CodingState
from vvc.model.recon import reconstruct_leaves
from vvc.kernels.isp import (isp_allowed, isp_partitions, isp_tr_types,
                             ISP_HOR, ISP_VER)
from vvc.common.types import TrType


def test_isp_geometry():
    # 8x8: K=2 both dirs, sub dims >= 4
    assert isp_partitions(8, 8, ISP_HOR) == [(0, 0, 8, 4), (0, 4, 8, 4)]
    assert isp_partitions(8, 8, ISP_VER) == [(0, 0, 4, 8), (4, 0, 4, 8)]
    # 16x16: K=4
    assert isp_partitions(16, 16, ISP_HOR) == [
        (0, 0, 16, 4), (0, 4, 16, 4), (0, 8, 16, 4), (0, 12, 16, 4)]
    # rect leaf
    assert isp_partitions(32, 8, ISP_VER) == [
        (0, 0, 8, 8), (8, 0, 8, 8), (16, 0, 8, 8), (24, 0, 8, 8)]
    for w, h in ((8, 8), (16, 8), (64, 64), (8, 32)):
        assert isp_allowed(w, h) == (True, True)
        for d in (ISP_HOR, ISP_VER):
            for (xo, yo, sw, sh) in isp_partitions(w, h, d):
                assert sw >= 4 and sh >= 4


def test_isp_implicit_transforms():
    assert isp_tr_types(16, 4) == (TrType.DST7, TrType.DST7)
    assert isp_tr_types(32, 8) == (TrType.DCT2, TrType.DST7)
    assert isp_tr_types(64, 16) == (TrType.DCT2, TrType.DST7)


def _content(W, H, seed):
    nrg = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((xx * 3 + yy * 2) % 256 + nrg.integers(-8, 9, (H, W))).clip(0, 255)
    cb = np.full((H // 2, W // 2), 120) + nrg.integers(-4, 5, (H // 2, W // 2))
    cr = np.full((H // 2, W // 2), 90) + nrg.integers(-4, 5, (H // 2, W // 2))
    return (y.astype(np.int32), cb.astype(np.int32), cr.astype(np.int32))


@pytest.mark.parametrize("seed", range(4))
def test_isp_syntax_and_recon_roundtrip(seed):
    rng = random.Random(seed)
    W = H = 128
    qp = rng.choice([22, 27, 32, 37])
    orig = _content(W, H, seed)

    # flat QT to 16x16/32x32 leaves, forcing ISP on a random subset
    split_map, leaves = {}, []
    from vvc.model.partition import SPLIT_NONE, SPLIT_QT
    for cy in range(0, H, 64):
        for cx in range(0, W, 64):
            split_map[(cx, cy, 64, 64)] = SPLIT_QT
            for qy in range(cy, cy + 64, 32):
                for qx in range(cx, cx + 32 + 32, 32):
                    if qx >= cx + 64:
                        continue
                    if rng.random() < 0.5:
                        split_map[(qx, qy, 32, 32)] = SPLIT_QT
                        for sy in range(qy, qy + 32, 16):
                            for sx in range(qx, qx + 32, 16):
                                split_map[(sx, sy, 16, 16)] = SPLIT_NONE
                                leaves.append(Leaf(
                                    sx, sy, 16, 16, rng.randrange(67),
                                    isp=rng.choice([0, 1, 2])))
                    else:
                        split_map[(qx, qy, 32, 32)] = SPLIT_NONE
                        leaves.append(Leaf(qx, qy, 32, 32,
                                           rng.randrange(67),
                                           isp=rng.choice([0, 1, 2])))
    assert any(l.isp for l in leaves)
    leaf_map = {(l.x0, l.y0, l.w, l.h): l for l in leaves}

    recon = tuple(np.zeros_like(p) for p in orig)
    reconstruct_leaves(leaves, recon, qp, 8, orig_planes=orig)

    kw = dict(mts_enabled=True, cclm_enabled=False, mip_enabled=False,
              lfnst_enabled=False, mtt_enabled=False, isp_enabled=True)
    ctxs = SliceContexts(qp)
    enc = BinEncoder()
    writer = TreeWriter(enc, ctxs, CodingState(W, H), W, H, split_map,
                        leaf_map, 64, 8, **kw)
    for cy in range(0, H, 64):
        for cx in range(0, W, 64):
            writer.write_ctu(cx, cy)
    enc.encode_bin_trm(1)
    data = enc.finish()

    ctxd = SliceContexts(qp)
    reader = TreeReader(BinDecoder(data), ctxd, CodingState(W, H), W, H,
                        64, 8, **kw)
    for cy in range(0, H, 64):
        for cx in range(0, W, 64):
            reader.read_ctu(cx, cy)

    assert len(reader.leaves) == len(leaves)
    for a, b in zip(leaves, reader.leaves):
        assert (a.x0, a.y0, a.w, a.h) == (b.x0, b.y0, b.w, b.h)
        assert a.luma_mode == b.luma_mode
        assert a.isp == b.isp
        for la, lb in ((a.lev_y, b.lev_y), (a.lev_cb, b.lev_cb),
                       (a.lev_cr, b.lev_cr)):
            if la is None:
                assert lb is None
            else:
                assert lb is not None and (la == lb).all()
    assert (ctxs.states == ctxd.states).all()

    recon2 = tuple(np.zeros_like(p) for p in orig)
    reconstruct_leaves(reader.leaves, recon2, qp, 8)
    for p1, p2 in zip(recon, recon2):
        assert (p1 == p2).all()


def _seq_frames(w, h, n=2, seed=3):
    from vvc.io.yuv import Frame
    nrg = np.random.default_rng(seed)
    out = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        # bar-structured content (directional edges) where sub-TU recon
        # feedback pays off
        y = (40 + 160 * ((yy // 6 + t) % 2)
             + nrg.integers(-6, 7, (h, w))).clip(0, 255)
        cb = np.full((h // 2, w // 2), 118 + t, np.int32)
        cr = np.full((h // 2, w // 2), 98, np.int32)
        out.append(Frame(y.astype(np.int32), cb, cr))
    return out


def test_isp_encode_decode_roundtrip():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = _seq_frames(128, 64)
    data, recons, stats = encode_sequence(frames, qp=30, isp=True)
    out, info = decode_stream(data)
    assert all(info["hash_ok"])
    for f, r in zip(out, recons):
        assert (f.y == r.y).all() and (f.cb == r.cb).all()


def test_isp_rd_not_worse():
    # ISP is an added RDO option with its own rate estimate: on content
    # with sharp horizontal structure the RD cost (D + lambda*R) must not
    # regress vs isp off
    from vvc.enc.encoder import encode_sequence
    from vvc.enc.rdo import rd_lambda
    frames = _seq_frames(128, 64, n=1)
    qp = 32
    costs = {}
    for flag in (False, True):
        data, recons, stats = encode_sequence(frames, qp=qp, isp=flag)
        sse = float(((frames[0].y - recons[0].y) ** 2).sum())
        bits = len(data) * 8.0
        costs[flag] = sse + rd_lambda(qp) * bits
    assert costs[True] <= costs[False] * 1.02


def test_isp_subtu_feedback_uses_previous_sub_recon():
    # the second sub-TU's prediction must see the FIRST sub-TU's recon:
    # DC-mode ISP_HOR on content whose rows 0..3 average A and rows 4..7
    # average B — at lossless the sub-1 prediction (before residual) is
    # the DC of sub-0's exact recon row 3, not the leaf's outer refs
    W = H = 32
    y = np.zeros((H, W), np.int32)
    y[0:4] = 60
    y[4:] = 200
    orig = (y.copy(), np.full((H // 2, W // 2), 128, np.int32),
            np.full((H // 2, W // 2), 128, np.int32))
    leaf = Leaf(0, 0, 16, 16, 1, isp=ISP_HOR)          # DC mode
    recon = tuple(np.zeros_like(p) for p in orig)
    reconstruct_leaves([leaf], recon, 32, 8, orig_planes=orig,
                       lossless=True)
    # lossless recon equals orig regardless; the feedback is visible in
    # the residual magnitudes: sub-TU 1 (rows 4..7) was predicted from
    # sub-TU 0's recon (values 60), so its stored residual is ~140 — but
    # a NO-feedback predictor (mid-grey 128, no neighbours) would give ~72
    assert leaf.lev_y is not None
    sub1 = leaf.lev_y[4:8]
    # DC prediction from recon rows 0..3 (left col is unavailable → DC
    # uses the 60-valued top line) ⇒ residual 200-60=140 everywhere
    assert np.all(np.abs(sub1) >= 100)
