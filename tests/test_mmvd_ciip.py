"""MMVD + CIIP merge extensions (VERDICT r2 task 9 tier).

Reference anchors: CABACWriter::merge_data (mmvd_merge_flag /
mmvd_merge_idx / ciip_flag), InterPrediction CIIP blend (spec 8.5.6.6),
CommonDef.h MMVD distance tables."""
import numpy as np

from vvc.io.yuv import Frame
from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def _roundtrip(frames, **kw):
    bs, recons, stats = encode_sequence(frames, qp=32, **kw)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"]), kw
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()
    return sum(s["bits"] for s in stats)


def test_mmvd_roundtrip_ldp_and_ra():
    frames = [synth_frame(192, 128, t) for t in range(4)]
    _roundtrip(frames, mode="ldp", mmvd=True)
    _roundtrip(frames, mode="ra", gop_size=4, mmvd=True, affine=True,
               bdof=True, dmvr=True)


def test_mmvd_offsets_roundtrip_exactly():
    """Force MMVD leaves through the writer/reader offset tables."""
    from vvc.cabac.cu_syntax import TreeCoder
    tc = TreeCoder.__new__(TreeCoder)
    cand = (3, np.array([[4, -8], [12, 0]], np.int32),
            np.array([0, 1], np.int8))
    for di in range(8):
        for gi in range(4):
            d, mv, ref = TreeCoder._mmvd_apply(tc, cand, di, gi)
            off = TreeCoder.MMVD_DISTS[di]
            dx, dy = TreeCoder.MMVD_DIRS[gi]
            assert mv[0][0] == 4 + off * dx and mv[0][1] == -8 + off * dy
            assert mv[1][0] == 12 + off * dx and mv[1][1] == 0 + off * dy


def test_ciip_roundtrip_and_engages_on_fade():
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:128, 0:192]
    tex = rng.integers(-8, 9, (128, 192))
    base = np.clip(96 + 0.2 * xx + 0.1 * yy + tex, 0, 235).astype(np.int32)
    cb = np.full((64, 96), 128, np.int32)
    f0 = Frame(base, cb, cb.copy(), 8)
    frames = [f0]
    for t in range(1, 4):
        frames.append(Frame(np.clip(base + 15 * t, 0, 255), cb.copy(),
                            cb.copy(), 8))
    _roundtrip(frames, mode="ldp", ciip=True)
    # decision engages on a brightness flash (inter off by a DC the intra
    # neighbours have already absorbed)
    from vvc.enc.inter_search import rdo_inter_partition
    from vvc.model.recon import reconstruct_leaves
    f1 = frames[1]
    _, _, leaves = rdo_inter_partition(f1.y, [f0.y], [], 32)
    rec = (np.zeros_like(f1.y), np.zeros_like(f1.cb), np.zeros_like(f1.cr))
    from vvc.enc.mode_decide import decide_modes
    from vvc.hls.ps import SPS
    cfg = {"ciip": True, "col": None, "n_ref": (1, 0),
           "cur_poc": 1, "ref_pocs": ((0,), ()), "is_b": False}
    refs = ([(f0.y, f0.cb, f0.cr)], [])
    h, w = f1.y.shape
    preds = decide_modes(leaves, (f1.y, f1.cb, f1.cr), 32, 8,
                         SPS(width=w, height=h), inter_cfg=cfg, refs=refs)
    reconstruct_leaves(leaves, rec, 32, 8,
                       orig_planes=(f1.y, f1.cb, f1.cr),
                       refs=refs, inter_cfg=cfg, pred_cache=preds)
    assert sum(1 for l in leaves if l.ciip) > 0


def test_all_inter_tools_together():
    frames = [synth_frame(192, 128, t) for t in range(5)]
    _roundtrip(frames, mode="ra", gop_size=4, mmvd=True, ciip=True,
               affine=True, bdof=True, dmvr=True, mtt=True, isp=True,
               dep_quant=True, lmcs=True)
