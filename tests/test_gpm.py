"""GPM: geometric partitioning merge (VERDICT r2 task 9 tier).

Reference anchors: InterPrediction::motionCompensationGeo / weightedGeoBlk,
EncCu::xCheckRDCostMergeGeo, CABACWriter::merge_data geo branch."""
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


def test_gpm_mask_properties():
    from vvc.kernels.gpm import gpm_mask, gpm_mask_chroma, gpm_blend
    for mode in range(0, 64, 7):
        m = gpm_mask(32, 16, mode)
        assert m.shape == (16, 32)
        assert m.min() >= 0 and m.max() <= 8
    # angle 0, distance 0: vertical boundary through the centre, weight
    # rising left→right, hard 0/8 regions at the extremes
    m = gpm_mask(64, 64, 0)
    assert (np.diff(m, axis=1) >= 0).all()
    assert m[:, 0].max() == 0 and m[:, -1].min() == 8
    # chroma mask is the even-phase subsample of the luma mask
    mc = gpm_mask_chroma(16, 16, 21)
    assert (mc == gpm_mask(32, 32, 21)[::2, ::2]).all()
    # blend endpoints: pure p0 where w=8, pure p1 where w=0
    p0 = np.full((64, 64), 200, np.int32)
    p1 = np.full((64, 64), 40, np.int32)
    b = gpm_blend(p0, p1, m)
    assert b[:, -1].min() == 200 and b[:, 0].max() == 40


def _two_motion_frames(n=4, w=192, h=128):
    """Diagonal boundary; upper-left texture pans right, lower-right pans
    down — GPM's home turf."""
    rng = np.random.default_rng(11)
    texa = rng.integers(60, 200, (h + 64, w + 64)).astype(np.int32)
    texb = rng.integers(60, 200, (h + 64, w + 64)).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    upper = (xx + yy) < (w + h) // 2
    cb = np.full((h // 2, w // 2), 128, np.int32)
    frames = []
    for t in range(n):
        a = texa[16:16 + h, 16 - 4 * t:16 - 4 * t + w]
        b = texb[16 - 4 * t:16 - 4 * t + h, 16:16 + w]
        frames.append(Frame(np.where(upper, a, b), cb.copy(), cb.copy(), 8))
    return frames


def test_gpm_roundtrip_ra():
    _roundtrip(_two_motion_frames(), mode="ra", gop_size=4, gpm=True)


def test_gpm_engages_on_two_motion_content():
    from vvc.enc.inter_search import rdo_inter_partition
    from vvc.model.recon import reconstruct_leaves
    frames = _two_motion_frames(3)
    f0, f1, f2 = frames
    _, _, leaves = rdo_inter_partition(f1.y, [f0.y], [f2.y], 32)
    rec = (np.zeros_like(f1.y), np.zeros_like(f1.cb), np.zeros_like(f1.cr))
    from vvc.enc.mode_decide import decide_modes
    from vvc.hls.ps import SPS
    cfg = {"gpm": True, "col": None, "n_ref": (1, 1),
           "cur_poc": 1, "ref_pocs": ((0,), (2,)), "is_b": True}
    refs = ([(f0.y, f0.cb, f0.cr)], [(f2.y, f2.cb, f2.cr)])
    h, w = f1.y.shape
    preds = decide_modes(leaves, (f1.y, f1.cb, f1.cr), 32, 8,
                         SPS(width=w, height=h), inter_cfg=cfg, refs=refs)
    reconstruct_leaves(leaves, rec, 32, 8,
                       orig_planes=(f1.y, f1.cb, f1.cr),
                       refs=refs, inter_cfg=cfg, pred_cache=preds)
    assert sum(1 for l in leaves if l.gpm is not None) > 0


def test_gpm_with_full_tool_set():
    frames = [synth_frame(192, 128, t) for t in range(5)]
    _roundtrip(frames, mode="ra", gop_size=4, gpm=True, mmvd=True,
               ciip=True, affine=True, bdof=True, dmvr=True, mtt=True,
               isp=True, dep_quant=True, lmcs=True)
