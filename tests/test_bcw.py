"""BCW: bi-prediction with CU-level weights.

Reference anchors: InterPrediction::xWeightedAverage BCW branch,
CABACWriter::cu_bcw_flag, CommonDef.h g_BcwWeights."""
import numpy as np

from vvc.io.yuv import Frame
from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def _fade_frames():
    """Static texture under a non-linear fade: the mid-B frame matches a
    5:3 blend of its refs, not the equal-weight average — BCW's case."""
    rng = np.random.default_rng(9)
    tex = rng.integers(-20, 21, (128, 192)).astype(np.int32)
    cb = np.full((64, 96), 128, np.int32)
    bright = [160, 130, 100, 50, 0]   # poc2 = (5*160 + 3*0)/8 = 100
    return [Frame(np.clip(b + tex, 0, 235), cb.copy(), cb.copy(), 8)
            for b in bright]


def test_bcw_roundtrip_ra():
    frames = _fade_frames()
    bs, recons, stats = encode_sequence(frames, qp=32, mode="ra",
                                        gop_size=4, bcw=True)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()


def test_bcw_engages_on_fade():
    from vvc.enc.inter_search import rdo_inter_partition
    from vvc.model.recon import reconstruct_leaves
    frames = _fade_frames()
    f0, f2, f4 = frames[0], frames[2], frames[4]
    _, _, leaves = rdo_inter_partition(f2.y, [f0.y], [f4.y], 32, is_b=True)
    rec = (np.zeros_like(f2.y), np.zeros_like(f2.cb), np.zeros_like(f2.cr))
    from vvc.enc.mode_decide import decide_modes
    from vvc.hls.ps import SPS
    cfg = {"bcw": True, "col": None, "n_ref": (1, 1),
           "cur_poc": 2, "ref_pocs": ((0,), (4,)), "is_b": True}
    refs = ([(f0.y, f0.cb, f0.cr)], [(f4.y, f4.cb, f4.cr)])
    h, w = f2.y.shape
    preds = decide_modes(leaves, (f2.y, f2.cb, f2.cr), 32, 8,
                         SPS(width=w, height=h), inter_cfg=cfg, refs=refs)
    reconstruct_leaves(leaves, rec, 32, 8,
                       orig_planes=(f2.y, f2.cb, f2.cr),
                       refs=refs, inter_cfg=cfg, pred_cache=preds)
    engaged = [l for l in leaves if l.bcw != 2]
    assert engaged, "BCW never engaged on fade content"
    # the 5:3 weight toward the brighter ref is the constructed optimum
    assert any(l.bcw in (1, 3) for l in engaged)


def test_bcw_weights_table():
    from vvc.kernels.mc import BCW_W1
    assert BCW_W1 == (-2, 3, 4, 5, 10) and BCW_W1[2] == 4


def test_bcw_with_full_tool_set():
    frames = [synth_frame(192, 128, t) for t in range(5)]
    bs, recons, stats = encode_sequence(
        frames, qp=32, mode="ra", gop_size=4, bcw=True, gpm=True,
        amvr=True, smvd=True, mmvd=True, ciip=True, affine=True,
        bdof=True, dmvr=True, mtt=True, dep_quant=True)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
