"""MRL: multi-reference-line intra (VERDICT r2 task 8).

Reference anchors: IntraPrediction.cpp multiRefIdx paths,
CABACWriter::extend_ref_line, IntraSearch multiRefIdx RD loop."""
import numpy as np

from vvc.io.yuv import Frame
from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def _noisy_line_frame(w=192, h=128, seed=7):
    """Vertical gradient whose every 16th row (the row right above each
    16-aligned block row) is corrupted — line 0 is untrustworthy, lines
    1/2 are clean: MRL's home turf."""
    rng = np.random.default_rng(seed)
    yy = np.mgrid[0:h, 0:w][0]
    y = np.clip(40 + (yy * 3) % 160, 0, 235).astype(np.int32)
    noisy = (np.arange(h) % 16) == 15
    y[noisy] = rng.integers(0, 256, (int(noisy.sum()), w))
    cb = np.full((h // 2, w // 2), 128, np.int32)
    return Frame(y, cb, cb.copy(), 8)


def test_mrl_roundtrip_and_engages():
    frames = [_noisy_line_frame(seed=s) for s in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, mrl=True)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()


def test_mrl_line_selection_direct():
    from vvc.model.frame import Leaf
    from vvc.enc.mode_decide import decide_modes
    from vvc.hls.ps import SPS
    f = _noisy_line_frame()
    h, w = f.y.shape
    leaves = [Leaf(x, y, 16, 16, luma_mode=50)
              for y in range(0, h, 16) for x in range(0, w, 16)]
    sps = SPS(width=w, height=h, mrl=True)
    decide_modes(leaves, (f.y, f.cb, f.cr), 32, 8, sps)
    # blocks whose adjacent line is the corrupted row prefer line 1/2
    assert sum(1 for l in leaves if l.mrl > 0) > 0
    # first CTU-relative row must stay on line 0 (writer gate)
    assert all(l.mrl == 0 for l in leaves if l.y0 % 64 == 0)


def test_mrl_ref_line_kernel():
    from vvc.kernels.intra import build_ref_line, build_ref_line_mrl
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 255, (64, 64)).astype(np.int32)
    coded = np.ones((16, 16), dtype=bool)
    c0 = build_ref_line(plane, coded, 16, 16, 8, 8)
    c1 = build_ref_line_mrl(plane, coded, 16, 16, 8, 8, 1)
    # line 1 top segment reads row y0-2
    s = 8
    assert (c1[2 * s + 1:2 * s + 1 + s] == plane[14, 16:24]).all()
    assert (c0[2 * s + 1:2 * s + 1 + s] == plane[15, 16:24]).all()
    # left segment reads column x0-2
    assert c1[2 * s - 1] == plane[16, 14]
    # first-row/col fallback pads instead of crashing
    cz = build_ref_line_mrl(plane, coded, 0, 0, 8, 8, 2)
    assert cz.shape == c0.shape


def test_mrl_with_tools():
    frames = [synth_frame(192, 128, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, mrl=True, mtt=True,
                                        isp=True, dep_quant=True)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
