"""SAO tests: classification semantics, syntax roundtrip, end-to-end
bit-exactness and quality direction."""
import numpy as np

from vvc.kernels.sao import (SaoParams, SAO_BO, SAO_EO, eo_categories,
                             apply_sao_region, sao_filter_plane)
from vvc.cabac.sao_syntax import write_sao_params, read_sao_params
from vvc.cabac.engine import BinEncoder, BinDecoder
from vvc.cabac.ctx import SliceContexts
from vvc.io.synth import synth_frame
from vvc.io.yuv import psnr


def test_eo_categories():
    src = np.array([[10, 5, 10, 10, 20, 10]] * 2, dtype=np.int32)
    cat = eo_categories(src, 0, 0, 6, 2, 0, 0, 6)
    assert cat[0, 1] == 1    # valley
    assert cat[0, 4] == 4    # peak
    assert cat[0, 0] == 0    # border neighbour unavailable
    assert cat[0, 3] == 2    # lower-equal edge


def test_bo_application():
    src = np.full((8, 8), 100, dtype=np.int32)   # band 100>>3 = 12
    dst = src.copy()
    p = SaoParams(SAO_BO, 0, 12, (3, 0, 0, 0))
    apply_sao_region(dst, src, p, 0, 0, 8, 8, 8, 0, 8)
    assert (dst == 103).all()


def test_sao_syntax_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(40):
        params = []
        for _ in range(3):
            mode = int(rng.integers(0, 3))
            if mode == SAO_BO:
                offs = tuple(int(v) for v in rng.integers(-7, 8, 4))
                params.append(SaoParams(SAO_BO, 0, int(rng.integers(0, 29)), offs))
            elif mode == SAO_EO:
                m = rng.integers(0, 8, 4)
                offs = (int(m[0]), int(m[1]), -int(m[2]), -int(m[3]))
                params.append(SaoParams(SAO_EO, int(rng.integers(0, 4)), 0, offs))
            else:
                params.append(SaoParams())
        enc = BinEncoder()
        cw = SliceContexts()
        write_sao_params(enc, cw, params)
        enc.encode_bin_trm(1)
        data = enc.finish()
        dec = BinDecoder(data)
        cr = SliceContexts()
        got = read_sao_params(dec, cr)
        for a, b in zip(params, got):
            assert a.mode == b.mode
            if a.mode:
                assert a.offsets == b.offsets
                assert a.band_pos == b.band_pos and a.eo_class == b.eo_class


def test_end_to_end_with_sao():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(176, 144, 0)]
    bs, recons, stats = encode_sequence(frames, qp=35)
    dec, info = decode_stream(bs)
    assert (dec[0].y == recons[0].y).all()
    assert (dec[0].cb == recons[0].cb).all()
    assert (dec[0].cr == recons[0].cr).all()
    assert all(info["hash_ok"])


def test_sao_improves_psnr():
    """SAO offsets are chosen by ΔSSE<0 — PSNR must not regress."""
    from vvc.enc.rdo import rdo_partition
    from vvc.model.recon import reconstruct_leaves
    from vvc.kernels.deblock import deblock_frame
    from vvc.enc.sao_enc import decide_sao_frame
    f = synth_frame(176, 144, 0)
    _, _, leaves = rdo_partition(f.y, 37, 8)
    rec = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves(leaves, rec, 37, 8, (f.y, f.cb, f.cr))
    deblock_frame(rec, leaves, 37, 8)
    pre = psnr(f.y, rec[0])
    params = decide_sao_frame((f.y, f.cb, f.cr), rec, 37, 8, 64, [(0, 176)])
    per_y = {k: v[0] for k, v in params.items()}
    sao_filter_plane(rec[0], per_y, 64, 8, [(0, 176)], 0)
    post = psnr(f.y, rec[0])
    assert post >= pre - 1e-9
    assert any(v[0].mode for v in params.values())  # something was chosen


def test_sao_merge_flags_roundtrip():
    """Merge-left/up syntax: writer auto-merges equal params; reader copies."""
    from vvc.cabac.engine import BinEncoder, BinDecoder
    from vvc.cabac.ctx import SliceContexts
    from vvc.cabac.sao_syntax import write_sao_params, read_sao_params
    from vvc.kernels.sao import SaoParams, SAO_EO, SAO_BO

    a = (SaoParams(SAO_EO, 1, 0, (2, 1, -1, -2)),
         SaoParams(), SaoParams(SAO_BO, 0, 7, (1, 0, 0, -1)))
    b = (SaoParams(), SaoParams(), SaoParams())
    seq = [  # (params, left, up) mimicking a 2x2 CTU grid walk
        (a, None, None),
        (a, a, None),        # merges left
        (b, None, a),        # differs: explicit after merge_left=0 skipped
        (b, b, a),           # merges left
    ]
    ctxs = SliceContexts(32)
    enc = BinEncoder()
    for p, l, u in seq:
        write_sao_params(enc, ctxs, p, left=l, up=u)
    enc.encode_bin_trm(1)
    data = enc.finish()
    ctxs = SliceContexts(32)
    dec = BinDecoder(data)
    for p, l, u in seq:
        got = read_sao_params(dec, ctxs, left=l, up=u)
        assert tuple(got) == tuple(p)
