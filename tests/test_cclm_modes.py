"""CCLM LM_L / LM_T variants: derivation restriction, selection, and
bit-exact roundtrip when the multi-directional modes are in the stream."""
import numpy as np

from vvc.io.yuv import Frame
from vvc.kernels.cclm import (gather_model_points, predict_cclm,
                              luma_ds_plane)


def test_variant_restricts_sides():
    ds = np.arange(64 * 64, dtype=np.int32).reshape(64, 64) % 255
    chroma = (ds // 2).astype(np.int32)
    coded = np.ones((16, 16), dtype=bool)
    # interior block: both sides exist; LM_L must use only left, LM_T only top
    pts_lm = gather_model_points(ds, chroma, coded, 16, 16, 8, variant=1)
    pts_l = gather_model_points(ds, chroma, coded, 16, 16, 8, variant=2)
    pts_t = gather_model_points(ds, chroma, coded, 16, 16, 8, variant=3)
    assert len(pts_lm) == 4 and len(pts_l) == 4 and len(pts_t) == 4
    # left-only points come from column x0-1 → luma values differ from the
    # top-row points of LM_T on this ramp
    assert set(pts_l) != set(pts_t)
    for v in (1, 2, 3):
        p = predict_cclm(ds, chroma, coded, 16, 16, 8, 8, variant=v)
        assert p.shape == (8, 8) and p.min() >= 0


def _frames(n=2, w=128, h=128):
    ys, xs = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = ((xs * 2 + ys + 7 * t) % 256).astype(np.int32)
        # chroma tracks luma horizontally only → one-sided models win
        cys, cxs = np.mgrid[0:h // 2, 0:w // 2]
        cb = ((cxs * 4 + 3 * t) % 200 + 20).astype(np.int32)
        cr = ((cys * 4 + 5 * t) % 200 + 20).astype(np.int32)
        out.append(Frame(y, cb, cr, 8))
    return out


def test_roundtrip_with_lm_variants():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream

    frames = _frames()
    bs, recons, stats = encode_sequence(frames, qp=32)
    decoded, _ = decode_stream(bs)
    for dec, rec in zip(decoded, recons):
        assert np.array_equal(dec.y, rec.y)
        assert np.array_equal(dec.cb, rec.cb)
        assert np.array_equal(dec.cr, rec.cr)
    dec_wf, _ = decode_stream(bs, wavefront=True)
    for d1, d2 in zip(decoded, dec_wf):
        assert np.array_equal(d1.cb, d2.cb)
        assert np.array_equal(d1.cr, d2.cr)


def test_lm_variants_get_selected():
    """On one-sided-correlation content the encoder should use LM_L/LM_T
    somewhere (exercises the syntax both ways)."""
    from vvc.enc.encoder import Encoder, _decide_chroma_modes
    from vvc.enc.rdo import rdo_partition

    f = _frames(1)[0]
    _, _, leaves = rdo_partition(f.y, 32)
    _decide_chroma_modes(leaves, f, 8)
    modes = {l.chroma_mode for l in leaves}
    assert modes & {2, 3}, f"expected LM_L/LM_T somewhere, got {modes}"
