"""ALF tests: filter math, Wiener gain, end-to-end bit-exactness."""
import numpy as np

from vvc.kernels.alf import diamond_pairs, alf_delta, apply_alf_plane
from vvc.enc.alf_enc import derive_alf_coeffs
from vvc.io.synth import synth_frame
from vvc.io.yuv import psnr


def test_diamond_geometry():
    assert len(diamond_pairs(3)) == 12  # 7x7 diamond: 24 surround / 2
    assert len(diamond_pairs(2)) == 6   # 5x5 diamond: 12 surround / 2
    for a, b in diamond_pairs(3):
        assert a == (-b[0], -b[1])


def test_zero_coeffs_identity():
    rng = np.random.default_rng(0)
    p = rng.integers(0, 256, (32, 32)).astype(np.int32)
    assert (alf_delta(p, [0] * 12, 3) == 0).all()


def test_wiener_recovers_blur():
    """If rec = blurred orig, the solved filter should sharpen back."""
    rng = np.random.default_rng(1)
    orig = rng.integers(0, 256, (64, 64)).astype(np.int32)
    rec = orig.copy()
    rec[1:-1, 1:-1] = (orig[:-2, 1:-1] + orig[2:, 1:-1] + orig[1:-1, :-2]
                       + orig[1:-1, 2:] + 4 * orig[1:-1, 1:-1] + 4) // 8
    c = derive_alf_coeffs(orig, rec, 3)
    assert c is not None
    filt = rec.copy()
    apply_alf_plane(filt, c, 3, 8)
    assert psnr(orig, filt) > psnr(orig, rec) + 1.0


def test_end_to_end_with_alf():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(176, 144, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=35)
    dec, info = decode_stream(bs)
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])


class TestClassifiedAlf:
    def test_classification_shape_and_direction(self):
        from vvc.kernels.alf import alf_classify
        rng = np.random.default_rng(0)
        h = w = 64
        # flat region → activity 0, no direction
        flat = np.full((h, w), 128, np.int32)
        cls, tr = alf_classify(flat, 8)
        assert cls.shape == (16, 16) and tr.shape == (16, 16)
        assert (cls == 0).all()
        # strong vertical edges (horizontal gradient) → directional class
        vert = np.tile((np.arange(w) % 8 < 4).astype(np.int32) * 200,
                       (h, 1))
        cls_v, _ = alf_classify(vert, 8)
        # horizontal stripes → a DIFFERENT directional class family
        horz = np.tile(((np.arange(h) % 8 < 4).astype(np.int32)
                        * 200)[:, None], (1, w))
        cls_h, _ = alf_classify(horz, 8)
        assert (cls_v[2:-2, 2:-2] >= 5).all(), "vertical edges unclassed"
        assert (cls_h[2:-2, 2:-2] >= 5).all()

    def test_transpose_perms_are_involutions(self):
        from vvc.kernels.alf import pair_transpose_perms
        for r in (2, 3):
            perms = pair_transpose_perms(r)
            n = perms.shape[1]
            for t in range(4):
                p = perms[t]
                assert (p[p] == np.arange(n)).all()

    def test_classified_beats_single_filter(self):
        # direction-dependent degradation: horizontal blur on the left
        # half, vertical blur on the right — one Wiener filter cannot fix
        # both, 25-class filters can
        from vvc.enc.alf_enc import (derive_classified_filters,
                                     derive_alf_coeffs)
        from vvc.kernels.alf import (alf_delta_classified, alf_delta,
                                     pair_features)
        rng = np.random.default_rng(3)
        h, w = 64, 128
        orig = rng.integers(0, 256, (h, w)).astype(np.int32)
        rec = orig.copy()
        rec[:, :64] = (orig[:, :64] + np.roll(orig[:, :64], 1, 1)
                       + np.roll(orig[:, :64], -1, 1) + 1) // 3
        rec[:, 64:] = (orig[:, 64:] + np.roll(orig[:, 64:], 1, 0)
                       + np.roll(orig[:, 64:], -1, 0) + 1) // 3
        base = float(((orig - rec) ** 2).sum())
        c1 = derive_alf_coeffs(orig, rec, 3)
        d1 = alf_delta(rec, c1, 3)
        e1 = float(((orig - np.clip(rec + d1, 0, 255)) ** 2).sum())
        res = derive_classified_filters(orig, rec, 32, 8)
        assert res is not None
        coeffs, clips, fmap, cls4, tr4 = res
        dc = alf_delta_classified(rec, coeffs, clips, fmap, cls4, tr4)
        ec = float(((orig - np.clip(rec + dc, 0, 255)) ** 2).sum())
        assert ec < e1 < base
        # NB: one filter may suffice here — the geometric transposes map
        # the horizontal- and vertical-blur regions onto the same filter;
        # the win over ALF-lite comes from the per-block transpose
        assert coeffs.shape[0] >= 1

    def test_e2e_classified_alf_roundtrip(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = [synth_frame(128, 64, t) for t in range(2)]
        data, recons, stats = encode_sequence(frames, qp=30)
        out, info = decode_stream(data)
        assert all(info["hash_ok"])
        for f, r in zip(out, recons):
            assert (f.y == r.y).all()


def test_native_alf_matches_numpy():
    from vvc.kernels.alf import (alf_classify, alf_classify_np,
                                 alf_delta_classified,
                                 alf_delta_classified_np, _native_lib)
    if _native_lib() is None:
        import pytest
        pytest.skip("native core not built")
    rng = np.random.default_rng(7)
    for h, w in ((64, 64), (96, 160)):
        o = rng.integers(0, 256, (h, w)).astype(np.int32)
        r = ((o + np.roll(o, 1, 1) + np.roll(o, -1, 0)) // 3).astype(np.int32)
        c1, t1 = alf_classify(r, 8)
        c2, t2 = alf_classify_np(r, 8)
        assert (c1 == c2).all() and (t1 == t2).all()
        coeffs = rng.integers(-90, 90, (4, 12)).astype(np.int32)
        clips = np.array([0, 32, 8, 2], np.int32)
        fmap = rng.integers(0, 4, 25).astype(np.int32)
        d1 = alf_delta_classified(r, coeffs, clips, fmap, c1, t1)
        d2 = alf_delta_classified_np(r, coeffs, clips, fmap, c1, t1)
        assert (d1 == d2).all()


def test_ccalf_improves_chroma_and_roundtrips():
    """CC-ALF (vvc/kernels/ccalf.py): luma-driven chroma correction must
    reduce chroma SSE when enabled, and streams stay bit-exact."""
    import numpy as np
    from vvc.kernels.ccalf import derive_ccalf, apply_ccalf_delta
    rng = np.random.default_rng(3)
    luma = rng.integers(0, 256, (64, 64)).astype(np.int32)
    # chroma correlated with luma high-pass (the CC-ALF model)
    hp = (np.roll(luma, -1, 0) - luma)
    orig_c = np.clip(128 + (hp[::2, ::2] // 4)
                     + rng.integers(-2, 3, (32, 32)), 0, 255).astype(np.int32)
    recon_c = np.full((32, 32), 128, np.int32)
    ci = derive_ccalf(orig_c, recon_c, luma, 8)
    assert ci is not None
    out = apply_ccalf_delta(recon_c, luma, ci, 8)
    sse0 = ((orig_c.astype(np.int64) - recon_c) ** 2).sum()
    sse1 = ((orig_c.astype(np.int64) - out) ** 2).sum()
    assert sse1 < 0.8 * sse0
    # e2e: encode/decode still bit-exact with ALF+CC-ALF in the loop
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(128, 96, 0)]
    bs, recons, _ = encode_sequence(frames, qp=32)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    assert (decs[0].cb == recons[0].cb).all()
    assert (decs[0].cr == recons[0].cr).all()
