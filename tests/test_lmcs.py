"""LMCS (luma mapping) tests: LUT construction, round-trip, end-to-end."""
import numpy as np

from vvc.kernels.lmcs import build_luts, derive_codewords, map_plane, N_PIECES
from vvc.io.synth import synth_frame


def test_uniform_codewords_identity():
    seg = 1 << 4  # 8-bit: 256/16
    fwd, inv = build_luts([seg] * N_PIECES, 8)
    x = np.arange(256)
    assert (fwd == x).all()
    assert (inv == x).all()


def test_luts_monotone_and_inverse_close():
    f = synth_frame(96, 64, 0)
    cw = derive_codewords(f.y, 8)
    assert len(cw) == N_PIECES and sum(cw) <= 256 + 32
    fwd, inv = build_luts(cw, 8)
    assert (np.diff(fwd) >= 0).all()
    assert (np.diff(inv) >= 0).all()
    x = np.arange(256)
    err = np.abs(inv[fwd[x]] - x)
    assert err.max() <= 4  # plateau width bound


def test_end_to_end_with_lmcs():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(96, 64, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, lmcs=True)
    dec, info = decode_stream(bs)
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])
    assert stats[0]["psnr_y"] > 25


def test_lmcs_off_unaffected():
    from vvc.enc.encoder import encode_sequence
    frames = [synth_frame(64, 64, 0)]
    bs_a, rec_a, _ = encode_sequence(frames, qp=32, lmcs=False)
    bs_b, rec_b, _ = encode_sequence(frames, qp=32, lmcs=True)
    assert len(bs_b) > 0  # both paths produce decodable streams


class TestChromaResidualScaling:
    def test_scale_factors_identity_at_uniform(self):
        from vvc.kernels.lmcs import chroma_scale_factors, CSCALE_SHIFT
        # uniform codewords (identity mapping) → scale 1.0 both ways
        seg = 1 << (8 - 4)
        fwd, inv = chroma_scale_factors([seg] * 16, 8)
        assert (fwd == (1 << CSCALE_SHIFT)).all()
        assert (inv == (1 << CSCALE_SHIFT)).all()

    def test_lmcs_roundtrip_with_chroma_scaling(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        from vvc.io.synth import synth_frame
        frames = [synth_frame(128, 64, t) for t in range(2)]
        data, recons, stats = encode_sequence(frames, qp=30, lmcs=True)
        out, info = decode_stream(data)
        assert all(info["hash_ok"])
        for f, r in zip(out, recons):
            assert (f.y == r.y).all()
            assert (f.cb == r.cb).all() and (f.cr == r.cr).all()
