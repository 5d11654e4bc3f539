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
