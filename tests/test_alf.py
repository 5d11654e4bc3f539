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
