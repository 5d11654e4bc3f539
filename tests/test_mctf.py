"""MCTF temporal pre-filter (encoder-only, non-normative)."""
import numpy as np

from vvc.io.synth import synth_frame


class TestMctf:
    def test_filter_shape_and_range(self):
        from vvc.enc.mctf import mctf_filter
        frames = [synth_frame(64, 64, t) for t in range(5)]
        f = mctf_filter(frames, 2, qp=32)
        assert f.y.shape == frames[2].y.shape
        assert f.y.min() >= 0 and f.y.max() <= 255
        # chroma passes through untouched
        np.testing.assert_array_equal(f.cb, frames[2].cb)

    def test_denoises_static_content(self):
        """On a static scene with independent noise, the filtered anchor
        must be closer to the clean signal than the noisy original."""
        from vvc.enc.mctf import mctf_filter
        from vvc.io.yuv import Frame
        rng = np.random.default_rng(0)
        clean = rng.integers(40, 200, size=(64, 64)).astype(np.int32)
        frames = []
        for t in range(5):
            n = rng.integers(-8, 9, size=clean.shape)
            y = np.clip(clean + n, 0, 255).astype(np.int32)
            c = np.full((32, 32), 128, dtype=np.int32)
            frames.append(Frame(y, c, c, 8))
        filt = mctf_filter(frames, 2, qp=32)
        err_orig = ((frames[2].y - clean) ** 2).mean()
        err_filt = ((filt.y - clean) ** 2).mean()
        assert err_filt < err_orig, (err_filt, err_orig)

    def test_ra_roundtrip_with_mctf(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = [synth_frame(64, 64, t) for t in range(5)]
        bs, recons, stats = encode_sequence(frames, qp=32, mode="ra",
                                            gop_size=4, mctf=True)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)
