"""DMVR + BDOF — decoder-side bi-prediction refinement (normative,
shared encoder-recon/decoder path)."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.io.yuv import Frame


class TestDmvrKernel:
    def test_recovers_mirrored_offset(self):
        """Refs displaced by ±1 px from truth: mirrored SAD search must
        find the compensating offset."""
        from vvc.kernels.mc import dmvr_refine_np
        rng = np.random.default_rng(0)
        truth = rng.integers(0, 256, size=(96, 96)).astype(np.int32)
        # roll(+1): ref0[y,x] = truth[y-1,x-1] → needs +1 px offset; ref1
        # mirrors it, exactly DMVR's mirrored-offset model
        ref0 = np.roll(truth, (1, 1), axis=(0, 1))
        ref1 = np.roll(truth, (-1, -1), axis=(0, 1))
        (dx, dy), p0, p1 = dmvr_refine_np(ref0, ref1, 32, 32, 16,
                                          (0, 0), (0, 0), 8)
        assert (dx, dy) == (4, 4), (dx, dy)  # qpel units, +1 int px
        np.testing.assert_array_equal(p0, p1)


class TestBdofKernel:
    def test_linear_gradient_correction(self):
        """Predictions offset ±0.5 px along a ramp: BDOF must land closer
        to the midpoint than the plain average... (on a pure linear ramp
        the average already equals the midpoint; use a curved signal)."""
        from vvc.kernels.mc import bdof_refine_np
        yy, xx = np.mgrid[0:32, 0:32]
        sig = (110 + 100 * np.sin(xx / 2.5)
               + 30 * np.sin(yy / 3)).astype(np.int32)
        p0 = np.roll(sig, 1, axis=1)   # ±1 px displacement mismatch
        p1 = np.roll(sig, -1, axis=1)
        out = bdof_refine_np(p0, p1, 8)
        avg = (p0 + p1 + 1) >> 1
        e_bdof = np.abs(out[:, 4:-4] - sig[:, 4:-4]).mean()
        e_avg = np.abs(avg[:, 4:-4] - sig[:, 4:-4]).mean()
        assert e_bdof < 0.5 * e_avg, (e_bdof, e_avg)

    def test_deterministic_int(self):
        from vvc.kernels.mc import bdof_refine_np
        rng = np.random.default_rng(1)
        p0 = rng.integers(0, 256, size=(16, 16)).astype(np.int32)
        p1 = rng.integers(0, 256, size=(16, 16)).astype(np.int32)
        np.testing.assert_array_equal(bdof_refine_np(p0, p1, 8),
                                      bdof_refine_np(p0, p1, 8))


class TestEndToEnd:
    def _frames(self, n=9):
        return [synth_frame(128, 96, t) for t in range(n)]

    def test_ra_roundtrip_bdof_dmvr(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = self._frames()
        bs, recons, stats = encode_sequence(frames, qp=32, mode="ra",
                                            gop_size=8, bdof=True, dmvr=True)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)
            np.testing.assert_array_equal(r.cb, d.cb)

    def test_flags_transported_in_sps(self):
        from vvc.hls.ps import SPS
        from vvc.hls.write import write_sps
        from vvc.hls.parse import parse_sps
        sps = SPS(width=64, height=64, bdof=True, dmvr=True)
        out = parse_sps(write_sps(sps))
        assert out.bdof and out.dmvr
