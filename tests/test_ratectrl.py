"""R-λ rate control (S5): budget tracking + roundtrip under RC.

Gate (BASELINE config 4 shape): achieved rate within tolerance of target,
stream still decodes bit-exact."""
import numpy as np

from vvc.io.synth import synth_frame


def _seq(n, w=96, h=64):
    return [synth_frame(w, h, t) for t in range(n)]


def _encode(frames, kbps, mode="ldp", fps=30.0):
    from vvc.enc.encoder import encode_sequence
    return encode_sequence(frames, qp=32, mode=mode,
                           target_kbps=kbps, fps=fps)


class TestRateCtrl:
    def test_rate_close_to_target(self):
        frames = _seq(12)
        fps = 30.0
        for kbps in (120.0, 360.0):
            bs, recons, stats = _encode(frames, kbps, fps=fps)
            got = sum(s["bits"] for s in stats) * fps / len(frames) / 1000.0
            # ±35% at this tiny scale (one I frame dominates a 12-frame
            # window; the reference's tolerance on short sequences is
            # similar [verify])
            assert abs(got - kbps) / kbps < 0.35, (kbps, got)

    def test_higher_target_more_bits_better_psnr(self):
        frames = _seq(10)
        _, _, lo = _encode(frames, 80.0)
        _, _, hi = _encode(frames, 500.0)
        assert sum(s["bits"] for s in hi) > sum(s["bits"] for s in lo)
        avg = lambda st: sum(s["psnr_y"] for s in st) / len(st)
        assert avg(hi) > avg(lo)

    def test_rc_stream_roundtrips(self):
        from vvc.dec.decoder import decode_stream
        frames = _seq(6)
        bs, recons, stats = _encode(frames, 200.0)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)

    def test_qp_adapts(self):
        frames = _seq(10)
        _, _, stats = _encode(frames, 100.0)
        qps = [s["qp"] for s in stats]
        assert len(set(qps)) > 1, qps
