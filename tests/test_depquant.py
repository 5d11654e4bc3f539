"""Dependent quantization (4-state trellis) — kernel + end-to-end gates."""
import numpy as np

from vvc.io.synth import synth_frame


class TestDepQuantKernel:
    def test_state_walk_deterministic(self):
        from vvc.kernels.depquant import dequant_depquant_np
        rng = np.random.default_rng(0)
        lev = rng.integers(-5, 6, size=(8, 8)).astype(np.int32)
        a = dequant_depquant_np(lev, 32, 8)
        b = dequant_depquant_np(lev, 32, 8)
        np.testing.assert_array_equal(a, b)

    def test_zero_levels_zero_coeffs(self):
        from vvc.kernels.depquant import dequant_depquant_np
        lev = np.zeros((16, 16), dtype=np.int32)
        assert not dequant_depquant_np(lev, 30, 8).any()

    def test_trellis_optimal_under_own_objective(self):
        """The Viterbi path cost must not exceed the cost of scalar-quant
        levels evaluated as a path under the SAME dep-quant objective (the
        trellis searches a superset that includes them)."""
        from vvc.kernels.depquant import (quant_depquant_np, NEXT_STATE,
                                          LAMBDA_T)
        from vvc.cabac.rates import level_bits_scalar
        from vvc.kernels.quant import (quant_np, transform_shift, _log2)
        from vvc.kernels.transform import fwd_transform_np
        from vvc.rom.transform_mats import QUANT_SCALES, QUANT_SHIFT
        from vvc.cabac.residual import full_scan
        rng = np.random.default_rng(1)
        qp = 32

        def path_cost(levels, coeff):
            h, w = levels.shape
            tshift = transform_shift(_log2(w), _log2(h), 8)
            qbits = QUANT_SHIFT + qp // 6 + tshift
            scale = int(QUANT_SCALES[qp % 6])
            state, tot = 0, 0.0
            for x, y in reversed(full_scan(_log2(w))):
                t = abs(int(coeff[y, x])) * scale / (1 << (qbits - 1))
                l = abs(int(levels[y, x]))
                r = 0.0 if l == 0 else 2.0 * l - (1.0 if state > 1 else 0.0)
                rate = level_bits_scalar(l)   # measured rate model
                tot += (t - r) ** 2 + LAMBDA_T * rate
                state = NEXT_STATE[state][l & 1]
            return tot

        for _ in range(8):
            resi = rng.integers(-40, 41, size=(8, 8)).astype(np.int32)
            coeff = fwd_transform_np(resi, 8, 0, 0)
            ld = quant_depquant_np(coeff, qp, 8)
            ls = quant_np(coeff, qp, 8)
            assert path_cost(ld, coeff) <= path_cost(ls, coeff) + 1e-6

    def test_encode_decode_inverse_pair(self):
        """dequant(quant(x)) reconstruction error bounded by the step."""
        from vvc.kernels.depquant import (quant_depquant_np,
                                          dequant_depquant_np)
        rng = np.random.default_rng(2)
        coeff = rng.integers(-500, 501, size=(8, 8)).astype(np.int32)
        qp = 22
        lev = quant_depquant_np(coeff, qp, 8)
        rec = dequant_depquant_np(lev, qp, 8)
        # step at qp22 ≈ 2^((22-4)/6)=8 in pixel units; coeff domain scaled —
        # just check correlation, exactness is covered by roundtrip below
        assert np.corrcoef(coeff.ravel(), rec.ravel())[0, 1] > 0.97


class TestDepQuantEndToEnd:
    def test_roundtrip_bitexact(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = [synth_frame(64, 64, t) for t in range(2)]
        bs, recons, stats = encode_sequence(frames, qp=32, dep_quant=True)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)
            np.testing.assert_array_equal(r.cb, d.cb)

    def test_rd_not_worse_than_scalar(self):
        """BD-style spot check: at equal QP, dep-quant should trade a
        little PSNR for clearly fewer bits (or dominate)."""
        from vvc.enc.encoder import encode_sequence
        frames = [synth_frame(96, 64, t) for t in range(2)]
        _, _, st_s = encode_sequence(frames, qp=32)
        _, _, st_d = encode_sequence(frames, qp=32, dep_quant=True)
        bits_s = sum(s["bits"] for s in st_s)
        bits_d = sum(s["bits"] for s in st_d)
        psnr_s = sum(s["psnr_y"] for s in st_s) / 2
        psnr_d = sum(s["psnr_y"] for s in st_d) / 2
        # RD dominance at the ~0.03dB-per-percent-bits slope: the PSNR gain
        # must exceed what the extra bits alone would buy
        gain = psnr_d - psnr_s
        extra_pct = (bits_d / bits_s - 1.0) * 100.0
        assert gain >= extra_pct * 0.03, (bits_s, bits_d, psnr_s, psnr_d)

    def test_dep_quant_with_inter(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = [synth_frame(64, 64, t) for t in range(3)]
        bs, recons, _ = encode_sequence(frames, qp=32, mode="ldp",
                                        dep_quant=True)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])


def test_native_trellis_bit_identical_to_python():
    """librecon's dep-quant pair (recon_core.cpp quant_depquant /
    dequant_depquant) must match the numpy oracle EXACTLY — same scan,
    same double-precision cost recursion, same rate LUT."""
    import vvc.kernels.depquant as dq
    l = dq._native()
    if l is None:
        import pytest
        pytest.skip("native recon core unavailable")
    rng = np.random.default_rng(11)
    real = dq._native
    try:
        for _ in range(60):
            w = int(rng.choice([2, 4, 8, 16, 32]))
            h = int(rng.choice([2, 4, 8, 16, 32]))
            qp = int(rng.integers(10, 51))
            mag = int(rng.choice([10, 300, 5000, 30000]))
            coeff = rng.integers(-mag, mag + 1, (h, w)).astype(np.int32)
            nat_q = dq._quant_native(l, coeff, w, h, qp, 8, dq.LAMBDA_T)
            dq._native = lambda: None
            py_q = dq.quant_depquant_np(coeff, qp, 8)
            dq._native = real
            assert (nat_q == py_q).all()
            nat_d = dq._dequant_native(l, py_q, w, h, qp, 8)
            dq._native = lambda: None
            py_d = dq.dequant_depquant_np(py_q, qp, 8)
            dq._native = real
            assert (nat_d == py_d).all()
    finally:
        dq._native = real
