"""Inter coding (S4): MC kernels, P/B roundtrips, GOP structures.

Mirrors the reference's self-consistency net (SURVEY.md §4): hash-SEI
verified decode(encode(x)) == encoder recon, plus kernel-level oracle
equivalence (golden path A)."""
import numpy as np
import pytest

from vvc.io.synth import synth_frame
from vvc.io.yuv import psnr


def _seq(n, w=64, h=64):
    return [synth_frame(w, h, t) for t in range(n)]


class TestMcKernels:
    def test_integer_mv_is_shift(self):
        from vvc.kernels.mc import mc_block_np
        rng = np.random.default_rng(0)
        plane = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
        # inner block displaced by full-pel MV == direct slice
        pred = mc_block_np(plane, 16, 16, 8, 8, mv_x=4 * 3, mv_y=4 * -2,
                           bit_depth=8)
        np.testing.assert_array_equal(pred, plane[14:22, 19:27])

    def test_fractional_range_and_determinism(self):
        from vvc.kernels.mc import mc_block_np
        rng = np.random.default_rng(1)
        plane = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
        for mvx, mvy in [(1, 0), (2, 3), (-5, 7), (9, -6)]:
            p1 = mc_block_np(plane, 24, 24, 8, 8, mvx, mvy, 8)
            p2 = mc_block_np(plane, 24, 24, 8, 8, mvx, mvy, 8)
            assert p1.min() >= 0 and p1.max() <= 255
            np.testing.assert_array_equal(p1, p2)

    def test_phase_planes_match_oracle(self):
        """Encoder's gather-from-phase-planes == normative per-block MC."""
        from vvc.kernels.mc import (mc_block_np, interp_luma_planes,
                                    gather_pred_planes)
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        plane = rng.integers(0, 256, size=(48, 48)).astype(np.int32)
        planes = interp_luma_planes(plane, 8)
        xs, ys = np.array([8, 16, 24]), np.array([8, 0, 32])
        mvx, mvy = np.array([5, -3, 2]), np.array([-1, 7, 10])
        got = np.asarray(gather_pred_planes(
            planes, jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(mvx), jnp.asarray(mvy), 8))
        for i in range(3):
            want = mc_block_np(plane, int(xs[i]), int(ys[i]), 8, 8,
                               int(mvx[i]), int(mvy[i]), 8)
            np.testing.assert_array_equal(got[i], want)

    def test_clamping_at_borders(self):
        from vvc.kernels.mc import mc_block_np
        rng = np.random.default_rng(3)
        plane = rng.integers(0, 256, size=(32, 32)).astype(np.int32)
        # MV pointing far outside: must not raise, stays in range
        p = mc_block_np(plane, 0, 0, 8, 8, -400, -400, 8)
        assert p.shape == (8, 8) and p.min() >= 0


class TestMotionDerivation:
    def test_merge_amvp_symmetry(self):
        """Candidates depend only on state updated in syntax order — same
        calls from writer and reader must agree."""
        from vvc.model.motion import (MotionState, merge_candidates,
                                      amvp_candidates)
        ms = MotionState(64, 64)
        ms.set_inter(0, 0, 16, 1, ((12, -4), (0, 0)), (0, 0))
        ms.set_inter(16, 0, 16, 1, ((8, 8), (0, 0)), (0, 0))
        c1 = merge_candidates(ms, 16, 16, 16, False, 1, 0)
        c2 = merge_candidates(ms, 16, 16, 16, False, 1, 0)
        assert len(c1) == 6
        for a, b in zip(c1, c2):
            assert a[0] == b[0]
            np.testing.assert_array_equal(a[1], b[1])
        a1 = amvp_candidates(ms, 16, 16, 16, 0, 0)
        assert len(a1) == 2 and a1[0] == (8, 8)  # B1 neighbour above


class TestInterRoundtrip:
    def test_ldp_roundtrip_bitexact(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = _seq(4)
        bs, recons, stats = encode_sequence(frames, qp=32, mode="ldp")
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)
            np.testing.assert_array_equal(r.cb, d.cb)
            np.testing.assert_array_equal(r.cr, d.cr)
        assert stats[1]["slice_type"] == 1  # P

    def test_ra_roundtrip_bitexact_and_reordered(self):
        from vvc.enc.encoder import encode_sequence
        from vvc.dec.decoder import decode_stream
        frames = _seq(9)
        bs, recons, stats = encode_sequence(frames, qp=32, mode="ra",
                                            gop_size=8)
        decoded, info = decode_stream(bs)
        assert all(info["hash_ok"])
        # decode order differs from display order (hierarchical B)
        assert info["decode_order_pocs"] != sorted(info["decode_order_pocs"])
        for r, d in zip(recons, decoded):
            np.testing.assert_array_equal(r.y, d.y)
        assert any(s["slice_type"] == 0 for s in stats)  # B slices present

    def test_inter_saves_bits_vs_intra(self):
        """Temporal prediction must pay for itself on mostly-static
        content (the reference's raison d'être for P frames)."""
        from vvc.enc.encoder import encode_sequence
        frames = _seq(4, 128, 64)
        bs_ai, _, st_ai = encode_sequence(frames, qp=32, mode="ai")
        bs_ld, _, st_ld = encode_sequence(frames, qp=32, mode="ldp")
        bits_ai = sum(s["bits"] for s in st_ai[1:])
        bits_ld = sum(s["bits"] for s in st_ld[1:])
        assert bits_ld < 0.7 * bits_ai, (bits_ld, bits_ai)
        # quality in the same ballpark
        assert min(s["psnr_y"] for s in st_ld) > \
            min(s["psnr_y"] for s in st_ai) - 2.0

    def test_ldp_quality_reasonable(self):
        from vvc.enc.encoder import encode_sequence
        frames = _seq(3)
        _, recons, stats = encode_sequence(frames, qp=27, mode="ldp")
        for f, r in zip(frames, recons):
            assert psnr(f.y, r.y, 8) > 30.0


class TestGopStructures:
    def test_ra_order_covers_all_frames(self):
        from vvc.enc.gop import gop_order
        for n in (1, 2, 7, 16, 17, 33):
            order = gop_order(n, "ra", 16)
            assert sorted(e.poc for e in order) == list(range(n))
            # refs always precede use in coding order
            coded = set()
            for e in order:
                for p in tuple(e.l0) + tuple(e.l1):
                    assert p in coded, (n, e)
                coded.add(e.poc)

    def test_ldp_refs(self):
        from vvc.enc.gop import gop_order
        order = gop_order(5, "ldp")
        assert order[0].slice_type == 2
        # nearest-first multi-ref L0 (2 refs where available)
        assert order[1].l0 == (0,)
        assert all(e.l0[0] == e.poc - 1 and len(e.l0) <= 2
                   for e in order[1:])
        assert order[3].l0 == (2, 1)


class TestHierarchicalMeAndMerge:
    def test_large_motion_found(self):
        # 24-px pan exceeds the old flat range-16 window; hierarchical ME
        # (top-level 32 + parent-centered children) must lock onto it
        from vvc.enc.inter_search import rdo_inter_partition
        rng = np.random.default_rng(5)
        base = rng.integers(0, 256, size=(64, 192)).astype(np.int32)
        ref = base[:, 24:24 + 128].copy()
        cur = base[:, 0:128].copy()      # content moved 24 px right→left
        _, _, leaves = rdo_inter_partition(cur, [ref], [], qp=32)
        inter_lv = [l for l in leaves if l.pred == 1]
        assert inter_lv, "no inter leaf chosen on pure translation"
        area = sum(l.w * l.h for l in inter_lv)
        good = sum(l.w * l.h for l in inter_lv
                   if l.mv[0] == (-4 * 24, 0))
        assert good >= 0.7 * area, (
            f"only {good}/{area} px found the 24-px MV")

    def test_small_blocks_get_inter(self):
        # 8x8 leaves must carry inter candidates (old ME_SIZES_MIN=16
        # forced them intra)
        from vvc.enc.inter_search import ME_SIZES_MIN
        assert ME_SIZES_MIN == 8

    def test_merge_adoption_reduces_bits(self):
        # coherent global pan: neighbour-adoption makes the MV field
        # uniform, so most inter CUs ride merge syntax (cheap);
        # P-frame bits must be a small fraction of the I-frame's
        from vvc.enc.encoder import encode_sequence
        from vvc.io.yuv import Frame
        rng = np.random.default_rng(9)
        base = rng.integers(0, 256, size=(96, 160)).astype(np.int32)
        frames = []
        for t in range(3):
            y = base[:64, 8 * t:8 * t + 128].copy()
            cb = np.full((32, 64), 120, np.int32)
            cr = np.full((32, 64), 100, np.int32)
            frames.append(Frame(y, cb, cr))
        data, recons, stats = encode_sequence(frames, qp=32, mode="ldp")
        assert stats[1]["bits"] < 0.25 * stats[0]["bits"]
        assert stats[2]["bits"] < 0.25 * stats[0]["bits"]
