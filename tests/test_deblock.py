"""Deblocking filter tests: edge maps, smoothing behavior, enc/dec
symmetry, quality gain on blocky content."""
import numpy as np

from vvc.model.frame import Leaf
from vvc.kernels.deblock import deblock_frame, _edge_maps, BETA_TABLE, TC_TABLE
from vvc.io.synth import synth_frame
from vvc.io.yuv import psnr


def _planes(w, h, fill=128):
    return (np.full((h, w), fill, dtype=np.int32),
            np.full((h // 2, w // 2), fill, dtype=np.int32),
            np.full((h // 2, w // 2), fill, dtype=np.int32))


def test_tables_monotone():
    assert (np.diff(BETA_TABLE) >= 0).all()
    assert (np.diff(TC_TABLE) >= 0).all()


def test_edge_maps_from_leaves():
    leaves = [Leaf(0, 0, 8, 8), Leaf(8, 0, 8, 8), Leaf(0, 8, 8, 8), Leaf(8, 8, 8, 8)]
    ev, eh = _edge_maps(leaves, 16, 16, 8, 0)
    assert ev.shape == (16, 1) and ev.all()
    assert eh.shape == (1, 16) and eh.all()


def test_step_edge_smoothed():
    w = h = 16
    y, cb, cr = _planes(w, h)
    y[:, :8] = 100
    y[:, 8:] = 140   # sharp CU-boundary step
    leaves = [Leaf(0, 0, 8, 8), Leaf(8, 0, 8, 8), Leaf(0, 8, 8, 8), Leaf(8, 8, 8, 8)]
    before = abs(int(y[4, 7]) - int(y[4, 8]))
    deblock_frame((y, cb, cr), leaves, qp=37)
    after = abs(int(y[4, 7]) - int(y[4, 8]))
    assert after < before


def test_flat_content_untouched():
    y, cb, cr = _planes(32, 32, 77)
    leaves = [Leaf(x, yy, 8, 8) for yy in range(0, 32, 8) for x in range(0, 32, 8)]
    y0 = y.copy()
    deblock_frame((y, cb, cr), leaves, qp=32)
    assert (y == y0).all()  # no gradient → deltas are zero


def test_non_boundary_columns_untouched():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, size=(16, 16)).astype(np.int32)
    cb = rng.integers(0, 256, size=(8, 8)).astype(np.int32)
    cr = cb.copy()
    leaves = [Leaf(0, 0, 16, 16)]  # single CU → no internal edges
    y0 = y.copy()
    deblock_frame((y, cb, cr), leaves, qp=40)
    assert (y == y0).all()


def test_roundtrip_with_deblocking_bit_exact_and_better():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(96, 48, 0)]
    bs, recons, stats = encode_sequence(frames, qp=39)
    dec, info = decode_stream(bs)
    assert (dec[0].y == recons[0].y).all()
    assert (dec[0].cb == recons[0].cb).all()
    assert all(info["hash_ok"])
