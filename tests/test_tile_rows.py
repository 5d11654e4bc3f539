"""Tile rows (P-3 grid tiles; reference: PPS::initTiles rows x columns).

Grid tiles = independent substreams + per-tile recon isolation on both
axes; loop filters never cross tile boundaries (deblocking skips the
boundary edges; SAO classification region-splits by columns — the
documented pps_loop_filter_across_tiles=0 configuration)."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence, tile_grid
from vvc.dec.decoder import decode_stream


def _roundtrip(frames, **kw):
    bs, recons, stats = encode_sequence(frames, qp=32, **kw)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"]), kw
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()
    return sum(s["bits"] for s in stats)


def test_tile_grid_geometry():
    g = tile_grid(2, 2, 256, 192, 64)
    assert g == [(0, 128, 0, 64), (128, 256, 0, 64),
                 (0, 128, 64, 192), (128, 256, 64, 192)]
    assert tile_grid(1, 1, 256, 192, 64) == [(0, 256, 0, 192)]
    # rows come out CTU-aligned even when height isn't divisible
    g = tile_grid(1, 2, 128, 192, 64)
    assert g == [(0, 128, 0, 64), (0, 128, 64, 192)]


def test_tile_rows_roundtrip_ai():
    frames = [synth_frame(256, 192, t) for t in range(2)]
    _roundtrip(frames, num_tile_rows=2)
    _roundtrip(frames, num_tile_cols=2, num_tile_rows=2)


def test_tile_rows_roundtrip_inter_tools():
    frames = [synth_frame(256, 192, t) for t in range(4)]
    _roundtrip(frames, mode="ra", gop_size=4, num_tile_cols=2,
               num_tile_rows=2, mmvd=True, ciip=True)


def test_tile_rows_lossless_bit_exact():
    frames = [synth_frame(192, 192, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, lossless=True,
                                        num_tile_rows=2)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, f in zip(decs, frames):
        assert (d.y == f.y).all()
