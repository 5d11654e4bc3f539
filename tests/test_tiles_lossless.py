"""Tiles + lossless tests (BASELINE.json config-5 shape: tiled encode,
bit-exact reconstruction, independent substreams)."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence, tile_columns
from vvc.dec.decoder import decode_stream


def test_tile_columns_geometry():
    assert tile_columns(1, 256, 64) == [(0, 256)]
    assert tile_columns(2, 256, 64) == [(0, 128), (128, 256)]
    assert tile_columns(2, 192, 64) == [(0, 64), (64, 192)]
    # width not CTU-aligned: last tile absorbs the partial CTU column
    assert tile_columns(2, 416, 64) == [(0, 192), (192, 416)]


def test_tiled_roundtrip_bit_exact():
    frames = [synth_frame(256, 64, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, num_tile_cols=2)
    assert stats[0]["n_tiles"] == 2
    dec, info = decode_stream(bs)
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all() and (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])


def test_tiled_matches_parallel_off():
    """Thread-parallel tile coding must be deterministic (same bytes)."""
    frames = [synth_frame(256, 64, 0)]
    bs_p, _, _ = encode_sequence(frames, qp=32, num_tile_cols=4,
                                 parallel_tiles=True)
    bs_s, _, _ = encode_sequence(frames, qp=32, num_tile_cols=4,
                                 parallel_tiles=False)
    assert bs_p == bs_s


def test_lossless_bit_exact_to_source():
    frames = [synth_frame(96, 48, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, lossless=True)
    for f, r in zip(frames, recons):
        assert (f.y == r.y).all(), "lossless luma must equal source"
        assert (f.cb == r.cb).all() and (f.cr == r.cr).all()
    dec, info = decode_stream(bs)
    for f, d in zip(frames, dec):
        assert (f.y == d.y).all() and (f.cb == d.cb).all() and (f.cr == d.cr).all()
    assert all(info["hash_ok"])


def test_lossless_tiled_multihost_shape():
    """Config-5 shape: tiled lossless encode, decode bit-exact == source,
    and the stream equals the single-threaded encode (host-count
    invariance of the sharded entropy stage)."""
    frames = [synth_frame(256, 64, 0)]
    bs, recons, _ = encode_sequence(frames, qp=32, num_tile_cols=4,
                                    lossless=True)
    bs2, _, _ = encode_sequence(frames, qp=32, num_tile_cols=4,
                                lossless=True, parallel_tiles=False)
    assert bs == bs2
    dec, info = decode_stream(bs)
    assert (dec[0].y == frames[0].y).all()
    assert (dec[0].cb == frames[0].cb).all()
    assert all(info["hash_ok"])
