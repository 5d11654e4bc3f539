"""Multi-host DCN story: GOP-segment scatter + Parcat gather.

VERDICT r3 task 7 — ≥2 separate host PROCESSES encode IDR-delimited
segments; the gathered stream must equal the in-process segmented encode
byte-for-byte (determinism), and decode to the per-segment recons in
display order (POC continuity via poc_base).  Reference: App/Parcat +
the split-encode flow (SURVEY.md §2.7 P-6, §5.8).
"""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.shard.dcn import encode_multihost, split_segments
from vvc.dec.decoder import decode_stream


def test_split_segments_gop_aligned():
    assert split_segments(32, 2, 8) == [(0, 16), (16, 16)]
    assert split_segments(20, 2, 8) == [(0, 16), (16, 4)]
    assert split_segments(8, 4, 8) == [(0, 8)]


def test_multihost_matches_inprocess_and_decodes():
    frames = [synth_frame(128, 96, t) for t in range(8)]
    kw = dict(qp=32, mode="ra")
    bs_mp, rec_mp, st_mp = encode_multihost(frames, n_hosts=2, gop_size=4,
                                            processes=True, **kw)
    bs_ip, rec_ip, st_ip = encode_multihost(frames, n_hosts=2, gop_size=4,
                                            processes=False, **kw)
    assert bs_mp == bs_ip, "multi-process bytes != in-process bytes"
    decs, info = decode_stream(bs_mp)
    assert all(info["hash_ok"])
    assert len(decs) == len(frames)
    for d, r in zip(decs, rec_mp):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()


def test_poc_base_slice_headers():
    """Second segment's slices must carry global POCs."""
    from vvc.enc.encoder import encode_sequence
    frames = [synth_frame(96, 64, t) for t in range(3)]
    bs, _, _ = encode_sequence(frames, qp=32, mode="ra", gop_size=2,
                               poc_base=10)
    decs, info = decode_stream(bs)
    assert sorted(info["decode_order_pocs"]) == [10, 11, 12]
