"""WPP (entropy_coding_sync) row-substream tests."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def test_wpp_roundtrip_bit_exact():
    frames = [synth_frame(176, 144, t) for t in range(2)]
    bs, recons, _ = encode_sequence(frames, qp=32, wpp=True)
    dec, info = decode_stream(bs)
    for d, r in zip(dec, recons):
        assert (d.y == r.y).all() and (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])


def test_wpp_matches_non_wpp_recon():
    """WPP changes only the entropy layer — reconstruction is identical."""
    frames = [synth_frame(176, 144, 0)]
    _, rec_a, st_a = encode_sequence(frames, qp=32, wpp=False)
    _, rec_b, st_b = encode_sequence(frames, qp=32, wpp=True)
    assert (rec_a[0].y == rec_b[0].y).all()
    # row substreams cost a few bits (per-row termination + entry points)
    assert abs(st_a[0]["bits"] - st_b[0]["bits"]) < 0.1 * st_a[0]["bits"]
