"""10-bit pipeline tests (reference: InternalBitDepth=10 CTC operating
points; SURVEY.md §7.2 S5 uses 10-bit)."""
from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def test_10bit_roundtrip_bit_exact():
    frames = [synth_frame(96, 48, t, bit_depth=10) for t in range(2)]
    bs, rec, st = encode_sequence(frames, qp=32, bit_depth=10)
    dec, info = decode_stream(bs)
    assert info["sps"].bit_depth == 10
    for d, r in zip(dec, rec):
        assert (d.y == r.y).all() and (d.cb == r.cb).all() and (d.cr == r.cr).all()
    assert all(info["hash_ok"])
    assert st[0]["psnr_y"] > 30


def test_10bit_lossless():
    frames = [synth_frame(64, 64, 0, bit_depth=10)]
    bs, rec, _ = encode_sequence(frames, qp=32, bit_depth=10, lossless=True)
    dec, info = decode_stream(bs)
    assert (dec[0].y == frames[0].y).all()
    assert (dec[0].cb == frames[0].cb).all()
    assert all(info["hash_ok"])
