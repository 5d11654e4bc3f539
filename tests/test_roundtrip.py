"""End-to-end gate (SURVEY.md §7.2 S2 tracer bullet):
decode(encode(x)) == encoder reconstruction, bit-exact, with hash-SEI
verification — the reference's workhorse self-consistency test
(SURVEY.md §4 item 1: --DecodedPictureHash workflow)."""
import numpy as np
import pytest

from vvc.io.yuv import Frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def synth_frame(w, h, t=0, seed=0):
    """Synthetic content: gradients + edges + a moving box + light noise."""
    rng = np.random.default_rng(seed + t)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 255 // max(1, w - 1) + yy * 64 // max(1, h - 1)) % 256
    y[(xx // 16 + yy // 16) % 2 == 0] //= 2
    bx = (10 + 7 * t) % max(1, w - 16)
    by = (6 + 5 * t) % max(1, h - 16)
    y[by:by + 16, bx:bx + 16] = 230
    y = np.clip(y + rng.integers(-4, 5, size=y.shape), 0, 255)
    cb = np.full((h // 2, w // 2), 120) + (xx[::2, ::2] // 8) % 16
    cr = np.full((h // 2, w // 2), 128) - (yy[::2, ::2] // 8) % 16
    return Frame(y.astype(np.int32), np.clip(cb, 0, 255).astype(np.int32),
                 np.clip(cr, 0, 255).astype(np.int32))


@pytest.mark.parametrize("w,h", [(128, 64), (96, 48)])
def test_encode_decode_bit_exact(w, h):
    frames = [synth_frame(w, h, t) for t in range(2)]
    bitstream, recons, stats = encode_sequence(frames, qp=32)
    decoded, info = decode_stream(bitstream)
    assert len(decoded) == len(frames)
    for i, (d, r) in enumerate(zip(decoded, recons)):
        assert (d.y == r.y).all(), f"luma mismatch poc {i}"
        assert (d.cb == r.cb).all(), f"cb mismatch poc {i}"
        assert (d.cr == r.cr).all(), f"cr mismatch poc {i}"
    assert all(info["hash_ok"]), info["hash_ok"]
    # sanity on quality/bits
    assert stats[0]["psnr_y"] > 28.0
    assert stats[0]["bits"] > 100


def test_qp_tradeoff():
    f = [synth_frame(64, 64)]
    bs_lo, _, st_lo = encode_sequence(f, qp=22)
    bs_hi, _, st_hi = encode_sequence(f, qp=40)
    assert len(bs_lo) > len(bs_hi)
    assert st_lo[0]["psnr_y"] > st_hi[0]["psnr_y"]


def test_decoder_rejects_corrupt_hash():
    f = [synth_frame(64, 64)]
    bitstream, _, _ = encode_sequence(f, qp=32)
    bad = bytearray(bitstream)
    # flip a bit late in the stream (inside slice payload)
    bad[len(bad) // 2] ^= 0x10
    from vvc.dec.decoder import HashMismatch
    try:
        decode_stream(bytes(bad))
    except (HashMismatch, AssertionError, IndexError, StopIteration):
        pass  # any detected failure is acceptable; silent wrong output is not
    else:
        _, info = decode_stream(bytes(bad), verify_hash=False)
        assert not all(info["hash_ok"])
