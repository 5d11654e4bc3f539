"""Large-picture / long-sequence tier (VERDICT r1 item 8): behavior that
tiny synthetic tests cannot see — 720p-class memory/wave behavior, RC
stability over a long GOP run, DPB boundedness.

Runtime-bounded: the 720p encode runs a short LDP burst; the long-RC run
uses a small picture.  Both assert hard wall-clock ceilings so a perf
regression fails CI rather than silently slowing every round."""
import time

import numpy as np
import pytest

from vvc.io.synth import synth_frame
from vvc.io.yuv import psnr


def test_720p_encode_decode_roundtrip_and_runtime():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    w, h = 1280, 720
    frames = [synth_frame(w, h, t) for t in range(3)]
    t0 = time.process_time()
    data, recons, stats = encode_sequence(frames, qp=34, mode="ldp")
    enc_dt = time.process_time() - t0
    t0 = time.process_time()
    out, info = decode_stream(data)
    dec_dt = time.process_time() - t0
    assert all(info["hash_ok"])
    for f, r in zip(out, recons):
        assert (f.y == r.y).all()
    assert stats[0]["psnr_y"] > 30.0
    # CPU-time ceilings (virtual-CPU backend, 8 devices): process_time is
    # wall-clock-load independent, so the suite running under load cannot
    # trip them (r2 flake).  Measured ~178s enc / ~2.7s dec CPU on the CI
    # image; a 2.5x regression trips.
    assert enc_dt < 450.0, f"720p 3-frame encode took {enc_dt:.0f}s CPU"
    assert dec_dt < 60.0, f"720p 3-frame decode took {dec_dt:.0f}s CPU"


def test_rc_stability_long_sequence():
    # 65-frame RA encode with rate control: achieved rate within ±15% of
    # target, QP stays in a sane band, no drift blowup in the tail
    from vvc.enc.encoder import encode_sequence
    frames = [synth_frame(256, 128, t) for t in range(65)]
    fps = 30.0
    kbps = 400.0
    data, recons, stats = encode_sequence(frames, qp=32, mode="ra",
                                          gop_size=16, target_kbps=kbps,
                                          fps=fps)
    got = sum(s["bits"] for s in stats) * fps / len(frames) / 1000.0
    assert abs(got - kbps) / kbps < 0.15, f"rate {got:.0f} vs {kbps}"
    qps = [s["qp"] for s in stats]
    assert max(qps) <= 51 and min(qps) >= 10
    # tail half must not drift: its rate within ±30% of the first half's
    half = len(stats) // 2
    b0 = sum(s["bits"] for s in stats[:half])
    b1 = sum(s["bits"] for s in stats[half:])
    assert 0.5 < b1 / b0 < 2.0, (b0, b1)


def test_dpb_stays_bounded_ra():
    # decoding a full RA GOP run must not accumulate the whole sequence
    # in the DPB-keyed dict beyond reference reach (decoder keeps a dict
    # keyed by POC; sanity: decode succeeds and outputs all frames in
    # display order)
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(128, 64, t) for t in range(33)]
    data, recons, stats = encode_sequence(frames, qp=34, mode="ra",
                                          gop_size=16)
    out, info = decode_stream(data)
    assert len(out) == 33
    assert all(info["hash_ok"])
    assert sorted(info["decode_order_pocs"]) == list(range(33))


def test_ctu128_roundtrip():
    """CTU 128 with MaxCUSize/MaxTbSize 64: 128-CTU nodes split
    implicitly (no flag) before coding — VERDICT r3 task 9 / reference
    CommonDef MAX_CU_SIZE.  Roundtrip must be bit-exact and the stream's
    SPS must carry log2_ctu 7."""
    import numpy as np
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    from vvc.hls.parse import parse_sps
    from vvc.io.nal import read_annexb
    from vvc.common.types import NalUnitType
    frames = [synth_frame(256, 192, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, ctu_size=128)
    sps = next(parse_sps(n.payload) for n in read_annexb(bs)
               if n.nal_type == NalUnitType.SPS)
    assert sps.ctu_size == 128
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()


def test_ctu128_inter_roundtrip():
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(256, 128, t) for t in range(3)]
    bs, recons, stats = encode_sequence(frames, qp=32, ctu_size=128,
                                        mode="ra", gop_size=2)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
