"""CLI + cfg + BD-rate tooling tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

from vvc.cli.cfg import parse_cfg_file, parse_args, build_encoder_config
from vvc.utils.bdrate import bd_rate, bd_psnr
from vvc.io.yuv import YuvWriter, YuvReader
from vvc.io.synth import synth_frame


def test_cfg_file_parsing(tmp_path):
    cfg = tmp_path / "enc.cfg"
    cfg.write_text(
        "# comment\n"
        "InputFile   : in.yuv  # trailing\n"
        "SourceWidth : 416\n"
        "SourceHeight: 240\n"
        "QP          : 32\n"
        "IntraPeriod : 1\n"
        "UnknownTool : 1\n")
    opts = parse_args(["-c", str(cfg), "--QP=27", "-f", "8"])
    assert opts["QP"] == "27"  # CLI overrides cfg
    sps, pps, io, leftover = build_encoder_config(opts)
    assert sps.width == 416 and sps.height == 240
    assert pps.init_qp == 27
    assert io["frames"] == 8
    assert "UnknownTool" in leftover


def test_bd_rate_sanity():
    # test curve shifted right by exactly 10% rate at equal psnr → +10%
    r_a = [1000, 2000, 4000, 8000]
    p = [30.0, 33.0, 36.0, 39.0]
    r_t = [r * 1.1 for r in r_a]
    assert abs(bd_rate(r_a, p, r_t, p) - 10.0) < 0.2
    assert bd_rate(r_a, p, r_a, p) == pytest.approx(0.0, abs=1e-9)
    assert bd_psnr(r_a, p, r_a, [q + 0.5 for q in p]) == pytest.approx(0.5, abs=0.05)


def test_encode_decode_cli_roundtrip(tmp_path):
    w, h, n = 96, 48, 2
    yuv = tmp_path / "in.yuv"
    with YuvWriter(str(yuv)) as wr:
        for t in range(n):
            wr.write_frame(synth_frame(w, h, t))
    env = dict(os.environ, JAX_PLATFORMS="cpu", VVC_JAX_PLATFORM="cpu")
    bs = tmp_path / "out.266"
    rec = tmp_path / "rec.yuv"
    dec = tmp_path / "dec.yuv"
    r = subprocess.run(
        [sys.executable, "-m", "vvc.cli.vvcenc", "-i", str(yuv),
         "-wdt", str(w), "-hgt", str(h), "-f", str(n), "-q", "35",
         "-b", str(bs), "-o", str(rec)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "SUMMARY" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "vvc.cli.vvcdec", "-b", str(bs), "-o", str(dec)],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "[OK]" in r.stdout and "[ERROR]" not in r.stdout
    assert dec.read_bytes() == rec.read_bytes()


def test_parcat(tmp_path):
    from vvc.cli.parcat import concat
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    seg0, rec0, _ = encode_sequence([synth_frame(64, 64, 0)], qp=32)
    seg1, rec1, _ = encode_sequence([synth_frame(64, 64, 1)], qp=32)
    merged = concat([seg0, seg1])
    frames, info = decode_stream(merged)
    assert len(frames) == 2
    assert (frames[0].y == rec0[0].y).all()
    assert (frames[1].y == rec1[0].y).all()


def test_parcat_mixed_qp_segments():
    """Segments with different PPS content must keep their parameter sets
    through concatenation (regression: parcat dropped all non-first PS)."""
    from vvc.cli.parcat import concat
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    s0, r0, _ = encode_sequence([synth_frame(64, 64, 0)], qp=35)
    s1, r1, _ = encode_sequence([synth_frame(64, 64, 1)], qp=30)
    frames, info = decode_stream(concat([s0, s1]))
    assert len(frames) == 2
    assert all(info["hash_ok"])
    assert (frames[0].y == r0[0].y).all()
    assert (frames[1].y == r1[0].y).all()
