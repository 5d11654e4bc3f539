"""GOP-boundary checkpoint / resume (SURVEY §5.4).

All cross-GOP encoder state is explicit (DPB recons, rate-control
accumulators, emitted NALs), so a resumed encode must be BYTE-identical
to an uninterrupted run — including with rate control active (the only
other cross-GOP mutable state besides the DPB, §5.4)."""
import os

import numpy as np
import pytest

from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream


def _frames(n=9, w=96, h=64):
    return [synth_frame(w, h, t) for t in range(n)]


def test_resume_is_byte_identical(tmp_path):
    frames = _frames()
    kw = dict(qp=32, mode="ra", gop_size=4)
    ref, _, _ = encode_sequence(frames, **kw)
    ck = str(tmp_path / "enc.ckpt")
    # interrupted run: encode with checkpointing, then simulate the crash
    # by re-running from the checkpoint (start_ei > 0 skips done work)
    encode_sequence(frames, checkpoint_path=ck, **kw)
    assert os.path.exists(ck)
    out, recons, stats = encode_sequence(frames, checkpoint_path=ck,
                                         resume=True, **kw)
    assert out == ref
    assert all(s is not None for s in stats)
    decs, info = decode_stream(out)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()


def test_resume_with_rate_control(tmp_path):
    frames = _frames(5)
    kw = dict(qp=34, mode="ldp", gop_size=4, target_kbps=300.0, fps=30.0)
    ref, _, _ = encode_sequence(frames, **kw)
    ck = str(tmp_path / "enc.ckpt")
    encode_sequence(frames, checkpoint_path=ck, **kw)
    out, _, _ = encode_sequence(frames, checkpoint_path=ck, resume=True,
                                **kw)
    assert out == ref


def test_config_mismatch_rejected(tmp_path):
    frames = _frames(5)
    ck = str(tmp_path / "enc.ckpt")
    encode_sequence(frames, qp=32, mode="ra", gop_size=4,
                    checkpoint_path=ck)
    with pytest.raises(AssertionError):
        encode_sequence(frames, qp=30, mode="ra", gop_size=4,
                        checkpoint_path=ck, resume=True)
