"""Native tree reader (cabac_core.cpp tr_read) equivalence.

The native parser + record deriver must produce EXACTLY the
reconstruction of the per-bin Python TreeReader on the same stream —
every tool on, both slice types (reference: the parse/derive split of
OpenVVC vcl_*.c / drv_*.c, SURVEY §2.6)."""
import os

import numpy as np
import pytest

from vvc.io.synth import synth_frame
from vvc.enc.encoder import encode_sequence
from vvc.dec.decoder import decode_stream
from vvc.packer import native as native_packer


pytestmark = pytest.mark.skipif(not native_packer.available(),
                                reason="native packer unavailable")


def _ab_decode(bs):
    decs_n, info_n = decode_stream(bs)
    os.environ["VVC_NO_NATIVE_TR"] = "1"
    try:
        decs_p, info_p = decode_stream(bs)
    finally:
        del os.environ["VVC_NO_NATIVE_TR"]
    assert all(info_n["hash_ok"]) and all(info_p["hash_ok"])
    for a, b in zip(decs_n, decs_p):
        assert (a.y == b.y).all()
        assert (a.cb == b.cb).all() and (a.cr == b.cr).all()


def test_native_reader_matches_python_tools_on():
    frames = [synth_frame(192, 128, t) for t in range(5)]
    bs, _, _ = encode_sequence(frames, qp=30, mode="ra", gop_size=4,
                               mtt=True, isp=True, dep_quant=True,
                               affine=True, mmvd=True, ciip=True,
                               gpm=True, amvr=True, smvd=True, bcw=True,
                               mrl=True, lmcs=True, bdof=True, dmvr=True)
    _ab_decode(bs)


def test_native_reader_matches_python_wpp():
    frames = [synth_frame(192, 192, t) for t in range(3)]
    bs, _, _ = encode_sequence(frames, qp=32, mode="ldp", wpp=True,
                               mtt=True, isp=True)
    _ab_decode(bs)
