"""APS NAL transport (VERDICT r2 task 6): ALF/LMCS parameters ride
PREFIX_APS units referenced by id from the slice header (spec 7.3.2.5;
reference: VLCWriter::codeAPS / ParameterSetManager)."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.io.nal import read_annexb
from vvc.common.types import NalUnitType


def test_aps_rbsp_roundtrip():
    from vvc.hls.aps import (write_aps_alf, write_aps_lmcs, parse_aps,
                             APS_ALF, APS_LMCS)
    rng = np.random.default_rng(0)
    coeffs = rng.integers(-64, 64, (3, 12)).astype(np.int32)
    clips = rng.integers(0, 4, 3).astype(np.int32)
    fmap = rng.integers(0, 3, 25).astype(np.int32)
    chroma = rng.integers(-32, 32, 6).astype(np.int32)
    cc = rng.integers(-64, 64, 7).astype(np.int32)
    t, i, (luma, chr_, cc_cb, cc_cr) = parse_aps(write_aps_alf(
        7, (coeffs, clips, fmap), chroma, cc_cb=cc))
    assert t == APS_ALF and i == 7
    assert (luma[0] == coeffs).all() and (luma[1] == clips).all()
    assert (luma[2] == fmap).all() and (chr_ == chroma).all()
    assert (cc_cb == cc).all() and cc_cr is None
    # luma-only / chroma-only
    t, i, (luma, chr_, cc_cb, cc_cr) = parse_aps(write_aps_alf(3, None,
                                                               chroma))
    assert luma is None and (chr_ == chroma).all()
    assert cc_cb is None and cc_cr is None
    cw = [64 + k for k in range(16)]
    t, i, out = parse_aps(write_aps_lmcs(9, cw))
    assert t == APS_LMCS and i == 9 and out == cw


def test_stream_carries_aps_and_decodes():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(128, 96, t) for t in range(2)]
    bs, recons, _ = encode_sequence(frames, qp=32, lmcs=True)
    types = [n.nal_type for n in read_annexb(bs)]
    n_aps = sum(1 for t in types if t == NalUnitType.PREFIX_APS)
    assert n_aps >= 2          # ALF + LMCS per intra picture
    # APS precedes its slice
    first_slice = types.index(NalUnitType.IDR_N_LP)
    assert NalUnitType.PREFIX_APS in types[:first_slice]
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, r in zip(decs, recons):
        assert (d.y == r.y).all()
        assert (d.cb == r.cb).all() and (d.cr == r.cr).all()
