"""VVC-true lossless tier (VERDICT r2 task 7): transform-skip residual
coding + BDPCM replaces the HEVC-style transquant bypass.

Reference anchors: CABACWriter::residual_codingTS, TrQuant transform-skip
path, CABACWriter::bdpcm_mode; spec 7.3.10.11 / 8.4.5.2."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.cabac.ctx import SliceContexts
from vvc.cabac.engine import BinEncoder, BinDecoder
from vvc.cabac.residual_ts import write_residual_ts, read_residual_ts


def _roundtrip_blocks(blocks, bdpcms):
    ctxs_w, ctxs_r = SliceContexts(), SliceContexts()
    enc = BinEncoder()
    for lv, bd in zip(blocks, bdpcms):
        write_residual_ts(enc, ctxs_w, lv, is_luma=True, bdpcm=bd)
    enc.encode_bin_trm(1)
    data = enc.finish()
    dec = BinDecoder(data)
    out = []
    for lv, bd in zip(blocks, bdpcms):
        h, w = lv.shape
        out.append(read_residual_ts(dec, ctxs_r, (w, h), is_luma=True,
                                    bdpcm=bd))
    return out


def test_ts_coder_roundtrip_fuzz():
    rng = np.random.default_rng(5)
    blocks, bdpcms = [], []
    for _ in range(40):
        w = int(rng.choice([2, 4, 8, 16, 32]))
        h = int(rng.choice([2, 4, 8, 16, 32]))
        mag = int(rng.choice([1, 3, 40, 900]))
        lv = rng.integers(-mag, mag + 1, (h, w)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1          # coder is only called with cbf = 1
        blocks.append(lv)
        bdpcms.append(int(rng.integers(0, 3)))
    out = _roundtrip_blocks(blocks, bdpcms)
    for lv, o in zip(blocks, out):
        assert (lv == o).all()


def test_ts_budget_fallback_roundtrip():
    """Dense large-magnitude block exhausts the MaxCcbs budget — the
    bypass fallback must still roundtrip exactly."""
    rng = np.random.default_rng(6)
    lv = rng.integers(-2000, 2000, (32, 32)).astype(np.int32)
    out = _roundtrip_blocks([lv], [0])[0]
    assert (lv == out).all()


def test_bdpcm_dpcm_inverse():
    from vvc.model.recon import _dpcm_fwd, _dpcm_inv
    rng = np.random.default_rng(7)
    for d in (1, 2):
        r = rng.integers(-255, 256, (16, 16)).astype(np.int32)
        assert (_dpcm_inv(_dpcm_fwd(r, d), d) == r).all()


def test_lossless_roundtrip_uses_bdpcm():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(128, 96, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32, lossless=True)
    decs, info = decode_stream(bs)
    assert all(info["hash_ok"])
    for d, f in zip(decs, frames):
        assert (d.y == f.y).all()
        assert (d.cb == f.cb).all() and (d.cr == f.cr).all()
    # the search must actually engage BDPCM on smooth-gradient content
    from vvc.enc.rdo import rdo_partition
    from vvc.model.recon import reconstruct_leaves
    f = frames[0]
    _, _, leaves = rdo_partition(f.y, 32, lossless=True, lfnst=False)
    rec = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves(leaves, rec, 32, 8, orig_planes=(f.y, f.cb, f.cr),
                       lossless=True)
    assert sum(1 for l in leaves if l.bdpcm) > 0
    assert (rec[0] == f.y).all()


def test_lossless_tiled_bit_exact():
    """Gate-5 shape: lossless + tiles stays exact and parallel-invariant."""
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(256, 128, 0)]
    for cols in (1, 2):
        bs, recons, _ = encode_sequence(frames, qp=32, lossless=True,
                                        num_tile_cols=cols)
        decs, info = decode_stream(bs)
        assert all(info["hash_ok"])
        assert (decs[0].y == frames[0].y).all()
        assert (decs[0].cb == frames[0].cb).all()
