"""Wavefront batched reconstruction: bit-exact with the sequential path,
and actually parallel (waves ≪ leaves)."""
import numpy as np

from vvc.io.synth import synth_frame
from vvc.enc.rdo import rdo_partition
from vvc.model.recon import reconstruct_leaves
from vvc.dec.wavefront import reconstruct_leaves_wavefront, compute_waves


def _encode_leaves(w, h, qp, lossless=False):
    f = synth_frame(w, h, 0)
    _, _, leaves = rdo_partition(f.y, qp, 8, lossless=lossless)
    rec = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves(leaves, rec, qp, 8, (f.y, f.cb, f.cr),
                       lossless=lossless)
    return f, leaves, rec


def test_wavefront_matches_sequential():
    f, leaves, rec_seq = _encode_leaves(192, 128, 30)
    rec_wf = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    n_waves = reconstruct_leaves_wavefront(leaves, rec_wf, 30, 8)
    assert (rec_wf[0] == rec_seq[0]).all()
    assert (rec_wf[1] == rec_seq[1]).all()
    assert (rec_wf[2] == rec_seq[2]).all()
    # parallelism: far fewer waves than leaves
    assert n_waves < len(leaves) / 2, (n_waves, len(leaves))


def test_wavefront_lossless():
    f, leaves, rec_seq = _encode_leaves(96, 64, 32, lossless=True)
    rec_wf = (np.zeros_like(f.y), np.zeros_like(f.cb), np.zeros_like(f.cr))
    reconstruct_leaves_wavefront(leaves, rec_wf, 32, 8, lossless=True)
    assert (rec_wf[0] == rec_seq[0]).all()
    assert (rec_wf[0] == f.y).all()


def test_wave_layering_respects_dependencies():
    f, leaves, _ = _encode_leaves(128, 64, 32)
    waves = compute_waves(leaves, 128, 64)
    level_of = {}
    for lvl, wave in enumerate(waves):
        for i in wave:
            level_of[i] = lvl
    # any leaf whose region touches another leaf's reference border and
    # precedes it in z-order must be in a strictly earlier wave
    for j, b in enumerate(leaves):
        for i in range(j):
            a = leaves[i]
            # does a touch b's top/left border?
            top = (b.y0 > 0 and a.y0 <= b.y0 - 1 < a.y0 + a.size
                   and a.x0 < b.x0 + 2 * b.size and a.x0 + a.size > b.x0 - 1)
            left = (b.x0 > 0 and a.x0 <= b.x0 - 1 < a.x0 + a.size
                    and a.y0 < b.y0 + 2 * b.size and a.y0 + a.size > b.y0)
            if top or left:
                assert level_of[i] < level_of[j], (i, j)


def test_decode_stream_wavefront_path():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    frames = [synth_frame(96, 64, 0)]
    bs, recons, _ = encode_sequence(frames, qp=33)
    dec_a, info_a = decode_stream(bs)
    dec_b, info_b = decode_stream(bs, wavefront=True)
    assert (dec_a[0].y == dec_b[0].y).all()
    assert (dec_a[0].cb == dec_b[0].cb).all()
    assert all(info_b["hash_ok"])
