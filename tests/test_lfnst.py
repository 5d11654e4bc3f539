"""LFNST: kernel equivalences (numpy == jax batch == C++), selection on
smooth content, and bit-exact roundtrip through both decoder paths."""
import numpy as np
import pytest

from vvc.kernels.lfnst import (fwd_lfnst_np, inv_lfnst_np, fwd_lfnst_batch,
                               inv_lfnst_batch, lfnst_set)
from vvc.io.yuv import Frame


def _smooth_frames(n=2, w=128, h=128):
    ys, xs = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (60 + 0.8 * xs + 0.4 * ys
             + 12 * np.sin(xs / 40.0 + t) * np.cos(ys / 37.0)).astype(np.int32)
        c = np.full((h // 2, w // 2), 110, np.int32)
        out.append(Frame(y, c, c + 30, 8))
    return out


def test_set_mapping():
    assert lfnst_set(0) == (0, False)
    assert lfnst_set(1) == (0, False)
    assert lfnst_set(18) == (2, False)       # diagonal class
    assert lfnst_set(50) == (2, True)        # mirrored: 68-50=18
    assert lfnst_set(66) == (1, True)
    assert lfnst_set(70) == (0, False)       # MIP


@pytest.mark.parametrize("size", [8, 16, 32])
@pytest.mark.parametrize("li", [1, 2])
def test_numpy_vs_batch(size, li):
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    n = 5
    coeff = rng.integers(-500, 500, (n, size, size)).astype(np.int32)
    modes = np.array([0, 18, 34, 50, 67], dtype=np.int32)
    fb = np.asarray(fwd_lfnst_batch(jnp.asarray(coeff), jnp.asarray(modes), li))
    ib = np.asarray(inv_lfnst_batch(jnp.asarray(coeff), jnp.asarray(modes), li))
    for k in range(n):
        assert np.array_equal(fb[k], fwd_lfnst_np(coeff[k], int(modes[k]), li))
        assert np.array_equal(ib[k], inv_lfnst_np(coeff[k], int(modes[k]), li))


def test_forward_zero_out_shape():
    coeff = np.full((16, 16), 100, dtype=np.int32)
    out = fwd_lfnst_np(coeff, 18, 1)
    assert not np.any(out[4:, :]) and not np.any(out[:, 4:])
    inv = inv_lfnst_np(out, 18, 1)
    assert not np.any(inv[8:, :]) and not np.any(inv[:, 8:])


def test_native_matches_oracle():
    from vvc.packer import native_recon
    if not native_recon.available():
        pytest.skip("native core unavailable")
    from vvc.model.recon import reconstruct_leaves
    from vvc.enc.rdo import rdo_partition

    f = _smooth_frames(1)[0]
    _, _, leaves = rdo_partition(f.y, 37)
    assert any(l.lfnst for l in leaves), "RDO should pick LFNST on smooth"
    planes_n = tuple(np.zeros_like(p) for p in f.planes())
    planes_o = tuple(np.zeros_like(p) for p in f.planes())
    import copy
    leaves_o = copy.deepcopy(leaves)
    reconstruct_leaves(leaves, planes_n, 37, 8, orig_planes=f.planes(),
                       use_native=True)
    reconstruct_leaves(leaves_o, planes_o, 37, 8, orig_planes=f.planes(),
                       use_native=False)
    for a, b in zip(planes_n, planes_o):
        assert np.array_equal(a, b)
    for ln, lo in zip(leaves, leaves_o):
        for attr in ("lev_y", "lev_cb", "lev_cr"):
            a, b = getattr(ln, attr), getattr(lo, attr)
            assert (a is None) == (b is None)
            if a is not None:
                assert np.array_equal(a, b)


def test_roundtrip_with_lfnst():
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream

    frames = _smooth_frames(2)
    bs, recons, stats = encode_sequence(frames, qp=37)
    decoded, _ = decode_stream(bs)
    for dec, rec in zip(decoded, recons):
        assert np.array_equal(dec.y, rec.y)
        assert np.array_equal(dec.cb, rec.cb)
        assert np.array_equal(dec.cr, rec.cr)
    dec_wf, _ = decode_stream(bs, wavefront=True)
    for d1, d2 in zip(decoded, dec_wf):
        assert np.array_equal(d1.y, d2.y)
        assert np.array_equal(d1.cb, d2.cb)
        assert np.array_equal(d1.cr, d2.cr)
