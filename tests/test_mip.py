"""MIP: oracle == JAX batch == native C++, plus end-to-end roundtrip."""
import numpy as np
import pytest

from vvc.kernels.mip import (mip_predict_np, mip_predict_all_batch,
                             K_MIP_MODES, mip_allowed)


def _rand_ref_lines(n, size, bit_depth, seed):
    rng = np.random.default_rng(seed)
    # piecewise-smooth lines (realistic boundaries, not white noise)
    base = rng.integers(0, 1 << bit_depth, size=(n, 1))
    walk = np.cumsum(rng.integers(-9, 10, size=(n, 4 * size + 3)), axis=1)
    return np.clip(base + walk, 0, (1 << bit_depth) - 1).astype(np.int32)


@pytest.mark.parametrize("size", [8, 16, 32])
@pytest.mark.parametrize("bit_depth", [8, 10])
def test_batch_matches_oracle(size, bit_depth):
    import jax.numpy as jnp
    c = _rand_ref_lines(5, size, bit_depth, seed=size * bit_depth)
    got = np.asarray(mip_predict_all_batch(jnp.asarray(c), size, bit_depth))
    assert got.shape == (5, K_MIP_MODES, size, size)
    for i in range(5):
        for k in range(K_MIP_MODES):
            want = mip_predict_np(c[i], k, size, bit_depth)
            np.testing.assert_array_equal(got[i, k], want,
                                          err_msg=f"blk {i} mode {k}")


def test_native_matches_oracle():
    from vvc.packer import native_recon, recon_lib
    if not native_recon.available():
        pytest.skip("native recon core unavailable")
    import ctypes
    l = recon_lib()
    for size in (8, 16, 32):
        c = _rand_ref_lines(3, size, 8, seed=7 * size)
        for i in range(3):
            for k in range(K_MIP_MODES):
                want = mip_predict_np(c[i], k, size, 8)
                pred = np.zeros((size, size), dtype=np.int32)
                cc = np.ascontiguousarray(c[i])
                l.predict_mip_c(cc.ctypes.data_as(ctypes.c_void_p), k, size,
                                8, pred.ctypes.data_as(ctypes.c_void_p))
                np.testing.assert_array_equal(pred, want)


def test_mip_selected_and_roundtrip():
    """End-to-end: MIP modes actually get chosen by the RDO on smooth
    content, the stream decodes bit-exact, and the wavefront path agrees."""
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream

    frames = [synth_frame(128, 64, t) for t in range(2)]
    bs, recons, stats = encode_sequence(frames, qp=32)
    decoded, info = decode_stream(bs)
    assert info["sps"].mip
    for r, d in zip(recons, decoded):
        for pr, pd in zip(r.planes(), d.planes()):
            np.testing.assert_array_equal(pr, pd)
    dec_wf, _ = decode_stream(bs, wavefront=True)
    for r, d in zip(recons, dec_wf):
        for pr, pd in zip(r.planes(), d.planes()):
            np.testing.assert_array_equal(pr, pd)


def test_allowed_range():
    assert not mip_allowed(4) and mip_allowed(8) and mip_allowed(32)
    assert not mip_allowed(64)
