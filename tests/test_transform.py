"""Transform/quant kernel tests: ROM table literals, integer round-trip,
jax batched kernels vs the numpy oracle (SURVEY.md §4 golden path A)."""
import numpy as np
import pytest

from vvc.rom.transform_mats import (
    dct2_matrix, dst7_matrix, dct8_matrix, diag_scan)
from vvc.kernels.transform import (
    fwd_transform_np, inv_transform_np, fwd_transform_batch, inv_transform_batch)
from vvc.kernels.quant import quant_np, dequant_np, quant_batch, dequant_batch


def test_dct2_known_literals():
    assert (dct2_matrix(4) == np.array(
        [[64, 64, 64, 64], [83, 36, -36, -83],
         [64, -64, -64, 64], [36, -83, 83, -36]])).all()
    t8 = dct2_matrix(8)
    assert list(t8[1]) == [89, 75, 50, 18, -18, -50, -75, -89]
    assert list(t8[3]) == [75, -18, -89, -50, 50, 89, 18, -75]
    assert list(t8[5]) == [50, -89, 18, 75, -75, -18, 89, -50]
    assert list(t8[7]) == [18, -50, 75, -89, 89, -75, 50, -18]
    t16 = dct2_matrix(16)
    assert list(t16[1]) == [90, 87, 80, 70, 57, 43, 25, 9,
                            -9, -25, -43, -57, -70, -80, -87, -90]
    assert list(t16[3]) == [87, 57, 9, -43, -80, -90, -70, -25,
                            25, 70, 90, 80, 43, -9, -57, -87]


def test_dst7_dct8_known_literals():
    d7 = dst7_matrix(4)
    assert list(d7[0]) == [29, 55, 74, 84]
    assert list(d7[1]) == [74, 74, 0, -74]
    assert list(d7[2]) == [84, -29, -74, 55]
    assert list(d7[3]) == [55, -84, 74, -29]
    assert list(dct8_matrix(4)[0]) == [84, 74, 55, 29]


@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_dct2_near_orthogonal(n):
    t = dct2_matrix(n).astype(np.int64)
    g = t @ t.T
    off = g - np.diag(np.diag(g))
    assert np.abs(off).max() < 0.03 * g[0, 0]


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (8, 4), (4, 16), (32, 8), (64, 64)])
def test_transform_roundtrip(shape):
    rng = np.random.default_rng(3)
    x = rng.integers(-255, 256, size=shape).astype(np.int32)
    y = inv_transform_np(fwd_transform_np(x))
    # integer-DCT rounding bound (grows slowly with size; quantization
    # dominates this in any real operating point)
    assert np.abs(y - x).max() <= 6


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32)])
def test_batch_matches_oracle(shape):
    rng = np.random.default_rng(5)
    xs = rng.integers(-255, 256, size=(13,) + shape).astype(np.int32)
    cb = np.asarray(fwd_transform_batch(xs))
    for i, x in enumerate(xs):
        assert (cb[i] == fwd_transform_np(x)).all()
    rb = np.asarray(inv_transform_batch(cb))
    for i in range(len(xs)):
        assert (rb[i] == inv_transform_np(cb[i])).all()


@pytest.mark.parametrize("qp", [12, 22, 27, 32, 37, 45, 51])
def test_quant_batch_matches_oracle(qp):
    rng = np.random.default_rng(qp)
    cs = rng.integers(-30000, 30001, size=(7, 8, 8)).astype(np.int32)
    lb = np.asarray(quant_batch(cs, qp))
    db = np.asarray(dequant_batch(lb, qp))
    for i, c in enumerate(cs):
        assert (lb[i] == quant_np(c, qp)).all()
        assert (db[i] == dequant_np(lb[i], qp)).all()


def test_quant_monotone_in_qp():
    rng = np.random.default_rng(9)
    x = rng.integers(-255, 256, size=(8, 8)).astype(np.int32)
    c = fwd_transform_np(x)
    errs = []
    for qp in (22, 32, 42):
        y = inv_transform_np(dequant_np(quant_np(c, qp), qp))
        errs.append(np.abs(y - x).mean())
    assert errs[0] < errs[1] < errs[2]


def test_diag_scan_is_permutation():
    for w, h in [(4, 4), (8, 4), (4, 8), (16, 16)]:
        s = diag_scan(w, h)
        assert sorted(s) == sorted((x, y) for x in range(w) for y in range(h))
    # first diagonal order: bottom-left before top-right
    assert diag_scan(4, 4)[:3] == ((0, 0), (0, 1), (1, 0))
