"""SAO encoder decisions: per-CTU statistics → RD-chosen parameters.

TPU-native analog of the reference's SAO encoder
(`/root/reference/source/Lib/EncoderLib/EncSampleAdaptiveOffset.cpp` →
getStatistics / decidePicParams / decideBlkParams).  Classic derivation:
for each candidate type, per-category (diff-sum d, count n) statistics
give the optimal offset o* ≈ d/n and the distortion change
ΔSSE(o) = n·o² − 2·o·d; choose min over {OFF, BO windows, 4 EO classes}
with λ·rate.

Statistics are gathered picture-at-once (whole-plane classification +
blocked reductions — the device-friendly shape; reference iterates CTUs);
only the final per-CTU arg-min runs as a small host loop.  Merge-left/up
RD is a later stage [verify].
"""
from __future__ import annotations

import numpy as np

from vvc.kernels.sao import (SaoParams, SAO_OFF, SAO_BO, SAO_EO,
                             MAX_SAO_OFFSET, eo_categories)
from vvc.enc.rdo import rd_lambda


def _best_offsets_arr(d: np.ndarray, n: np.ndarray, sign: int, lam: float):
    """Vectorized optimal clipped offsets + RD costs.  d, n same shape."""
    with np.errstate(divide="ignore", invalid="ignore"):
        o = np.where(n > 0, np.round(d / np.maximum(n, 1)), 0.0)
    if sign > 0:
        o = np.clip(o, 0, MAX_SAO_OFFSET)
    elif sign < 0:
        o = np.clip(o, -MAX_SAO_OFFSET, 0)
    else:
        o = np.clip(o, -MAX_SAO_OFFSET, MAX_SAO_OFFSET)
    best_o = np.zeros_like(o)
    best_c = np.zeros_like(d, dtype=np.float64)
    for cand in (o, np.trunc(o / 2)):
        c = n * cand * cand - 2 * cand * d + lam * (np.abs(cand) + 1)
        better = c < best_c
        best_o = np.where(better, cand, best_o)
        best_c = np.where(better, c, best_c)
    return best_o.astype(np.int64), best_c


def _block_sums(arr: np.ndarray, cs: int):
    """[H,W] → per-CTU sums [ny,nx] (zero-padded to CTU multiples)."""
    h, w = arr.shape
    ny, nx = -(-h // cs), -(-w // cs)
    pad = np.zeros((ny * cs, nx * cs), dtype=arr.dtype)
    pad[:h, :w] = arr
    return pad.reshape(ny, cs, nx, cs).sum(axis=(1, 3))


def _component_stats(orig: np.ndarray, rec: np.ndarray, cs: int,
                     bit_depth: int, tiles_c):
    """Per-CTU stats for one component: EO (d,n)[4class][4cat][ny,nx] and
    BO (d,n)[32band][ny,nx].  One whole-plane classification per EO class
    (sliced shifts) + bincount reductions — no per-CTU loops."""
    from vvc.kernels.sao import eo_categories_region
    h, w = orig.shape
    diff = (orig - rec).astype(np.float64)
    ny, nx = -(-h // cs), -(-w // cs)
    ctu_idx = ((np.arange(h)[:, None] // cs) * nx
               + (np.arange(w)[None, :] // cs)).astype(np.int64)
    # EO: flat index (class, ctu, cat 0..4) → two bincounts total
    cats = np.empty((4, h, w), dtype=np.int64)
    for ec in range(4):
        for tb in tiles_c:
            t0, t1 = tb[0], tb[1]
            r0, r1 = (tb[2], tb[3]) if len(tb) == 4 else (0, h)
            cats[ec, r0:r1, t0:t1] = eo_categories_region(rec, t0, t1, ec,
                                                          r0, r1)
    base = (np.arange(4)[:, None, None] * (ny * nx) + ctu_idx[None]) * 5
    flat = (base + cats).reshape(-1)
    nbin = 4 * ny * nx * 5
    d_all = np.bincount(flat, weights=np.broadcast_to(
        diff, (4, h, w)).reshape(-1), minlength=nbin)
    n_all = np.bincount(flat, minlength=nbin)
    d_all = d_all.reshape(4, ny, nx, 5)
    n_all = n_all.reshape(4, ny, nx, 5)
    eo_d = np.moveaxis(d_all[..., 1:], 3, 1)       # [4class,4cat,ny,nx]
    eo_n = np.moveaxis(n_all[..., 1:], 3, 1).astype(np.float64)
    band = (rec >> (bit_depth - 5)).astype(np.int64)
    flat = (ctu_idx * 32 + band).reshape(-1)
    bo_d = np.bincount(flat, weights=diff.reshape(-1),
                       minlength=ny * nx * 32).reshape(ny, nx, 32)
    bo_n = np.bincount(flat, minlength=ny * nx * 32).reshape(ny, nx, 32)
    return eo_d, eo_n, bo_d, bo_n, ny, nx


def _decide_component(orig, rec, cs, qp, bit_depth, tiles_c):
    lam = rd_lambda(qp)
    eo_d, eo_n, bo_d, bo_n, ny, nx = _component_stats(orig, rec, cs,
                                                      bit_depth, tiles_c)
    # EO: per class, per cat offsets/costs (sign-constrained cats)
    eo_off = np.zeros((4, 4, ny, nx), dtype=np.int64)
    eo_cost = np.full((4, ny, nx), 3.0 * lam)
    for ec in range(4):
        for k, sign in ((0, 1), (1, 1), (2, -1), (3, -1)):
            o, c = _best_offsets_arr(eo_d[ec, k], eo_n[ec, k], sign, lam)
            eo_off[ec, k] = o
            eo_cost[ec] += c
    # BO: per-band offsets, then best 4-band window
    bo_off, bo_cost = _best_offsets_arr(bo_d, bo_n, 0, lam)  # [ny,nx,32]
    win_cost = np.full((29, ny, nx), 8.0 * lam)
    for s0 in range(29):
        win_cost[s0] += bo_cost[:, :, s0:s0 + 4].sum(axis=2)
    best_win = np.argmin(win_cost, axis=0)                   # [ny,nx]
    best_bo = np.take_along_axis(win_cost, best_win[None], axis=0)[0]
    best_eo = np.argmin(eo_cost, axis=0)                     # [ny,nx]
    best_eo_cost = np.min(eo_cost, axis=0)

    out = {}
    for j in range(ny):
        for i in range(nx):
            cands = [(0.0, SaoParams())]
            ec = int(best_eo[j, i])
            offs = eo_off[ec, :, j, i]
            cands.append((float(best_eo_cost[j, i]),
                          SaoParams(SAO_EO, ec, 0, tuple(int(v) for v in offs))))
            s0 = int(best_win[j, i])
            cands.append((float(best_bo[j, i]),
                          SaoParams(SAO_BO, 0, s0,
                                    tuple(int(v) for v in bo_off[j, i, s0:s0 + 4]))))
            out[(i, j)] = min(cands, key=lambda t: t[0])[1]
    return out


def decide_sao_frame(orig_planes, recon_planes, qp: int, bit_depth: int,
                     ctu_size: int, tiles) -> dict:
    """Per-CTU SAO params for all components:
    {(ctu_x, ctu_y) luma coords: (SaoParams_y, SaoParams_cb, SaoParams_cr)}.

    Each component signals complete params ([verify]: the reference shares
    chroma type between cb/cr)."""
    h, w = orig_planes[0].shape
    tiles4 = [(tb[0], tb[1], tb[2], tb[3]) if len(tb) == 4
              else (tb[0], tb[1], 0, h) for tb in tiles]
    tiles_l = [(x0, min(x1, w), y0, min(y1, h))
               for x0, x1, y0, y1 in tiles4]
    tiles_c = [(x0 >> 1, min(x1 >> 1, w >> 1), y0 >> 1,
                min(y1 >> 1, h >> 1)) for x0, x1, y0, y1 in tiles4]
    per_comp = [
        _decide_component(orig_planes[0], recon_planes[0], ctu_size, qp,
                          bit_depth, tiles_l),
        _decide_component(orig_planes[1], recon_planes[1], ctu_size >> 1, qp,
                          bit_depth, tiles_c),
        _decide_component(orig_planes[2], recon_planes[2], ctu_size >> 1, qp,
                          bit_depth, tiles_c),
    ]
    out = {}
    for (i, j), py in per_comp[0].items():
        key = (i * ctu_size, j * ctu_size)
        out[key] = (py, per_comp[1].get((i, j), SaoParams()),
                    per_comp[2].get((i, j), SaoParams()))
    return out
