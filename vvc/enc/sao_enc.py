"""SAO encoder decisions: per-CTU statistics → RD-chosen parameters.

TPU-native analog of the reference's SAO encoder
(`/root/reference/source/Lib/EncoderLib/EncSampleAdaptiveOffset.cpp` →
getStatistics / decidePicParams / decideBlkParams).  Classic derivation:
for each candidate type, per-category (diff-sum d, count n) statistics
give the optimal offset o* ≈ d/n and the distortion change
ΔSSE(o) = n·o² − 2·o·d; choose min over {OFF, BO windows, 4 EO classes}
with λ·rate.  Merge-left/up RD is a later stage [verify].
"""
from __future__ import annotations

import numpy as np

from vvc.kernels.sao import (SaoParams, SAO_OFF, SAO_BO, SAO_EO, EO_DIRS,
                             MAX_SAO_OFFSET, eo_categories)
from vvc.enc.rdo import rd_lambda


def _best_offset(d: float, n: float, sign: int, lam_rate: float):
    """Optimal clipped offset and its RD cost for one category."""
    if n == 0:
        return 0, 0.0
    o = int(round(d / n))
    if sign > 0:
        o = max(0, min(MAX_SAO_OFFSET, o))
    elif sign < 0:
        o = min(0, max(-MAX_SAO_OFFSET, o))
    else:
        o = max(-MAX_SAO_OFFSET, min(MAX_SAO_OFFSET, o))
    best_o, best_c = 0, 0.0
    # scan a small neighbourhood (offset rate grows with magnitude)
    for cand in {0, o, o // 2}:
        c = n * cand * cand - 2 * cand * d + lam_rate * (abs(cand) + 1)
        if c < best_c:
            best_o, best_c = cand, c
    return best_o, best_c


def decide_sao_ctu(orig: np.ndarray, rec: np.ndarray, x0: int, y0: int,
                   w: int, h: int, qp: int, bit_depth: int,
                   lim_x0: int, lim_x1: int) -> SaoParams:
    """Choose SAO parameters for one CTU region of one component."""
    lam = rd_lambda(qp)
    o_reg = orig[y0:y0 + h, x0:x0 + w].astype(np.int64)
    r_reg = rec[y0:y0 + h, x0:x0 + w].astype(np.int64)
    diff = o_reg - r_reg
    best = SaoParams()
    best_cost = 0.0  # OFF baseline (≈1 bin rate folded out)

    # EO classes: categories 1,2 positive offsets; 3,4 negative (HEVC sign
    # inference)
    for ec in range(4):
        cat = eo_categories(rec, x0, y0, w, h, ec, lim_x0, lim_x1)
        offs = []
        cost = lam * 3.0  # type + class signalling
        for k, sign in ((1, 1), (2, 1), (3, -1), (4, -1)):
            m = cat == k
            o, c = _best_offset(float(diff[m].sum()), float(m.sum()), sign,
                                lam)
            offs.append(abs(o) * (1 if sign > 0 else -1) if o else 0)
            cost += c
        if cost < best_cost:
            best = SaoParams(SAO_EO, ec, 0, tuple(offs))
            best_cost = cost

    # BO: per-band stats, best window of 4 consecutive bands
    band = (r_reg >> (bit_depth - 5)).astype(np.int32)
    d32 = np.zeros(32)
    n32 = np.zeros(32)
    np.add.at(d32, band.reshape(-1), diff.reshape(-1).astype(np.float64))
    np.add.at(n32, band.reshape(-1), 1.0)
    bo_off = np.zeros(32, dtype=np.int64)
    bo_cost = np.zeros(32)
    for b in range(32):
        bo_off[b], bo_cost[b] = _best_offset(d32[b], n32[b], 0, lam)
    for start in range(29):
        cost = lam * 8.0 + float(bo_cost[start:start + 4].sum())
        if cost < best_cost:
            best = SaoParams(SAO_BO, 0, start,
                             tuple(int(v) for v in bo_off[start:start + 4]))
            best_cost = cost
    return best


def decide_sao_frame(orig_planes, recon_planes, qp: int, bit_depth: int,
                     ctu_size: int, tiles) -> dict:
    """Per-CTU SAO params for all components.

    Returns {(cx, cy): (SaoParams_y, SaoParams_cb, SaoParams_cr)} — chroma
    shares the type/class of cb's decision with its own offsets [verify:
    the reference derives a joint chroma decision]."""
    out = {}
    h, w = orig_planes[0].shape
    for cy in range(0, h, ctu_size):
        for cx in range(0, w, ctu_size):
            lim = (0, w)
            for tx0, tx1 in tiles:
                if tx0 <= cx < tx1:
                    lim = (tx0, min(tx1, w))
                    break
            py = decide_sao_ctu(orig_planes[0], recon_planes[0], cx, cy,
                                min(ctu_size, w - cx), min(ctu_size, h - cy),
                                qp, bit_depth, *lim)
            cs = ctu_size >> 1
            climx = (lim[0] >> 1, lim[1] >> 1 if lim[1] != w else w // 2)
            pcb = decide_sao_ctu(orig_planes[1], recon_planes[1], cx >> 1,
                                 cy >> 1, min(cs, (w >> 1) - (cx >> 1)),
                                 min(cs, (h >> 1) - (cy >> 1)), qp, bit_depth,
                                 *climx)
            pcr = decide_sao_ctu(orig_planes[2], recon_planes[2], cx >> 1,
                                 cy >> 1, min(cs, (w >> 1) - (cx >> 1)),
                                 min(cs, (h >> 1) - (cy >> 1)), qp, bit_depth,
                                 *climx)
            # each component signals complete params ([verify]: the
            # reference shares chroma type between cb/cr)
            out[(cx, cy)] = (py, pcb, pcr)
    return out
