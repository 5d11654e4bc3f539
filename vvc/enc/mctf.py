"""MCTF — motion-compensated temporal pre-filtering of anchor pictures.

TPU-native analog of the reference's temporal filter
(`/root/reference/source/Lib/EncoderLib/EncTemporalFilter.cpp` →
EncTemporalFilter::filter: hierarchical ME of ±2 neighbour originals
toward each GOP-boundary picture, per-block error-adaptive bilateral
blending before encoding).  Non-normative (operates on source pictures
only), so the implementation is free to be fully batched: integer ME via
the inter-search conv kernel, quarter-pel refinement on phase planes, and
one vectorized blend.

Effect: temporally-independent noise averages out of the anchors that the
whole GOP predicts from — bits drop at equal PSNR-vs-source.
"""
from __future__ import annotations

import math

import numpy as np

from vvc.io.yuv import Frame
from vvc.enc import me as me_mod

BLOCK = 16


def _me_pred(cur_y: np.ndarray, ref_y: np.ndarray, bit_depth: int,
             radius: int = 8):
    """Motion-compensate ref toward cur at BLOCK granularity; returns the
    prediction plane and the per-block SSE error map (r5: window-ME
    engine — coarse ds4 full-search + per-block window refine; the old
    phase-plane gather path cost ~1 s/ref at 1080p)."""
    import jax.numpy as jnp
    refpad, refds = me_mod.pic_dev(ref_y)
    h, w = cur_y.shape
    cur_dev = jnp.asarray(np.ascontiguousarray(cur_y), jnp.int32)
    _, cds = me_mod._prep_ref(cur_dev, h, w)
    h4, w4 = (h + 3) // 4, (w + 3) // 4
    coarse = me_mod._coarse_program(cds, refds[None], h4, w4,
                                    me_mod.COARSE_R)
    lam_m = math.sqrt(0.57 * 2.0 ** ((32 - 12) / 3.0))
    plane_d, err_d = me_mod.me_pred_v2(cur_dev, refpad, coarse[16][0],
                                       w, h, bit_depth,
                                       jnp.float32(lam_m))
    plane = np.asarray(plane_d)
    err = np.asarray(err_d).astype(np.float64)
    full = cur_y.copy()
    ny, nx = err.shape
    full[:ny * BLOCK, :nx * BLOCK] = plane
    return full, err


def mctf_filter(frames, poc: int, qp: int, bit_depth: int = 8,
                window: int = 2) -> Frame:
    """Filtered version of frames[poc] using ±window neighbour originals.

    Luma only (the reference filters chroma too with smaller strength —
    [verify]; chroma passes through here)."""
    cur = frames[poc]
    h, w = cur.y.shape
    num = cur.y.astype(np.float64).copy()
    den = np.ones_like(num)
    # error-adaptive weight (reference: s_o·σ² / (err + σ²) shape)
    sigma2 = max(4.0, (qp - 20) * 1.5) ** 1.0 * 10.0
    base_w = 0.4
    for dp in range(-window, window + 1):
        p = poc + dp
        if dp == 0 or p < 0 or p >= len(frames):
            continue
        pred, err = _me_pred(cur.y, frames[p].y, bit_depth)
        wmap = base_w * sigma2 / (err + sigma2)        # [ny, nx] per block
        wfull = np.ones((h, w)) * 0.0
        ny, nx = err.shape
        wfull[:ny * BLOCK, :nx * BLOCK] = np.repeat(
            np.repeat(wmap, BLOCK, axis=0), BLOCK, axis=1)
        num += wfull * pred
        den += wfull
    y = np.clip(np.rint(num / den), 0, (1 << bit_depth) - 1).astype(np.int32)
    return Frame(y, cur.cb, cur.cr, bit_depth)
