"""Wavefront (anti-diagonal batched) reconstruction — the TPU-native
decoder compute path.

TPU-native replacement for the reference's strictly sequential per-CU
reconstruction (`/root/reference/source/Lib/DecoderLib/DecCu.cpp` →
decompressCtu; OpenVVC parallelizes only across CTU *lines* with threads,
libovvc/ctudec.c + drv_lines.c).  SURVEY.md §7.3 item 3: "intra
reconstruction dependency → wavefront over anti-diagonals, batch across
CTUs at the same diagonal".

Phase structure: leaves are layered by exact dependency depth — leaf B
waits only for earlier-z-order leaves that own samples on B's reference
border.  Every leaf in a wave is then reconstructed in one batched device
pass per (size, mts) group: 67-mode prediction via vvc.kernels.intra's
gather tables (bit-exact with the scalar oracle, test-enforced) +
batched dequant/inverse-transform.  Wave count grows ~O(picture diagonal /
block size), so a 1080p picture of ~1500 CUs collapses to a few dozen
device steps — the Amdahl win over per-CU dispatch.

This module is the decoder's device path; the sequential host path
(vvc.model.recon / native recon core) remains the latency-optimal choice
for single small pictures and is the oracle these results are tested
against (bit-exact).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vvc.kernels.intra import build_ref_line, predict_all_modes_batch
from vvc.kernels.transform import inv_transform_batch, MTS_TR
from vvc.kernels.quant import dequant_batch
from vvc.model.recon import chroma_qp


def compute_waves(leaves, width: int, height: int):
    """Exact dependency layering.  Returns list of index lists."""
    w4, h4 = (width + 3) >> 2, (height + 3) >> 2
    level_map = np.full((h4, w4), -1, dtype=np.int32)
    levels = np.empty(len(leaves), dtype=np.int32)
    for i, leaf in enumerate(leaves):
        x0, y0, s = leaf.x0, leaf.y0, leaf.size
        lv = -1
        # top border row y0-1, cols x0-1 .. x0+2s-1
        if y0 > 0:
            r = (y0 - 1) >> 2
            c0 = max(0, (x0 - 1) >> 2)
            c1 = min(w4 - 1, (x0 + 2 * s - 1) >> 2)
            lv = max(lv, int(level_map[r, c0:c1 + 1].max(initial=-1)))
        # left border col x0-1, rows y0 .. y0+2s-1
        if x0 > 0:
            c = (x0 - 1) >> 2
            r0 = y0 >> 2
            r1 = min(h4 - 1, (y0 + 2 * s - 1) >> 2)
            lv = max(lv, int(level_map[r0:r1 + 1, c].max(initial=-1)))
        levels[i] = lv + 1
        s4 = s >> 2
        level_map[y0 >> 2:(y0 >> 2) + s4, x0 >> 2:(x0 >> 2) + s4] = lv + 1
    waves = [[] for _ in range(int(levels.max(initial=0)) + 1)]
    for i, lv in enumerate(levels):
        waves[lv].append(i)
    return waves


def _recon_wave_group(plane, order_map, group, qp, bit_depth, lossless, comp,
                      cclm_ds=None):
    """Batched reconstruction of same-size leaves of one wave for one
    component.  Mutates plane/order_map.

    order_map holds the z-order index of each reconstructed 4×4 unit (a
    large sentinel when pending): a reference unit is available iff it was
    reconstructed AND precedes this leaf in z-order — exactly the
    sequential decoder's availability, even though waves reorder work."""
    size = group[0][1]
    n = len(group)
    cs = []
    modes = np.empty(n, dtype=np.int32)
    levs = np.zeros((n, size, size), dtype=np.int32)
    mtss = np.empty(n, dtype=np.int32)
    for k, (leaf, s, x0, y0, lv, mts, zi) in enumerate(group):
        avail = order_map < zi
        cs.append(build_ref_line(plane, avail, x0, y0, s, bit_depth))
        modes[k] = leaf.luma_mode
        mtss[k] = mts
        if lv is not None:
            levs[k] = lv
    if comp != 0:
        # chroma DM of a MIP leaf maps to planar
        modes = np.where(modes >= 67, 0, modes)
    c_batch = jnp.asarray(np.stack(cs))
    preds = predict_all_modes_batch(c_batch, size, bit_depth)      # [N,67,S,S]
    pred = np.asarray(preds)[np.arange(n), np.minimum(modes, 66)]  # [N,S,S]
    if comp == 0 and np.any(modes >= 67):
        from vvc.kernels.mip import mip_predict_np
        for k in np.nonzero(modes >= 67)[0]:
            pred[k] = mip_predict_np(cs[k], int(modes[k]) - 67, size,
                                     bit_depth)
    if cclm_ds is not None:
        from vvc.kernels.cclm import predict_cclm
        for k, (leaf, s, x0, y0, lv, mts, zi) in enumerate(group):
            if leaf.chroma_mode:
                avail = order_map < zi
                pred[k] = predict_cclm(cclm_ds, plane, avail, x0, y0, s,
                                       bit_depth, variant=leaf.chroma_mode)
    resi = np.zeros_like(pred)
    if lossless:
        # TS lossless: levels are the residual; BDPCM leaves carry DPCM
        # deltas (luma only — inverse is a prefix sum)
        resi = levs
        if comp == 0:
            from vvc.model.recon import _dpcm_inv
            for k, g in enumerate(group):
                if g[0].bdpcm:
                    resi[k] = _dpcm_inv(levs[k], g[0].bdpcm)
    else:
        lfns = np.array([g[0].lfnst if comp == 0 else 0 for g in group],
                        dtype=np.int32)
        for mi in np.unique(mtss):
            sel = mtss == mi
            if not np.any(levs[sel]):
                continue
            th, tv = MTS_TR[int(mi)]
            deq = np.asarray(dequant_batch(jnp.asarray(levs[sel]), qp,
                                           bit_depth))
            if np.any(lfns[sel]):
                from vvc.kernels.lfnst import inv_lfnst_np
                deq = deq.copy()  # jax buffers are read-only views
                for j, k in enumerate(np.nonzero(sel)[0]):
                    if lfns[k]:
                        deq[j] = inv_lfnst_np(deq[j], int(modes[k]),
                                              int(lfns[k]))
            resi[sel] = np.asarray(inv_transform_batch(jnp.asarray(deq),
                                                       bit_depth, th, tv))
    rec = np.clip(pred + resi, 0, (1 << bit_depth) - 1)
    for k, (leaf, s, x0, y0, lv, mts, zi) in enumerate(group):
        plane[y0:y0 + s, x0:x0 + s] = rec[k]
        s4 = max(1, s >> 2)
        order_map[y0 >> 2:(y0 >> 2) + s4, x0 >> 2:(x0 >> 2) + s4] = zi


def reconstruct_leaves_wavefront(leaves, recon_planes, qp: int,
                                 bit_depth: int = 8, lossless: bool = False):
    """Decode-mode reconstruction, batched per dependency wave.

    Bit-exact with vvc.model.recon.reconstruct_leaves (decode mode).
    Returns the number of waves (for instrumentation).
    """
    y_pl, cb_pl, cr_pl = recon_planes
    h, w = y_pl.shape
    waves = compute_waves(leaves, w, h)
    big = np.iinfo(np.int32).max
    order_y = np.full(((h + 3) >> 2, (w + 3) >> 2), big, dtype=np.int32)
    order_cb = np.full(((h // 2 + 3) >> 2, (w // 2 + 3) >> 2), big,
                       dtype=np.int32)
    order_cr = order_cb.copy()
    qpc = chroma_qp(qp)
    for wave in waves:
        by_size_y = {}
        by_size_c = {}
        for i in wave:
            lf = leaves[i]
            by_size_y.setdefault(lf.size, []).append(
                (lf, lf.size, lf.x0, lf.y0, lf.lev_y, lf.mts, i))
            by_size_c.setdefault(lf.size >> 1, []).append((lf, i))
        for s, group in by_size_y.items():
            _recon_wave_group(y_pl, order_y, group, qp, bit_depth, lossless, 0)
        ds = None
        if any(leaves[i].chroma_mode for i in wave):
            from vvc.kernels.cclm import luma_ds_plane
            ds = luma_ds_plane(y_pl)
        for s, lfs in by_size_c.items():
            gcb = [(lf, s, lf.x0 >> 1, lf.y0 >> 1, lf.lev_cb, 0, i)
                   for lf, i in lfs]
            gcr = [(lf, s, lf.x0 >> 1, lf.y0 >> 1, lf.lev_cr, 0, i)
                   for lf, i in lfs]
            _recon_wave_group(cb_pl, order_cb, gcb, qpc, bit_depth, lossless,
                              1, cclm_ds=ds)
            _recon_wave_group(cr_pl, order_cr, gcr, qpc, bit_depth, lossless,
                              2, cclm_ds=ds)
    return len(waves)
