"""Batched inter search: full-search motion estimation + mode decision.

TPU-native analog of the reference's motion search
(`/root/reference/source/Lib/EncoderLib/InterSearch.cpp` →
predInterSearch / xMotionEstimation / xTZSearch integer search +
xPatternSearchFracDIF half/quarter refinement; EncCu.cpp →
xCheckRDCostInter/Merge).  Per SURVEY.md §7.0 tenet 2, the reference's
per-block TZ diamond walk becomes an exhaustive batched evaluation:

  - Integer ME: SSE over the FULL (2R+1)² search window for ALL blocks of
    a size class in one device dispatch.  SSE(d) decomposes as
    Σo² + Σw²(d) − 2·corr(d): the correlation is a grouped convolution
    (each block is its own filter — MXU native), the window energy an
    integral-image gather.  Exhaustive search on TPU costs less than the
    reference's sequential early-exit heuristics cost on CPU.
  - Fractional: reference planes are interpolated once per quarter-pel
    phase (vvc.kernels.mc.interp_luma_planes); half- then quarter-pel
    refinement is 2×9 gathered SATD evaluations, batched over blocks.
  - Bi-prediction (B slices): average of the per-list best predictions,
    chosen against both uni candidates by SATD (the reference's fast
    bi-pred iteration collapses to one batched compare).

Mode decision per block = min(inter RD, intra RD) followed by the same
bottom-up partition DP as the intra path (vvc.enc.rdo).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vvc.enc.rdo import (rd_lambda, eval_all_sizes, _candidate_sizes,
                         SPLIT_BITS)
from vvc.kernels.mc import interp_luma_planes, gather_pred_planes
from vvc.kernels.satd import satd_batch
from vvc.kernels.transform import fwd_transform_batch, inv_transform_batch
from vvc.kernels.quant import quant_batch, dequant_batch
from vvc.model.frame import Leaf
from vvc.model.partition import SPLIT_NONE, SPLIT_QT

ME_SIZES_MIN = 8       # integer ME at sizes >= this (8×8 searches a small
                       # window centered on the parent 16×16 MV)
CHUNK = 1024           # blocks per ME dispatch (bounds window-gather memory)
CHILD_RADIUS = 8       # refinement radius around the parent-MV center —
                       # hierarchical ME: effective range ≈ top radius +
                       # Σ child radii (reference: xTZSearch's predictor-
                       # centered window, SURVEY §2.3 InterSearch)


def _mv_bits(d):
    """Approximate qpel-MVD rate (bits) — EG1-ish."""
    return 2.0 * jnp.log2(1.0 + jnp.abs(d).astype(jnp.float32)) + 1.0


@partial(jax.jit, static_argnames=("size", "radius"))
def _int_me_chunk(blocks, ref, xs, ys, size: int, radius: int, lam_m,
                  cx0, cy0):
    """Integer full-search SSE ME for one chunk of same-size blocks, over
    a (2R+1)² window centered at per-block predictor (cx0, cy0) int-pel
    (hierarchical/AMVP-centered search — the TZSearch analog).

    blocks [N,S,S] f32, ref [H,W] f32, xs/ys block origins [N].
    Returns (mv_x [N], mv_y [N]) integer-pel displacements (incl. center).
    """
    n, s, _ = blocks.shape
    r = radius
    h, w = ref.shape
    k = jnp.arange(s + 2 * r)
    yy = jnp.clip(ys[:, None] + cy0[:, None] - r + k[None, :], 0, h - 1)
    xx = jnp.clip(xs[:, None] + cx0[:, None] - r + k[None, :], 0, w - 1)
    win = ref[yy[:, :, None], xx[:, None, :]]                 # [N, S+2R, S+2R]
    # correlation via grouped conv: each block is its own filter (MXU)
    corr = jax.lax.conv_general_dilated(
        win[None], blocks[:, None], (1, 1), "VALID",
        feature_group_count=n,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]        # [N, 2R+1, 2R+1]
    # window energy via integral image
    w2 = win * win
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(w2, axis=1), axis=2),
                 ((0, 0), (1, 0), (1, 0)))
    d = jnp.arange(2 * r + 1)
    e_win = (ii[:, d[:, None] + s, d[None, :] + s]
             - ii[:, d[:, None] + s, d[None, :]]
             - ii[:, d[:, None], d[None, :] + s]
             + ii[:, d[:, None], d[None, :]])                 # [N, 2R+1, 2R+1]
    sse = e_win - 2.0 * corr                                  # + Σo² (const)
    bx = _mv_bits(4 * (cx0[:, None] + d[None, :] - r))        # [N, 2R+1]
    by = _mv_bits(4 * (cy0[:, None] + d[None, :] - r))
    cost = sse + lam_m * (by[:, :, None] + bx[:, None, :])
    flat = jnp.argmin(cost.reshape(n, -1), axis=1)
    return (cx0 + flat % (2 * r + 1) - r,
            cy0 + flat // (2 * r + 1) - r)


_FRAC_OFF = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (1, -1), (-1, 1), (1, 1)]


@partial(jax.jit, static_argnames=("size",))
def _frac_refine(orig, planes, xs, ys, mvx, mvy, size: int, lam_m):
    """Half- then quarter-pel refinement around integer-best, SATD cost.

    orig [N,S,S] i32; planes [4,4,H,W] phase planes; mv in qpel units.
    Returns refined (mvx, mvy, satd_best)."""
    n = orig.shape[0]

    def stage(mvx, mvy, best, step):
        for (dx, dy) in _FRAC_OFF:
            if dx == 0 and dy == 0:
                continue
            cx = mvx + dx * step
            cy = mvy + dy * step
            pred = gather_pred_planes(planes, xs, ys, cx, cy, size)
            c = satd_batch(pred, orig).astype(jnp.float32) \
                + lam_m * (_mv_bits(cx) + _mv_bits(cy))
            better = c < best
            best = jnp.where(better, c, best)
            mvx = jnp.where(better, cx, mvx)
            mvy = jnp.where(better, cy, mvy)
        return mvx, mvy, best

    pred0 = gather_pred_planes(planes, xs, ys, mvx, mvy, size)
    best = satd_batch(pred0, orig).astype(jnp.float32) \
        + lam_m * (_mv_bits(mvx) + _mv_bits(mvy))
    # half then quarter (reference: xPatternSearchFracDIF order)
    mvx1, mvy1, best = stage(mvx, mvy, best, 2)
    mvx2, mvy2, best = stage(mvx1, mvy1, best, 1)
    return mvx2, mvy2, best


@partial(jax.jit, static_argnames=("size", "bit_depth"))
def _inter_rd(orig, pred, size: int, qp, bit_depth: int, extra_bits):
    """DCT2 RD cost of coding orig with the given inter prediction
    (mirrors rdo.eval_blocks' rd_pass).  qp is traced — one compile serves
    all hierarchy/rate-control QPs."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    lam = 0.57 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0)
    resi = orig - pred
    coeff = fwd_transform_batch(resi, bit_depth, 0, 0)
    lev = quant_batch(coeff, qp, bit_depth, intra=False)
    deq = dequant_batch(lev, qp, bit_depth)
    rec_resi = inv_transform_batch(deq, bit_depth, 0, 0)
    rec = jnp.clip(pred + rec_resi, 0, (1 << bit_depth) - 1)
    d = (rec - orig).astype(jnp.float32)
    sse = jnp.sum(d * d, axis=(1, 2))
    from vvc.cabac.rates import level_bits_jnp
    rate = jnp.sum(level_bits_jnp(jnp.abs(lev)), axis=(1, 2))
    return sse + lam * (rate + extra_bits)


def _blocks_grid(plane: np.ndarray, size: int):
    h, w = plane.shape
    ny, nx = h // size, w // size
    blocks = (plane[:ny * size, :nx * size]
              .reshape(ny, size, nx, size).transpose(0, 2, 1, 3)
              .reshape(-1, size, size))
    ys = np.repeat(np.arange(ny), nx) * size
    xs = np.tile(np.arange(nx), ny) * size
    return blocks, xs.astype(np.int32), ys.astype(np.int32), ny, nx


def _me_one_ref(y_plane, ref_plane, phase_planes, size, qp, radius,
                centers=None):
    """Full ME (integer + fractional) of all size×size blocks against one
    reference.  centers: optional (cx, cy) int-pel per-block window centers
    (parent MVs — hierarchical search).  Returns (mvx, mvy [N] qpel,
    satd [N])."""
    lam_m = math.sqrt(rd_lambda(qp))
    blocks_np, xs, ys, ny, nx = _blocks_grid(y_plane, size)
    n = len(blocks_np)
    reff = jnp.asarray(ref_plane, dtype=jnp.float32)
    cx0 = (centers[0] if centers is not None
           else np.zeros(n, np.int32)).astype(np.int32)
    cy0 = (centers[1] if centers is not None
           else np.zeros(n, np.int32)).astype(np.int32)
    mvx = np.zeros(n, dtype=np.int32)
    mvy = np.zeros(n, dtype=np.int32)
    for c0 in range(0, n, CHUNK):
        c1 = min(n, c0 + CHUNK)
        pad = CHUNK - (c1 - c0) if (c1 - c0) < CHUNK and n > CHUNK else 0
        bl = blocks_np[c0:c1].astype(np.float32)
        cxs, cys = xs[c0:c1], ys[c0:c1]
        ccx, ccy = cx0[c0:c1], cy0[c0:c1]
        if pad:
            bl = np.concatenate([bl, np.zeros((pad,) + bl.shape[1:],
                                              np.float32)])
            cxs = np.concatenate([cxs, np.zeros(pad, np.int32)])
            cys = np.concatenate([cys, np.zeros(pad, np.int32)])
            ccx = np.concatenate([ccx, np.zeros(pad, np.int32)])
            ccy = np.concatenate([ccy, np.zeros(pad, np.int32)])
        ix, iy = _int_me_chunk(jnp.asarray(bl), reff, jnp.asarray(cxs),
                               jnp.asarray(cys), size, radius, lam_m,
                               jnp.asarray(ccx), jnp.asarray(ccy))
        mvx[c0:c1] = np.asarray(ix)[:c1 - c0] * 4
        mvy[c0:c1] = np.asarray(iy)[:c1 - c0] * 4
    fx, fy, cost = _frac_refine(
        jnp.asarray(blocks_np, dtype=jnp.int32), phase_planes,
        jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(mvx), jnp.asarray(mvy), size, lam_m)
    return (np.asarray(fx), np.asarray(fy), np.asarray(cost),
            blocks_np, xs, ys, ny, nx)


MERGE_CAND_BITS = 3.0   # approximate merge-candidate signalling cost


def _neighbor_adopt(blocks, refs, phase, best, s, xs, ys, ny, nx, lam_m):
    """Merge-mode RDO analog: evaluate the left/above neighbours' (MV, ref)
    as prediction hypotheses at merge-level rate (no MVD) and adopt when
    cheaper (reference: EncCu::xCheckRDCostMerge2Nx2N — candidates scored
    as predictions, not just syntax shortcuts).  Adopted MVs then match
    the writer's real merge list and ride merge syntax."""
    ob = jnp.asarray(blocks, dtype=jnp.int32)

    def gather_sel(mx, my, rf):
        out = None
        for ridx, ref in enumerate(refs):
            p = gather_pred_planes(phase[id(ref)], jnp.asarray(xs),
                                   jnp.asarray(ys), jnp.asarray(mx),
                                   jnp.asarray(my), s)
            m = jnp.asarray(rf == ridx)[:, None, None]
            out = p if out is None else jnp.where(m, p, out)
        return out

    for axis in ("left", "above"):
        gx = best[0].reshape(ny, nx).copy()
        gy = best[1].reshape(ny, nx).copy()
        gr = best[3].reshape(ny, nx).copy()
        valid = np.ones((ny, nx), bool)
        if axis == "left":
            gx[:, 1:], gy[:, 1:], gr[:, 1:] = gx[:, :-1], gy[:, :-1], gr[:, :-1]
            valid[:, 0] = False
        else:
            gx[1:, :], gy[1:, :], gr[1:, :] = gx[:-1, :], gy[:-1, :], gr[:-1, :]
            valid[0, :] = False
        cmx, cmy, crf = gx.ravel(), gy.ravel(), gr.ravel()
        pred_c = gather_sel(cmx, cmy, crf)
        cost_c = (np.asarray(satd_batch(pred_c, ob)).astype(np.float64)
                  + lam_m * MERGE_CAND_BITS)
        upd = valid.ravel() & (cost_c < best[2])
        best[0] = np.where(upd, cmx, best[0])
        best[1] = np.where(upd, cmy, best[1])
        best[2] = np.where(upd, cost_c, best[2])
        best[3] = np.where(upd, crf, best[3])
    return best


AFFINE_ME_SIZES = (16, 32, 64)   # spec: AMVP affine needs w,h >= 16
AFFINE_BITS = 18.0               # flag + type + extra CPMV MVD overhead


def _affine_candidates(blocks_np, xs, ys, s, per_list, refs_l0, refs_l1,
                       phase, is_b, qp, bit_depth):
    """Affine CPMV search per block against ref 0 of each used list,
    seeded with the list's best translational MV; candidates are scored
    with the NORMATIVE batched subblock predictor so RD sees exactly what
    the decoder will reconstruct (reference: InterSearch::
    xPredAffineInterSearch seeded from the AMVP/translational result).

    Returns (pred [N,S,S] device, cp0, cp1 [N,3,2], adir [N], bits [N])."""
    from vvc.kernels.affine import affine_me_batch, affine_pred_batch_np
    ob = jnp.asarray(blocks_np, dtype=jnp.int32)
    n = len(blocks_np)
    preds, costs, cps = [], [], []
    lists = [(0, refs_l0)] + ([(1, refs_l1)] if is_b and refs_l1 else [])
    lam_m = math.sqrt(rd_lambda(qp))
    for li, refs in lists:
        best = per_list[li]
        seed_ok = best[3] == 0
        sx = np.where(seed_ok, best[0], 0).astype(np.int32)
        sy = np.where(seed_ok, best[1], 0).astype(np.int32)
        cp = affine_me_batch(blocks_np.astype(np.float32), refs[0],
                             xs, ys, sx, sy, s, bit_depth)
        pred = affine_pred_batch_np(refs[0], xs, ys, s, cp, 4, bit_depth)
        mvb = np.log2(1.0 + np.abs(cp[:, :2]).sum(axis=(1, 2)))
        c = (np.asarray(satd_batch(jnp.asarray(pred), ob)).astype(np.float64)
             + lam_m * (AFFINE_BITS + 2.0 * mvb))
        preds.append(pred)
        costs.append(c)
        cps.append(cp)
    if len(lists) == 2:
        adir = np.where(costs[1] < costs[0], 2, 1).astype(np.int32)
        pred = np.where((adir == 2)[:, None, None], preds[1], preds[0])
        cp1 = cps[1]
    else:
        adir = np.ones(n, np.int32)
        pred = preds[0]
        cp1 = np.zeros_like(cps[0])
    return pred, cps[0], cp1, adir


def rdo_inter_partition(y_plane: np.ndarray, refs_l0, refs_l1, qp: int,
                        bit_depth: int = 8, ctu_size: int = 64,
                        min_cu: int = 8, is_b: bool = False,
                        search_range: int = 32, mts_enabled: bool = True,
                        affine: bool = False):
    """Partition + per-CU mode decision for a P/B frame.

    refs_l0 / refs_l1: lists of reference luma planes (decode order nearest
    first).  Returns (split_map, leaf_map, leaves) with inter fields set.

    ME is hierarchical: the largest size searches ±search_range around
    zero; every smaller size searches ±CHILD_RADIUS around its parent
    block's integer MV (effective range grows with depth — the TZSearch
    predictor-centering analog, exhaustively batched on the MXU).
    """
    h, w = y_plane.shape
    sizes = _candidate_sizes(ctu_size, min_cu)
    lam = rd_lambda(qp)
    lam_m = math.sqrt(lam)

    # intra costs for all sizes (one dispatch — shared with the AI path)
    from vvc.enc.rdo import pack_planes, unpack_results
    packed = eval_all_sizes(jax.device_put(pack_planes(y_plane)),
                            tuple(sizes), jnp.int32(qp), bit_depth, w, h)
    intra_res = unpack_results(np.asarray(packed), sizes, w, h)

    # phase planes per unique reference (device, once)
    phase = {}
    for ref in list(refs_l0) + list(refs_l1):
        key = id(ref)
        if key not in phase:
            phase[key] = interp_luma_planes(ref, bit_depth)

    me_sizes = sorted([s for s in sizes if s >= ME_SIZES_MIN], reverse=True)
    # per (list, ref, size): integer-MV grids feeding the children's centers
    parent_mv = {}
    # per size: best uni MV per list (ref 0 ... n), then bi check, then RD
    inter = {}   # size -> dict of per-block arrays
    for s in me_sizes:
        per_list = []
        for li, refs in enumerate((refs_l0, refs_l1 if is_b else [])):
            best = None
            for ridx, ref in enumerate(refs):
                centers = None
                radius = search_range
                pk = (li, ridx, 2 * s)
                if pk in parent_mv:
                    pmx, pmy, pny, pnx = parent_mv[pk]
                    cny, cnx = h // s, w // s
                    iy = np.minimum(np.arange(cny) // 2, pny - 1)
                    ix = np.minimum(np.arange(cnx) // 2, pnx - 1)
                    centers = (pmx[np.ix_(iy, ix)].ravel(),
                               pmy[np.ix_(iy, ix)].ravel())
                    radius = CHILD_RADIUS
                fx, fy, cost, blocks_np, xs, ys, ny, nx = _me_one_ref(
                    y_plane, ref, phase[id(ref)], s, qp, radius, centers)
                parent_mv[(li, ridx, s)] = ((fx // 4).reshape(ny, nx),
                                            (fy // 4).reshape(ny, nx),
                                            ny, nx)
                if best is None:
                    best = [fx, fy, cost, np.full(len(fx), ridx)]
                else:
                    upd = cost < best[2]
                    best[0] = np.where(upd, fx, best[0])
                    best[1] = np.where(upd, fy, best[1])
                    best[2] = np.where(upd, cost, best[2])
                    best[3] = np.where(upd, ridx, best[3])
            if best is not None:
                best = _neighbor_adopt(blocks_np, refs, phase, best, s,
                                       xs, ys, ny, nx, lam_m)
            per_list.append(best)
        blocks_np, xs, ys, ny, nx = _blocks_grid(y_plane, s)
        n = len(blocks_np)
        l0 = per_list[0]

        def sel_pred(refs, best):
            """Per-block prediction at (best mv, best ref): gather per ref,
            select by the block's chosen ref index."""
            out = None
            for ridx, ref in enumerate(refs):
                p = gather_pred_planes(
                    phase[id(ref)], jnp.asarray(xs), jnp.asarray(ys),
                    jnp.asarray(best[0]), jnp.asarray(best[1]), s)
                m = jnp.asarray(best[3] == ridx)[:, None, None]
                out = p if out is None else jnp.where(m, p, out)
            return out

        dirs = np.ones(n, dtype=np.int32)
        if is_b and per_list[1] is not None:
            l1 = per_list[1]
            # uni choice by SATD cost, then test bi (average of both best)
            dirs = np.where(l1[2] < l0[2], 2, 1).astype(np.int32)
            p0 = sel_pred(refs_l0, l0)
            p1 = sel_pred(refs_l1, l1)
            pbi = (p0 + p1 + 1) >> 1
            ob = jnp.asarray(blocks_np, dtype=jnp.int32)
            cbi = np.asarray(satd_batch(pbi, ob)).astype(np.float64) \
                + math.sqrt(lam) * 8.0
            cuni = np.where(dirs == 2, l1[2], l0[2])
            dirs = np.where(cbi < cuni, 3, dirs)
            pred_dev = jnp.where((jnp.asarray(dirs) == 3)[:, None, None], pbi,
                                 jnp.where((jnp.asarray(dirs) == 2)
                                           [:, None, None], p1, p0))
        else:
            pred_dev = sel_pred(refs_l0, l0)
        # signalling bits: MVD vs the left-neighbour predictor (AMVP-rate
        # analog; merge-adopted MVs get near-zero MVD) + flags
        pmx = l0[0].reshape(ny, nx).copy()
        pmy = l0[1].reshape(ny, nx).copy()
        pmx[:, 1:], pmy[:, 1:] = pmx[:, :-1], pmy[:, :-1]
        pmx[:, 0] = 0
        pmy[:, 0] = 0
        mvb = (np.log2(1 + np.abs(l0[0] - pmx.ravel()))
               + np.log2(1 + np.abs(l0[1] - pmy.ravel()))) + 6.0
        rd = np.asarray(_inter_rd(jnp.asarray(blocks_np, dtype=jnp.int32),
                                  pred_dev, s, jnp.int32(qp), bit_depth,
                                  jnp.asarray(mvb, dtype=jnp.float32)))
        aff = np.zeros(n, np.int32)
        acp0 = acp1 = None
        if affine and s in AFFINE_ME_SIZES:
            apred, acp0, acp1, adir = _affine_candidates(
                blocks_np, xs, ys, s, per_list, refs_l0, refs_l1, phase,
                is_b, qp, bit_depth)
            acpb = (np.log2(1.0 + np.abs(acp0[:, :2]).sum(axis=(1, 2)))
                    + AFFINE_BITS)
            ard = np.asarray(_inter_rd(
                jnp.asarray(blocks_np, dtype=jnp.int32),
                jnp.asarray(apred), s, jnp.int32(qp), bit_depth,
                jnp.asarray(acpb, dtype=jnp.float32)))
            upd = ard < rd
            aff = np.where(upd, 4, 0).astype(np.int32)
            rd = np.where(upd, ard, rd)
            dirs = np.where(upd, adir, dirs)
        ent = {"cost": rd.reshape(ny, nx),
               "dir": dirs.reshape(ny, nx),
               "mvx0": l0[0].reshape(ny, nx), "mvy0": l0[1].reshape(ny, nx),
               "ref0": l0[3].reshape(ny, nx),
               "aff": aff.reshape(ny, nx)}
        if acp0 is not None:
            ent["cp0"] = acp0.reshape(ny, nx, 3, 2)
            ent["cp1"] = acp1.reshape(ny, nx, 3, 2)
        if is_b and per_list[1] is not None:
            ent.update({"mvx1": l1[0].reshape(ny, nx),
                        "mvy1": l1[1].reshape(ny, nx),
                        "ref1": l1[3].reshape(ny, nx)})
        inter[s] = ent

    return _dp_backtrack_inter(intra_res, inter, w, h, qp, sizes, ctu_size,
                               min_cu)


def _dp_backtrack_inter(intra_res, inter, w, h, qp, sizes, ctu_size, min_cu):
    """Bottom-up DP over the size pyramid with per-node intra/inter choice
    (mirrors rdo._dp_backtrack; kept separate for the extra payloads)."""
    lam = rd_lambda(qp)
    cost, choose_inter = {}, {}
    for s in sizes:
        nx, ny = w // s, h // s
        cost[s] = np.full((ny, nx), np.inf)
        choose_inter[s] = np.zeros((ny, nx), dtype=bool)
        if s in intra_res:
            cost[s][:] = intra_res[s][0]
        if s in inter:
            ic = inter[s]["cost"]
            choose_inter[s] = ic < cost[s]
            cost[s] = np.minimum(cost[s], ic)

    best = {min_cu: cost[min_cu].copy()}
    use_split = {}
    for s in sizes[1:]:
        half = s // 2
        ny, nx = h // s, w // s
        ch = best[half]
        child_sum = (ch[0::2, 0::2][:ny, :nx] + ch[0::2, 1::2][:ny, :nx]
                     + ch[1::2, 0::2][:ny, :nx] + ch[1::2, 1::2][:ny, :nx])
        split_cost = child_sum + lam * SPLIT_BITS
        leaf_cost = cost[s][:ny, :nx] + lam * SPLIT_BITS
        use_split[s] = split_cost < leaf_cost
        best[s] = np.where(use_split[s], split_cost, leaf_cost)

    split_map, leaf_map, leaves = {}, {}, []

    def make_leaf(x0, y0, s):
        by, bx = y0 // s, x0 // s
        if choose_inter[s][by, bx]:
            e = inter[s]
            d = int(e["dir"][by, bx])
            if "aff" in e and int(e["aff"][by, bx]):
                cp = e["cp0"] if d == 1 else e["cp1"]
                cpmv = tuple((int(cp[by, bx, c, 0]), int(cp[by, bx, c, 1]))
                             for c in range(2))
                cps = [None, None]
                cps[d - 1] = cpmv
                return Leaf(x0, y0, s, s, pred=1, inter_dir=d,
                            ref_idx=(0, 0), affine=4, cpmv=tuple(cps))
            mv = [(int(e["mvx0"][by, bx]), int(e["mvy0"][by, bx])), (0, 0)]
            ref = [int(e["ref0"][by, bx]), 0]
            if d >= 2:
                mv[1] = (int(e["mvx1"][by, bx]), int(e["mvy1"][by, bx]))
                ref[1] = int(e["ref1"][by, bx])
                if d == 2:
                    mv[0] = (0, 0)
                    ref[0] = 0
            return Leaf(x0, y0, s, s, pred=1, inter_dir=d, mv=tuple(mv),
                        ref_idx=tuple(ref))
        mode = int(intra_res[s][1][by, bx]) if s in intra_res else 0
        mts = int(intra_res[s][2][by, bx]) if s in intra_res else 0
        return Leaf(x0, y0, s, s, mode, mts=mts)

    def walk(x0, y0, s):
        if x0 >= w or y0 >= h:
            return
        inside = x0 + s <= w and y0 + s <= h
        if not inside:
            half = s // 2
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                walk(x0 + dx, y0 + dy, half)
            return
        if s > min_cu and use_split[s][y0 // s, x0 // s]:
            split_map[(x0, y0, s, s)] = SPLIT_QT
            half = s // 2
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                walk(x0 + dx, y0 + dy, half)
        else:
            if s > min_cu:
                split_map[(x0, y0, s, s)] = SPLIT_NONE
            leaf = make_leaf(x0, y0, s)
            leaf_map[(x0, y0, s, s)] = leaf
            leaves.append(leaf)

    for cy in range(0, h, ctu_size):
        for cx in range(0, w, ctu_size):
            walk(cx, cy, ctu_size)
    return split_map, leaf_map, leaves
