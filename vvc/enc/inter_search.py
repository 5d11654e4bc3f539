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

EVERYTHING for one size class — integer+fractional ME over every
(list, ref), merge-style neighbour adoption, bi-check, affine CPMV
search, and the DCT2 RD — runs as ONE jitted device program; sizes chain
parent→child MV centers as device arrays (no host sync), and the whole
frame's results come back in a single packed int32 transfer
(vvc.enc.rdo's _pack_results pattern).  The r3 flow synced the device
~40× per frame with numpy glue between dispatches; over the TPU tunnel
each sync costs 6–30 ms, which dominated the north-star bench
(VERDICT r3 weak #1 profile).

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
CHUNK = 1024           # blocks per ME map step (bounds window-gather memory)
CHILD_RADIUS = 8       # refinement radius around the parent-MV center —
                       # hierarchical ME: effective range ≈ top radius +
                       # Σ child radii (reference: xTZSearch's predictor-
                       # centered window, SURVEY §2.3 InterSearch)

MERGE_CAND_BITS = 3.0   # approximate merge-candidate signalling cost
AFFINE_ME_SIZES = (16, 32, 64)   # spec: AMVP affine needs w,h >= 16
AFFINE_BITS = 18.0               # flag + type + extra CPMV MVD overhead


def _mv_bits(d):
    """Approximate qpel-MVD rate (bits) — EG1-ish."""
    return 2.0 * jnp.log2(1.0 + jnp.abs(d).astype(jnp.float32)) + 1.0


def _int_me_dev(blocks_f, ref_f, xs, ys, size: int, radius: int, lam_m,
                cx0, cy0):
    """Integer full-search SSE ME for all same-size blocks, chunked with
    lax.map to bound window-gather memory.  Returns int-pel (mvx, mvy)."""
    n, s, _ = blocks_f.shape
    r = radius
    h, w = ref_f.shape
    pad = (-n) % CHUNK if n > CHUNK else 0
    if pad:
        blocks_f = jnp.concatenate(
            [blocks_f, jnp.zeros((pad, s, s), blocks_f.dtype)])
        xs = jnp.concatenate([xs, jnp.zeros(pad, xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros(pad, ys.dtype)])
        cx0 = jnp.concatenate([cx0, jnp.zeros(pad, cx0.dtype)])
        cy0 = jnp.concatenate([cy0, jnp.zeros(pad, cy0.dtype)])
    nn = n + pad
    k = jnp.arange(s + 2 * r)
    d = jnp.arange(2 * r + 1)

    def one_chunk(args):
        bl, bxs, bys, bcx, bcy = args
        m = bl.shape[0]
        yy = jnp.clip(bys[:, None] + bcy[:, None] - r + k[None, :], 0, h - 1)
        xx = jnp.clip(bxs[:, None] + bcx[:, None] - r + k[None, :], 0, w - 1)
        win = ref_f[yy[:, :, None], xx[:, None, :]]        # [M, S+2R, S+2R]
        corr = jax.lax.conv_general_dilated(
            win[None], bl[:, None], (1, 1), "VALID",
            feature_group_count=m,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]  # [M, 2R+1, 2R+1]
        w2 = win * win
        ii = jnp.pad(jnp.cumsum(jnp.cumsum(w2, axis=1), axis=2),
                     ((0, 0), (1, 0), (1, 0)))
        e_win = (ii[:, d[:, None] + s, d[None, :] + s]
                 - ii[:, d[:, None] + s, d[None, :]]
                 - ii[:, d[:, None], d[None, :] + s]
                 + ii[:, d[:, None], d[None, :]])
        sse = e_win - 2.0 * corr                            # + Σo² (const)
        bx = _mv_bits(4 * (bcx[:, None] + d[None, :] - r))
        by = _mv_bits(4 * (bcy[:, None] + d[None, :] - r))
        cost = sse + lam_m * (by[:, :, None] + bx[:, None, :])
        flat = jnp.argmin(cost.reshape(m, -1), axis=1)
        return (bcx + flat % (2 * r + 1) - r,
                bcy + flat // (2 * r + 1) - r)

    if nn > CHUNK:
        nc = nn // CHUNK
        mx, my = jax.lax.map(one_chunk,
                             (blocks_f.reshape(nc, CHUNK, s, s),
                              xs.reshape(nc, CHUNK), ys.reshape(nc, CHUNK),
                              cx0.reshape(nc, CHUNK), cy0.reshape(nc, CHUNK)))
        mx, my = mx.reshape(-1), my.reshape(-1)
    else:
        mx, my = one_chunk((blocks_f, xs, ys, cx0, cy0))
    return mx[:n], my[:n]


_FRAC_OFF = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (1, -1), (-1, 1), (1, 1)]


def _frac_refine_dev(orig, planes, xs, ys, mvx, mvy, size: int, lam_m):
    """Half- then quarter-pel refinement around integer-best, SATD cost."""
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


def _inter_rd_dev(orig, pred, qp, bit_depth: int, extra_bits):
    """DCT2 RD cost of coding orig with the given inter prediction
    (mirrors rdo.eval_blocks' rd_pass)."""
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


def _affine_pred_dev(planes, xs, ys, size: int, cp, bit_depth: int):
    """Device affine luma prediction (PROF-less) from the ref's phase
    planes: per-4×4-subblock MVs from CPMVs, each subblock gathered at its
    own quarter-pel phase — the batched analog of affine_pred_batch_np
    used for SEARCH SCORING (reconstruction runs the normative host
    predictor).  cp [N,3,2] qpel; returns [N,S,S] int32."""
    from vvc.kernels.affine import AFF_SHIFT, SB
    n = cp.shape[0]
    cpl = cp.astype(jnp.int64)
    lw = int(size).bit_length() - 1
    dhx = ((cpl[:, 1, 0] - cpl[:, 0, 0]) << AFF_SHIFT) >> lw
    dhy = ((cpl[:, 1, 1] - cpl[:, 0, 1]) << AFF_SHIFT) >> lw
    dvx, dvy = -dhy, dhx                                   # 4-param
    c = jnp.arange(size // SB, dtype=jnp.int64) * SB + SB // 2
    bx = ((cpl[:, 0, 0] << AFF_SHIFT)[:, None, None]
          + dhx[:, None, None] * c[None, None, :]
          + dvx[:, None, None] * c[None, :, None])
    by = ((cpl[:, 0, 1] << AFF_SHIFT)[:, None, None]
          + dhy[:, None, None] * c[None, None, :]
          + dvy[:, None, None] * c[None, :, None])

    def rnd(v):
        off = (1 << (AFF_SHIFT - 1))
        return jnp.where(v >= 0, (v + off) >> AFF_SHIFT,
                         -((-v + off) >> AFF_SHIFT))

    mvx = jnp.clip(rnd(bx), -(1 << 17), (1 << 17) - 1).astype(jnp.int32)
    mvy = jnp.clip(rnd(by), -(1 << 17), (1 << 17) - 1).astype(jnp.int32)
    nb = size // SB
    sub_x = (xs[:, None, None]
             + (jnp.arange(nb) * SB)[None, None, :]).astype(jnp.int32)
    sub_y = (ys[:, None, None]
             + (jnp.arange(nb) * SB)[None, :, None]).astype(jnp.int32)
    sub_x = jnp.broadcast_to(sub_x, (n, nb, nb)).reshape(-1)
    sub_y = jnp.broadcast_to(sub_y, (n, nb, nb)).reshape(-1)
    pred = gather_pred_planes(planes, sub_x, sub_y,
                              mvx.reshape(-1), mvy.reshape(-1), SB)
    return (pred.reshape(n, nb, nb, SB, SB).transpose(0, 1, 3, 2, 4)
            .reshape(n, size, size))


@partial(jax.jit, static_argnames=("size", "radius", "bit_depth", "w", "h",
                                  "n_l0", "n_l1", "is_b", "affine",
                                  "has_parent"))
def _me_size_program(y, phase, qp, size: int, radius: int, bit_depth: int,
                     w: int, h: int, n_l0: int, n_l1: int, is_b: bool,
                     affine: bool, has_parent: bool, parents):
    """One device program per size class: ME over every (list, ref) +
    neighbour adoption + bi check + affine + RD.  phase [R,4,4,H,W] stacks
    the unique refs' quarter-pel planes (list l's ref r = stack index
    l * n_l0 bookkeeping is done by the caller via l0/l1 index maps: stack
    holds l0 refs then l1 refs).  parents: {(l, r): (pmx, pmy)} int-pel
    parent MV grids from the 2× size, or empty.  Returns the per-block
    result fields + this size's parent grids for the next level."""
    s = size
    ny, nx = h // s, w // s
    n = ny * nx
    blocks = (y[:ny * s, :nx * s].reshape(ny, s, nx, s)
              .transpose(0, 2, 1, 3).reshape(-1, s, s))
    ob = blocks.astype(jnp.int32)
    bf = blocks.astype(jnp.float32)
    xs = (jnp.tile(jnp.arange(nx), ny) * s).astype(jnp.int32)
    ys = (jnp.repeat(jnp.arange(ny), nx) * s).astype(jnp.int32)
    lam = 0.57 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0)
    lam_m = jnp.sqrt(lam)
    zero = jnp.zeros(n, jnp.int32)

    def expand_parent(p):
        """Parent int-MV grid [pny,pnx] → per-child-block center [N]."""
        pny, pnx = p.shape
        iy = jnp.minimum(jnp.arange(ny) // 2, pny - 1)
        ix = jnp.minimum(jnp.arange(nx) // 2, pnx - 1)
        return p[iy[:, None], ix[None, :]].reshape(-1)

    per_list = []
    new_parents = {}
    n_refs = (n_l0, n_l1 if is_b else 0)
    for li in (0, 1):
        best = None
        for ridx in range(n_refs[li]):
            st = ridx if li == 0 else n_l0 + ridx
            pl = phase[st]
            ref_f = pl[0, 0].astype(jnp.float32)
            if has_parent:
                cx0 = expand_parent(parents[2 * (li * n_l0 + ridx)])
                cy0 = expand_parent(parents[2 * (li * n_l0 + ridx) + 1])
            else:
                cx0, cy0 = zero, zero
            ix, iy = _int_me_dev(bf, ref_f, xs, ys, s, radius, lam_m,
                                 cx0, cy0)
            fx, fy, cost = _frac_refine_dev(ob, pl, xs, ys, ix * 4, iy * 4,
                                            s, lam_m)
            new_parents[2 * (li * n_l0 + ridx)] = \
                (fx // 4).reshape(ny, nx)
            new_parents[2 * (li * n_l0 + ridx) + 1] = \
                (fy // 4).reshape(ny, nx)
            if best is None:
                best = [fx, fy, cost, jnp.full(n, ridx, jnp.int32)]
            else:
                upd = cost < best[2]
                best = [jnp.where(upd, fx, best[0]),
                        jnp.where(upd, fy, best[1]),
                        jnp.where(upd, cost, best[2]),
                        jnp.where(upd, ridx, best[3])]
        per_list.append(best)

    def gather_sel(li, mx, my, rf):
        """Prediction at (mv, ref) per block, selecting by ref index."""
        out = None
        for ridx in range(n_refs[li]):
            st = ridx if li == 0 else n_l0 + ridx
            p = gather_pred_planes(phase[st], xs, ys, mx, my, s)
            m = (rf == ridx)[:, None, None]
            out = p if out is None else jnp.where(m, p, out)
        return out

    def neighbor_adopt(li, best):
        """Merge-mode RDO analog: left/above neighbours' (MV, ref) as
        prediction hypotheses at merge-level rate (reference:
        EncCu::xCheckRDCostMerge2Nx2N)."""
        for axis in ("left", "above"):
            gx = best[0].reshape(ny, nx)
            gy = best[1].reshape(ny, nx)
            gr = best[3].reshape(ny, nx)
            if axis == "left":
                gx = jnp.concatenate([gx[:, :1], gx[:, :-1]], axis=1)
                gy = jnp.concatenate([gy[:, :1], gy[:, :-1]], axis=1)
                gr = jnp.concatenate([gr[:, :1], gr[:, :-1]], axis=1)
                valid = (jnp.arange(nx) > 0)[None, :].repeat(ny, 0)
            else:
                gx = jnp.concatenate([gx[:1, :], gx[:-1, :]], axis=0)
                gy = jnp.concatenate([gy[:1, :], gy[:-1, :]], axis=0)
                gr = jnp.concatenate([gr[:1, :], gr[:-1, :]], axis=0)
                valid = (jnp.arange(ny) > 0)[:, None].repeat(nx, 1)
            cmx, cmy, crf = gx.reshape(-1), gy.reshape(-1), gr.reshape(-1)
            pred_c = gather_sel(li, cmx, cmy, crf)
            cost_c = (satd_batch(pred_c, ob).astype(jnp.float32)
                      + lam_m * MERGE_CAND_BITS)
            upd = valid.reshape(-1) & (cost_c < best[2])
            best = [jnp.where(upd, cmx, best[0]),
                    jnp.where(upd, cmy, best[1]),
                    jnp.where(upd, cost_c, best[2]),
                    jnp.where(upd, crf, best[3])]
        return best

    l0 = neighbor_adopt(0, per_list[0])
    dirs = jnp.ones(n, jnp.int32)
    if is_b and per_list[1] is not None:
        l1 = neighbor_adopt(1, per_list[1])
        dirs = jnp.where(l1[2] < l0[2], 2, 1)
        p0 = gather_sel(0, l0[0], l0[1], l0[3])
        p1 = gather_sel(1, l1[0], l1[1], l1[3])
        pbi = (p0 + p1 + 1) >> 1
        cbi = satd_batch(pbi, ob).astype(jnp.float32) + lam_m * 8.0
        cuni = jnp.where(dirs == 2, l1[2], l0[2])
        dirs = jnp.where(cbi < cuni, 3, dirs)
        pred = jnp.where((dirs == 3)[:, None, None], pbi,
                         jnp.where((dirs == 2)[:, None, None], p1, p0))
    else:
        l1 = [zero, zero, jnp.zeros(n, jnp.float32), zero]
        pred = gather_sel(0, l0[0], l0[1], l0[3])
    # signalling bits: MVD vs the left-neighbour predictor (AMVP-rate
    # analog; merge-adopted MVs get near-zero MVD) + flags
    pmx = l0[0].reshape(ny, nx)
    pmy = l0[1].reshape(ny, nx)
    pmx = jnp.concatenate([jnp.zeros((ny, 1), pmx.dtype), pmx[:, :-1]], 1)
    pmy = jnp.concatenate([jnp.zeros((ny, 1), pmy.dtype), pmy[:, :-1]], 1)
    mvb = (jnp.log2(1.0 + jnp.abs(l0[0] - pmx.reshape(-1))
                    .astype(jnp.float32))
           + jnp.log2(1.0 + jnp.abs(l0[1] - pmy.reshape(-1))
                      .astype(jnp.float32)) + 6.0)
    rd = _inter_rd_dev(ob, pred, qp, bit_depth, mvb)
    aff = zero
    cp0 = jnp.zeros((n, 3, 2), jnp.int32)
    cp1 = jnp.zeros((n, 3, 2), jnp.int32)
    if affine and s in AFFINE_ME_SIZES:
        from vvc.kernels.affine import _affine_me_jit
        acosts, acps, apreds = [], [], []
        for li in (0, 1):
            if n_refs[li] == 0:
                continue
            best = (l0, l1)[li]
            st = 0 if li == 0 else n_l0
            seed_ok = best[3] == 0
            sx = jnp.where(seed_ok, best[0], 0).astype(jnp.float32)
            sy = jnp.where(seed_ok, best[1], 0).astype(jnp.float32)
            ref_f = phase[st][0, 0].astype(jnp.float32)
            cp = _affine_me_jit(bf, ref_f, xs, ys, sx, sy, s, 4, 4)
            apred = _affine_pred_dev(phase[st], xs, ys, s, cp, bit_depth)
            mvbits = jnp.log2(1.0 + jnp.abs(cp[:, :2])
                              .sum(axis=(1, 2)).astype(jnp.float32))
            c = (satd_batch(apred, ob).astype(jnp.float32)
                 + lam_m * (AFFINE_BITS + 2.0 * mvbits))
            acosts.append(c)
            acps.append(cp)
            apreds.append(apred)
        if len(acosts) == 2:
            adir = jnp.where(acosts[1] < acosts[0], 2, 1)
            apred = jnp.where((adir == 2)[:, None, None],
                              apreds[1], apreds[0])
            acp1 = acps[1]
        else:
            adir = jnp.ones(n, jnp.int32)
            apred = apreds[0]
            acp1 = jnp.zeros_like(acps[0])
        acpb = (jnp.log2(1.0 + jnp.abs(acps[0][:, :2])
                         .sum(axis=(1, 2)).astype(jnp.float32))
                + AFFINE_BITS)
        ard = _inter_rd_dev(ob, apred, qp, bit_depth, acpb)
        upd = ard < rd
        aff = jnp.where(upd, 4, 0)
        rd = jnp.where(upd, ard, rd)
        dirs = jnp.where(upd, adir, dirs)
        cp0 = acps[0]
        cp1 = acp1
    out = [rd, dirs.astype(jnp.float32), l0[0].astype(jnp.float32),
           l0[1].astype(jnp.float32), l0[3].astype(jnp.float32),
           l1[0].astype(jnp.float32), l1[1].astype(jnp.float32),
           l1[3].astype(jnp.float32), aff.astype(jnp.float32),
           cp0.reshape(n, -1).astype(jnp.float32).reshape(-1),
           cp1.reshape(n, -1).astype(jnp.float32).reshape(-1)]
    packed = jnp.concatenate([o.reshape(-1) for o in out])
    return packed, new_parents


_FIELDS = ("cost", "dir", "mvx0", "mvy0", "ref0", "mvx1", "mvy1", "ref1",
           "aff")


@partial(jax.jit, static_argnames=("size", "radius", "w", "h"))
def me_pred_program(y, phase, size: int, radius: int, w: int, h: int,
                    lam_m):
    """Standalone single-ref ME + prediction + per-block MSE — one device
    program (consumer: vvc.enc.mctf).  Returns (pred_plane [ny*s, nx*s],
    err [ny, nx])."""
    s = size
    ny, nx = h // s, w // s
    blocks = (y[:ny * s, :nx * s].reshape(ny, s, nx, s)
              .transpose(0, 2, 1, 3).reshape(-1, s, s))
    xs = (jnp.tile(jnp.arange(nx), ny) * s).astype(jnp.int32)
    ys = (jnp.repeat(jnp.arange(ny), nx) * s).astype(jnp.int32)
    zero = jnp.zeros(ny * nx, jnp.int32)
    ref_f = phase[0, 0].astype(jnp.float32)
    ix, iy = _int_me_dev(blocks.astype(jnp.float32), ref_f, xs, ys, s,
                         radius, lam_m, zero, zero)
    fx, fy, _ = _frac_refine_dev(blocks.astype(jnp.int32), phase, xs, ys,
                                 ix * 4, iy * 4, s, lam_m)
    pred = gather_pred_planes(phase, xs, ys, fx, fy, s)    # [N,S,S]
    d = (pred - blocks).astype(jnp.float32)
    err = (d * d).mean(axis=(1, 2)).reshape(ny, nx)
    plane = (pred.reshape(ny, nx, s, s).transpose(0, 2, 1, 3)
             .reshape(ny * s, nx * s))
    return plane, err


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
    predictor-centering analog, exhaustively batched on the MXU).  All
    device work is queued async; ONE packed transfer per size brings the
    frame's decisions back.
    """
    h, w = y_plane.shape
    sizes = _candidate_sizes(ctu_size, min_cu)

    # intra costs for all sizes (one dispatch — shared with the AI path)
    from vvc.enc.rdo import pack_planes, unpack_results
    packed_intra = eval_all_sizes(jax.device_put(pack_planes(y_plane)),
                                  tuple(sizes), jnp.int32(qp), bit_depth,
                                  w, h)

    # quarter-pel phase planes per ref, stacked [R,4,4,H,W] (device, once);
    # stack layout: l0 refs then l1 refs (duplicates share via id cache)
    cache = {}
    stack = []
    n_l0, n_l1 = len(refs_l0), len(refs_l1) if is_b else 0
    for ref in list(refs_l0) + (list(refs_l1) if is_b else []):
        if id(ref) in cache:
            stack.append(stack[cache[id(ref)]])
        else:
            cache[id(ref)] = len(stack)
            stack.append(interp_luma_planes(ref, bit_depth))
    phase = jnp.stack(stack)
    y_dev = jax.device_put(np.ascontiguousarray(y_plane).astype(np.int32))
    qpj = jnp.int32(qp)

    me_sizes = sorted([s for s in sizes if s >= ME_SIZES_MIN], reverse=True)
    packed_by_size = {}
    parents = {}
    for s in me_sizes:
        has_parent = bool(parents)
        # dict order must be stable across trace/call: key-sorted tuple
        pt = tuple(parents[k] for k in sorted(parents)) if parents else ()
        packed, parents = _me_size_program(
            y_dev, phase, qpj, s, search_range if not has_parent
            else CHILD_RADIUS, bit_depth, w, h, n_l0, n_l1, is_b, affine,
            has_parent, pt)
        packed_by_size[s] = packed

    # single sync point: pull every size's packed vector (queued async)
    intra_res = unpack_results(np.asarray(packed_intra), sizes, w, h)
    inter = {}
    for s in me_sizes:
        v = np.asarray(packed_by_size[s])
        ny, nx = h // s, w // s
        n = ny * nx
        ent = {}
        off = 0
        for f in _FIELDS:
            fv = v[off:off + n]
            ent[f] = (fv if f == "cost"
                      else fv.astype(np.int32)).reshape(ny, nx)
            off += n
        ent["cp0"] = v[off:off + n * 6].astype(np.int32) \
            .reshape(ny, nx, 3, 2)
        off += n * 6
        ent["cp1"] = v[off:off + n * 6].astype(np.int32) \
            .reshape(ny, nx, 3, 2)
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
        if s > 64:
            # MaxCUSize 64: CTU-128 nodes split implicitly (no flag)
            half = s // 2
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                walk(x0 + dx, y0 + dy, half)
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
