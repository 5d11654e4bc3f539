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
from vvc.enc import me as me_mod

ME_SIZES_MIN = 8       # integer ME at sizes >= this (8×8 searches a small
                       # window centered on the parent 16×16 MV)
CHUNK = 1024           # blocks per ME map step (bounds window-gather memory)
CHILD_RADIUS = 8       # refinement radius around the parent-MV center —
                       # hierarchical ME: effective range ≈ top radius +
                       # Σ child radii (reference: xTZSearch's predictor-
                       # centered window, SURVEY §2.3 InterSearch)



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


def _reorder_children(f, nye: int, nxe: int, ny8: int, nx8: int):
    """Child field [4·N16e, …] (parent-major, sub (0,0),(0,1),(1,0),(1,1))
    → raster [ny8·nx8, …]."""
    tail = f.shape[1:]
    g = f.reshape((nye, nxe, 2, 2) + tail)
    perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(tail)))
    g = g.transpose(perm).reshape((2 * nye, 2 * nxe) + tail)
    return g[:ny8, :nx8].reshape((-1,) + tail)


def _finish(l0, l1, ob, qp, bit_depth: int, lam_m, ny: int, nx: int,
            is_b: bool, affine_res):
    """Per-block list selection + bi check + RD + pack (shared by parent
    and child grids).  l0/l1: dict(mvy, mvx, cost, pred, ref) raster [N];
    affine_res: None or per-list list of (cost, cp [N,3,2] (x,y), pred)."""
    n = ob.shape[0]
    zero = jnp.zeros(n, jnp.int32)
    dirs = jnp.ones(n, jnp.int32)
    if is_b and l1 is not None:
        dirs = jnp.where(l1["cost"] < l0["cost"], 2, 1)
        pbi = (l0["pred"] + l1["pred"] + 1) >> 1
        cbi = satd_batch(pbi, ob).astype(jnp.float32) + lam_m * 8.0
        cuni = jnp.where(dirs == 2, l1["cost"], l0["cost"])
        dirs = jnp.where(cbi < cuni, 3, dirs)
        pred = jnp.where((dirs == 3)[:, None, None], pbi,
                         jnp.where((dirs == 2)[:, None, None],
                                   l1["pred"], l0["pred"]))
    else:
        l1 = dict(mvy=zero, mvx=zero, ref=zero)
        pred = l0["pred"]
    # signalling bits: MVD vs the left-neighbour predictor (AMVP-rate
    # analog) + flags
    pmx = l0["mvx"].reshape(ny, nx)
    pmy = l0["mvy"].reshape(ny, nx)
    pmx = jnp.concatenate([jnp.zeros((ny, 1), pmx.dtype), pmx[:, :-1]], 1)
    pmy = jnp.concatenate([jnp.zeros((ny, 1), pmy.dtype), pmy[:, :-1]], 1)
    mvb = (jnp.log2(1.0 + jnp.abs(l0["mvx"] - pmx.reshape(-1))
                    .astype(jnp.float32))
           + jnp.log2(1.0 + jnp.abs(l0["mvy"] - pmy.reshape(-1))
                      .astype(jnp.float32)) + 6.0)
    rd = _inter_rd_dev(ob, pred, qp, bit_depth, mvb)
    aff = zero
    cp0 = jnp.zeros((n, 3, 2), jnp.int32)
    cp1 = jnp.zeros((n, 3, 2), jnp.int32)
    if affine_res:
        if len(affine_res) == 2:
            adir = jnp.where(affine_res[1][0] < affine_res[0][0], 2, 1)
            apred = jnp.where((adir == 2)[:, None, None],
                              affine_res[1][2], affine_res[0][2])
            acp1 = affine_res[1][1]
        else:
            adir = jnp.ones(n, jnp.int32)
            apred = affine_res[0][2]
            acp1 = jnp.zeros((n, 3, 2), jnp.int32)
        acp0 = affine_res[0][1]
        # rate proxy: seed MV costs like the translational MVD (mvb) +
        # affine flag/type/idx bins + the corner-delta MVDs (reference
        # signals CPMV MVDs vs affine AMVP predictors, not absolutes)
        dcp = jnp.abs(acp0[:, 1] - acp0[:, 0]).astype(jnp.float32)
        acpb = (mvb + 6.0 + jnp.log2(1.0 + dcp[:, 0])
                + jnp.log2(1.0 + dcp[:, 1]))
        ard = _inter_rd_dev(ob, apred, qp, bit_depth, acpb)
        upd = ard < rd
        aff = jnp.where(upd, 4, 0)
        rd = jnp.where(upd, ard, rd)
        dirs = jnp.where(upd, adir, dirs)
        cp0, cp1 = acp0, acp1
    out = [rd, dirs.astype(jnp.float32), l0["mvx"].astype(jnp.float32),
           l0["mvy"].astype(jnp.float32), l0["ref"].astype(jnp.float32),
           l1["mvx"].astype(jnp.float32), l1["mvy"].astype(jnp.float32),
           l1["ref"].astype(jnp.float32), aff.astype(jnp.float32),
           cp0.reshape(n, -1).astype(jnp.float32).reshape(-1),
           cp1.reshape(n, -1).astype(jnp.float32).reshape(-1)]
    return jnp.concatenate([o.reshape(-1) for o in out])


@partial(jax.jit, static_argnames=("size", "bit_depth", "w", "h", "n_l0",
                                   "n_l1", "is_b", "affine", "children"))
def _me_v2_program(y, refpad, coarse, qp, size: int, bit_depth: int,
                   w: int, h: int, n_l0: int, n_l1: int, is_b: bool,
                   affine: bool, children: bool):
    """One device program per size class over every (list, ref): window
    fetch → int refine → qpel refine → bi/affine/RD → packed fields
    (vvc.enc.me window engine; VERDICT r4 task 1).

    refpad [R, h+2P, w+2P] edge-padded refs (l0 then l1); coarse
    [R, nc_y, nc_x, 2] full-pel (mvy, mvx) grid for this size (the
    16-grid when children=True).  children=True additionally evaluates
    the four 8×8 sub-blocks of every 16×16 block on static sub-slices of
    the parent windows; returns (packed_parent, packed_child|None)."""
    s = size
    if children:
        ny8, nx8 = h // 8, w // 8
        nye, nxe = (ny8 + 1) // 2, (nx8 + 1) // 2
    else:
        nye, nxe = h // s, w // s
    n = nye * nxe
    yp = y
    if nye * s > h or nxe * s > w:
        yp = jnp.pad(y, ((0, max(0, nye * s - h)),
                         (0, max(0, nxe * s - w))), mode="edge")
    blocks = (yp[:nye * s, :nxe * s].reshape(nye, s, nxe, s)
              .transpose(0, 2, 1, 3).reshape(-1, s, s))
    ob = blocks.astype(jnp.int32)
    xs = (jnp.tile(jnp.arange(nxe), nye) * s).astype(jnp.int32)
    ys = (jnp.repeat(jnp.arange(nye), nxe) * s).astype(jnp.int32)
    lam = 0.57 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0)
    lam_m = jnp.sqrt(lam)

    nc_y, nc_x = coarse.shape[1], coarse.shape[2]
    giy = jnp.minimum(jnp.repeat(jnp.arange(nye), nxe), nc_y - 1)
    gix = jnp.minimum(jnp.tile(jnp.arange(nxe), nye), nc_x - 1)

    n_refs = (n_l0, n_l1 if is_b else 0)
    per_list = [None, None]
    ref0_res = [None, None]
    child_list = [None, None]
    for li in (0, 1):
        best = cbest = None
        for ridx in range(n_refs[li]):
            st = ridx if li == 0 else n_l0 + ridx
            cy = coarse[st, giy, gix, 0]
            cx = coarse[st, giy, gix, 1]
            cy, cx, sy, sx = me_mod._win_centers(cy, cx, ys, xs, h, w, s)
            win = me_mod._gather_windows(refpad[st], sy, sx,
                                         s + 2 * me_mod.WIN_M)
            res = me_mod._eval_from_win(win, ob, cy, cx, lam_m, s,
                                        bit_depth)
            if ridx == 0:
                ref0_res[li] = res
            ent = dict(mvy=res["mvy"], mvx=res["mvx"], cost=res["cost"],
                       pred=res["pred"], ref=jnp.full(n, ridx, jnp.int32))
            best = ent if best is None else _run_min(best, ent)
            if children:
                subs = ((0, 0), (0, 8), (8, 0), (8, 8))
                wsc = 8 + 2 * me_mod.WIN_M
                winc = jnp.stack([win[:, oy:oy + wsc, ox:ox + wsc]
                                  for oy, ox in subs], 1) \
                    .reshape(-1, wsc, wsc)
                obc = (yp[:nye * 16, :nxe * 16]
                       .reshape(nye, 2, 8, nxe, 2, 8)
                       .transpose(0, 3, 1, 4, 2, 5)
                       .reshape(-1, 8, 8).astype(jnp.int32))
                cres = me_mod._eval_from_win(
                    winc, obc, jnp.repeat(cy, 4), jnp.repeat(cx, 4),
                    lam_m, 8, bit_depth)
                cent = dict(mvy=cres["mvy"], mvx=cres["mvx"],
                            cost=cres["cost"], pred=cres["pred"],
                            ref=jnp.full(4 * n, ridx, jnp.int32))
                cbest = cent if cbest is None else _run_min(cbest, cent)
        per_list[li] = best
        child_list[li] = cbest

    aff_res = None
    if affine and s in me_mod.AFFINE_ME_SIZES:
        aff_res = []
        for li in (0, 1):
            if n_refs[li] == 0:
                continue
            r0 = ref0_res[li]
            ac, da, db, apred = me_mod.affine_search_win(
                r0["w2"], ob, r0["mvy"], r0["mvx"], r0["iy"], r0["ix"],
                lam_m, s, bit_depth)
            # cpmv (x, y) for the CENTER-rooted candidate field
            # dq(x,y) = (a(x−s/2) − b(y−s/2), b(x−s/2) + a(y−s/2)) with
            # a·s = da, b·s = db (qpel); cp1 − cp0 = (da, db) so the
            # normative 4-param derivation recovers the searched field
            sx_, sy_ = r0["mvx"], r0["mvy"]
            cp = jnp.stack([
                jnp.stack([sx_ + (db - da) // 2, sy_ - (da + db) // 2], -1),
                jnp.stack([sx_ + (da + db) // 2, sy_ + (db - da) // 2], -1),
                jnp.stack([sx_ - (da + db) // 2, sy_ + (da - db) // 2], -1)],
                axis=1)
            aff_res.append((ac, cp.astype(jnp.int32), apred))

    # parent grids: slice synthetic rows/cols before the finish pass
    nyv, nxv = h // s, w // s
    if children and (nye != nyv or nxe != nxv):
        def _sl(f):
            tail = f.shape[1:]
            return (f.reshape((nye, nxe) + tail)[:nyv, :nxv]
                    .reshape((-1,) + tail))
        per_list = [None if d is None else {k: _sl(v) for k, v in d.items()}
                    for d in per_list]
        if aff_res is not None:
            aff_res = [(_sl(c), _sl(cp), _sl(p)) for c, cp, p in aff_res]
        ob_f = (y[:nyv * s, :nxv * s].reshape(nyv, s, nxv, s)
                .transpose(0, 2, 1, 3).reshape(-1, s, s).astype(jnp.int32))
    else:
        ob_f = ob
    packed = _finish(per_list[0], per_list[1], ob_f, qp, bit_depth, lam_m,
                     nyv, nxv, is_b, aff_res)
    packed_c = None
    if children:
        cl = [None if d is None else
              {k: _reorder_children(v, nye, nxe, ny8, nx8)
               for k, v in d.items()} for d in child_list]
        ob8 = (y[:ny8 * 8, :nx8 * 8].reshape(ny8, 8, nx8, 8)
               .transpose(0, 2, 1, 3).reshape(-1, 8, 8).astype(jnp.int32))
        packed_c = _finish(cl[0], cl[1], ob8, qp, bit_depth, lam_m,
                           ny8, nx8, is_b, None)
    return packed, packed_c


def _run_min(best, ent):
    m = ent["cost"] < best["cost"]
    mm = m[:, None, None]
    return dict(mvy=jnp.where(m, ent["mvy"], best["mvy"]),
                mvx=jnp.where(m, ent["mvx"], best["mvx"]),
                cost=jnp.where(m, ent["cost"], best["cost"]),
                pred=jnp.where(mm, ent["pred"], best["pred"]),
                ref=jnp.where(m, ent["ref"], best["ref"]))


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

    ME is window-based (vvc.enc.me): one coarse full-search on cached
    4×-downsampled refs gives per-size centers for the whole frame; each
    size class then runs ONE device program (window fetch → static-slice
    int refine → in-window qpel DCTIF refine → bi/affine/RD).  8×8 rides
    its 16×16 parent's program.  All device work is queued async; one
    packed transfer per size brings the frame's decisions back.
    """
    h, w = y_plane.shape
    sizes = _candidate_sizes(ctu_size, min_cu)

    # intra costs for all sizes (one dispatch — shared with the AI path)
    from vvc.enc.rdo import pack_planes, unpack_results
    packed_intra = eval_all_sizes(jax.device_put(pack_planes(y_plane)),
                                  tuple(sizes), jnp.int32(qp), bit_depth,
                                  w, h)

    # edge-padded + ds4 reference planes, cached per PICTURE across
    # frames (vvc.enc.me.pic_dev); stack layout: l0 refs then l1 refs
    n_l0, n_l1 = len(refs_l0), len(refs_l1) if is_b else 0
    pads, dss = [], []
    for ref in list(refs_l0) + (list(refs_l1) if is_b else []):
        pp, ds = me_mod.pic_dev(ref)
        pads.append(pp)
        dss.append(ds)
    refpad = jnp.stack(pads)
    y_dev = jax.device_put(np.ascontiguousarray(y_plane).astype(np.int32))
    _, yds = me_mod._prep_ref(y_dev, h, w)
    h4, w4 = (h + 3) // 4, (w + 3) // 4
    coarse = me_mod._coarse_program(yds, jnp.stack(dss), h4, w4,
                                    me_mod.COARSE_R)
    qpj = jnp.int32(qp)

    me_sizes = sorted([s for s in sizes if ME_SIZES_MIN <= s <= 64],
                      reverse=True)
    packed_by_size = {}
    for s in me_sizes:
        if s == 8 or h < s or w < s:
            continue                       # 8 rides the 16-program
        children = (s == 16 and 8 in me_sizes)
        pk, pkc = _me_v2_program(y_dev, refpad, coarse[s], qpj, s,
                                 bit_depth, w, h, n_l0, n_l1, is_b,
                                 affine, children)
        packed_by_size[s] = pk
        if children:
            packed_by_size[8] = pkc

    # single sync point: pull every size's packed vector (queued async)
    intra_res = unpack_results(np.asarray(packed_intra), sizes, w, h)
    inter = {}
    for s in me_sizes:
        if s not in packed_by_size:
            continue
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
