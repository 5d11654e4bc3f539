"""Batched intra RDO: enumerate–mask–reduce partition/mode search.

TPU-native analog of the reference's recursive CU search
(`/root/reference/source/Lib/EncoderLib/EncCu.cpp` → xCompressCU;
IntraSearch.cpp → estIntraPredLumaQT with its SATD prescreen + RD
shortlist; EncModeCtrl.cpp heuristics).  Per SURVEY.md §7.0 tenet 2 the
depth-first recursion is replaced by:

  1. For every QT candidate size (8..CTU), evaluate ALL blocks of the
     frame at that size in ONE device dispatch: the luma plane is uploaded
     once; block tiling, reference-line assembly (clamp-gather), 67-mode
     prediction (vvc.kernels.intra), SATD prescreen (vvc.kernels.satd) and
     top-K full RD (transform → quant → dequant → inverse → SSE + rate
     estimate) all run on device.  Only [ny,nx] cost/mode grids come back
     — host↔device traffic is O(pixels), not O(blocks·modes).
  2. A bottom-up dynamic program over the size pyramid picks split/leaf
     per node (child-sum + split-bit cost vs leaf cost) — the masked
     segmented arg-min that replaces xCheckModeSplit recursion.

RDO references use *original* neighbours (classic fast-search
approximation; the final reconstruction pass re-predicts from true
reconstructed samples).  Distortion SSE + rate estimates are heuristic
(SURVEY.md §7.0 tenet 5: floats allowed outside normative paths).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vvc.cabac.rates import level_bits_jnp
from vvc.kernels.intra import predict_all_modes_batch
from vvc.kernels.satd import satd_batch
from vvc.kernels.transform import fwd_transform_batch, inv_transform_batch
from vvc.kernels.quant import quant_batch, dequant_batch
from vvc.model.frame import Leaf
from vvc.utils.trace import active as _trace
from vvc.model.partition import (SPLIT_NONE, SPLIT_QT,
                                 SPLIT_BT_H, SPLIT_BT_V)

RD_SHORTLIST = 3  # full-RD candidates after SATD prescreen (EncModeCtrl analog)

# approximate mode signalling cost in bits (MPM statistics analog)
_MODE_BITS = np.full((67,), 7.0, dtype=np.float32)
_MODE_BITS[0] = 2.5   # planar (MPM[0])
_MODE_BITS[1] = 4.0   # DC
_MODE_BITS[18] = 5.0
_MODE_BITS[50] = 5.0


def rd_lambda(qp: int) -> float:
    """λ for intra RD (reference: EncSlice::setUpLambda, SURVEY.md §3.5)."""
    return 0.57 * (2.0 ** ((qp - 12) / 3.0))


def build_ref_lines_device(plane: jax.Array, xs: jax.Array, ys: jax.Array,
                           size: int, bit_depth: int) -> jax.Array:
    """Device-side reference lines from the original plane for N blocks.

    Availability approximated by edge clamping (equivalent to spec
    substitution at frame borders).  plane [H,W] int32 → [N, 4S+3] int32.
    """
    h, w = plane.shape
    s = size
    mid = 1 << (bit_depth - 1)
    k = jnp.arange(2 * s)
    lx = jnp.clip(xs - 1, 0, w - 1)
    lyy = jnp.clip(ys[:, None] + k[None, :], 0, h - 1)
    left = plane[lyy, lx[:, None]]
    ty = jnp.clip(ys - 1, 0, h - 1)
    txx = jnp.clip(xs[:, None] + k[None, :], 0, w - 1)
    top = plane[ty[:, None], txx]
    corner = plane[ty, lx]
    top = jnp.where((ys > 0)[:, None], top,
                    jnp.where((xs > 0)[:, None], left[:, :1], mid))
    corner = jnp.where(ys > 0, corner, jnp.where(xs > 0, left[:, 0], mid))
    left = jnp.where((xs > 0)[:, None], left,
                     jnp.where((ys > 0)[:, None], top[:, :1], mid))
    return jnp.concatenate(
        [left[:, ::-1], corner[:, None], top, top[:, -1:], top[:, -1:]], axis=1)


def build_ref_lines_device_rect(plane: jax.Array, xs: jax.Array,
                                ys: jax.Array, w: int, h: int,
                                bit_depth: int) -> jax.Array:
    """Rect twin of build_ref_lines_device: [N, 2H+2W+3] int32 lines
    (left 2H reversed, corner, top 2W, 2 pads) from the original plane."""
    ph, pw = plane.shape
    mid = 1 << (bit_depth - 1)
    kh = jnp.arange(2 * h)
    kw = jnp.arange(2 * w)
    lx = jnp.clip(xs - 1, 0, pw - 1)
    lyy = jnp.clip(ys[:, None] + kh[None, :], 0, ph - 1)
    left = plane[lyy, lx[:, None]]
    ty = jnp.clip(ys - 1, 0, ph - 1)
    txx = jnp.clip(xs[:, None] + kw[None, :], 0, pw - 1)
    top = plane[ty[:, None], txx]
    corner = plane[ty, lx]
    top = jnp.where((ys > 0)[:, None], top,
                    jnp.where((xs > 0)[:, None], left[:, :1], mid))
    corner = jnp.where(ys > 0, corner, jnp.where(xs > 0, left[:, 0], mid))
    left = jnp.where((xs > 0)[:, None], left,
                     jnp.where((ys > 0)[:, None], top[:, :1], mid))
    return jnp.concatenate(
        [left[:, ::-1], corner[:, None], top, top[:, -1:], top[:, -1:]],
        axis=1)


# approximate mts_idx signalling cost (truncated-unary ctx bins)
_MTS_BITS = (0.5, 2.0, 3.0, 4.0, 4.0)

# approximate MIP signalling cost: mip_flag + TB(K) mode bits
_MIP_BITS = 4.5

# approximate lfnst_idx signalling cost (truncated unary, cMax 2)
_LFNST_BITS = (0.0, 2.0, 3.0)

# approximate ISP signalling cost: isp flag + direction + per-sub cbf bins
_ISP_BITS = 2.5
_ISP_CBF_BITS = 0.8


def eval_isp_dir(plane, xs, ys, w: int, h: int, modes, qp, bit_depth: int,
                 direction: int):
    """RD cost [N] of coding each block with ISP in `direction` using its
    (already decided) intra mode.  Search approximation: every sub-TU is
    predicted from *original* neighbours at its own position — the batched
    analog of IntraSearch's ISP loop (the real recon then runs the exact
    sequential feedback).  Implicit DST7/DCT2 per sub-TU dimension."""
    from vvc.kernels.isp import isp_partitions, isp_tr_types
    from vvc.kernels.intra import (predict_modes_batch,
                                   predict_modes_batch_rect)
    qp = jnp.asarray(qp, dtype=jnp.int32)
    lam = 0.57 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0)
    parts = isp_partitions(w, h, direction)
    n = xs.shape[0]
    cost = jnp.zeros((n,), jnp.float32)
    ph, pw = plane.shape
    for (xo, yo, sw, sh) in parts:
        sxs, sys = xs + xo, ys + yo
        if sw == sh:
            refs = build_ref_lines_device(plane, sxs, sys, sw, bit_depth)
            pred = predict_modes_batch(refs, modes, sw, bit_depth)
        else:
            refs = build_ref_lines_device_rect(plane, sxs, sys, sw, sh,
                                               bit_depth)
            pred = predict_modes_batch_rect(refs, modes, sw, sh, bit_depth)
        oy = sys[:, None, None] + jnp.arange(sh)[None, :, None]
        ox = sxs[:, None, None] + jnp.arange(sw)[None, None, :]
        orig = plane[oy, ox].astype(jnp.int32)
        resi = orig - pred
        th, tv = isp_tr_types(sw, sh)
        coeff = fwd_transform_batch(resi, bit_depth, th, tv)
        lev = quant_batch(coeff, qp, bit_depth, intra=True)
        deq = dequant_batch(lev, qp, bit_depth)
        rec_resi = inv_transform_batch(deq, bit_depth, th, tv)
        d = (rec_resi - resi).astype(jnp.float32)
        sse = jnp.sum(d * d, axis=(1, 2))
        rate = jnp.sum(level_bits_jnp(jnp.abs(lev)), axis=(1, 2))
        cost = cost + sse + lam * (rate + _ISP_CBF_BITS)
    return cost + lam * _ISP_BITS


def eval_blocks(orig: jax.Array, refs: jax.Array, size: int, qp: int,
                bit_depth: int = 8, try_mts: bool = False,
                lossless: bool = False, try_mip: bool = False,
                try_lfnst: bool = False, h: int | None = None):
    """[N,H,W] originals + [N,2H+2W+3] refs →
    (best_cost [N] f32, best_mode [N] i32, best_mts [N] i32,
     best_lfnst [N] i32).

    SATD prescreen over 67 modes (+ K MIP matrix modes when try_mip — mode
    indices 67..67+K-1), then full RD on the shortlist — jointly over MTS
    transform candidates when try_mts (reference:
    IntraSearch::estIntraPredLumaQT's MTS loop + MIP candidates).  Pure
    (trace-safe).  h != size → rect MTT shape (wide-angle predictor;
    MIP/LFNST are square-only and must be off).
    """
    from vvc.kernels.transform import MTS_TR

    w = size
    h = w if h is None else h
    qp = jnp.asarray(qp, dtype=jnp.int32)
    lam = 0.57 * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0)
    sqrt_lam = jnp.sqrt(lam)
    n = orig.shape[0]
    s = w  # legacy alias (square paths)
    if w == h:
        preds = predict_all_modes_batch(refs, w, bit_depth)     # [N,67,S,S]
    else:
        assert not try_mip and not try_lfnst
        from vvc.kernels.intra import predict_all_modes_batch_rect
        preds = predict_all_modes_batch_rect(refs, w, h, bit_depth)
    mode_bits_np = _MODE_BITS
    if try_mip:
        from vvc.kernels.mip import mip_predict_all_batch, K_MIP_MODES
        mip_preds = mip_predict_all_batch(refs, size, bit_depth)
        preds = jnp.concatenate([preds, mip_preds], axis=1)  # [N,67+K,S,S]
        mode_bits_np = np.concatenate(
            [_MODE_BITS, np.full((K_MIP_MODES,), _MIP_BITS, np.float32)])
    n_modes = preds.shape[1]
    o = orig[:, None]                                           # [N,1,H,W]
    satd = satd_batch(
        preds.reshape(-1, h, w),
        jnp.broadcast_to(o, preds.shape).reshape(-1, h, w)).reshape(n, n_modes)
    mode_bits = jnp.asarray(mode_bits_np)
    pre_cost = satd.astype(jnp.float32) + sqrt_lam * mode_bits[None, :]
    if lossless:
        # transquant bypass: SATD is the rate proxy; no RD stage
        best_mode = jnp.argmin(pre_cost, axis=1).astype(jnp.int32)
        best_cost = jnp.min(pre_cost, axis=1)
        return (best_cost, best_mode, jnp.zeros_like(best_mode),
                jnp.zeros_like(best_mode))
    _, short = jax.lax.top_k(-pre_cost, RD_SHORTLIST)           # [N,K]

    def rd_pass(resi_, pred_, th, tv, extra_bits):
        coeff = fwd_transform_batch(resi_, bit_depth, th, tv)
        lev = quant_batch(coeff, qp, bit_depth, intra=True)
        deq = dequant_batch(lev, qp, bit_depth)
        rec_resi = inv_transform_batch(deq, bit_depth, th, tv)
        rec = jnp.clip(pred_ + rec_resi, 0, (1 << bit_depth) - 1)
        d = (rec - pred_ - resi_).astype(jnp.float32)
        sse = jnp.sum(d * d, axis=(1, 2))
        # measured level-rate model (vvc.cabac.rates — estFracBits analog)
        rate = jnp.sum(level_bits_jnp(jnp.abs(lev)), axis=(1, 2))
        return sse + lam * (rate + extra_bits)

    # stage A: DCT2 RD over the SATD shortlist → best mode
    cand = jnp.take_along_axis(preds, short[:, :, None, None], axis=1)  # [N,K,H,W]
    resi = (orig[:, None] - cand).reshape(-1, h, w)
    pred_flat = cand.reshape(-1, h, w)
    cost_a = rd_pass(resi, pred_flat, MTS_TR[0][0], MTS_TR[0][1],
                     mode_bits[short].reshape(-1) + _MTS_BITS[0]
                     ).reshape(n, RD_SHORTLIST)
    best_k = jnp.argmin(cost_a, axis=1)
    best_cost = jnp.take_along_axis(cost_a, best_k[:, None], axis=1)[:, 0]
    best_mode = jnp.take_along_axis(short, best_k[:, None], axis=1)[:, 0]
    best_mts = jnp.zeros_like(best_mode)
    best_lfnst = jnp.zeros_like(best_mode)
    bp = jnp.take_along_axis(cand, best_k[:, None, None, None],
                             axis=1)[:, 0]                          # [N,S,S]
    br = orig - bp
    bbits = mode_bits[best_mode]
    if try_mts:
        # stage B: MTS candidates on the winning mode only (the reference
        # also restricts the MTS loop to surviving candidates)
        for mi in range(1, len(MTS_TR)):
            th, tv = MTS_TR[mi]
            c_mi = rd_pass(br, bp, th, tv, bbits + _MTS_BITS[mi])
            better = c_mi < best_cost
            best_cost = jnp.where(better, c_mi, best_cost)
            best_mts = jnp.where(better, mi, best_mts)
    if try_lfnst:
        # stage C: LFNST kernels on the winning mode's DCT2 path (competes
        # with the stage-B MTS winner; reference IntraSearch's lfnst loop)
        from vvc.kernels.lfnst import fwd_lfnst_batch, inv_lfnst_batch
        th0, tv0 = MTS_TR[0]
        coeff0 = fwd_transform_batch(br, bit_depth, th0, tv0)
        maxv = (1 << bit_depth) - 1
        for li in (1, 2):
            lev = quant_batch(fwd_lfnst_batch(coeff0, best_mode, li),
                              qp, bit_depth, intra=True)
            deq = dequant_batch(lev, qp, bit_depth)
            rec_resi = inv_transform_batch(
                inv_lfnst_batch(deq, best_mode, li), bit_depth, th0, tv0)
            rec = jnp.clip(bp + rec_resi, 0, maxv)
            d = (rec - bp - br).astype(jnp.float32)
            sse = jnp.sum(d * d, axis=(1, 2))
            rate = jnp.sum(level_bits_jnp(jnp.abs(lev)), axis=(1, 2))
            c_li = sse + lam * (rate + bbits + _MTS_BITS[0] + _LFNST_BITS[li])
            better = c_li < best_cost
            best_cost = jnp.where(better, c_li, best_cost)
            best_mts = jnp.where(better, 0, best_mts)
            best_lfnst = jnp.where(better, li, best_lfnst)
    return (best_cost, best_mode, best_mts.astype(jnp.int32),
            best_lfnst.astype(jnp.int32))


def eval_chroma_modes(cb, cr, ds, xs, ys, size: int, best_mode, bit_depth):
    """Device 4-way chroma decision (DM / LM / LM_L / LM_T) for N blocks —
    SSE on original samples, mirroring the host _decide_chroma_modes
    (reference: IntraSearch::estIntraPredChromaQT).  Returns [N] i32."""
    from vvc.kernels.cclm import derive_models_batch_jnp, CCLM_SHIFT
    cs = size >> 1
    cxs, cys = xs >> 1, ys >> 1
    dm = jnp.where(best_mode >= 67, 0, best_mode)
    oy = jnp.arange(cs)
    iy = cys[:, None, None] + oy[None, :, None]
    ix = cxs[:, None, None] + oy[None, None, :]
    ds_blk = ds[iy, ix].astype(jnp.int32)
    maxv = (1 << bit_depth) - 1
    n = xs.shape[0]
    cost = jnp.zeros((n, 4), dtype=jnp.float32)
    from vvc.kernels.intra import predict_modes_batch
    for plane in (cb, cr):
        refs = build_ref_lines_device(plane, cxs, cys, cs, bit_depth)
        pdm = predict_modes_batch(refs, dm, cs, bit_depth)
        obs = plane[iy, ix].astype(jnp.int32)
        d = (obs - pdm).astype(jnp.float32)
        cost = cost.at[:, 0].add(jnp.sum(d * d, axis=(1, 2)))
        for v in (1, 2, 3):
            alpha, beta = derive_models_batch_jnp(ds, plane, cxs, cys, cs,
                                                  bit_depth, v)
            plm = jnp.clip((alpha[:, None, None] * ds_blk >> CCLM_SHIFT)
                           + beta[:, None, None], 0, maxv)
            d = (obs - plm).astype(jnp.float32)
            cost = cost.at[:, v].add(jnp.sum(d * d, axis=(1, 2)))
    return jnp.argmin(cost, axis=1).astype(jnp.int32)


def eval_size_plane(plane: jax.Array, size: int, qp: int, bit_depth: int,
                    ny: int, nx: int, mts_enabled: bool = True,
                    lossless: bool = False, lfnst_enabled: bool = True,
                    chroma=None, h: int | None = None,
                    isp_enabled: bool = False):
    """Whole-frame single-shape evaluation: plane [H,W] int32 →
    (cost [ny,nx] f32, mode [ny,nx] i32, mts [ny,nx] i32,
     lfnst [ny,nx] i32, chroma_mode [ny,nx] i32, isp [ny,nx] i32).
    Trace-safe.
    chroma: optional (cb, cr, ds) planes for the device chroma decision.
    h != size → rect MTT shape (MIP/LFNST/CCLM gated off)."""
    s = size
    bh = s if h is None else h
    blocks = (plane[:ny * bh, :nx * s]
              .reshape(ny, bh, nx, s).transpose(0, 2, 1, 3).reshape(-1, bh, s))
    ys = (jnp.repeat(jnp.arange(ny), nx) * bh)
    xs = (jnp.tile(jnp.arange(nx), ny) * s)
    square = bh == s
    if square:
        refs = build_ref_lines_device(plane, xs, ys, s, bit_depth)
    else:
        refs = build_ref_lines_device_rect(plane, xs, ys, s, bh, bit_depth)
    try_mts = ((not lossless) and mts_enabled
               and 8 <= s <= 32 and 8 <= bh <= 32)       # spec limit 32
    from vvc.kernels.mip import mip_allowed
    from vvc.kernels.lfnst import lfnst_allowed
    try_mip = (not lossless) and square and mip_allowed(s)
    try_lfnst = (not lossless) and square and lfnst_enabled and lfnst_allowed(s)
    cost, mode, mts, lfnst = eval_blocks(blocks, refs, s, qp, bit_depth,
                                         try_mts, lossless, try_mip,
                                         try_lfnst, h=bh)
    isp = jnp.zeros_like(mode)
    # ISP stage on the winning mode (reference: estIntraPredLumaQT's ISP
    # loop over surviving candidates); sizes bounded to keep the compiled
    # program small — 8..32 is where ISP wins in practice
    if (isp_enabled and not lossless and 8 <= s <= 32 and 8 <= bh <= 32):
        qpj = jnp.asarray(qp, dtype=jnp.int32)
        lam = 0.57 * jnp.exp2((qpj.astype(jnp.float32) - 12.0) / 3.0)
        mode_ok = mode < 67                       # no ISP with MIP
        m = jnp.where(mode_ok, mode, 0)
        mbits = jnp.asarray(_MODE_BITS)[m]
        for d in (1, 2):
            c_isp = (eval_isp_dir(plane, xs, ys, s, bh, m, qpj, bit_depth, d)
                     + lam * mbits)
            better = mode_ok & (c_isp < cost)
            cost = jnp.where(better, c_isp, cost)
            isp = jnp.where(better, d, isp)
        # implicit transforms with ISP: clear mts/lfnst where ISP won
        mts = jnp.where(isp > 0, 0, mts)
        lfnst = jnp.where(isp > 0, 0, lfnst)
    if chroma is not None and square:
        cb, cr, ds = chroma
        cmode = eval_chroma_modes(cb, cr, ds, xs, ys, s, mode, bit_depth)
    else:
        cmode = jnp.zeros_like(mode)
    return (cost.reshape(ny, nx), mode.reshape(ny, nx), mts.reshape(ny, nx),
            lfnst.reshape(ny, nx), cmode.reshape(ny, nx),
            isp.reshape(ny, nx))


def _as_shapes(sizes):
    """Normalize a candidate list: ints (squares) or (w, h) pairs."""
    return tuple((s, s) if isinstance(s, int) else tuple(s) for s in sizes)


def _tt_descriptors(sizes):
    """TT middle-child cost planes needed beyond the aligned shape grids.

    TT outer children land on the aligned (w, h/4) grids; only the middle
    child (w, h/2) sits at the +h/4 half-offset, so each TT-capable parent
    shape adds ONE offset plane: ('TH', w) = (w,16) blocks at y ≡ 8 mod 32
    (stride 32), ('TV', h) mirrored.  Derived deterministically from the
    shape list so pack/unpack order always agrees."""
    from vvc.model.partition import allowed_splits
    shapes = _as_shapes(sizes)
    out = []
    for (bw, bh) in shapes:
        if allowed_splits(bw, bh, False, True)[3]:       # can_tt_h
            out.append(("TH", bw))
        if allowed_splits(bw, bh, False, True)[4]:       # can_tt_v
            out.append(("TV", bh))
    return tuple(out)


def eval_mid_plane(plane, desc, qp, bit_depth: int, lossless: bool,
                   lfnst_enabled: bool):
    """Leaf-cost plane for TT middle children: desc ('TH', w) → (w, 16)
    blocks at (x = k·w, y = 8 + 32·r); ('TV', h) mirrored.  Returns the
    same 6-tuple as eval_size_plane (chroma decision off — TT mid leaves
    code chroma as DM)."""
    H, W = plane.shape
    kind, s = desc
    if kind == "TH":
        bw, bh = s, 16
        ny, nx = H // 32, W // bw
        ys = jnp.repeat(jnp.arange(ny) * 32 + 8, nx)
        xs = jnp.tile(jnp.arange(nx) * bw, ny)
    else:
        bw, bh = 16, s
        ny, nx = H // s, W // 32
        ys = jnp.repeat(jnp.arange(ny) * s, nx)
        xs = jnp.tile(jnp.arange(nx) * 32 + 8, ny)
    oy = ys[:, None, None] + jnp.arange(bh)[None, :, None]
    ox = xs[:, None, None] + jnp.arange(bw)[None, None, :]
    blocks = plane[oy, ox].astype(jnp.int32)
    square = bw == bh
    if square:
        refs = build_ref_lines_device(plane, xs, ys, bw, bit_depth)
    else:
        refs = build_ref_lines_device_rect(plane, xs, ys, bw, bh, bit_depth)
    from vvc.kernels.mip import mip_allowed
    from vvc.kernels.lfnst import lfnst_allowed
    try_mts = (not lossless) and 8 <= bw <= 32 and 8 <= bh <= 32
    try_mip = (not lossless) and square and mip_allowed(bw)
    try_lfnst = ((not lossless) and square and lfnst_enabled
                 and lfnst_allowed(bw))
    cost, mode, mts, lfnst = eval_blocks(blocks, refs, bw, qp, bit_depth,
                                         try_mts, lossless, try_mip,
                                         try_lfnst, h=bh)
    z = jnp.zeros_like(mode)
    return (cost.reshape(ny, nx), mode.reshape(ny, nx), mts.reshape(ny, nx),
            lfnst.reshape(ny, nx), z.reshape(ny, nx), z.reshape(ny, nx))


def _eval_all_sizes_impl(plane, sizes, qp, bit_depth, w, h, lossless=False,
                         lfnst=True, cb=None, cr=None, isp=False):
    chroma = None
    if cb is not None:
        from vvc.kernels.cclm import luma_ds_plane_jnp
        chroma = (cb, cr, luma_ds_plane_jnp(plane))
    out = {}
    for (bw, bh) in _as_shapes(sizes):
        ny, nx = h // bh, w // bw
        if ny and nx:
            out[(bw, bh)] = eval_size_plane(plane, bw, qp, bit_depth, ny, nx,
                                            lossless=lossless,
                                            lfnst_enabled=lfnst,
                                            chroma=chroma, h=bh,
                                            isp_enabled=isp)
    for desc in _tt_descriptors(sizes):
        kind, s = desc
        ny = (h // 32, h // s)[kind == "TV"]
        nx = (w // s, w // 32)[kind == "TV"]
        if ny and nx:
            out[desc] = eval_mid_plane(plane, desc, qp, bit_depth, lossless,
                                       lfnst)
    return out


def _pack_results(out, sizes):
    """Flatten the per-shape result dict into ONE int32 vector (cost planes
    bitcast) — device→host transfers over the TPU tunnel cost ~6–30 ms
    EACH regardless of size, so everything rides one transfer."""
    parts = []
    for sh in _as_shapes(sizes) + _tt_descriptors(sizes):
        if sh not in out:
            continue
        c, m, t, l, cm, isp = out[sh]
        parts += [jax.lax.bitcast_convert_type(c, jnp.int32).ravel(),
                  m.ravel(), t.ravel(), l.ravel(), cm.ravel(), isp.ravel()]
    return jnp.concatenate(parts)


def unpack_results(vec: np.ndarray, sizes, w: int, h: int):
    """Host-side inverse of _pack_results → {(bw, bh): (cost, mode, mts,
    lfnst, chroma_mode, isp)} numpy arrays."""
    out = {}
    off = 0
    keys = []
    for (bw, bh) in _as_shapes(sizes):
        keys.append(((bw, bh), h // bh, w // bw))
    for desc in _tt_descriptors(sizes):
        kind, s = desc
        keys.append((desc, (h // 32, h // s)[kind == "TV"],
                     (w // s, w // 32)[kind == "TV"]))
    for key, ny, nx in keys:
        if not (ny and nx):
            continue
        n = ny * nx
        c = vec[off:off + n].view(np.float32).reshape(ny, nx); off += n
        m = vec[off:off + n].reshape(ny, nx); off += n
        t = vec[off:off + n].reshape(ny, nx); off += n
        l = vec[off:off + n].reshape(ny, nx); off += n
        cm = vec[off:off + n].reshape(ny, nx); off += n
        isp = vec[off:off + n].reshape(ny, nx); off += n
        out[key] = (c, m, t, l, cm, isp)
    return out


def _split_planes(vec, w, h, with_chroma, f=None):
    """Unpack the single host→device input vector back into planes."""
    shape_y = (h, w) if f is None else (f, h, w)
    ny = int(np.prod(shape_y))
    y = vec[:ny].reshape(shape_y)
    if not with_chroma:
        return y, None, None
    shape_c = (h // 2, w // 2) if f is None else (f, h // 2, w // 2)
    nc = int(np.prod(shape_c))
    cb = vec[ny:ny + nc].reshape(shape_c)
    cr = vec[ny + nc:ny + 2 * nc].reshape(shape_c)
    return y, cb, cr


def pack_planes(y, cb=None, cr=None):
    """Host-side input packing (one device_put instead of three)."""
    parts = [np.asarray(y, dtype=np.int32).ravel()]
    if cb is not None:
        parts += [np.asarray(cb, dtype=np.int32).ravel(),
                  np.asarray(cr, dtype=np.int32).ravel()]
    return np.concatenate(parts)


@partial(jax.jit, static_argnames=("sizes", "bit_depth", "w", "h",
                                   "lossless", "lfnst", "with_chroma",
                                   "isp"))
def eval_all_sizes(planes_vec: jax.Array, sizes: tuple, qp, bit_depth: int,
                   w: int, h: int, lossless: bool = False,
                   lfnst: bool = True, with_chroma: bool = False,
                   isp: bool = False):
    """All candidate sizes in ONE dispatch and ONE packed result transfer
    (the RDO search is transfer-latency-bound on small pictures).
    planes_vec: pack_planes(y[, cb, cr]).  Unpack with unpack_results."""
    y, cb, cr = _split_planes(planes_vec, w, h, with_chroma)
    out = _eval_all_sizes_impl(y, sizes, qp, bit_depth, w, h, lossless,
                               lfnst, cb, cr, isp)
    return _pack_results(out, sizes)


@partial(jax.jit, static_argnames=("sizes", "bit_depth", "w", "h",
                                   "lossless", "lfnst", "with_chroma", "f",
                                   "isp"))
def eval_all_sizes_frames(planes_vec: jax.Array, sizes: tuple, qp,
                          bit_depth: int, w: int, h: int, f: int,
                          lossless: bool = False, lfnst: bool = True,
                          with_chroma: bool = False, isp: bool = False):
    """[F]-batched variant: one dispatch + one packed transfer for the
    whole GOP (All-Intra frames are independent, SURVEY.md §2.7 P-5).
    Result: [F, per-frame packed length] int32."""
    y, cb, cr = _split_planes(planes_vec, w, h, with_chroma, f)
    if with_chroma:
        return jax.vmap(
            lambda p, b, r: _pack_results(
                _eval_all_sizes_impl(p, sizes, qp, bit_depth, w, h,
                                     lossless, lfnst, b, r, isp), sizes)
        )(y, cb, cr)
    return jax.vmap(
        lambda p: _pack_results(
            _eval_all_sizes_impl(p, sizes, qp, bit_depth, w, h,
                                 lossless, lfnst, isp=isp), sizes))(y)


# Split-signalling rates from the measured per-context table
# (vvc/cabac/rates.py SYNTAX_BITS, tools/measure_syntax_rates.py — the
# estFracBits analog; replaces the r2 hand-waved flat constants).
from vvc.cabac.rates import SYNTAX_BITS as _SB

# test hook: disable TT candidates in the DP (decode support unaffected)
# for TT-on-vs-off A/B quality checks
TT_IN_SEARCH = True

# conservative margin (bits) on TT candidates: the DP's luma-only cost
# cannot see that TT mid leaves forfeit the 4-way chroma decision (rect
# CCLM not yet supported), ISP, and further splitting.  MEASURED by
# tools/calibrate_tt_margin.py (TT-on-vs-off BD-rate sweep on
# TT-friendly + neutral content); last run: margin 0/2 -> +0.06%
# overuse on tt-friendly, 4 -> -0.03% / -1.56% — re-run the tool after
# any quality-touching change (the r3 regression was a stale margin
# after a deblocking tc bug shifted recon quality).
TT_MARGIN_BITS = 4.0

SPLIT_LEAF_BITS = _SB["SPLIT_CU_FLAG"][0]  # leaf codes split_cu_flag = 0
SPLIT_BITS = _SB["SPLIT_CU_FLAG"][1]       # any split codes flag = 1
QT_FLAG_BITS = _SB["SPLIT_QT_FLAG"][1]     # QT chosen while MTT competes
MTT_FLAG_BITS = _SB["SPLIT_QT_FLAG"][0]    # MTT chosen while QT competes
MTT_DIR_BITS = (_SB["MTT_SPLIT_VERT"][0] + _SB["MTT_SPLIT_VERT"][1]) / 2
BT_FLAG_BITS = _SB["MTT_SPLIT_BINARY"][1]  # binary flag = 1 (BT)
TT_FLAG_BITS = _SB["MTT_SPLIT_BINARY"][0]  # binary flag = 0 (TT)


def _candidate_sizes(ctu_size: int, min_cu: int):
    """Leaf/TB candidate sizes: capped at 64 (MaxCUSize/MaxTbSize 64 —
    CTU 128 nodes split implicitly before coding; reference: CommonDef
    MAX_CU_SIZE vs MAX_TB_SIZEY)."""
    sizes = []
    s = min_cu
    while s <= min(ctu_size, 64):
        sizes.append(s)
        s <<= 1
    return sizes


def _candidate_shapes(ctu_size: int, min_cu: int, mtt: bool):
    if mtt:
        from vvc.model.partition import shape_lattice
        return shape_lattice(min(ctu_size, 64), True)
    return tuple((s, s) for s in _candidate_sizes(ctu_size, min_cu))


def _shape_groups(shapes):
    """Partition the candidate shape list into per-dispatch groups.

    One mega-program minimizes device→host transfers, but on the real TPU
    the 14-shape MTT program's compile/runtime footprint crashes the
    remote worker (r3 finding: every shape passes alone, the combined
    program kills the worker).  Groups of a few shapes compile as
    independent (persistently cacheable) programs, queued back-to-back so
    dispatch stays async.  VVC_RDO_SHAPE_GROUPS=<n> sets shapes/program;
    0 = single mega program (the CPU-backend default)."""
    import os
    g = os.environ.get("VVC_RDO_SHAPE_GROUPS")
    if g is None:
        g = 0 if jax.default_backend() == "cpu" else 4
    g = int(g)
    if g <= 0 or len(shapes) <= g:
        return [tuple(shapes)]
    return [tuple(shapes[i:i + g]) for i in range(0, len(shapes), g)]


def rdo_partition(y_plane: np.ndarray, qp: int, bit_depth: int = 8,
                  ctu_size: int = 64, min_cu: int = 8, lossless: bool = False,
                  lfnst: bool = True, chroma_planes=None, mtt: bool = False,
                  isp: bool = False):
    """Full-frame partition + mode decision.

    chroma_planes: optional (cb, cr) — enables the on-device 4-way chroma
    decision (DM/LM/LM_L/LM_T), stored on each leaf.
    Returns (split_map, leaf_map, leaves_zorder) consumed by the syntax
    writer and the reconstruction pass.
    """
    return rdo_partition_finish(rdo_partition_dispatch(
        y_plane, qp, bit_depth, ctu_size, min_cu, lossless, lfnst,
        chroma_planes, mtt, isp))


def rdo_partition_dispatch(y_plane, qp: int, bit_depth: int = 8,
                           ctu_size: int = 64, min_cu: int = 8,
                           lossless: bool = False, lfnst: bool = True,
                           chroma_planes=None, mtt: bool = False,
                           isp: bool = False):
    """Async half of rdo_partition: queues the device program(s) and
    returns the packed result handles immediately (jax dispatch is async)
    — the host pipeline overlaps with device compute.  Finish with
    rdo_partition_finish."""
    h, w = y_plane.shape
    assert w % min_cu == 0 and h % min_cu == 0, "pad input to min-CU multiple"
    shapes = _candidate_shapes(ctu_size, min_cu, mtt)
    with_chroma = chroma_planes is not None
    vec = pack_planes(y_plane, *(chroma_planes or (None, None)))
    vec_dev = jax.device_put(vec)
    packed = [(grp, eval_all_sizes(vec_dev, grp, jnp.int32(qp), bit_depth,
                                   w, h, lossless, lfnst, with_chroma, isp))
              for grp in _shape_groups(shapes)]
    return (packed, w, h, qp, shapes, ctu_size, min_cu, mtt)


def rdo_partition_finish(handle):
    """Blocking half: transfer + DP backtrack."""
    packed, w, h, qp, shapes, ctu_size, min_cu, mtt = handle
    results = {}
    for grp, pk in packed:
        results.update(unpack_results(np.asarray(pk), grp, w, h))
    return _dp_backtrack(results, w, h, qp, shapes, ctu_size, min_cu, mtt)


def rdo_partition_frames(y_planes, qp: int, bit_depth: int = 8,
                         ctu_size: int = 64, min_cu: int = 8,
                         lossless: bool = False, lfnst: bool = True,
                         chroma_planes=None, mtt: bool = False,
                         isp: bool = False):
    """Batched variant: list of [H,W] planes → list of per-frame
    (split_map, leaf_map, leaves).  One device dispatch for the whole GOP."""
    h, w = y_planes[0].shape
    assert w % min_cu == 0 and h % min_cu == 0, "pad input to min-CU multiple"
    shapes = _candidate_shapes(ctu_size, min_cu, mtt)
    nf = len(y_planes)
    with_chroma = chroma_planes is not None
    vec = pack_planes(np.stack(y_planes),
                      *((np.stack(chroma_planes[0]),
                         np.stack(chroma_planes[1])) if with_chroma
                        else (None, None)))
    vec_dev = jax.device_put(vec)
    packed = [(grp, eval_all_sizes_frames(vec_dev, grp, jnp.int32(qp),
                                          bit_depth, w, h, nf, lossless,
                                          lfnst, with_chroma, isp))
              for grp in _shape_groups(shapes)]
    packed = [(grp, np.asarray(pk)) for grp, pk in packed]
    out = []
    for f in range(nf):
        per = {}
        for grp, pk in packed:
            per.update(unpack_results(pk[f], grp, w, h))
        out.append(_dp_backtrack(per, w, h, qp, shapes, ctu_size, min_cu,
                                 mtt))
    return out


def _offset_rdo_result(result, dx: int):
    """Shift a per-tile (split_map, leaf_map, leaves) to frame coords."""
    if dx == 0:
        return result
    sm, lm, leaves = result
    for leaf in leaves:
        leaf.x0 += dx
    return ({(x + dx, y, bw, bh): v for (x, y, bw, bh), v in sm.items()},
            {(x + dx, y, bw, bh): v for (x, y, bw, bh), v in lm.items()},
            leaves)


def rdo_partition_tiled(y_plane: np.ndarray, tiles, qp: int,
                        bit_depth: int = 8, ctu_size: int = 64,
                        min_cu: int = 8, lossless: bool = False,
                        lfnst: bool = True, chroma_planes=None,
                        mtt: bool = False, tile_results=None,
                        isp: bool = False):
    """Per-tile RDO: each tile column is searched on its own sub-plane
    (prediction references clamp at the tile edge, matching the tile
    reconstruction's availability — the frame-wide search crossed edges
    the recon pass could never use).  This per-tile formulation is ALSO
    the unit the sharded multi-device encode distributes (vvc.shard.encode
    runs the identical per-tile program under shard_map), so 1-device and
    N-device encodes agree by construction.

    tiles: [(tx0, tx1)] from tile_columns.  tile_results: optional
    precomputed per-tile unpacked result dicts (the sharded path supplies
    these).  Returns frame-coordinate (split_map, leaf_map, leaves)."""
    h, w = y_plane.shape
    shapes = _candidate_shapes(ctu_size, min_cu, mtt)
    widths = [tx1 - tx0 for tx0, tx1 in tiles]
    uniform = len(set(widths)) == 1
    with_chroma = chroma_planes is not None
    if tile_results is None:
        tile_results = []
        if uniform:
            wt = widths[0]
            ys = np.stack([y_plane[:, tx0:tx1] for tx0, tx1 in tiles])
            cbs = crs = None
            if with_chroma:
                cb, cr = chroma_planes
                cbs = np.stack([cb[:, tx0 >> 1:tx1 >> 1] for tx0, tx1 in tiles])
                crs = np.stack([cr[:, tx0 >> 1:tx1 >> 1] for tx0, tx1 in tiles])
            vec = pack_planes(ys, cbs, crs)
            vec_dev = jax.device_put(vec)
            packed = [(grp, np.asarray(eval_all_sizes_frames(
                vec_dev, grp, jnp.int32(qp), bit_depth, wt, h,
                len(tiles), lossless, lfnst, with_chroma, isp)))
                for grp in _shape_groups(shapes)]
            tile_results = []
            for i in range(len(tiles)):
                per = {}
                for grp, pk in packed:
                    per.update(unpack_results(pk[i], grp, wt, h))
                tile_results.append(per)
        else:
            for tx0, tx1 in tiles:
                cp = None
                if with_chroma:
                    cb, cr = chroma_planes
                    cp = (cb[:, tx0 >> 1:tx1 >> 1], cr[:, tx0 >> 1:tx1 >> 1])
                vec = pack_planes(y_plane[:, tx0:tx1], *(cp or (None, None)))
                vec_dev = jax.device_put(vec)
                per = {}
                for grp in _shape_groups(shapes):
                    per.update(unpack_results(
                        np.asarray(eval_all_sizes(
                            vec_dev, grp, jnp.int32(qp), bit_depth,
                            tx1 - tx0, h, lossless, lfnst, with_chroma,
                            isp)), grp, tx1 - tx0, h))
                tile_results.append(per)
    split_map, leaf_map, leaves = {}, {}, []
    for (tx0, tx1), res in zip(tiles, tile_results):
        sm, lm, lv = _offset_rdo_result(
            _dp_backtrack(res, tx1 - tx0, h, qp, shapes, ctu_size, min_cu,
                          mtt), tx0)
        split_map.update(sm)
        leaf_map.update(lm)
        leaves.extend(lv)
    return split_map, leaf_map, leaves


def _dp_backtrack(results, w, h, qp, sizes, ctu_size, min_cu, mtt=False):
    if mtt:
        return _dp_backtrack_mtt(results, w, h, qp, sizes, ctu_size, min_cu)
    lam = rd_lambda(qp)
    cost = {}
    mode = {}
    mts = {}
    lfn = {}
    cmode = {}
    ispd = {}
    szs = [bw for (bw, bh) in _as_shapes(sizes)]
    for s in szs:
        nx, ny = w // s, h // s
        cost[s] = np.full((ny, nx), np.inf, dtype=np.float64)
        mode[s] = np.zeros((ny, nx), dtype=np.int32)
        mts[s] = np.zeros((ny, nx), dtype=np.int32)
        lfn[s] = np.zeros((ny, nx), dtype=np.int32)
        cmode[s] = np.zeros((ny, nx), dtype=np.int32)
        ispd[s] = np.zeros((ny, nx), dtype=np.int32)
        if (s, s) in results:
            r = results[(s, s)]
            cost[s][:] = r[0]
            mode[s][:] = r[1]
            mts[s][:] = r[2]
            if len(r) > 3:
                lfn[s][:] = r[3]
            if len(r) > 4:
                cmode[s][:] = r[4]
            if len(r) > 5:
                ispd[s][:] = r[5]

    # bottom-up DP
    best = {min_cu: cost[min_cu].copy()}
    use_split = {}
    for s in szs[1:] if szs[0] == min_cu else sorted(szs)[1:]:
        half = s // 2
        ny, nx = h // s, w // s
        ch = best[half]
        child_sum = (ch[0::2, 0::2][:ny, :nx] + ch[0::2, 1::2][:ny, :nx]
                     + ch[1::2, 0::2][:ny, :nx] + ch[1::2, 1::2][:ny, :nx])
        split_cost = child_sum + lam * SPLIT_BITS
        leaf_cost = cost[s][:ny, :nx] + lam * SPLIT_LEAF_BITS  # flag = 0
        use_split[s] = split_cost < leaf_cost
        best[s] = np.where(use_split[s], split_cost, leaf_cost)

    # backtrack in z-order over the CTU grid (implicit splits at borders)
    split_map = {}
    leaf_map = {}
    leaves = []

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
            leaf = Leaf(x0, y0, s, s, int(mode[s][y0 // s, x0 // s]),
                        mts=int(mts[s][y0 // s, x0 // s]),
                        lfnst=int(lfn[s][y0 // s, x0 // s]),
                        isp=int(ispd[s][y0 // s, x0 // s]),
                        chroma_mode=int(cmode[s][y0 // s, x0 // s]))
            tr = _trace()
            if tr.enabled:
                tr.emit("BEST_MODE", x=x0, y=y0, w=s, h=s,
                        mode=leaf.luma_mode,
                        cost=float(cost[s][y0 // s, x0 // s]))
            leaf_map[(x0, y0, s, s)] = leaf
            leaves.append(leaf)

    for cy in range(0, h, ctu_size):
        for cx in range(0, w, ctu_size):
            walk(cx, cy, ctu_size)
    return split_map, leaf_map, leaves


def _dp_backtrack_mtt(results, w, h, qp, shapes, ctu_size, min_cu):
    """Shape-lattice DP over QT + BT + TT: two tables per shape — best_q
    (QT still allowed) and best_m (inside MTT, the spec's no-QT-below-MTT
    rule) — then a z-order backtrack emitting split codes (reference:
    EncCu::xCheckModeSplit over canSplit results).

    BT children of an aligned (w,h) grid land on the (w',h') grid.  TT
    outer children also align (offsets 0 and 3h/4 on the (w,h/4) grid and
    recurse through best_m); only the middle child sits at the +h/4
    half-offset, for which eval_mid_plane supplies LEAF-only cost planes
    (the middle child is not split further in the search — a bounded
    approximation; syntax/decode support arbitrary TT subtrees)."""
    from vvc.model.partition import allowed_splits, SPLIT_TT_H, SPLIT_TT_V
    lam = rd_lambda(qp)
    shapes = _as_shapes(shapes)
    data = {}
    for sh in shapes:
        bw, bh = sh
        ny, nx = h // bh, w // bw
        if not (ny and nx):
            continue
        if sh in results:
            r = results[sh]
            data[sh] = tuple(np.asarray(x) for x in r)
        else:
            data[sh] = (np.full((ny, nx), np.inf, np.float64),
                        np.zeros((ny, nx), np.int32),
                        np.zeros((ny, nx), np.int32),
                        np.zeros((ny, nx), np.int32),
                        np.zeros((ny, nx), np.int32),
                        np.zeros((ny, nx), np.int32))

    # process smallest-area first so children exist before parents
    order = sorted(data.keys(), key=lambda sh: (sh[0] * sh[1], sh[0]))
    best_m, choice_m = {}, {}
    best_q, choice_q = {}, {}

    def bt_costs(tbl, sh):
        """(bt_h, bt_v) child-sum planes for shape sh from table tbl."""
        bw, bh = sh
        ny, nx = h // bh, w // bw
        out = []
        ch_h = tbl.get((bw, bh >> 1))
        out.append(None if ch_h is None else
                   ch_h[0::2, :][:ny, :nx] + ch_h[1::2, :][:ny, :nx])
        ch_v = tbl.get((bw >> 1, bh))
        out.append(None if ch_v is None else
                   ch_v[:, 0::2][:ny, :nx] + ch_v[:, 1::2][:ny, :nx])
        return out

    def tt_costs(tbl, sh):
        """(tt_h, tt_v) child-sum planes: outer children from the aligned
        quarter-shape best_m table, middle child from the leaf-only
        half-offset plane (results[('TH'|'TV', dim)])."""
        if not TT_IN_SEARCH:
            return [None, None]
        bw, bh = sh
        ny, nx = h // bh, w // bw
        out = []
        # the mid leaf pays its own split_cu_flag like every best_m leaf
        q_h = tbl.get((bw, bh >> 2))
        mid_h = results.get(("TH", bw)) if bh == 32 else None
        if q_h is None or mid_h is None:
            out.append(None)
        else:
            out.append(q_h[0::4, :][:ny, :nx] + q_h[3::4, :][:ny, :nx]
                       + mid_h[0][:ny, :nx] + lam * SPLIT_LEAF_BITS)
        q_v = tbl.get((bw >> 2, bh))
        mid_v = results.get(("TV", bh)) if bw == 32 else None
        if q_v is None or mid_v is None:
            out.append(None)
        else:
            out.append(q_v[:, 0::4][:ny, :nx] + q_v[:, 3::4][:ny, :nx]
                       + mid_v[0][:ny, :nx] + lam * SPLIT_LEAF_BITS)
        return out

    for sh in order:
        bw, bh = sh
        ny, nx = h // bh, w // bw
        leaf = data[sh][0].astype(np.float64)
        # ---- MTT-context table (QT barred) ----
        _, mbth, mbtv, mtth, mttv = allowed_splits(bw, bh, False, True)
        cands = [leaf + lam * SPLIT_LEAF_BITS]  # choice 0 = leaf (flag=0)
        codes = [SPLIT_NONE]
        sums = bt_costs(best_m, sh)
        tsums = tt_costs(best_m, sh)
        # direction flag coded only when both directions are available;
        # binary (BT-vs-TT) flag only when both compete in that direction
        dir_b = MTT_DIR_BITS if (mbth or mtth) and (mbtv or mttv) else 0.0
        if mbth and sums[0] is not None:
            cands.append(sums[0] + lam * (SPLIT_BITS + dir_b
                                          + (BT_FLAG_BITS if mtth else 0)))
            codes.append(SPLIT_BT_H)
        if mbtv and sums[1] is not None:
            cands.append(sums[1] + lam * (SPLIT_BITS + dir_b
                                          + (BT_FLAG_BITS if mttv else 0)))
            codes.append(SPLIT_BT_V)
        if mtth and tsums[0] is not None:
            cands.append(tsums[0] + lam * (SPLIT_BITS + dir_b
                                           + TT_MARGIN_BITS
                                           + (TT_FLAG_BITS if mbth else 0)))
            codes.append(SPLIT_TT_H)
        if mttv and tsums[1] is not None:
            cands.append(tsums[1] + lam * (SPLIT_BITS + dir_b
                                           + TT_MARGIN_BITS
                                           + (TT_FLAG_BITS if mbtv else 0)))
            codes.append(SPLIT_TT_V)
        stack = np.stack(cands)
        pick = np.argmin(stack, axis=0)
        best_m[sh] = np.take_along_axis(stack, pick[None], axis=0)[0]
        choice_m[sh] = np.asarray(codes, np.int32)[pick]
        # ---- QT-allowed table (square shapes only) ----
        if bw == bh:
            qt_ok, qbth, qbtv, qtth, qttv = allowed_splits(bw, bh, True, True)
            any_mtt = qbth or qbtv or qtth or qttv
            # split_qt_flag coded only when QT and MTT both compete
            qt_b = QT_FLAG_BITS if (qt_ok and any_mtt) else 0.0
            mtt_b = MTT_FLAG_BITS if qt_ok else 0.0
            qdir_b = (MTT_DIR_BITS
                      if (qbth or qtth) and (qbtv or qttv) else 0.0)
            cands = [leaf + lam * SPLIT_LEAF_BITS]
            codes = [SPLIT_NONE]
            if qt_ok and (bw >> 1, bh >> 1) in best_q:
                cq = best_q[(bw >> 1, bh >> 1)]
                qsum = (cq[0::2, 0::2][:ny, :nx] + cq[0::2, 1::2][:ny, :nx]
                        + cq[1::2, 0::2][:ny, :nx] + cq[1::2, 1::2][:ny, :nx])
                cands.append(qsum + lam * (SPLIT_BITS + qt_b))
                codes.append(SPLIT_QT)
            sums = bt_costs(best_m, sh)
            tsums = tt_costs(best_m, sh)
            if qbth and sums[0] is not None:
                cands.append(sums[0] + lam * (SPLIT_BITS + mtt_b + qdir_b
                                              + (BT_FLAG_BITS if qtth
                                                 else 0)))
                codes.append(SPLIT_BT_H)
            if qbtv and sums[1] is not None:
                cands.append(sums[1] + lam * (SPLIT_BITS + mtt_b + qdir_b
                                              + (BT_FLAG_BITS if qttv
                                                 else 0)))
                codes.append(SPLIT_BT_V)
            if qtth and tsums[0] is not None:
                cands.append(tsums[0] + lam * (SPLIT_BITS + mtt_b + qdir_b
                                               + TT_MARGIN_BITS
                                               + (TT_FLAG_BITS if qbth
                                                  else 0)))
                codes.append(SPLIT_TT_H)
            if qttv and tsums[1] is not None:
                cands.append(tsums[1] + lam * (SPLIT_BITS + mtt_b + qdir_b
                                               + TT_MARGIN_BITS
                                               + (TT_FLAG_BITS if qbtv
                                                  else 0)))
                codes.append(SPLIT_TT_V)
            stack = np.stack(cands)
            pick = np.argmin(stack, axis=0)
            best_q[sh] = np.take_along_axis(stack, pick[None], axis=0)[0]
            choice_q[sh] = np.asarray(codes, np.int32)[pick]

    split_map = {}
    leaf_map = {}
    leaves = []
    from vvc.model.partition import child_blocks

    def walk(x0, y0, bw, bh, qt_allowed):
        if x0 >= w or y0 >= h:
            return
        if bw > 64 or bh > 64:
            # MaxCUSize 64: CTU-128 nodes split implicitly (no flag)
            half = bw >> 1
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                walk(x0 + dx, y0 + dy, half, half, qt_allowed)
            return
        if not (x0 + bw <= w and y0 + bh <= h):
            half = bw >> 1
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                walk(x0 + dx, y0 + dy, half, half, qt_allowed)
            return
        sh = (bw, bh)
        tbl = choice_q if (qt_allowed and bw == bh) else choice_m
        code = int(tbl[sh][y0 // bh, x0 // bw]) if sh in tbl else SPLIT_NONE
        if any(allowed_splits(bw, bh, qt_allowed, True)):
            split_map[(x0, y0, bw, bh)] = code
        if code == SPLIT_NONE:
            r = data[sh]
            iy, ix = y0 // bh, x0 // bw
            leaf = Leaf(x0, y0, bw, bh, int(r[1][iy, ix]),
                        mts=int(r[2][iy, ix]), lfnst=int(r[3][iy, ix]),
                        chroma_mode=int(r[4][iy, ix]),
                        isp=int(r[5][iy, ix]) if len(r) > 5 else 0)
            leaf_map[(x0, y0, bw, bh)] = leaf
            leaves.append(leaf)
            return
        kids = child_blocks(x0, y0, bw, bh, code)
        if code in (SPLIT_TT_H, SPLIT_TT_V):
            # middle child: leaf directly from the half-offset plane (its
            # position is off the aligned grids)
            cx, cy, cw, ch = kids[1]
            r = results[("TH", bw) if code == SPLIT_TT_H else ("TV", bh)]
            iy = cy // 32 if code == SPLIT_TT_H else cy // ch
            ix = cx // cw if code == SPLIT_TT_H else cx // 32
            leaf = Leaf(cx, cy, cw, ch, int(r[1][iy, ix]),
                        mts=int(r[2][iy, ix]), lfnst=int(r[3][iy, ix]))
            walk(*kids[0], False)
            if any(allowed_splits(cw, ch, False, True)):
                split_map[(cx, cy, cw, ch)] = SPLIT_NONE
            leaf_map[(cx, cy, cw, ch)] = leaf
            leaves.append(leaf)
            walk(*kids[2], False)
            return
        for (cx, cy, cw, ch) in kids:
            walk(cx, cy, cw, ch, code == SPLIT_QT and qt_allowed)

    for cy in range(0, h, ctu_size):
        for cx in range(0, w, ctu_size):
            walk(cx, cy, ctu_size, ctu_size, True)
    return split_map, leaf_map, leaves
