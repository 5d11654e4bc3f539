"""Window-based batched motion estimation — the v2 inter-search core.

TPU-native analog of the reference's motion search
(`/root/reference/source/Lib/EncoderLib/InterSearch.cpp` →
predInterSearch / xMotionEstimation / xTZSearch / xPatternSearchFracDIF;
affine: xAffineMotionEstimation).  The r4 engine evaluated candidates by
per-element XLA gathers from pre-interpolated quarter-pel phase planes;
on TPU a generic gather runs at ~25 ns/element (measured, r5), and with
~85 gathers of ~N·S² elements per size program the inter search cost
27 s/frame at 1080p — 82 % of the tools-on encode wall (VERDICT r4
weak #1).  This rewrite eliminates per-element gathers:

  1. COARSE: full-search on 4×-downsampled planes over a ±COARSE_R
     displacement grid (±4·COARSE_R full-res) as UNIFORM plane shifts —
     each displacement is a `dynamic_slice` + squared-diff + box-reduce
     evaluated for every 16/32/64 block of the frame simultaneously
     (one `lax.scan` over the displacement grid, no gathers at all).
  2. WINDOW: per block of each size class, ONE `vmap(dynamic_slice)`
     fetch of an (S+16)² reference window centered on the block's coarse
     MV.  Slice-granularity gathers cost ~2.4 µs/slice irrespective of
     slice size (measured r5), so one window per block beats
     per-candidate gathers by ~80×.  8×8 blocks reuse their 16×16
     parent's window via static sub-slices — no gather of their own.
  3. INT REFINE: the 81 integer displacements in ±R2 are STATIC slices
     of the window — pure VPU elementwise SSE; a 9+9-way one-hot
     contraction re-centers the window on the argmin (no gather).
  4. QPEL: all 49 quarter-pel offsets in ±3 around the integer best are
     static slices of the re-centered window run through the normative
     8-tap DCTIF (shared horizontal passes), scored by SATD on the MXU.
  5. AFFINE: candidate corner-delta CPMV search around the translational
     seed, scored by separable bilinear one-hot sampling inside the
     re-centered window under a `lax.scan` over candidates — replaces
     the r4 Gauss-Newton whose bilinear sampling was 16 full-coverage
     gathers per size/list.

Reference planes are edge-padded by PAD and 4×-downsampled ONCE per
picture and cached across frames keyed by the ndarray (VERDICT r4
task 1a: a recon picture referenced by 5 B-frames was re-interpolated
5× per frame; the quarter-pel phase-plane stack is gone altogether).
"""
from __future__ import annotations

import weakref
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vvc.kernels.mc import LUMA_FILTERS
from vvc.kernels.satd import satd_batch

PAD = 16        # edge padding baked into cached reference planes
R2 = 4          # full-res integer refinement radius around the coarse MV
WIN_M = 10      # window margin each side of the block (R2 + M2)
M2 = 6          # re-centered window margin (8-tap support + ±2 int pel)
COARSE_R = 8    # coarse search radius in ds4 units (±32 full-res)
AFFINE_ME_SIZES = (16, 32, 64)
AFFINE_BITS = 18.0
# corner-delta candidate grid (qpel at the TR control point)
AFF_DELTAS = (-8, -4, -2, 0, 2, 4, 8)


def _mv_bits(d):
    """Approximate qpel-MVD rate (bits) — EG1-ish."""
    return 2.0 * jnp.log2(1.0 + jnp.abs(d).astype(jnp.float32)) + 1.0


# --------------------------------------------------------------------
# per-picture device cache: padded plane + ds4 plane
# --------------------------------------------------------------------

@partial(jax.jit, static_argnames=("h", "w"))
def _prep_ref(plane, h: int, w: int):
    pp = jnp.pad(plane, ((PAD, PAD), (PAD, PAD)), mode="edge")
    h4, w4 = (h + 3) // 4, (w + 3) // 4
    pe = jnp.pad(plane, ((0, 4 * h4 - h), (0, 4 * w4 - w)), mode="edge")
    ds = pe.reshape(h4, 4, w4, 4).astype(jnp.int32).sum(axis=(1, 3)) // 16
    return pp, ds


_CACHE: dict = {}
_ORDER: list = []


def pic_dev(arr: np.ndarray):
    """(padded_dev [H+2P, W+2P], ds4_dev [ceil(H/4), ceil(W/4)]) for a
    reference picture, cached per ndarray object (weakref-validated —
    a recon referenced by several B frames preps once)."""
    key = id(arr)
    ent = _CACHE.get(key)
    if ent is not None and ent[0]() is arr:
        return ent[1], ent[2]
    h, w = arr.shape
    pp, ds = _prep_ref(jnp.asarray(np.ascontiguousarray(arr), jnp.int32),
                       h, w)
    _CACHE[key] = (weakref.ref(arr), pp, ds)
    _ORDER.append(key)
    while len(_ORDER) > 12:
        _CACHE.pop(_ORDER.pop(0), None)
    return pp, ds


# --------------------------------------------------------------------
# coarse full-search on ds4 planes (uniform shifts, all sizes at once)
# --------------------------------------------------------------------

@partial(jax.jit, static_argnames=("h4", "w4", "r"))
def _coarse_program(yds, refds, h4: int, w4: int, r: int):
    """yds [h4,w4], refds [R,h4,w4] → per-size coarse full-pel MV grids
    {16: [R,n4y,n4x,2], 32: …, 64: …} (mvy, mvx), grids padded up to a
    multiple-of-16 ds extent; callers clip-index."""
    R = refds.shape[0]
    D = 2 * r + 1
    refp = jnp.pad(refds, ((0, 0), (r, r), (r, r)), mode="edge")
    hp, wp = -(-h4 // 16) * 16, -(-w4 // 16) * 16
    n4y, n4x = hp // 4, wp // 4
    yf = yds.astype(jnp.float32)

    def body(carry, d):
        dy, dx = d // D - r, d % D - r
        sh = jax.lax.dynamic_slice(refp, (0, dy + r, dx + r), (R, h4, w4))
        sq = (yf[None] - sh.astype(jnp.float32)) ** 2
        sq = jnp.pad(sq, ((0, 0), (0, hp - h4), (0, wp - w4)))
        bias = 0.5 * (_mv_bits(16 * dx) + _mv_bits(16 * dy))
        c4 = sq.reshape(R, n4y, 4, n4x, 4).sum(axis=(2, 4)) + bias
        c8 = c4.reshape(R, n4y // 2, 2, n4x // 2, 2).sum(axis=(2, 4))
        c16 = c8.reshape(R, n4y // 4, 2, n4x // 4, 2).sum(axis=(2, 4))
        out = []
        for c, (b, a) in zip((c4, c8, c16), carry):
            m = c < b
            out.append((jnp.where(m, c, b), jnp.where(m, d, a)))
        return out, None

    init = [(jnp.full((R, n4y // k, n4x // k), jnp.inf),
             jnp.zeros((R, n4y // k, n4x // k), jnp.int32))
            for k in (1, 2, 4)]
    res, _ = jax.lax.scan(body, init, jnp.arange(D * D))
    grids = {}
    for s, (_, arg) in zip((16, 32, 64), res):
        grids[s] = jnp.stack([(arg // D - r) * 4, (arg % D - r) * 4],
                             axis=-1)
    return grids


# --------------------------------------------------------------------
# window fetch + integer / qpel refinement
# --------------------------------------------------------------------

def _gather_windows(refpad, sy, sx, ws: int):
    def one(y0, x0):
        return jax.lax.dynamic_slice(refpad, (y0, x0), (ws, ws))
    return jax.vmap(one)(sy, sx)


def _win_centers(cy, cx, ys, xs, h: int, w: int, s: int):
    """Clip coarse centers so the (s+2·WIN_M)² window stays inside the
    padded plane; returns (cy, cx, sy, sx), sy/sx the padded origins."""
    ws = s + 2 * WIN_M
    cy = jnp.clip(cy, WIN_M - (ys + PAD), (h + PAD - ws) - ys + WIN_M)
    cx = jnp.clip(cx, WIN_M - (xs + PAD), (w + PAD - ws) - xs + WIN_M)
    sy = ys + PAD + cy - WIN_M
    sx = xs + PAD + cx - WIN_M
    return cy, cx, sy, sx


def _int_refine(win, ob, cy, cx, lam_m, s: int):
    """81 static-slice SSE evals in ±R2 around the window center.
    Returns (iy, ix absolute int-pel MV [N], w2 [N,s+2·M2,s+2·M2]
    re-centered on the winner: w2 row r ↔ block-relative r−M2)."""
    n = ob.shape[0]
    of = ob.astype(jnp.float32)
    best = None
    for dy in range(-R2, R2 + 1):
        for dx in range(-R2, R2 + 1):
            t, l = dy + WIN_M, dx + WIN_M
            pr = win[:, t:t + s, l:l + s].astype(jnp.float32)
            d = pr - of
            c = jnp.sum(d * d, axis=(1, 2)) \
                + lam_m * (_mv_bits(4 * (cy + dy)) + _mv_bits(4 * (cx + dx)))
            k = (dy + R2) * (2 * R2 + 1) + (dx + R2)
            if best is None:
                best = [c, jnp.full(n, k, jnp.int32)]
            else:
                m = c < best[0]
                best = [jnp.where(m, c, best[0]),
                        jnp.where(m, jnp.int32(k), best[1])]
    kb = best[1]
    dyb, dxb = kb // (2 * R2 + 1), kb % (2 * R2 + 1)       # 0..8
    ws = win.shape[2]
    m2 = s + 2 * M2
    acc = jnp.zeros((n, m2, ws), jnp.int32)
    for k in range(2 * R2 + 1):
        sel = (dyb == k).astype(jnp.int32)[:, None, None]
        acc = acc + sel * win[:, k:k + m2, :]
    w2 = jnp.zeros((n, m2, m2), jnp.int32)
    for k in range(2 * R2 + 1):
        sel = (dxb == k).astype(jnp.int32)[:, None, None]
        w2 = w2 + sel * acc[:, :, k:k + m2]
    return cy + dyb - R2, cx + dxb - R2, w2


def _qpel_refine(w2, ob, iy, ix, lam_m, s: int, bit_depth: int):
    """All 49 qpel offsets in ±3 around the integer best as static slices
    of the re-centered window + normative 8-tap DCTIF, SATD-scored.
    w2 origin ↔ block-relative (-4,-4) at integer MV (iy,ix).
    Returns (mvy, mvx qpel [N], cost [N], pred [N,s,s] int32)."""
    mx = (1 << bit_depth) - 1
    filt = LUMA_FILTERS
    m2 = s + 2 * M2
    hor = {}
    for qx in range(-3, 4):
        key = (qx >> 2, qx & 3)
        if key in hor:
            continue
        ixo, fx = key
        if fx == 0:
            hor[key] = w2[:, :, M2:M2 + s].astype(jnp.int32) << 6
        else:
            c0 = ixo + M2 - 3
            acc = jnp.zeros((w2.shape[0], m2, s), jnp.int32)
            for k in range(8):
                acc = acc + int(filt[fx, k]) * w2[:, :, c0 + k:c0 + k + s]
            hor[key] = acc
    best = None
    for qy in range(-3, 4):
        iyo, fy = qy >> 2, qy & 3
        r0 = iyo + M2 - 3
        for qx in range(-3, 4):
            hb = hor[(qx >> 2, qx & 3)]
            if fy == 0:
                acc = hb[:, M2:M2 + s, :] << 6
            else:
                acc = jnp.zeros_like(hb[:, :s, :])
                for k in range(8):
                    acc = acc + int(filt[fy, k]) * hb[:, r0 + k:r0 + k + s, :]
            pred = jnp.clip((acc + 2048) >> 12, 0, mx)
            mvy, mvx = 4 * iy + qy, 4 * ix + qx
            c = satd_batch(pred, ob).astype(jnp.float32) \
                + lam_m * (_mv_bits(mvy) + _mv_bits(mvx))
            if best is None:
                best = [c, mvy, mvx, pred]
            else:
                m = c < best[0]
                mm = m[:, None, None]
                best = [jnp.where(m, c, best[0]),
                        jnp.where(m, mvy, best[1]),
                        jnp.where(m, mvx, best[2]),
                        jnp.where(mm, pred, best[3])]
    return best[1], best[2], best[0], best[3]


def _eval_from_win(win, ob, cy, cx, lam_m, s: int, bit_depth: int):
    iy, ix, w2 = _int_refine(win, ob, cy, cx, lam_m, s)
    mvy, mvx, cost, pred = _qpel_refine(w2, ob, iy, ix, lam_m, s,
                                        bit_depth)
    return dict(mvy=mvy, mvx=mvx, cost=cost, pred=pred, w2=w2,
                iy=iy, ix=ix)


def eval_ref(refpad, ob, ys, xs, cy, cx, lam_m, s: int, h: int, w: int,
             bit_depth: int):
    cy, cx, sy, sx = _win_centers(cy, cx, ys, xs, h, w, s)
    win = _gather_windows(refpad, sy, sx, s + 2 * WIN_M)
    return _eval_from_win(win, ob, cy, cx, lam_m, s, bit_depth)


# --------------------------------------------------------------------
# affine: candidate corner-delta search in the re-centered window
# --------------------------------------------------------------------

def affine_search_win(w2, ob, mvy0, mvx0, iy, ix, lam_m, s: int,
                      bit_depth: int):
    """4-param CPMV candidates around the translational seed, scored by
    separable bilinear one-hot sampling inside w2 (no gathers;
    `lax.scan` over the candidate grid bounds trace size).

    Candidate (da, db) = qpel displacement of the TR control point;
    field vx = a·x − b·y, vy = b·x + a·y with a = da/s, b = db/s.
    Returns (cost, da, db, pred [N,s,s] int32)."""
    n = ob.shape[0]
    nsb = s // 4
    w2f = w2.astype(jnp.float32)
    cxy = jnp.arange(nsb, dtype=jnp.float32) * 4.0 + 2.0
    qy0 = (mvy0 - 4 * iy).astype(jnp.float32)
    qx0 = (mvx0 - 4 * ix).astype(jnp.float32)

    def score(best, da, db):
        """da/db [n] qpel corner deltas → pred + SATD + running min."""
        a = (da / float(s))[:, None, None]
        b = (db / float(s))[:, None, None]
        # delta field rooted at the block CENTER: the translational seed
        # already absorbs the block-mean displacement, so the candidate
        # rotation/zoom must be mean-free over the block
        cc = cxy - float(s) / 2.0
        dqx = a * cc[None, None, :] - b * cc[None, :, None]   # [n,v,u]
        dqy = b * cc[None, None, :] + a * cc[None, :, None]
        by = jnp.clip(M2 + (qy0[:, None, None] + dqy) / 4.0,
                      0.0, 2 * M2 - 0.001)
        bx = jnp.clip(M2 + (qx0[:, None, None] + dqx) / 4.0,
                      0.0, 2 * M2 - 0.001)
        iby = jnp.floor(by)
        ibx = jnp.floor(bx)
        ay, ax = by - iby, bx - ibx
        iby = iby.astype(jnp.int32)
        ibx = ibx.astype(jnp.int32)
        m2 = s + 2 * M2
        # row pass: r[n,v,u,py,x] = Σ_k wy[n,v,u,k]·w2f[n, 4v+py+k, x]
        r = jnp.zeros((n, nsb, nsb, 4, m2), jnp.float32)
        for k in range(2 * M2 + 1):
            wy = jnp.where(iby == k, 1.0 - ay, 0.0) \
                + jnp.where(iby == k - 1, ay, 0.0)
            sl = w2f[:, k:k + 4 * nsb, :].reshape(n, nsb, 4, m2)
            r = r + wy[:, :, :, None, None] * sl[:, :, None, :, :]
        # col pass per u (static slices): pred[n,v,u,py,px]
        cols = []
        for u in range(nsb):
            pu = jnp.zeros((n, nsb, 4, 4), jnp.float32)
            for k in range(2 * M2 + 1):
                wx = jnp.where(ibx[:, :, u] == k, 1.0 - ax[:, :, u], 0.0) \
                    + jnp.where(ibx[:, :, u] == k - 1, ax[:, :, u], 0.0)
                pu = pu + wx[:, :, None, None] \
                    * r[:, :, u, :, 4 * u + k:4 * u + k + 4]
            cols.append(pu)
        pred = jnp.stack(cols, axis=2)                     # [n,v,u,py,px]
        pred = pred.transpose(0, 1, 3, 2, 4).reshape(n, s, s)
        predi = jnp.clip(jnp.round(pred), 0, (1 << bit_depth) - 1) \
            .astype(jnp.int32)
        c = satd_batch(predi, ob).astype(jnp.float32) \
            + lam_m * (AFFINE_BITS + _mv_bits(da) + _mv_bits(db))
        m = c < best[0]
        mm = m[:, None, None]
        return [jnp.where(m, c, best[0]),
                jnp.where(m, da.astype(jnp.int32), best[1]),
                jnp.where(m, db.astype(jnp.int32), best[2]),
                jnp.where(mm, predi, best[3])]

    def stage1(best, cand):
        return score(best, jnp.broadcast_to(cand[0], (n,)),
                     jnp.broadcast_to(cand[1], (n,))), None

    def stage2(best, off):
        return score(best, best[1].astype(jnp.float32) + off[0],
                     best[2].astype(jnp.float32) + off[1]), None

    init = [jnp.full(n, jnp.inf), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.int32), jnp.zeros((n, s, s), jnp.int32)]
    cands = jnp.asarray([(da, db) for da in AFF_DELTAS
                         for db in AFF_DELTAS], jnp.float32)
    best, _ = jax.lax.scan(stage1, init, cands)
    # ±1-qpel refinement around the grid winner (per-block deltas)
    offs = jnp.asarray([(dy, dx) for dy in (-1, 0, 1)
                        for dx in (-1, 0, 1) if (dy, dx) != (0, 0)],
                       jnp.float32)
    best, _ = jax.lax.scan(stage2, best, offs)
    # final pred for the winner through the normative-quality 8-tap
    # DCTIF (the bilinear scoring pred would handicap affine's RD
    # against the DCTIF-interpolated translational candidates)
    da = best[1].astype(jnp.float32)
    db = best[2].astype(jnp.float32)
    cc = cxy - float(s) / 2.0
    a = (da / float(s))[:, None, None]
    b = (db / float(s))[:, None, None]
    dqx = a * cc[None, None, :] - b * cc[None, :, None]
    dqy = b * cc[None, None, :] + a * cc[None, :, None]
    qy = jnp.clip(jnp.round(qy0[:, None, None] + dqy), -12, 11) \
        .astype(jnp.int32)
    qx = jnp.clip(jnp.round(qx0[:, None, None] + dqx), -12, 11) \
        .astype(jnp.int32)
    pred = _affine_dctif_pred(w2f, qy, qx, s, bit_depth)
    return best[0], best[1], best[2], pred


def _affine_dctif_pred(w2f, qy, qx, s: int, bit_depth: int):
    """Per-subblock 8-tap DCTIF prediction inside the re-centered window
    at per-subblock qpel offsets qy/qx [n,nsb,nsb] ∈ [−12, 11] — one-hot
    combined (integer-offset × phase-filter) weights, no gathers."""
    n = w2f.shape[0]
    nsb = s // 4
    m2 = s + 2 * M2
    filt = LUMA_FILTERS

    def weights(q):
        off = q >> 2                                    # [−3..2]
        fy = q & 3
        ft = [sum((fy == f).astype(jnp.float32) * float(filt[f, t])
                  for f in range(4)) for t in range(8)]
        W = []
        for kp in range(2 * M2 + 1):
            acc = None
            for o in range(-3, 3):
                t = kp - o - 3
                if 0 <= t <= 7:
                    term = (off == o).astype(jnp.float32) * ft[t]
                    acc = term if acc is None else acc + term
            W.append(acc if acc is not None
                     else jnp.zeros_like(ft[0]))
        return W                                        # list of [n,v,u]

    Wy = weights(qy)
    Wx = weights(qx)
    r = jnp.zeros((n, nsb, nsb, 4, m2), jnp.float32)
    for kp in range(2 * M2 + 1):
        sl = w2f[:, kp:kp + s, :].reshape(n, nsb, 4, m2)
        r = r + Wy[kp][:, :, :, None, None] * sl[:, :, None, :, :]
    cols = []
    for u in range(nsb):
        pu = jnp.zeros((n, nsb, 4, 4), jnp.float32)
        for kp in range(2 * M2 + 1):
            pu = pu + Wx[kp][:, :, u, None, None] \
                * r[:, :, u, :, 4 * u + kp:4 * u + kp + 4]
        cols.append(pu)
    pred = jnp.stack(cols, axis=2).transpose(0, 1, 3, 2, 4) \
        .reshape(n, s, s)
    return jnp.clip(jnp.round(pred / 4096.0), 0,
                    (1 << bit_depth) - 1).astype(jnp.int32)


# --------------------------------------------------------------------
# standalone ME + prediction (MCTF consumer) on the window engine
# --------------------------------------------------------------------

@partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def me_pred_v2(cur, refpad, coarse16, w: int, h: int, bit_depth: int,
               lam_m):
    """Single-ref 16×16 ME + qpel prediction + per-block MSE (consumer:
    vvc.enc.mctf).  cur [H,W] int32, refpad the PAD-padded ref, coarse16
    [nc_y, nc_x, 2] full-pel grid.  Returns (pred plane [ny*16, nx*16],
    err [ny, nx] f32)."""
    s = 16
    ny, nx = h // s, w // s
    blocks = (cur[:ny * s, :nx * s].reshape(ny, s, nx, s)
              .transpose(0, 2, 1, 3).reshape(-1, s, s)).astype(jnp.int32)
    xs = (jnp.tile(jnp.arange(nx), ny) * s).astype(jnp.int32)
    ys = (jnp.repeat(jnp.arange(ny), nx) * s).astype(jnp.int32)
    nc_y, nc_x = coarse16.shape[0], coarse16.shape[1]
    giy = jnp.minimum(jnp.repeat(jnp.arange(ny), nx), nc_y - 1)
    gix = jnp.minimum(jnp.tile(jnp.arange(nx), ny), nc_x - 1)
    cy = coarse16[giy, gix, 0]
    cx = coarse16[giy, gix, 1]
    cy, cx, sy, sx = _win_centers(cy, cx, ys, xs, h, w, s)
    win = _gather_windows(refpad, sy, sx, s + 2 * WIN_M)
    res = _eval_from_win(win, blocks, cy, cx, lam_m, s, bit_depth)
    pred = res["pred"]
    d = (pred - blocks).astype(jnp.float32)
    err = (d * d).mean(axis=(1, 2)).reshape(ny, nx)
    plane = (pred.reshape(ny, nx, s, s).transpose(0, 2, 1, 3)
             .reshape(ny * s, nx * s))
    return plane, err
