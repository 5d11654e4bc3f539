"""Adaptive Loop Filter — symmetric diamond Wiener filter application.

TPU-native analog of the reference's ALF
(`/root/reference/source/Lib/CommonLib/AdaptiveLoopFilter.cpp` →
ALFProcess / filterBlk (7×7 diamond luma, 5×5 chroma); OpenVVC
libovvc/rcn_alf.c).  SURVEY.md §2.2: "filter = depthwise conv"; here the
difference-form filter

    out = curr + ( Σ_i c_i · (n_a(i) + n_b(i) − 2·curr) + 64 ) >> 7

is a stack of shifted adds — pure VPU work, vectorized whole-plane.
(n_a, n_b) are the point-symmetric tap pairs of the diamond; c_i are
7-bit-scaled integers solved by least squares on (orig − rec)
(vvc.enc.alf_enc).

Classified ALF (reference: AdaptiveLoopFilter::deriveClassification +
filterBlk): per-4×4 Laplacian gradient classification into 25 classes
(5 direction × 5 activity) with a per-block geometric transpose (4
transforms acting as static permutations of the symmetric tap pairs),
per-class filters with class→filter merging, and nonlinear clipping of
the neighbour differences (uniform per-filter clip level — the spec's
per-tap clip indices are simplified [verify]).  Everything is
whole-plane vectorized: Laplacians are shifted adds, the 8×8 window sums
ride an integral image, per-pixel filter/transpose selection is a gather.

Remaining simplifications [verify]: coefficients ride the slice header
(APS NAL transport later), dense Laplacian positions (the spec
subsamples 2×), edge-replicate padding.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

ALF_SHIFT = 7  # coefficient scale 1<<7


@lru_cache(maxsize=None)
def diamond_pairs(radius: int):
    """Point-symmetric tap pairs of a (2r+1) diamond, excluding center.

    Returns tuple of ((dy, dx), (-dy, -dx)) with one canonical member per
    pair.  radius 3 → 12 pairs (7×7 luma), radius 2 → 6 pairs (5×5 chroma).
    """
    pairs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if abs(dy) + abs(dx) == 0 or abs(dy) + abs(dx) > radius:
                continue
            if (dy, dx) > (-dy, -dx):
                continue
            pairs.append(((dy, dx), (-dy, -dx)))
    return tuple(pairs)


def _shift(plane: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Edge-replicate shifted view."""
    h, w = plane.shape
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return plane[ys[:, None], xs[None, :]]


def pair_features(rec: np.ndarray, radius: int) -> np.ndarray:
    """[n_pairs, H, W] difference features (n_a + n_b − 2·curr), int32.
    One edge pad + pure slices (no index gathers)."""
    r32 = rec.astype(np.int32)
    h, w = rec.shape
    p = np.pad(r32, radius, mode="edge")
    feats = np.empty((len(diamond_pairs(radius)), h, w), dtype=np.int32)
    for i, ((ady, adx), (bdy, bdx)) in enumerate(diamond_pairs(radius)):
        na = p[radius + ady:radius + ady + h, radius + adx:radius + adx + w]
        nb = p[radius + bdy:radius + bdy + h, radius + bdx:radius + bdx + w]
        np.subtract(na + nb, 2 * r32, out=feats[i])
    return feats


def alf_delta(rec: np.ndarray, coeffs, radius: int,
              feats: np.ndarray | None = None) -> np.ndarray:
    """Integer filter delta for the whole plane (before CTU gating)."""
    if feats is None:
        feats = pair_features(rec, radius)
    c = np.asarray(coeffs, dtype=np.int64)
    acc = np.tensordot(c, feats.astype(np.int64), axes=1)
    acc += 1 << (ALF_SHIFT - 1)
    return (acc >> ALF_SHIFT).astype(np.int32)


# ---------------------------------------------------------------------------
# 25-class gradient classification (reference: deriveClassificationBlk)
# ---------------------------------------------------------------------------

# activity → Â table (reference: AdaptiveLoopFilter th[] shape)
_ACT_TAB = np.array([0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4],
                    dtype=np.int32)
# (mainDir*2 + (secondaryDir>>1)) → transposeIdx (reference transposeTable)
_TRANSPOSE_TAB = np.array([0, 1, 0, 2, 2, 3, 1, 3], dtype=np.int32)


def _box4(lap: np.ndarray, h4: int, w4: int) -> np.ndarray:
    """8×8 window sums at 4×4 stride (window centered on each 4×4 block,
    ±2 sample margin) via integral image.  lap covers samples −1..H
    (one-sample halo); one more edge-replicated ring extends it to ±2."""
    p = np.pad(lap, 1, mode="edge")
    ii = np.pad(np.cumsum(np.cumsum(p, 0), 1), ((1, 0), (1, 0)))
    ys = np.arange(h4) * 4
    xs = np.arange(w4) * 4
    y1 = ys + 8
    x1 = xs + 8
    return (ii[y1[:, None], x1[None, :]] - ii[y1[:, None], xs[None, :]]
            - ii[ys[:, None], x1[None, :]] + ii[ys[:, None], xs[None, :]])


def _native_lib():
    try:
        from vvc.packer import recon_lib
        return recon_lib()
    except Exception:
        return None


def alf_classify(rec: np.ndarray, bit_depth: int = 8):
    """Dispatch: native C++ classification when built (bit-exact mirror,
    test-enforced), numpy otherwise."""
    lib = _native_lib()
    if lib is not None:
        import ctypes
        h, w = rec.shape
        h4, w4 = h // 4, w // 4
        cls = np.empty((h4, w4), np.int32)
        tr = np.empty((h4, w4), np.int32)
        r = np.ascontiguousarray(rec, dtype=np.int32)
        lib.alf_classify_c(r.ctypes.data_as(ctypes.c_void_p), h, w,
                           bit_depth, cls.ctypes.data_as(ctypes.c_void_p),
                           tr.ctypes.data_as(ctypes.c_void_p))
        return cls, tr
    return alf_classify_np(rec, bit_depth)


def alf_classify_np(rec: np.ndarray, bit_depth: int = 8):
    """Per-4×4 (class_idx [H/4,W/4] 0..24, transpose_idx [H/4,W/4] 0..3).

    Laplacian gradients in 4 directions over an 8×8 window per block;
    direction from the HV/diagonal dominance ratios (thresholds 2 and
    4.5, reference shape), activity from (sumV+sumH) quantized to 5
    levels.  [verify] exact spec subsampling/shift once the mount has
    the reference."""
    r = rec.astype(np.int32)
    h, w = r.shape
    h4, w4 = h // 4, w // 4
    p = np.pad(r, 2, mode="edge")
    c = p[1:-1, 1:-1]
    lv = np.abs(2 * c - p[:-2, 1:-1] - p[2:, 1:-1])
    lh = np.abs(2 * c - p[1:-1, :-2] - p[1:-1, 2:])
    ld0 = np.abs(2 * c - p[:-2, :-2] - p[2:, 2:])
    ld1 = np.abs(2 * c - p[:-2, 2:] - p[2:, :-2])
    sv = _box4(lv, h4, w4)
    sh = _box4(lh, h4, w4)
    s0 = _box4(ld0, h4, w4)
    s1 = _box4(ld1, h4, w4)
    hv1 = np.maximum(sv, sh)
    hv0 = np.minimum(sv, sh)
    dir_hv = np.where(sv > sh, 1, 3)
    d1 = np.maximum(s0, s1)
    d0 = np.minimum(s0, s1)
    dir_d = np.where(s0 > s1, 0, 2)
    hv_stronger = hv1 * d0 > d1 * hv0
    hvd1 = np.where(hv_stronger, hv1, d1)
    hvd0 = np.where(hv_stronger, hv0, d0)
    main_dir = np.where(hv_stronger, dir_hv, dir_d)
    sec_dir = np.where(hv_stronger, dir_d, dir_hv)
    strength = np.where(2 * hvd1 > 9 * hvd0, 2,
                        np.where(hvd1 > 2 * hvd0, 1, 0))
    act = np.clip(((sv + sh) * 64) >> (4 + bit_depth), 0, 15)
    cls = _ACT_TAB[act]
    cls = cls + np.where(strength > 0,
                         (((main_dir & 1) << 1) + strength) * 5, 0)
    tr = _TRANSPOSE_TAB[main_dir * 2 + (sec_dir >> 1)]
    return cls.astype(np.int32), tr.astype(np.int32)


@lru_cache(maxsize=None)
def pair_transpose_perms(radius: int) -> np.ndarray:
    """[4, n_pairs] permutation: perm[t, i] = canonical pair index of the
    t-transformed offset of pair i (transforms: none, diagonal flip,
    vertical flip, rotation — the reference's geometric transforms acting
    on the point-symmetric pair set)."""
    pairs = diamond_pairs(radius)
    rep = {p[0]: i for i, p in enumerate(pairs)}

    def canon(dy, dx):
        return rep[(dy, dx)] if (dy, dx) in rep else rep[(-dy, -dx)]

    tf = (lambda dy, dx: (dy, dx), lambda dy, dx: (dx, dy),
          lambda dy, dx: (-dy, dx), lambda dy, dx: (dx, -dy))
    out = np.empty((4, len(pairs)), dtype=np.int32)
    for t, f in enumerate(tf):
        for i, ((dy, dx), _) in enumerate(pairs):
            out[t, i] = canon(*f(dy, dx))
    return out


def alf_delta_classified(rec, coeffs, clips, fmap, cls4, tr4,
                         radius: int = 3) -> np.ndarray:
    """Dispatch: native C++ classified delta when built, numpy otherwise."""
    lib = _native_lib()
    if lib is not None and radius == 3:
        import ctypes
        h, w = rec.shape
        pairs = np.asarray([(a[0], a[1], b[0], b[1])
                            for a, b in diamond_pairs(radius)], np.int32)
        perms = np.ascontiguousarray(pair_transpose_perms(radius), np.int32)
        r = np.ascontiguousarray(rec, np.int32)
        cf = np.ascontiguousarray(coeffs, np.int32)
        cl = np.ascontiguousarray(clips, np.int32)
        fm = np.ascontiguousarray(fmap, np.int32)
        c4 = np.ascontiguousarray(cls4, np.int32)
        t4 = np.ascontiguousarray(tr4, np.int32)
        out = np.empty((h, w), np.int32)
        p = ctypes.c_void_p
        lib.alf_delta_classified_c(
            r.ctypes.data_as(p), h, w, cf.ctypes.data_as(p),
            cl.ctypes.data_as(p), cf.shape[0], fm.ctypes.data_as(p),
            c4.ctypes.data_as(p), t4.ctypes.data_as(p),
            pairs.ctypes.data_as(p), perms.ctypes.data_as(p),
            pairs.shape[0], out.ctypes.data_as(p))
        return out
    return alf_delta_classified_np(rec, coeffs, clips, fmap, cls4, tr4,
                                   radius)


def alf_delta_classified_np(rec: np.ndarray, coeffs: np.ndarray,
                            clips: np.ndarray, fmap: np.ndarray,
                            cls4: np.ndarray, tr4: np.ndarray,
                            radius: int = 3) -> np.ndarray:
    """Classified, clipped filter delta for the whole plane (numpy).

    coeffs [nf, n_pairs] int32 (1<<7 scale); clips [nf] int32 clip bound
    per filter (0 = no clipping); fmap [25] class→filter; cls4/tr4 from
    alf_classify.  Per-pixel coefficient/clip selection is a gather;
    features are clip(n_a−curr)+clip(n_b−curr)."""
    h, w = rec.shape
    r32 = rec.astype(np.int32)
    p = np.pad(r32, radius, mode="edge")
    fidx = fmap[cls4]                                   # [h4, w4]
    fpx = np.repeat(np.repeat(fidx, 4, 0), 4, 1)[:h, :w]
    tpx = np.repeat(np.repeat(tr4, 4, 0), 4, 1)[:h, :w]
    perms = pair_transpose_perms(radius)                # [4, np]
    # clip 0 = off → sentinel bound that never clips (uniform fast path)
    big = np.int32(1 << 12)   # > any |sample diff| at <=10-bit; keeps
                              # the int32 accumulator far from overflow
    bpx = np.where(clips[fpx] > 0, clips[fpx], big)     # [H, W]
    # int32 accumulator: |c| <= 127, |clipped diff sum| <= 2^(bd+1),
    # 12 taps -> < 2^23 at 10-bit — no overflow
    acc = np.full((h, w), 1 << (ALF_SHIFT - 1), dtype=np.int32)
    pairs = diamond_pairs(radius)
    # per-pixel coefficient for tap i = coeffs[fpx, perms[tpx, i]]
    for i, ((ady, adx), (bdy, bdx)) in enumerate(pairs):
        na = p[radius + ady:radius + ady + h, radius + adx:radius + adx + w]
        nb = p[radius + bdy:radius + bdy + h, radius + bdx:radius + bdx + w]
        da = np.clip(na - r32, -bpx, bpx)
        db = np.clip(nb - r32, -bpx, bpx)
        ci = coeffs[fpx, perms[tpx, i]]
        acc += ci * (da + db)
    return acc >> ALF_SHIFT


def apply_delta_gated(plane: np.ndarray, delta: np.ndarray, bit_depth: int,
                      ctu_flags=None, ctu_size: int = 0):
    """Apply a precomputed filter delta in place with per-CTU gating
    (the encoder reuses the delta its decision pass already computed)."""
    maxv = (1 << bit_depth) - 1
    if ctu_flags is None:
        plane[:] = np.clip(plane + delta, 0, maxv)
        return
    h, w = plane.shape
    for (x0, y0), on in ctu_flags.items():
        if not on or x0 >= w or y0 >= h:
            continue
        sl = np.s_[y0:min(y0 + ctu_size, h), x0:min(x0 + ctu_size, w)]
        plane[sl] = np.clip(plane[sl] + delta[sl], 0, maxv)


def apply_alf_classified(plane: np.ndarray, coeffs, clips, fmap, bit_depth,
                         ctu_flags=None, ctu_size: int = 0, cls4=None,
                         tr4=None):
    """Apply classified luma ALF in place with per-CTU gating."""
    if cls4 is None:
        cls4, tr4 = alf_classify(plane, bit_depth)
    delta = alf_delta_classified(plane, np.asarray(coeffs, np.int32),
                                 np.asarray(clips, np.int32),
                                 np.asarray(fmap, np.int32), cls4, tr4)
    maxv = (1 << bit_depth) - 1
    if ctu_flags is None:
        plane[:] = np.clip(plane + delta, 0, maxv)
        return
    h, w = plane.shape
    for (x0, y0), on in ctu_flags.items():
        if not on or x0 >= w or y0 >= h:
            continue
        sl = np.s_[y0:min(y0 + ctu_size, h), x0:min(x0 + ctu_size, w)]
        plane[sl] = np.clip(plane[sl] + delta[sl], 0, maxv)


def apply_alf_plane(plane: np.ndarray, coeffs, radius: int, bit_depth: int,
                    ctu_flags=None, ctu_size: int = 0, delta=None):
    """Apply ALF in place; ctu_flags {(x0,y0): bool} gates per-CTU regions
    (None → whole plane)."""
    if delta is None:
        delta = alf_delta(plane, coeffs, radius)
    maxv = (1 << bit_depth) - 1
    if ctu_flags is None:
        plane[:] = np.clip(plane + delta, 0, maxv)
        return
    h, w = plane.shape
    for (x0, y0), on in ctu_flags.items():
        if not on or x0 >= w or y0 >= h:
            continue
        sl = np.s_[y0:min(y0 + ctu_size, h), x0:min(x0 + ctu_size, w)]
        plane[sl] = np.clip(plane[sl] + delta[sl], 0, maxv)


# ------------------------------------------------------------------
# device-side encoder statistics (VERDICT r4 task 7): per-(class,
# transpose) covariance accumulation as a lax.scan of masked matmuls —
# replaces the numpy float64 feature/segment pass (~1.5 s/frame @1080p)
# ------------------------------------------------------------------

def alf_stats_dev(o, r, cls4, tr4):
    """o/r [H,W] int32 device, cls4/tr4 [ceil(H/4),ceil(W/4)] int32.

    Returns device (A100 [100,12,12] f32, B100 [100,12] f32,
    sse0 [25] f32, npx [25] f32) — raw per-(class*4+transpose) normal
    equations on the 2×2-subsampled grid; host applies the transpose
    permutations and the ×4 full-plane rescale."""
    import jax
    global _ALF_STATS_JIT
    if _ALF_STATS_JIT is None:
        _ALF_STATS_JIT = jax.jit(_alf_stats_impl)
    return _ALF_STATS_JIT(o, r, cls4, tr4)


_ALF_STATS_JIT = None


def _alf_stats_impl(o, r, cls4, tr4):
    import jax
    import jax.numpy as jnp
    h, w = o.shape
    hs, ws = (h + 1) // 2, (w + 1) // 2
    rad = 3
    pairs = diamond_pairs(rad)
    p = jnp.pad(r, rad, mode="edge")
    feats = []
    for (ady, adx), (bdy, bdx) in pairs:
        na = p[rad + ady:rad + ady + h:2, rad + adx:rad + adx + w:2]
        nb = p[rad + bdy:rad + bdy + h:2, rad + bdx:rad + bdx + w:2]
        feats.append((na + nb - 2 * r[::2, ::2]).astype(jnp.float32))
    F = jnp.stack([f.reshape(-1) for f in feats])          # [12, P]
    t = (o - r)[::2, ::2].astype(jnp.float32).reshape(-1)  # [P]
    cls_px = jnp.repeat(jnp.repeat(cls4, 2, 0), 2, 1)[:hs, :ws]
    tr_px = jnp.repeat(jnp.repeat(tr4, 2, 0), 2, 1)[:hs, :ws]
    key = (cls_px * 4 + tr_px).reshape(-1)

    def body(_, g):
        m = (key == g).astype(jnp.float32)
        Fw = F * m[None, :]
        A = Fw @ F.T
        B = Fw @ t
        return None, (A, B)

    _, (A100, B100) = jax.lax.scan(body, None, jnp.arange(100))

    def body25(_, c):
        m = (cls_px.reshape(-1) == c).astype(jnp.float32)
        return None, ((t * t * m).sum(), m.sum())

    _, (sse0, npx) = jax.lax.scan(body25, None, jnp.arange(25))
    return A100, B100, sse0, npx
