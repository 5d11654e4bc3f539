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

Round-1 simplifications [verify]: single class (no 4×4 gradient
classification / 25 classes), no clipping (VVC nonlinear ALF), coefficients
carried in the slice header (APS lands later), edge-replicate padding.
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
