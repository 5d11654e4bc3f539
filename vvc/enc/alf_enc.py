"""ALF encoder: Wiener solve + per-CTU on/off RD decisions.

TPU-native analog of the reference's ALF encoder
(`/root/reference/source/Lib/EncoderLib/EncAdaptiveLoopFilter.cpp` →
deriveStatsForFiltering (covariances) / deriveFilterCoeffs (Cholesky
solve) / alfEncoderCtb (CTB on/off RD)).  The normal equations
  (F Fᵀ) c = F (orig − rec)
are accumulated over the whole picture — covariance reductions are the
device-friendly shape; the 12×12 solve is trivial host work.
"""
from __future__ import annotations

import numpy as np

from vvc.kernels.alf import pair_features, alf_delta, ALF_SHIFT
from vvc.enc.rdo import rd_lambda

MAX_COEFF = 127  # 7-bit signed (reference coefficient range)


def derive_alf_coeffs(orig: np.ndarray, rec: np.ndarray, radius: int,
                      feats=None):
    """Least-squares filter coefficients (int, 1<<7 scale), or None if the
    system is degenerate."""
    f = feats if feats is not None else pair_features(rec, radius)
    n = f.shape[0]
    fm = f.reshape(n, -1).astype(np.float32)
    t = (orig - rec).reshape(-1).astype(np.float32)
    a = (fm @ fm.T).astype(np.float64)
    b = (fm @ t).astype(np.float64)
    try:
        c = np.linalg.solve(a + np.eye(n) * 1e-3, b)
    except np.linalg.LinAlgError:
        return None
    ci = np.clip(np.round(c * (1 << ALF_SHIFT)), -MAX_COEFF, MAX_COEFF)
    if not np.any(ci):
        return None
    return ci.astype(np.int32)


def decide_alf_frame(orig_planes, recon_planes, qp: int, bit_depth: int,
                     ctu_size: int):
    """Returns (luma_coeffs|None, ctu_flags, chroma_coeffs|None) where
    ctu_flags {(x0,y0): bool}.  Chroma: one 5×5 filter shared by cb/cr,
    frame-level on/off."""
    lam = rd_lambda(qp)
    o, r = orig_planes[0], recon_planes[0]
    h, w = o.shape
    feats = pair_features(r, 3)
    coeffs = derive_alf_coeffs(o, r, 3, feats)
    flags = {}
    luma = None
    if coeffs is not None:
        delta = alf_delta(r, coeffs, 3, feats)
        filtered_err = (o.astype(np.int64) - np.clip(r + delta, 0, (1 << bit_depth) - 1)) ** 2
        plain_err = (o.astype(np.int64) - r) ** 2
        total_gain = 0.0
        for y0 in range(0, h, ctu_size):
            for x0 in range(0, w, ctu_size):
                sl = np.s_[y0:min(y0 + ctu_size, h), x0:min(x0 + ctu_size, w)]
                d = float(plain_err[sl].sum() - filtered_err[sl].sum())
                on = d > lam  # 1-bit flag cost
                flags[(x0, y0)] = on
                if on:
                    total_gain += d - lam
        if total_gain > lam * 12 * 8:  # coefficients cost ~12 se(v) codes
            luma = coeffs
        else:
            flags = {k: False for k in flags}
    else:
        for y0 in range(0, h, ctu_size):
            for x0 in range(0, w, ctu_size):
                flags[(x0, y0)] = False

    chroma = None
    oc = np.concatenate([orig_planes[1], orig_planes[2]], axis=0)
    rc = np.concatenate([recon_planes[1], recon_planes[2]], axis=0)
    cc = derive_alf_coeffs(oc, rc, 2)
    if cc is not None:
        d = alf_delta(rc, cc, 2)
        gain = float((((oc - rc) ** 2).sum()
                      - ((oc - np.clip(rc + d, 0, (1 << bit_depth) - 1)) ** 2).sum()))
        if gain > lam * 6 * 8:
            chroma = cc
    return luma, flags, chroma
