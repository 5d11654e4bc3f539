"""Generate the MIP weight table embedded in vvc/rom/mip_mats.py.

Our MIP analog (reference: CommonLib/MatrixIntraPrediction.cpp +
MipData.h — whose weights are trained constants we cannot and must not
copy) derives its matrices ANALYTICALLY as LMMSE predictors under an
anisotropic first-order Gauss-Markov image model:

    cov(p, q) = rho ** d_theta(p, q)
    d_theta   = sqrt((du/1)^2 + (dv/eps)^2),  (u,v) = coords rotated by theta

Mode 0 is the isotropic model (eps=1, a smooth planar-like predictor);
modes 1..8 are 8 orientations (theta = k * 22.5deg) with eps = 0.3 —
strong correlation along the orientation, weak across.  All geometry
lives in the REDUCED 8x8 grid (4 top + 4 left pooled boundary samples),
so ONE [K, 64, 8] table serves every block size; only the surrounding
pool/upsample differs per size.

Weights are mean-removed (predict b - mean(b), add mean back) and
quantized to int8 with a 6-bit fraction.  Run this script to regenerate
the literal in vvc/rom/mip_mats.py; it is checked in so encoder and
decoder share bit-identical constants with no runtime linear algebra.
"""
import base64
import zlib

import numpy as np

RHO = 0.92
EPS = 0.30
K_MODES = 9
SHIFT = 6


def positions():
    # reduced-pred samples (i, j) -> (x=j, y=i); boundary: 4 top at
    # (2k+0.5, -1), 4 left at (-1, 2k+0.5) — centers of the pooled segments
    pred = [(float(j), float(i)) for i in range(8) for j in range(8)]
    bnd = [(2 * k + 0.5, -1.0) for k in range(4)] + \
          [(-1.0, 2 * k + 0.5) for k in range(4)]
    return np.array(pred), np.array(bnd)


def cov(pa, pb, theta, eps):
    c, s = np.cos(theta), np.sin(theta)
    dx = pa[:, None, 0] - pb[None, :, 0]
    dy = pa[:, None, 1] - pb[None, :, 1]
    du = c * dx + s * dy
    dv = -s * dx + c * dy
    d = np.sqrt(du ** 2 + (dv / eps) ** 2)
    return RHO ** d


def derive():
    pred, bnd = positions()
    tables = []
    # mean-removal projector on the boundary: b_c = (I - 1 1^T / 8) b
    P = np.eye(8) - np.ones((8, 8)) / 8.0
    for k in range(K_MODES):
        if k == 0:
            theta, eps = 0.0, 1.0
        else:
            theta, eps = (k - 1) * np.pi / 8.0, EPS
        cxb = cov(pred, bnd, theta, eps)          # [64, 8]
        cbb = cov(bnd, bnd, theta, eps)           # [8, 8]
        # LMMSE on centered boundary; ridge for conditioning
        w = cxb @ np.linalg.solve(cbb + 1e-3 * np.eye(8), np.eye(8))
        w = w @ P                                 # mean-removed input
        tables.append(w)
    wq = np.round(np.stack(tables) * (1 << SHIFT)).astype(np.int64)
    wq = np.clip(wq, -127, 127).astype(np.int8)
    return wq


def main():
    wq = derive()
    blob = base64.b64encode(zlib.compress(wq.tobytes(), 9)).decode()
    print(f"# shape ({K_MODES}, 64, 8) int8, shift {SHIFT}")
    print(f"K_MIP_MODES = {K_MODES}")
    print(f"MIP_SHIFT = {SHIFT}")
    print('_BLOB = (')
    for i in range(0, len(blob), 72):
        print(f'    "{blob[i:i+72]}"')
    print(')')
    # quick sanity: predict a directional ramp from its boundary
    for k in range(K_MODES):
        w = wq[k].astype(np.int64)
        # synthetic boundary: 45-degree ramp
        b = np.array([10, 20, 30, 40, 10, 20, 30, 40], dtype=np.int64)
        m = (b.sum() + 4) >> 3
        p = ((w @ (b - m)) + 32 >> 6) + m
        print(f"# mode {k}: pred range {p.min()}..{p.max()}")


if __name__ == "__main__":
    main()
