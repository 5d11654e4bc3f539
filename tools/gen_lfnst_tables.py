"""Generate the LFNST kernel table embedded in vvc/rom/lfnst_mats.py.

Our LFNST analog (reference: CommonLib/TrQuant.cpp -> xFwdLfnst/xInvLfnst,
kernels in LowFreqNonSep.cpp -- whose 4x2 non-separable matrices are
TRAINED constants we cannot and must not copy) derives its kernels
ANALYTICALLY as truncated KLTs of a directional residual model:

  1. Model the post-prediction residual on an 8x8 spatial grid as an
     anisotropic first-order Gauss-Markov field.  Directional intra
     prediction removes correlation ALONG the prediction direction, so
     the residual stays correlated ACROSS it: each mode set g gets a
     covariance oriented PERPENDICULAR to its prediction direction.
  2. Map to the primary-transform domain:  Sc = (C8 (x) C8) Ss (.)^T
     with C8 the orthonormal 8-pt DCT-II (the separable primary).
  3. Eigendecompose Sc and keep the top 16 eigenvectors: the 16x64
     non-separable rotation that concentrates the modelled residual's
     energy into 16 secondary coefficients.

Two kernels per set (lfnst_idx 1/2) come from two model sharpnesses
(rho): smooth residuals favour kernel 1, busier ones kernel 2 -- the
encoder RD-searches both, mirroring the reference's 2-candidate design.

Kernels are quantized to int8 with a 6-bit fraction (rows of an
orthonormal matrix are unit vectors, so x64 fits comfortably).  Run this
script to regenerate the literal in vvc/rom/lfnst_mats.py; it is checked
in so encoder and decoder share bit-identical constants.
"""
import base64
import zlib

import numpy as np

SHIFT = 6
N_SETS = 4       # mode-classed transform sets (planar/DC, horiz, diag, vert)
N_KERNELS = 2    # lfnst_idx in {1, 2}
N_OUT = 16       # secondary coefficients kept
EPS = 0.35       # anisotropy of the directional residual model
RHOS = (0.95, 0.75)   # kernel 1: smooth model; kernel 2: sharp model
# residual correlation orientation per set: perpendicular to the set's
# prediction direction (set 0 isotropic)
THETAS = (0.0, np.pi / 2, 3 * np.pi / 4, 0.0)
ISO = (True, False, False, False)


def dct2_orthonormal(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * x + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def spatial_cov(theta: float, eps: float, rho: float) -> np.ndarray:
    ys, xs = np.mgrid[0:8, 0:8]
    p = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)  # [64, 2]
    c, s = np.cos(theta), np.sin(theta)
    dx = p[:, None, 0] - p[None, :, 0]
    dy = p[:, None, 1] - p[None, :, 1]
    du = c * dx + s * dy
    dv = -s * dx + c * dy
    d = np.sqrt(du ** 2 + (dv / eps) ** 2)
    return rho ** d


def derive() -> np.ndarray:
    c8 = dct2_orthonormal(8)
    t = np.kron(c8, c8)                       # vec(C X C^T) = (C (x) C) vec(X)
    out = np.empty((N_SETS, N_KERNELS, N_OUT, 64), dtype=np.int8)
    for g in range(N_SETS):
        for ki, rho in enumerate(RHOS):
            eps = 1.0 if ISO[g] else EPS
            sc = t @ spatial_cov(THETAS[g], eps, rho) @ t.T
            w_, v = np.linalg.eigh(sc)        # ascending
            b = v[:, ::-1][:, :N_OUT].T       # top eigvecs as rows [16, 64]
            # deterministic sign: largest-magnitude entry positive
            sgn = np.sign(b[np.arange(N_OUT), np.argmax(np.abs(b), axis=1)])
            b = b * sgn[:, None]
            q = np.clip(np.round(b * (1 << SHIFT)), -127, 127)
            out[g, ki] = q.astype(np.int8)
    return out


def main():
    q = derive()
    blob = base64.b64encode(zlib.compress(q.tobytes(), 9)).decode()
    print(f"# shape ({N_SETS}, {N_KERNELS}, {N_OUT}, 64) int8, shift {SHIFT}")
    print(f"LFNST_SHIFT = {SHIFT}")
    print('_BLOB = (')
    for i in range(0, len(blob), 72):
        print(f'    "{blob[i:i+72]}"')
    print(')')
    # sanity: inverse(forward) on a smooth coefficient block stays close
    rng = np.random.default_rng(0)
    for g in range(N_SETS):
        b = q[g, 0].astype(np.int64)
        c = (rng.standard_normal((8, 8)) * 50 / (1 + np.add.outer(
            np.arange(8), np.arange(8)))).astype(np.int64).ravel()
        y = (b @ c + 32) >> SHIFT
        r = (b.T @ y + 32) >> SHIFT
        err = np.abs(r - c).max()
        print(f"# set {g}: max roundtrip err {err} (coeff scale ~50)")


if __name__ == "__main__":
    main()
