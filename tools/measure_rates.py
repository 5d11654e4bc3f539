"""Fit the LEVEL_BITS_TABLE in vvc.cabac.rates from actual coder output.

Runs this repo's own residual writer (vvc.cabac.residual.write_residual)
over quantized transform blocks and least-squares fits average bits per
level magnitude — the measured stand-in for the reference's per-context
estFracBits (CommonLib/Contexts.cpp).  Rerun after any residual-syntax or
context-table change and update vvc/cabac/rates.py.
"""
import numpy as np

from vvc.cabac.ctx import SliceContexts
from vvc.cabac.engine import BinEncoder
from vvc.cabac.residual import write_residual
from vvc.kernels.transform import fwd_transform_np
from vvc.kernels.quant import quant_np


def main(qp: int = 32, k: int = 10, seed: int = 0):
    rng = np.random.default_rng(seed)
    samples = []
    for amp in (5, 15, 40, 90):
        for _ in range(150):
            resi = rng.normal(0, amp, (8, 8)).astype(np.int32)
            lev = quant_np(fwd_transform_np(resi, 8, 0, 0), qp, 8, intra=True)
            if np.any(lev):
                samples.append(lev)
    ctxs = SliceContexts(qp)
    enc = BinEncoder()
    bits, prev = [], 0
    for lev in samples:
        write_residual(enc, ctxs, lev, True)
        bits.append(enc.bit_count - prev)
        prev = enc.bit_count
    bits = np.asarray(bits, dtype=np.float64)
    x = np.zeros((len(samples), k + 1))
    for i, lev in enumerate(samples):
        a = np.abs(lev).ravel()
        for j in range(k):
            x[i, j] = np.sum(a == j)
        big = a[a >= k]
        x[i, k] = (np.sum(2 * np.floor(np.log2(big - k + 2)) + 1)
                   if big.size else 0)
        x[i, k - 1] += np.sum(a >= k)
    coef, *_ = np.linalg.lstsq(x, bits, rcond=None)
    pred = x @ coef
    r2 = 1 - np.sum((bits - pred) ** 2) / np.sum((bits - bits.mean()) ** 2)
    print("level cost table 0..%d:" % (k - 1), np.round(coef[:k], 3))
    print("EG multiplier:", round(float(coef[k]), 3), " R2:", round(r2, 4))


if __name__ == "__main__":
    main()
