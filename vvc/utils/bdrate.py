"""BD-rate / BD-PSNR computation (Bjøntegaard delta, piecewise-cubic).

In-repo replacement for the reference's external CTC Excel template
(SURVEY.md §4 item 3: VTM evaluates quality via BD-rate spreadsheets under
doc/; nothing in-tree computes it).  Standard method: fit PSNR↔log(rate)
with a cubic through the 4 CTC QP points, integrate the difference over
the overlapping interval.
"""
from __future__ import annotations

import numpy as np


def _pchip_area(x: np.ndarray, y: np.ndarray, lo: float, hi: float) -> float:
    """Integrate the cubic polynomial fit of y(x) over [lo, hi]."""
    coeffs = np.polyfit(x, y, min(3, len(x) - 1))
    poly_int = np.polyint(coeffs)
    return float(np.polyval(poly_int, hi) - np.polyval(poly_int, lo))


def bd_rate(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-rate in percent (negative = test saves bits at equal quality)."""
    la = np.log10(np.asarray(rate_anchor, dtype=np.float64))
    lt = np.log10(np.asarray(rate_test, dtype=np.float64))
    pa = np.asarray(psnr_anchor, dtype=np.float64)
    pt = np.asarray(psnr_test, dtype=np.float64)
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        raise ValueError("PSNR ranges do not overlap")
    ia = _pchip_area(pa, la, lo, hi)
    it = _pchip_area(pt, lt, lo, hi)
    avg = (it - ia) / (hi - lo)
    return float((10.0 ** avg - 1.0) * 100.0)


def bd_psnr(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-PSNR in dB (positive = test better at equal rate)."""
    la = np.log10(np.asarray(rate_anchor, dtype=np.float64))
    lt = np.log10(np.asarray(rate_test, dtype=np.float64))
    pa = np.asarray(psnr_anchor, dtype=np.float64)
    pt = np.asarray(psnr_test, dtype=np.float64)
    lo = max(la.min(), lt.min())
    hi = min(la.max(), lt.max())
    if hi <= lo:
        raise ValueError("rate ranges do not overlap")
    ia = _pchip_area(la, pa, lo, hi)
    it = _pchip_area(lt, pt, lo, hi)
    return float((it - ia) / (hi - lo))
