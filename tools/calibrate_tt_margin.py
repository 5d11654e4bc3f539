"""Calibrate TT_MARGIN_BITS from measured BD-rate A/Bs.

The MTT DP's TT candidates carry a margin (vvc/enc/rdo.py TT_MARGIN_BITS)
compensating the estimator's realization gap: the DP cost is a luma-only
leaf proxy, and TT mid leaves forfeit ISP/4-way-chroma/further-splitting
at realization.  Rather than hand-tune the constant, this tool MEASURES
the TT-on-vs-off BD-rate across a margin sweep on two content classes:

  * tt-friendly: 16-high textured bands at the TT_H mid-child offset
    (the geometry TT exists for; tests/test_mtt.py uses the same)
  * neutral: smooth gradients + noise with no TT-aligned structure
    (where spurious TT picks would hurt)

and prints the smallest margin whose BD-rate is <= 0 on BOTH.  Re-run
after any quality-touching change (deblocking, transforms, rate model):
the r3 regression (VERDICT r3 weak #3) was exactly a stale margin after
the BS-derivation change shifted recon quality.

Usage: python tools/calibrate_tt_margin.py [margin margin ...]
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def tt_friendly_frame(seed=11, H=128, W=128):
    rng = np.random.default_rng(seed)
    y = np.full((H, W), 90, np.int32)
    for by in range(0, H, 32):
        for bx in range(0, W, 32):
            y[by:by + 32, bx:bx + 32] = rng.integers(60, 120)
            y[by + 8:by + 24, bx:bx + 32] = rng.integers(140, 220, (16, 32))
    return y.clip(0, 255).astype(np.int32)


def neutral_frame(seed=3, H=128, W=128):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    y = (128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
         + rng.normal(0, 6, (H, W)))
    return y.clip(0, 255).astype(np.int32)


def curves(frames, tt_on, qps=(22, 27, 32, 37)):
    from vvc.enc.encoder import encode_sequence
    import vvc.enc.rdo as rdo
    old = rdo.TT_IN_SEARCH
    rdo.TT_IN_SEARCH = tt_on
    try:
        rs, ps = [], []
        for qp in qps:
            bs, recons, stats = encode_sequence(frames, qp=qp, mode="ai",
                                                mtt=True)
            rs.append(sum(s["bits"] for s in stats))
            ps.append(np.mean([s["psnr_y"] for s in stats]))
        return rs, ps
    finally:
        rdo.TT_IN_SEARCH = old


def main():
    from vvc.io.yuv import Frame
    from vvc.utils.bdrate import bd_rate
    import vvc.enc.rdo as rdo

    margins = [float(a) for a in sys.argv[1:]] or [0, 2, 4, 6, 8, 12]
    contents = {}
    for name, y in (("tt-friendly", tt_friendly_frame()),
                    ("neutral", neutral_frame())):
        H, W = y.shape
        cb = np.full((H // 2, W // 2), 128, np.int32)
        cr = np.full((H // 2, W // 2), 128, np.int32)
        contents[name] = [Frame(y, cb, cr, 8)]

    base = {n: curves(f, False) for n, f in contents.items()}
    results = {}
    for m in margins:
        rdo.TT_MARGIN_BITS = m
        bds = {}
        for n, f in contents.items():
            on = curves(f, True)
            bds[n] = bd_rate(*base[n], *on)
        results[m] = bds
        print(f"margin={m:5.1f}  " + "  ".join(
            f"{n}: {bd:+.3f}%" for n, bd in bds.items()), flush=True)
    ok = [m for m, bds in results.items()
          if all(bd <= 0.0 for bd in bds.values())]
    if ok:
        print(f"-> smallest margin with bd<=0 everywhere: {min(ok)}")
    else:
        print("-> NO margin passes on all contents; realization gap needs "
              "a structural fix (ISP/chroma on mid leaves)")


if __name__ == "__main__":
    main()
