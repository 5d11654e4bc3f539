"""Measure average CABAC bits per syntax-element bin over a small corpus.

estFracBits analog for non-level syntax (reference:
`/root/reference/source/Lib/CommonLib/Contexts.cpp` →
BinProbModel_Std::estFracBits, consumed by the estimator CABACWriter):
the reference prices every RDO candidate's syntax bins from live context
state.  Our partition DP is global (enumerate-mask-reduce, SURVEY.md §7.0
tenet 2), so context state at a node is unknown until the tree is chosen;
instead we measure the *adapted average* -log2(p(bin)) per (family, bin)
over real encodes — the same methodology that produced the measured level
table in vvc/cabac/rates.py.

Run: python tools/measure_syntax_rates.py
Prints a python dict to paste into vvc/cabac/rates.py::SYNTAX_BITS.
"""
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vvc.cabac import ctx as ctxmod
from vvc.cabac.engine import BinEncoder

# idx -> family name
IDX2FAM = {}
for name, count in ctxmod.CTX_SETS:
    off = ctxmod._OFFSETS[name]
    for i in range(count):
        IDX2FAM[off + i] = name

ACC = defaultdict(lambda: [0.0, 0])  # (family, bin) -> [bits_sum, n]

def _make_probe(orig):
    def probed(self, bin_val, ctx):
        p1 = ctx.prob() / 32768.0
        p = p1 if bin_val else (1.0 - p1)
        fam = IDX2FAM.get(getattr(ctx, "_i", -1))
        if fam is not None:
            a = ACC[(fam, bin_val)]
            a[0] += -math.log2(max(p, 1e-6))
            a[1] += 1
        return orig(self, bin_val, ctx)
    return probed


def corpus():
    from vvc.io.yuv import Frame
    from vvc.io.synth import synth_frame
    rng = np.random.default_rng(7)
    H, W = 144, 176
    y = np.full((H, W), 128, np.int32)
    for r in range(0, H, 12):
        y[r:r + 2, :] = 40 + (r * 3) % 160
    for c in range(0, W, 16):
        y[:, c:c + 3] = 210 - (c * 2) % 120
    y = (y + rng.integers(-4, 5, (H, W))).clip(0, 255).astype(np.int32)
    cb = np.full((H // 2, W // 2), 120, np.int32)
    cr = np.full((H // 2, W // 2), 130, np.int32)
    bars = Frame(y, cb, cr, 8)
    return [bars, synth_frame(176, 144, 0)]


def main():
    BinEncoder.encode_bin = _make_probe(BinEncoder.encode_bin)
    from vvc.packer import native
    native.NativeBinEncoder.encode_bin = _make_probe(
        native.NativeBinEncoder.encode_bin)
    from vvc.enc.encoder import encode_sequence
    frames = corpus()
    import time
    for qp in (22, 32, 37):
        for i, f in enumerate(frames):
            t0 = time.time()
            encode_sequence([f], qp=qp, mode="ai", mtt=True, isp=True)
            print(f"# qp={qp} frame={i} {time.time()-t0:.1f}s", flush=True)
    out = {}
    for (fam, b), (s, n) in sorted(ACC.items()):
        out.setdefault(fam, {})[b] = (round(s / n, 3), n)
    for fam, d in out.items():
        print(f"  {fam!r}: " + repr({b: v[0] for b, v in sorted(d.items())})
              + f",   # n={ {b: v[1] for b, v in sorted(d.items())} }")


if __name__ == "__main__":
    main()
