"""Benchmark: north-star RA 1080p GOP16 encode throughput, full tool set.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Operating point = BASELINE.json config 3 (Random Access GOP16 1080p with
affine/DMVR/BDOF/ALF on) — the north-star metric.  All quality tools are
ON: MTT, ISP, dep-quant, LMCS, affine, MMVD, CIIP, DMVR, BDOF, ALF, SAO,
MCTF.  Baseline: VTM single-thread encodes RA 1080p at ~0.01–0.05 fps
(BASELINE.md, external-from-memory); anchor = 0.03 fps midpoint until VTM
can be measured locally (reference mount empty, SURVEY.md §0).  The
north-star target is 2× the anchor.

Extra keys ride the same JSON object: decode fps on the same stream, and
the r2 AI operating point (416×240 QP32, tools off) for cross-round
comparability.  VVC_BENCH=ai selects the old AI-only bench.

Uses the persistent XLA compilation cache (.jax_cache) — the first run
after a code change pays real compiles (~30 min at 1080p); later runs
reuse them.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

VTM_RA1080_ANCHOR_FPS = 0.03   # BASELINE.md, single thread (measure when possible)
VTM_AI_ANCHOR_FPS = 4.0        # r1/r2 anchor, 416x240 scaled


def bench_ai():
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    W, H, QP, F = 416, 240, 32, 8
    frames = [synth_frame(W, H, t) for t in range(F)]
    encode_sequence(frames, qp=QP)
    t0 = time.perf_counter()
    encode_sequence(frames, qp=QP)
    fps = F / (time.perf_counter() - t0)
    return {"metric": f"ai_encode_fps_{W}x{H}_qp{QP}",
            "value": round(fps, 4), "unit": "frames/s",
            "vs_baseline": round(fps / VTM_AI_ANCHOR_FPS, 4)}


def bench_ra1080():
    """North-star point: 17 frames = one REAL GOP16 (I + full hierarchy),
    multi-ref RPLs (2 per list — vvc/enc/gop.py), every tool on.
    VERDICT r3 weak #7: the 9-frame 'GOP16' measured an easier-than-CTC
    structure.  Per-phase host timings ride the JSON (vvc.utils.perf)."""
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence
    from vvc.dec.decoder import decode_stream
    from vvc.utils import perf
    W, H, QP, F = 1920, 1080, 32, 17
    tools = dict(qp=QP, mode="ra", gop_size=16, mtt=True, isp=True,
                 dep_quant=True, bdof=True, dmvr=True, lmcs=True,
                 affine=True, mmvd=True, ciip=True, mctf=True,
                 gpm=True, amvr=True, smvd=True, bcw=True, mrl=True)
    # warmup: the SAME 17-frame GOP16 structure — a gop_size=4 mini-run
    # does not compile every (slice-type, ref-count) program variant the
    # real GOP16 uses, so first-run compiles leaked into the timed
    # region (VERDICT r4 weak #2: ledgered 0.0493 vs driver 0.0294).
    # With a warm .jax_cache the warmup costs one encode pass, not the
    # compiles.
    frames = [synth_frame(W, H, t) for t in range(F)]
    encode_sequence(frames, **tools)
    perf.reset()
    t0 = time.perf_counter()
    bs, recons, stats = encode_sequence(frames, **tools)
    enc_fps = len(frames) / (time.perf_counter() - t0)
    phases = {k: round(v / len(frames), 3)
              for k, v in perf.totals().items()}
    t0 = time.perf_counter()
    decode_stream(bs)
    dec_fps = len(frames) / (time.perf_counter() - t0)
    out = {"metric": "ra_encode_fps_1080p_gop16_tools_on",
           "value": round(enc_fps, 4), "unit": "frames/s/chip",
           "vs_baseline": round(enc_fps / VTM_RA1080_ANCHOR_FPS, 4),
           "decode_fps_1080p": round(dec_fps, 3),
           "bits": sum(s["bits"] for s in stats),
           "mean_psnr_y": round(sum(s["psnr_y"] for s in stats)
                                / len(stats), 3),
           "n_frames": F,
           "phase_s_per_frame": phases}
    try:
        ai = bench_ai()
        out["ai_encode_fps_416x240_qp32"] = ai["value"]
    except Exception:
        pass
    return out


def main():
    if os.environ.get("VVC_BENCH") == "ai":
        out = bench_ai()
    else:
        out = bench_ra1080()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
