"""Benchmark: All-Intra encode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Operating point = BASELINE.json config 1 (All-Intra, BasketballPass-class
416×240 8-bit, QP32).  Baseline: VTM single-thread encodes AI 1080p at
~0.1–0.3 fps (BASELINE.md, external-from-memory); scaled by the 20×
pixel-count ratio that is ~2–6 fps at 416×240 — we take 4.0 fps as the
anchor until VTM can be measured locally (reference mount empty,
SURVEY.md §0).
"""
import json
import time

VTM_ANCHOR_FPS = 4.0
W, H, QP, FRAMES = 416, 240, 32, 8  # BASELINE config 1: 8 frames


def main():
    from vvc.io.synth import synth_frame
    from vvc.enc.encoder import encode_sequence

    frames = [synth_frame(W, H, t) for t in range(FRAMES)]
    # warmup: one full encode compiles the RDO device program (same shapes
    # as the timed run)
    encode_sequence(frames, qp=QP)
    t0 = time.perf_counter()
    bitstream, recons, stats = encode_sequence(frames, qp=QP)
    dt = time.perf_counter() - t0
    fps = FRAMES / dt
    print(json.dumps({
        "metric": f"ai_encode_fps_{W}x{H}_qp{QP}",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / VTM_ANCHOR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
