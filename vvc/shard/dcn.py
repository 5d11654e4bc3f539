"""Multi-host (DCN) encode: GOP-segment scatter across processes.

TPU-native analog of the reference's only distributed-encode story
(`/root/reference/source/App/Parcat/parcat.cpp` + the split-encode flow,
SURVEY.md §2.7 P-6 / §5.8 DCN): the sequence splits into IDR-delimited
segments, each HOST (separate process — its own Python interpreter, JAX
runtime and, in production, its own TPU slice) encodes its segment
independently, and the driver gathers the per-segment bitstreams into one
stream with the Parcat concatenator.  POC continuity comes from
encode_sequence(poc_base=...) — slice headers carry global POCs, so the
concatenated stream decodes in true display order.

Embarrassingly parallel by construction (segments share nothing), which
is exactly why the reference chose it: scaling efficiency is bounded only
by segment-length imbalance — the ≥70% multi-host target's easy half.
Cross-host ICI/DCN collectives are NOT needed for this axis; the
per-segment interiors use the (frame × tile) mesh (vvc.shard.encode).
"""
from __future__ import annotations

import multiprocessing as mp
import os

import numpy as np


def split_segments(n_frames: int, n_hosts: int, gop_size: int = 16):
    """[(start, count), ...] — GOP-aligned, near-equal segments."""
    n_gops = max(1, -(-n_frames // gop_size))
    n_hosts = min(n_hosts, n_gops)
    out = []
    start = 0
    for h in range(n_hosts):
        gops = n_gops // n_hosts + (1 if h < n_gops % n_hosts else 0)
        count = min(gops * gop_size, n_frames - start)
        if count <= 0:
            break
        out.append((start, count))
        start += count
    return out


def _encode_segment(args):
    """Worker (child process): encode one IDR-delimited segment."""
    (start, yuv, shape, bit_depth, kwargs) = args
    os.environ.setdefault("VVC_JAX_PLATFORM", "cpu")
    from vvc.io.yuv import Frame
    from vvc.enc.encoder import encode_sequence
    n, h, w = shape
    ys = np.frombuffer(yuv[0], np.int32).reshape(n, h, w)
    cbs = np.frombuffer(yuv[1], np.int32).reshape(n, h // 2, w // 2)
    crs = np.frombuffer(yuv[2], np.int32).reshape(n, h // 2, w // 2)
    frames = [Frame(ys[i], cbs[i], crs[i], bit_depth) for i in range(n)]
    bs, recons, stats = encode_sequence(frames, bit_depth=bit_depth,
                                        poc_base=start, **kwargs)
    return (start, bs,
            [(np.ascontiguousarray(r.y).tobytes(),
              np.ascontiguousarray(r.cb).tobytes(),
              np.ascontiguousarray(r.cr).tobytes()) for r in recons],
            stats)


def encode_multihost(frames, n_hosts: int = 2, gop_size: int = 16,
                     processes: bool = True, **kwargs):
    """Encode `frames` across n_hosts processes → (annexb, recons, stats).

    processes=False runs the segments in-process (same code path, no
    fork) — the two must be byte-identical (test-enforced), which is the
    determinism proof the multi-host story rests on."""
    from vvc.cli.parcat import concat
    from vvc.io.yuv import Frame
    h, w = frames[0].y.shape
    bit_depth = frames[0].bit_depth
    segs = split_segments(len(frames), n_hosts, gop_size)
    kwargs = dict(kwargs)
    kwargs.setdefault("gop_size", gop_size)
    jobs = []
    for (start, count) in segs:
        sub = frames[start:start + count]
        yuv = (b"".join(np.ascontiguousarray(f.y, np.int32).tobytes()
                        for f in sub),
               b"".join(np.ascontiguousarray(f.cb, np.int32).tobytes()
                        for f in sub),
               b"".join(np.ascontiguousarray(f.cr, np.int32).tobytes()
                        for f in sub))
        jobs.append((start, yuv, (count, h, w), bit_depth, kwargs))
    if processes and len(jobs) > 1:
        # children must pin their backend BEFORE importing vvc (spawn
        # re-imports the module tree; the container's sitecustomize would
        # otherwise grab the TPU tunnel in every worker).  In production
        # each host process targets its own slice via this same variable.
        os.environ.setdefault("VVC_JAX_PLATFORM", "cpu")
        ctx = mp.get_context("spawn")
        with ctx.Pool(len(jobs)) as pool:
            results = pool.map(_encode_segment, jobs)
    else:
        results = [_encode_segment(j) for j in jobs]
    results.sort(key=lambda r: r[0])
    bitstream = concat([r[1] for r in results])
    recons = []
    stats = []
    for (_, _, recs, sts) in results:
        for (yb, cbb, crb) in recs:
            recons.append(Frame(
                np.frombuffer(yb, np.int32).reshape(h, w),
                np.frombuffer(cbb, np.int32).reshape(h // 2, w // 2),
                np.frombuffer(crb, np.int32).reshape(h // 2, w // 2),
                bit_depth))
        stats.extend(sts)
    return bitstream, recons, stats
