"""Sharded frame/GOP encode: the RDO search fanned out over a
(frame × tile) device mesh, byte-identical to the single-device encoder.

TPU-native analog of the reference's scale-out story (SURVEY.md §2.7):
P-3 tiles (OpenVVC tile threads / PPS::initTiles) become the 'tile' mesh
axis, P-5/P-6 frame//GOP parallelism (OpenVVC ovthreads.c frame threads,
VTM App/Parcat) becomes the 'frame' axis.  The unit of distribution is
the per-tile RDO search (vvc.enc.rdo.rdo_partition_tiled's body): tiles
cut all prediction/entropy dependencies, so each device searches its own
(frame, tile) cell; the host then runs the per-tile DP backtrack, tile
reconstruction and CABAC substream packing exactly as the single-device
path does — producing the same bytes by construction (test-enforced).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_encode_mesh(n_frames: int, n_tiles: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_frames * n_tiles
    grid = devices[: n_frames * n_tiles].reshape(n_frames, n_tiles)
    return Mesh(grid, ("frame", "tile"))


def eval_cells_sharded(mesh: Mesh, cells: np.ndarray, shapes, qp: int,
                       bit_depth: int, wt: int, h: int, lossless: bool,
                       lfnst: bool, with_chroma: bool,
                       isp: bool = False) -> np.ndarray:
    """cells [N, Lin] int32 — one packed (y[,cb,cr]) plane-vector per
    (frame, tile) cell, frame-major — evaluated under shard_map over the
    flattened mesh.  Returns packed per-cell RDO results [N, Lout].

    The body is the SAME vmapped per-tile program eval_all_sizes_frames
    runs on one device, so sharded and single-device results agree."""
    from vvc.enc.rdo import _split_planes, _eval_all_sizes_impl, _pack_results

    n = cells.shape[0]
    ndev = mesh.devices.size
    pad = (-n) % ndev
    if pad:
        cells = np.concatenate([cells, np.zeros((pad, cells.shape[1]),
                                                np.int32)])

    def one(vec):
        y, cb, cr = _split_planes(vec, wt, h, with_chroma)
        return _pack_results(
            _eval_all_sizes_impl(y, shapes, qp, bit_depth, wt, h, lossless,
                                 lfnst, cb, cr, isp), shapes)

    def body(chunk):
        return jax.vmap(one)(chunk)

    spec = P(("frame", "tile"))
    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec))
    arr = jax.device_put(jnp.asarray(cells), NamedSharding(mesh, spec))
    out = np.asarray(f(arr))
    return out[:n]


def encode_sequence_sharded(frames, qp: int = 32, bit_depth: int = 8,
                            num_tile_cols: int = 2, mesh: Mesh | None = None,
                            lossless: bool = False, mtt: bool = False,
                            isp: bool = False, parallel_tiles: bool = True):
    """All-Intra sequence encode with the RDO fan-out over a device mesh.

    Byte-identical to encode_sequence(frames, qp, num_tile_cols=...) —
    the mesh only changes WHERE each (frame, tile) search runs.  Returns
    the same (annexb bytes, recons, stats) triple."""
    from vvc.enc.encoder import encode_sequence, tile_columns
    from vvc.enc.rdo import (_candidate_shapes, pack_planes,
                             rdo_partition_tiled, unpack_results)
    from vvc.hls.ps import SPS

    h, w = frames[0].y.shape
    ctu, min_cu = 64, 8
    tiles = tile_columns(num_tile_cols, w, ctu)
    widths = {tx1 - tx0 for tx0, tx1 in tiles}
    assert len(widths) == 1, "sharded encode needs uniform tile columns"
    wt = widths.pop()
    nf, nt = len(frames), len(tiles)
    if mesh is None:
        nd = len(jax.devices())
        mt = 1
        for c in range(min(nt, nd), 0, -1):
            if nt % c == 0 and nd % c == 0:
                mt = c
                break
        mf = min(nf, nd // mt)
        mesh = make_encode_mesh(mf, mt)

    cclm = not lossless
    shapes = _candidate_shapes(ctu, min_cu, mtt and not lossless)
    cells = []
    for f in frames:
        for tx0, tx1 in tiles:
            cp = ((f.cb[:, tx0 >> 1:tx1 >> 1], f.cr[:, tx0 >> 1:tx1 >> 1])
                  if cclm else (None, None))
            cells.append(pack_planes(f.y[:, tx0:tx1], *cp))
    cells = np.stack(cells)
    packed = eval_cells_sharded(mesh, cells, shapes, qp, bit_depth, wt, h,
                                lossless, not lossless, cclm,
                                isp and not lossless)

    rdo_list = []
    for i, f in enumerate(frames):
        tr = [unpack_results(packed[i * nt + t], shapes, wt, h)
              for t in range(nt)]
        rdo_list.append(rdo_partition_tiled(
            f.y, tiles, qp, bit_depth, ctu, min_cu, lossless=lossless,
            lfnst=not lossless, mtt=mtt and not lossless, tile_results=tr,
            isp=isp and not lossless))
    return encode_sequence(frames, qp=qp, bit_depth=bit_depth,
                           num_tile_cols=num_tile_cols, lossless=lossless,
                           mtt=mtt, isp=isp, parallel_tiles=parallel_tiles,
                           _precomputed_rdo=rdo_list)
