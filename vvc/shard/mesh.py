"""Device-mesh construction and the sharded encoder search step.

TPU-native analog of the reference's (absent) parallel runtime: VTM is
single-threaded; OpenVVC uses pthreads over tiles/CTU lines/frames
(libovvc/ovthreads.c).  Per SURVEY.md §2.7/§5.8, the codec's parallel axes
map to a jax.sharding Mesh:

  * 'tile'  — spatial shard (P-3): CTU/block batches split across devices;
    VVC tiles cut all intra/entropy dependencies, so the RDO search is
    embarrassingly parallel along this axis.
  * 'frame' — temporal shard (P-5/P-6): pictures of a GOP/segment.

Collectives ride ICI: psum for distortion/bit totals (the RdCost
reductions), ppermute for loop-filter halos (vvc.shard.halo).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_tiles: int, n_frames: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_tiles * n_frames, (devices.size, n_tiles, n_frames)
    grid = devices[: n_tiles * n_frames].reshape(n_tiles, n_frames)
    return Mesh(grid, ("tile", "frame"))


def shard_blocks(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Place a [N, ...] block batch with N split across the tile axis."""
    return jax.device_put(arr, NamedSharding(mesh, P("tile")))


def sharded_rdo_step(mesh: Mesh, orig: jax.Array, refs: jax.Array,
                     size: int, qp: int, bit_depth: int = 8):
    """One sharded encoder search step: per-block best cost/mode plus the
    frame-level distortion total (psum analog of the RdCost accumulation).

    Block batch is sharded over 'tile'; XLA inserts the collectives for the
    final reduction.  Returns (costs [N], modes [N], total_cost scalar).
    """
    from vvc.enc.rdo import eval_blocks

    orig = shard_blocks(mesh, orig)
    refs = shard_blocks(mesh, refs)

    @jax.jit
    def step(o, r):
        cost, mode, _mts, _lfnst = eval_blocks(o, r, size, qp, bit_depth)
        return cost, mode, jnp.sum(cost)

    return step(orig, refs)
