"""Halo exchange across tile shards via ppermute.

TPU-native analog of the reference's cross-tile loop-filter taps
(`/root/reference/source/Lib/CommonLib/Slice.cpp` → PPS tile geometry +
pps_loop_filter_across_tiles_enabled_flag; LoopFilter/SAO/ALF read ≤8
samples across a tile edge).  SURVEY.md §5.7: "deblock/SAO/ALF cross-edge
taps need a ≤8-px halo ppermute (ring-attention-shaped neighbor
exchange)".

The frame is sharded into vertical tile stripes along the mesh 'tile'
axis; each device sends its right edge to the right neighbor and its left
edge to the left neighbor, giving every shard the halo columns it needs to
filter its own edge region.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def exchange_tile_halos(mesh: Mesh, stripes: jax.Array, halo: int = 8):
    """[T, H, Wt] per-tile stripes (sharded over 'tile') →
    (left_halo [T, H, halo], right_halo [T, H, halo]) where left_halo[i]
    holds the rightmost columns of tile i-1 (zeros for i=0) and
    right_halo[i] the leftmost columns of tile i+1 (zeros for the last).
    """
    n = mesh.shape["tile"]

    def body(x):
        # x: [1, H, Wt] local block
        right_edge = x[:, :, -halo:]
        left_edge = x[:, :, :halo]
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_left = jax.lax.ppermute(right_edge, "tile", fwd)
        from_right = jax.lax.ppermute(left_edge, "tile", bwd)
        idx = jax.lax.axis_index("tile")
        from_left = jnp.where(idx == 0, 0, from_left)
        from_right = jnp.where(idx == n - 1, 0, from_right)
        return from_left, from_right

    f = shard_map(body, mesh=mesh, in_specs=P("tile"),
                  out_specs=(P("tile"), P("tile")))
    return f(stripes)
