"""Cross-tile loop filtering on the device mesh — the halo consumer.

TPU-native analog of `pps_loop_filter_across_tiles_enabled_flag = 1`
(`/root/reference/source/Lib/CommonLib/LoopFilter.cpp` filters run over
tile boundaries unless the PPS flag disables it).  The sharded encoder
keeps each tile's samples on its own device; the deblocking taps of the
vertical edge AT a tile boundary need ≤4 columns from the neighbour
device — exactly the ring halo exchange vvc.shard.halo provides
(SURVEY.md §5.7: "deblock/SAO/ALF cross-edge taps need a ≤8-px halo
ppermute").

`deblock_tile_edges` filters ONLY the tile-boundary vertical edges, each
shard updating its own columns from both of its halos; interior edges
are the per-tile (host or device) pass as usual.  At the 8-sample
deblocking grid adjacent edges' ±4 windows never overlap, so boundary
edges filter independently of interior ones — the result equals the
single-device unsharded pass (test-enforced, tests/test_halo_filter.py).

Scope: the all-intra tier (BS = 2 everywhere) — the configuration the
sharded lossless/AI encodes use; BS maps ride the same halo when the
inter tier moves on-mesh.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vvc.kernels.deblock import BETA_TABLE, TC_TABLE
from vvc.shard.halo import exchange_tile_halos


def _filter_edge_cols(seg, beta, tc, maxv):
    """Luma deblock of ONE vertical edge given its 8-column window.

    seg [H, 8] = [p3 p2 p1 p0 q0 q1 q2 q3]; BS=2; returns the filtered
    [H, 8] window (mirror of vvc.kernels.deblock._filter_luma_edges_v for
    a single always-present edge)."""
    h = seg.shape[0]
    p3, p2, p1, p0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2, q3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    g = h // 4
    dp = jnp.abs(p2 - 2 * p1 + p0)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = dp[0::4][:g], dp[3::4][:g]
    dq0, dq3 = dq[0::4][:g], dq[3::4][:g]
    d = dp0 + dp3 + dq0 + dq3
    seg_on = d < beta
    thr = (5 * tc + 1) >> 1
    strong = (seg_on
              & (2 * (dp0 + dq0) < (beta >> 2))
              & (2 * (dp3 + dq3) < (beta >> 2))
              & (jnp.abs(p3[0::4][:g] - p0[0::4][:g])
                 + jnp.abs(q0[0::4][:g] - q3[0::4][:g]) < (beta >> 3))
              & (jnp.abs(p0[0::4][:g] - q0[0::4][:g]) < thr)
              & (jnp.abs(p3[3::4][:g] - p0[3::4][:g])
                 + jnp.abs(q0[3::4][:g] - q3[3::4][:g]) < (beta >> 3))
              & (jnp.abs(p0[3::4][:g] - q0[3::4][:g]) < thr))
    on = jnp.repeat(seg_on, 4)[:h]
    st = jnp.repeat(strong, 4)[:h]
    nr = on & ~st
    c2 = 2 * tc
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - c2, p0 + c2)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - c2, p1 + c2)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - c2, p2 + c2)
    sq0 = jnp.clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                   q0 - c2, q0 + c2)
    sq1 = jnp.clip((p0 + q0 + q1 + q2 + 2) >> 2, q1 - c2, q1 + c2)
    sq2 = jnp.clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3,
                   q2 - c2, q2 + c2)
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    n_on = nr & (jnp.abs(delta) < 10 * tc)
    dlt = jnp.clip(delta, -tc, tc)
    np0 = jnp.clip(p0 + dlt, 0, maxv)
    nq0 = jnp.clip(q0 - dlt, 0, maxv)
    act = (beta + (beta >> 1)) >> 3
    side_p = jnp.repeat((dp0 + dp3) < act, 4)[:h] & n_on
    side_q = jnp.repeat((dq0 + dq3) < act, 4)[:h] & n_on
    tch = tc >> 1
    dp1v = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tch, tch)
    dq1v = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tch, tch)
    np1 = jnp.clip(p1 + dp1v, 0, maxv)
    nq1 = jnp.clip(q1 + dq1v, 0, maxv)
    out = jnp.stack([
        p3,
        jnp.where(st, jnp.clip(sp2, 0, maxv), p2),
        jnp.where(st, jnp.clip(sp1, 0, maxv), jnp.where(side_p, np1, p1)),
        jnp.where(st, jnp.clip(sp0, 0, maxv), jnp.where(n_on, np0, p0)),
        jnp.where(st, jnp.clip(sq0, 0, maxv), jnp.where(n_on, nq0, q0)),
        jnp.where(st, jnp.clip(sq1, 0, maxv), jnp.where(side_q, nq1, q1)),
        jnp.where(st, jnp.clip(sq2, 0, maxv), q2),
        q3,
    ], axis=1)
    return out


def deblock_tile_edges(mesh: Mesh, stripes, qp: int, bit_depth: int = 8):
    """Filter the vertical edges AT tile boundaries across the mesh.

    stripes [T, H, Wt] int32 per-tile luma stripes sharded over 'tile'.
    Tiles are CTU-aligned, so every boundary is a CU edge (BS=2 in the
    all-intra tier).  Each shard exchanges 4-column halos (ppermute) and
    updates only its OWN columns: the left 4 (q side of its left-boundary
    edge) and the right 4 (p side of its right-boundary edge).  Returns
    the filtered stripes, equal to the unsharded whole-frame pass over
    those edges."""
    n = mesh.shape["tile"]
    qpi = int(np.clip(qp, 0, 63))
    beta = int(BETA_TABLE[qpi]) << (bit_depth - 8)
    tc = int(TC_TABLE[min(qpi + 2, 65)]) << (bit_depth - 8)
    maxv = (1 << bit_depth) - 1

    from_left, from_right = exchange_tile_halos(mesh, stripes, halo=4)

    def body(x, fl, fr):
        # x [1, H, Wt]; fl/fr [1, H, 4]
        idx = jax.lax.axis_index("tile")
        xs = x[0]
        # left-boundary edge: p = halo (prev tile's right 4), q = own left 4
        seg_l = jnp.concatenate([fl[0], xs[:, :4]], axis=1)
        out_l = _filter_edge_cols(seg_l, beta, tc, maxv)[:, 4:]
        xs = xs.at[:, :4].set(jnp.where(idx > 0, out_l, xs[:, :4]))
        # right-boundary edge: p = own right 4, q = halo (next tile's left 4)
        seg_r = jnp.concatenate([xs[:, -4:], fr[0]], axis=1)
        out_r = _filter_edge_cols(seg_r, beta, tc, maxv)[:, :4]
        xs = xs.at[:, -4:].set(jnp.where(idx < n - 1, out_r, xs[:, -4:]))
        return xs[None]

    f = shard_map(body, mesh=mesh, in_specs=(P("tile"), P("tile"),
                                             P("tile")),
                  out_specs=P("tile"))
    return f(stripes, from_left, from_right)
