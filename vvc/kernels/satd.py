"""Distortion kernels: SSE, SAD, Hadamard SATD — batched for RDO.

TPU-native analog of the reference's RdCost
(`/root/reference/source/Lib/CommonLib/RdCost.cpp` → xGetSAD*, xGetSSE*,
xGetHADs / xCalcHADs8x8; x86/RdCostX86.h SIMD ladders).  SURVEY.md §2.2:
"SATD 8×8 = small matmul sandwich — MXU"; here the Hadamard transform is a
batched integer matmul  H·D·Hᵀ  over [N, S, S] difference blocks.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.array([[1]], dtype=np.int32)
    h = hadamard(n // 2)
    return np.block([[h, h], [h, -h]]).astype(np.int32)


def sse_batch(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, S, S] → [N] sum of squared error (float32 accumulate — RDO
    distortion is non-normative, SURVEY.md §7.0 tenet 5)."""
    d = (a - b).astype(jnp.float32)
    return jnp.sum(d * d, axis=(-2, -1))


def sad_batch(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


def satd_batch(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, H, W] → [N] Hadamard SATD (8×8 tiles like the reference's
    xGetHADs when min(H,W)>=8; whole-block transform for 4-side blocks).
    Rectangular blocks tile the same way (reference xGetHADs W!=H path)."""
    n, hh, ww = a.shape
    d = (a - b).astype(jnp.int32)
    t = 8 if min(hh, ww) >= 8 else min(hh, ww)
    h = jnp.asarray(hadamard(t))
    # tile into [N*tiles, t, t]
    d = d.reshape(n, hh // t, t, ww // t, t).transpose(0, 1, 3, 2, 4).reshape(-1, t, t)
    had = jnp.einsum("ij,njk,kl->nil", h, d, h, preferred_element_type=jnp.int32)
    per_tile = jnp.sum(jnp.abs(had), axis=(1, 2))
    # reference normalization: (sum + t) >> log2(2t) per 8x8 tile ≈ /2t
    if t == 8:
        per_tile = (per_tile + 2) >> 2  # match VTM's HAD8x8 scale (sum/4 >> 2)
    else:
        per_tile = (per_tile + 1) >> 1
    return jnp.sum(per_tile.reshape(n, -1), axis=1)
