"""Spatially-balanced keypoint selection.

Replaces ORBextractor::DistributeOctTree (reference: src/ORBextractor.cc:716)
— an inherently sequential quadtree — with a parallel two-stage selection with
the same intent (spatial spread + keep-best-response):

  1. bucket the NMS'd response map into fixed-size tiles and keep the best
     corner per tile (a quadtree leaf keeps exactly one keypoint too);
  2. global top-k over tile winners to meet the per-level quota.

Static output shapes: (quota,) arrays with a valid mask."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_keypoints(
    resp: jnp.ndarray,
    quota: int,
    border: int = 19,
    bucket: int = 16,
):
    """resp: (H, W) NMS'd response map. Returns (xy (quota,2) int32 in level
    pixels, response (quota,), valid (quota,))."""
    h, w = resp.shape
    # Kill the border (EDGE_THRESHOLD=19, ORBextractor.cc:75).
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    inb = (row >= border) & (row < h - border) & (col >= border) & (col < w - border)
    resp = jnp.where(inb, resp, 0.0)

    gh, gw = -(-h // bucket), -(-w // bucket)
    pad_h, pad_w = gh * bucket - h, gw * bucket - w
    rp = jnp.pad(resp, ((0, pad_h), (0, pad_w)))
    tiles = rp.reshape(gh, bucket, gw, bucket).transpose(0, 2, 1, 3).reshape(
        gh * gw, bucket * bucket
    )
    best_val = tiles.max(axis=1)
    best_idx = tiles.argmax(axis=1)
    ty = jnp.arange(gh * gw) // gw
    tx = jnp.arange(gh * gw) % gw
    y = ty * bucket + best_idx // bucket
    x = tx * bucket + best_idx % bucket

    # Two-stage priority for quadtree-like spatial spread: group buckets into
    # coarse tiles sized so there are <= quota tiles; each tile's champion
    # bucket outranks every non-champion regardless of response. This mirrors
    # DistributeOctTree's guarantee that coarse regions each keep a keypoint
    # before any region keeps two.
    import math

    c = max(1, math.ceil(math.sqrt(gh * gw / max(quota, 1))))
    ch, cw = -(-gh // c), -(-gw // c)
    vpad = jnp.pad(
        best_val.reshape(gh, gw),
        ((0, ch * c - gh), (0, cw * c - gw)),
        constant_values=-jnp.inf,
    )
    coarse = vpad.reshape(ch, c, cw, c)
    champ = coarse.max(axis=(1, 3), keepdims=True)
    is_champ = (coarse >= champ) & (coarse > 0.0)
    # break ties within a tile: keep only the first champion (scan order)
    flat = is_champ.reshape(ch, cw, c * c)
    first = jnp.argmax(flat, axis=-1)
    only_first = jnp.zeros_like(flat).at[
        jnp.arange(ch)[:, None].repeat(cw, 1), jnp.arange(cw)[None, :].repeat(ch, 0), first
    ].set(flat.max(axis=-1))
    is_champ = only_first.reshape(ch, cw, c, c).transpose(0, 2, 1, 3)
    is_champ = is_champ.reshape(ch * c, cw * c)[:gh, :gw].reshape(gh * gw)

    OFFSET = 1e12  # larger than any FAST SAD score
    priority = best_val + jnp.where(is_champ, OFFSET, 0.0)

    k = min(quota, gh * gw)
    topp, topi = jax.lax.top_k(priority, k)
    topv = best_val[topi]
    sel_x = x[topi]
    sel_y = y[topi]
    valid = topv > 0.0
    if k < quota:
        pad = quota - k
        sel_x = jnp.pad(sel_x, (0, pad))
        sel_y = jnp.pad(sel_y, (0, pad))
        topv = jnp.pad(topv, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    xy = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.int32)
    return xy, topv, valid


def level_quotas(n_features: int, n_levels: int = 8, scale: float = 1.2):
    """Geometric per-level feature quotas (ORBextractor.cc:474-541)."""
    inv = 1.0 / scale
    total = sum(inv ** i for i in range(n_levels))
    raw = [n_features * (inv ** i) / total for i in range(n_levels)]
    quotas = [int(round(q)) for q in raw]
    # fix rounding drift on the last level, as the reference does
    quotas[-1] = max(1, n_features - sum(quotas[:-1]))
    return quotas
