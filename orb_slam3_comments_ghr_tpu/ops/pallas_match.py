"""Pallas TPU kernel: fused windowed descriptor matching.

The projection-search hot loop (ORBmatcher::SearchByProjection and friends)
is, on TPU, a Hamming-distance matmul plus a candidate mask plus a top-2
reduction. The XLA path (ops.matching) materializes the (N, M) distance and
mask matrices in HBM; this kernel fuses all three stages in VMEM,
flash-attention style:

  * descriptors enter pre-unpacked as +-1 int8 (N,256)/(M,256); a query tile
    contracts against the full target block on the MXU
    (dist = (256 - A.B^T)/2);
  * the window mask (|du|,|dv| < r, octave band, validity) is evaluated
    in-kernel from per-row query params and per-column target params — the
    (N, M) mask never exists in memory;
  * best/second-best + argmin are computed per query row in VMEM.

Per 128-row tile the kernel touches 128*256 + M*256 int8 + small vectors —
compute-bound on the MXU instead of HBM-bound on three big intermediates.

Used by ops.matching.search_by_window on TPU when shapes fit; the XLA path
remains as reference/fallback (CPU tests, odd shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
BIG = 1 << 20  # plain int: jnp constants captured by kernels are rejected


def _kernel(qd_ref, quv_ref, qrad_ref, qlo_ref, qhi_ref,
            td_ref, txy_ref, tlvl_ref, tvalid_ref,
            idx_ref, best_ref, second_ref):
    # query tile
    A = qd_ref[:]                      # (TILE_N, 256) int8
    B = td_ref[:]                      # (M, 256) int8
    dot = jax.lax.dot_general(
        A, B, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )                                  # (TILE_N, M)
    dist = (256 - dot) // 2

    qu = quv_ref[:, 0:1]               # (TILE_N, 1)
    qv = quv_ref[:, 1:2]
    r = qrad_ref[:]                    # (TILE_N, 1)
    lo = qlo_ref[:]
    hi = qhi_ref[:]
    tu = txy_ref[:, 0][None, :]        # (1, M)
    tv = txy_ref[:, 1][None, :]
    tl = tlvl_ref[:, 0][None, :]
    tok = tvalid_ref[:, 0][None, :]

    mask = (
        (jnp.abs(qu - tu) < r)
        & (jnp.abs(qv - tv) < r)
        & (tl >= lo)
        & (tl <= hi)
        & (tok > 0)
    )
    d = jnp.where(mask, dist, BIG)

    best = jnp.min(d, axis=1)
    bidx = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == bidx[:, None], BIG, d)
    second = jnp.min(d2, axis=1)

    idx_ref[:, 0] = bidx
    best_ref[:, 0] = best
    second_ref[:, 0] = second


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_match_tpu(
    qdesc_pm1: jnp.ndarray,   # (N, 256) int8 in {-1, +1}
    q_uv: jnp.ndarray,        # (N, 2) float32 predicted pixel
    q_radius: jnp.ndarray,    # (N,) float32
    q_lvl_lo: jnp.ndarray,    # (N,) float32 (level bounds as floats)
    q_lvl_hi: jnp.ndarray,
    tdesc_pm1: jnp.ndarray,   # (M, 256) int8
    t_xy: jnp.ndarray,        # (M, 2) float32
    t_level: jnp.ndarray,     # (M,) float32
    t_valid: jnp.ndarray,     # (M,) float32 (1.0 valid)
    interpret: bool = False,
):
    n = qdesc_pm1.shape[0]
    m = tdesc_pm1.shape[0]
    assert n % TILE_N == 0, "pad queries to a multiple of 128"
    grid = (n // TILE_N,)

    out_shape = (
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
    )
    idx, best, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * 256, bytes_accessed=(n + m) * 256 + n * m // 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        qdesc_pm1, q_uv, q_radius[:, None], q_lvl_lo[:, None], q_lvl_hi[:, None],
        tdesc_pm1, t_xy, t_level[:, None].astype(jnp.float32),
        t_valid[:, None].astype(jnp.float32),
    )
    return idx[:, 0], best[:, 0], second[:, 0]
