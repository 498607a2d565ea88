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

Layout notes (Mosaic tiling): all per-element parameter vectors ride in
lane-aligned (8, N) packed blocks — rows 0..4 of the query pack are
u, v, radius, lvl_lo, lvl_hi; the target pack carries u, v, level, valid.
Outputs are one (8, N) int32 pack: rows 0..2 = best_idx, best, second.

Used by ops.matching window searches on TPU; the XLA path remains as
reference/fallback (CPU tests, odd shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
BIG = 1 << 20  # plain int: jnp constants captured by kernels are rejected


def _kernel(qd_ref, qp_ref, td_ref, tp_ref, out_ref):
    A = qd_ref[:]                      # (TILE_N, 256) int8
    B = td_ref[:]                      # (M, 256) int8
    dot = jax.lax.dot_general(
        A, B, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        # int8 MXU path: must not inherit a global 'highest' (fp32) matmul
        # precision — Mosaic rejects fp32-contract int8 matmuls
        precision=jax.lax.Precision.DEFAULT,
    )                                  # (TILE_N, M)
    dist = (256 - dot) // 2

    qp = qp_ref[:]                     # (8, TILE_N) f32
    tp = tp_ref[:]                     # (8, M) f32
    qu = qp[0][:, None]
    qv = qp[1][:, None]
    r = qp[2][:, None]
    lo = qp[3][:, None]
    hi = qp[4][:, None]
    tu = tp[0][None, :]
    tv = tp[1][None, :]
    tl = tp[2][None, :]
    tok = tp[3][None, :]

    mask = (
        (jnp.abs(qu - tu) < r)
        & (jnp.abs(qv - tv) < r)
        & (tl >= lo)
        & (tl <= hi)
        & (tok > 0.0)
    )
    # Mosaic index-reductions support float32 only; Hamming distances
    # (<= 256) and the BIG sentinel are exactly representable
    d = jnp.where(mask, dist, BIG).astype(jnp.float32)

    best = jnp.min(d, axis=1)
    bidx = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == bidx[:, None], float(BIG), d)
    second = jnp.min(d2, axis=1)

    # build the (8, TILE_N) pack without scatter (unsupported in Mosaic)
    zeros = jnp.zeros((5, TILE_N), jnp.int32)
    out_ref[:] = jnp.concatenate(
        [bidx[None, :], best.astype(jnp.int32)[None, :],
         second.astype(jnp.int32)[None, :], zeros], axis=0
    )


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

    qpack = jnp.zeros((8, n), jnp.float32)
    qpack = qpack.at[0].set(q_uv[:, 0]).at[1].set(q_uv[:, 1])
    qpack = qpack.at[2].set(q_radius).at[3].set(q_lvl_lo).at[4].set(q_lvl_hi)
    tpack = jnp.zeros((8, m), jnp.float32)
    tpack = tpack.at[0].set(t_xy[:, 0]).at[1].set(t_xy[:, 1])
    tpack = tpack.at[2].set(t_level.astype(jnp.float32))
    tpack = tpack.at[3].set(t_valid.astype(jnp.float32))

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * 256, bytes_accessed=(n + m) * 256 + n * m // 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qdesc_pm1, qpack, tdesc_pm1, tpack)
    return out[0], out[1], out[2]
