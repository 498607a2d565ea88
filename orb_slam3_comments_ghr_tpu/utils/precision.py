"""Full-f32 matmul guard for geometry-critical programs.

On TPU the default matmul precision is bf16 (8-bit mantissa, ~0.4% relative
error). That is the right trade for the big front-end contractions (blur,
Hamming, rBRIEF) but poisonous for the small matmuls that SET map geometry —
triangulation, two-view init, Sim3, inertial init, pose graphs: their output
feeds every downstream estimate and lower-bounds the system ATE at
centimeters. These matmuls are tiny (3x3/4x4/batched-small), so full f32
costs nothing measurable. CPU/GPU backends already run f32 — the decorator
is a no-op there."""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace `fn` under jax.default_matmul_precision('highest'). Apply UNDER
    jax.jit (closest to the function) so the context is active at trace
    time."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
