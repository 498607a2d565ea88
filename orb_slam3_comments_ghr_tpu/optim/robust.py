"""Robust kernels and chi-square gates.

Mirrors the reference's g2o RobustKernelHuber usage and per-octave information
weights (reference: src/Optimizer.cc:112-126 deltaMono/deltaStereo, 5.991 /
7.815 chi2 thresholds; Frame keypoint sigma ladder mvInvLevelSigma2)."""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991       # 95% for 2 dof
CHI2_STEREO = 7.815     # 95% for 3 dof
SCALE_FACTOR = 1.2


def inv_level_sigma2(level: jnp.ndarray, scale: float = SCALE_FACTOR) -> jnp.ndarray:
    """Information weight 1/sigma^2 for a keypoint octave: sigma grows with
    the pyramid scale (ORBextractor mvLevelSigma2)."""
    return (scale ** (-2.0 * level.astype(jnp.float32)))


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber IRLS weight as a function of the squared error (chi2 already
    includes the information matrix): w = 1 inside, delta/sqrt(chi2) outside.
    g2o applies rho'(e) the same way."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def huber_cost(chi2: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """rho(chi2): quadratic inside, linear outside (g2o RobustKernelHuber)."""
    delta = jnp.sqrt(delta2)
    return jnp.where(
        chi2 <= delta2,
        chi2,
        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta2,
    )
