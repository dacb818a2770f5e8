"""Robust loss correctors (Cauchy / Huber / Tukey).

Implements the standard "triangular corrector" that Ceres applies to
residuals and Jacobians so a robustified problem can be solved with plain
Gauss-Newton (reference behaviour documented at okvis_ceres/src/
TwoPoseGraphError.cpp:282-340).  Given squared norm s = ||r||^2 and loss
rho(s) with derivatives rho', rho'', the corrected residual is
sqrt(rho') * r with a rank-1 correction when rho'' < 0; like Ceres (and the
reference), we use the first-order corrector sqrt(rho') for the Jacobian
scale — sufficient for GN and what `TwoPoseGraphError` replicates.
"""

from __future__ import annotations

import jax.numpy as jnp

CAUCHY = "cauchy"
HUBER = "huber"
TUKEY = "tukey"
NONE = "none"


def rho_prime(loss: str, s: jnp.ndarray, scale: float):
    """d rho / d s for loss with scale parameter (delta^2 = scale^2)."""
    a2 = scale * scale
    if loss == NONE:
        return jnp.ones_like(s)
    if loss == CAUCHY:
        return 1.0 / (1.0 + s / a2)
    if loss == HUBER:
        return jnp.where(s <= a2, jnp.ones_like(s), scale / jnp.sqrt(jnp.maximum(s, 1e-24)))
    if loss == TUKEY:
        w = 1.0 - s / a2
        return jnp.where(s <= a2, w * w, jnp.zeros_like(s))
    raise ValueError(loss)


def weight(loss: str, r_norm2: jnp.ndarray, scale: float):
    """Per-factor IRLS weight w = rho'(||r||^2); multiply residual and
    Jacobian by sqrt(w)."""
    return rho_prime(loss, r_norm2, scale)


def rho(loss: str, s: jnp.ndarray, scale: float):
    """Robustified cost rho(s) for s = ||r||^2 (for LM accept/reject)."""
    a2 = scale * scale
    if loss == NONE:
        return s
    if loss == CAUCHY:
        return a2 * jnp.log1p(s / a2)
    if loss == HUBER:
        sq = jnp.sqrt(jnp.maximum(s, 1e-24))
        return jnp.where(s <= a2, s, 2.0 * scale * sq - a2)
    if loss == TUKEY:
        w = 1.0 - s / a2
        return jnp.where(s <= a2, (a2 / 3.0) * (1.0 - w**3), jnp.full_like(s, a2 / 3.0))
    raise ValueError(loss)
