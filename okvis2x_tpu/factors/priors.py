"""Unary and binary prior factors.

Replaces the reference's PoseError / SpeedAndBiasError / RelativePoseError /
HomogeneousPointError (okvis_ceres/include/okvis/ceres/*.hpp) — all are
simple whitened differences on the respective manifolds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from okvis2x_tpu.core import se3


def pose_prior_residual(T_prior: jax.Array, T: jax.Array, sqrt_info: jax.Array):
    """6-dim pose prior: W * (T ⊟ T_prior) (reference PoseError)."""
    return sqrt_info @ se3.local_delta(T_prior, T)


def speed_bias_prior_residual(sb_prior: jax.Array, sb: jax.Array, sqrt_info: jax.Array):
    """9-dim speed/bias prior (reference SpeedAndBiasError)."""
    return sqrt_info @ (sb - sb_prior)


def relative_pose_residual(
    T_rel_meas: jax.Array, T_WA: jax.Array, T_WB: jax.Array, sqrt_info: jax.Array
):
    """6-dim relative pose factor: W * ((T_WA^-1 T_WB) ⊟ T_rel_meas)
    (reference RelativePoseError; also the shape of pose-graph edges)."""
    T_AB = se3.se3_multiply(se3.se3_inverse(T_WA), T_WB)
    return sqrt_info @ se3.local_delta(T_rel_meas, T_AB)


def homogeneous_point_prior_residual(
    hp_prior: jax.Array, hp: jax.Array, sqrt_info: jax.Array
):
    """3-dim landmark prior on the xyz part (reference HomogeneousPointError)."""
    return sqrt_info @ (hp[:3] - hp_prior[:3])
