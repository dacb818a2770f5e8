"""Shared synthetic-problem builders (tests, bench, compile checks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb


def synthetic_window_problem(
    K: int = 8,
    L: int = 512,
    N: int = 4096,
    noise_px: float = 0.4,
    dtype=jnp.float32,
    seed: int = 0,
):
    """A representative sliding-window BA problem with dense random
    observations (every obs slot used), stereo rig, frame 0 gauge-fixed."""
    rng = np.random.default_rng(seed)
    cam = pinhole.make_pinhole(
        fx=460.0, fy=460.0, cx=376.0, cy=240.0, width=752, height=480,
        model=dist.RADTAN, dist_params=[-0.28, 0.07, 1e-4, 1e-5], dtype=dtype,
    )
    cams = gn.stack_cameras([cam, cam])
    T_SC = np.stack(
        [
            np.array([-0.055, 0, 0, 0, 0, 0, 1.0]),
            np.array([0.055, 0, 0, 0, 0, 0, 1.0]),
        ]
    )

    T_WS = np.zeros((K, 7))
    T_WS[:, 6] = 1.0
    T_WS[:, 0] = 0.1 * np.arange(K)
    pts = rng.uniform([-3, -2, 2.0], [3, 2, 8.0], (L, 3))
    hp = np.concatenate([pts, np.ones((L, 1))], 1)

    obs_frame = rng.integers(0, K, N)
    obs_cam = rng.integers(0, 2, N)
    obs_lm = rng.integers(0, L, N)

    # project ground truth to make consistent uv measurements
    T_SC_j = jnp.asarray(T_SC, dtype)
    T_WS_j = jnp.asarray(T_WS, dtype)
    pts_j = jnp.asarray(pts, dtype)

    def project(k, c, l):
        T_CW = se3.se3_multiply(
            se3.se3_inverse(T_SC_j[c]), se3.se3_inverse(T_WS_j[k])
        )
        p_C = se3.se3_apply(T_CW, pts_j[l])
        uv, valid = pinhole.project(cam, p_C)
        return uv, valid

    uv, valid = jax.vmap(project)(
        jnp.asarray(obs_frame), jnp.asarray(obs_cam), jnp.asarray(obs_lm)
    )
    uv = np.asarray(uv) + rng.normal(0, noise_px, (N, 2))

    # R=1 rel-edge slot (marginalisation edges exist in real windows);
    # G=0 — GNSS-free, its factor family is skipped at trace time
    p = prb.empty_problem(K=K, L=L, C=2, N=N, M=K - 1, R=1, G=0, dtype=dtype)
    p = p._replace(
        T_WS=jnp.asarray(T_WS, dtype),
        frame_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        sb_fixed=jnp.ones(K, bool),
        T_SC=jnp.asarray(T_SC, dtype),
        hp_W=jnp.asarray(hp, dtype),
        lm_valid=jnp.ones(L, bool),
        obs_frame=jnp.asarray(obs_frame, jnp.int32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(uv, dtype),
        obs_valid=np.asarray(valid),
    )
    # perturb initial state
    dpose = rng.normal(0, 0.02, (K, 6))
    dpose[0] = 0
    p = p._replace(
        T_WS=jax.vmap(se3.retract)(p.T_WS, jnp.asarray(dpose, dtype)),
        hp_W=p.hp_W.at[:, :3].add(jnp.asarray(rng.normal(0, 0.05, (L, 3)), dtype)),
    )
    return p, cams
