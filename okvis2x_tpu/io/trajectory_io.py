"""Trajectory output + ATE evaluation.

Replaces the reference's `TrajectoryOutput` CSV writers (okvis_multisensor_
processing/src/TrajectoryOutput.cpp) and the external evo-style evaluation
used with tools/convert_to_tum.py: writes TUM-format trajectories and
computes ATE RMSE after SE(3) (or Sim(3)) Umeyama alignment.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def write_tum(path: str, ts: np.ndarray, T_WS: np.ndarray):
    """TUM format: t x y z qx qy qz qw."""
    with open(path, "w") as f:
        for t, T in zip(ts, T_WS):
            f.write(
                f"{t:.9f} {T[0]:.9f} {T[1]:.9f} {T[2]:.9f} "
                f"{T[3]:.9f} {T[4]:.9f} {T[5]:.9f} {T[6]:.9f}\n"
            )


def associate(t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-neighbour timestamp association; returns index pairs."""
    j = np.searchsorted(t_b, t_a)
    j = np.clip(j, 1, len(t_b) - 1)
    left = np.abs(t_b[j - 1] - t_a)
    right = np.abs(t_b[j] - t_a)
    jj = np.where(left < right, j - 1, j)
    ok = np.abs(t_b[jj] - t_a) < max_dt
    return np.nonzero(ok)[0], jj[ok]


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (or similarity) alignment dst ≈ s R src + t."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (xs**2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    t_est: np.ndarray,
    p_est: np.ndarray,
    t_gt: np.ndarray,
    p_gt: np.ndarray,
    with_scale: bool = False,
) -> Optional[float]:
    """ATE RMSE [m] after alignment; None if too few associations."""
    ia, ib = associate(t_est, t_gt)
    if len(ia) < 3:
        return None
    src = p_est[ia]
    dst = p_gt[ib]
    s, R, t = umeyama_alignment(src, dst, with_scale)
    err = dst - (s * (R @ src.T).T + t)
    return float(np.sqrt((err**2).sum(axis=1).mean()))
