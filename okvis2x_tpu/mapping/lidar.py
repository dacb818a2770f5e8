"""LiDAR utilities: motion deskew + voxel-grid downsampling.

Replaces the reference's `LidarMotionUndistortion` (okvis_mapping/include/
okvis/LidarMotionUndistortion.hpp:22-59) and `VoxelGridFilter`
(VoxelGridFilter.hpp:84-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3


def deskew(
    T_WS_0: jax.Array,  # (7,) pose at scan start
    T_WS_1: jax.Array,  # (7,) pose at scan end
    t_frac: jax.Array,  # (N,) per-ray time in [0, 1] across the sweep
    p_S: jax.Array,  # (N, 3) raw points in the (moving) sensor frame
) -> jax.Array:
    """Motion-compensate a sweep into the frame at scan end.

    Per-ray pose by geodesic interpolation between the bracketing states
    (the reference propagates IMU per-ray; interpolation of the two
    estimator states is the batched equivalent at typical sweep rates).
    """
    T_t = jax.vmap(lambda a: se3.se3_interpolate(T_WS_0, T_WS_1, a))(t_frac)
    p_W = jax.vmap(se3.se3_apply)(T_t, p_S)
    T_SW_1 = se3.se3_inverse(T_WS_1)
    return jax.vmap(lambda p: se3.se3_apply(T_SW_1, p))(p_W)


def deskew_imu(
    imu_params,
    imu_t: np.ndarray,
    imu_gyr: np.ndarray,
    imu_acc: np.ndarray,
    f_a,  # bracketing FrameState at/before sweep start (T_WS, sb)
    t_point: np.ndarray,  # (N,) absolute per-ray times
    pts_S: np.ndarray,  # (N, 3) raw points in the (moving) sensor frame
    t_end: float | None = None,  # target frame time (default: last ray)
) -> np.ndarray:
    """Per-ray IMU-propagated motion compensation into the frame at sweep
    end (≙ LidarMotionUndistortion's deskew-through-Propagator,
    okvis_mapping/include/okvis/LidarMotionUndistortion.hpp:22-59): the
    state at/before the sweep start is propagated through the raw IMU
    samples, giving each ray its own pose — capturing intra-sweep
    dynamics that two-state interpolation loses under aggressive motion
    (the Hilti'22 operating regime).  Host numpy: one O(n + m) pass."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.imu import preintegration_np as pre_np

    t_point = np.asarray(t_point, np.float64)
    if t_end is None:
        t_end = float(t_point.max())
    tq = np.concatenate([t_point, [t_end]])
    order = np.argsort(tq)
    T_sorted = pre_np.predict_states_batch(
        imu_params, imu_t, imu_gyr, imu_acc, float(f_a.timestamp),
        tq[order], np.asarray(f_a.T_WS), np.asarray(f_a.sb[0:3]),
        np.asarray(f_a.sb[3:6]), np.asarray(f_a.sb[6:9]),
    )
    T_all = np.empty_like(T_sorted)
    T_all[order] = T_sorted
    T_rays = T_all[:-1]
    T_end = T_all[-1]
    # p_end = T_end^-1 * T_ray * p
    R_end_T = se3np.quat_to_matrix(T_end[3:7]).T
    Rs = se3np.quat_to_matrix(T_rays[:, 3:7])  # (N, 3, 3)
    p_W = np.einsum("nij,nj->ni", Rs, pts_S) + T_rays[:, :3]
    out = (p_W - T_end[:3]) @ R_end_T.T
    # (deskewed points in the sweep-end frame, propagated sweep-end pose)
    return out, T_end


def voxel_downsample(
    pts: np.ndarray, voxel: float, max_per_voxel: int = 1
) -> np.ndarray:
    """Host voxel-grid downsampling (≙ VoxelGridFilter): keep up to
    `max_per_voxel` points per voxel (first-come, matching the reference)."""
    if len(pts) == 0:
        return pts
    keys = np.floor(pts / voxel).astype(np.int64)
    # lexicographic unique
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    keys_s = keys[order]
    new_cell = np.any(np.diff(keys_s, axis=0) != 0, axis=1)
    cell_id = np.concatenate([[0], np.cumsum(new_cell)])
    rank = np.ones(len(pts), np.int64)
    # rank within each cell
    starts = np.concatenate([[0], np.nonzero(new_cell)[0] + 1])
    rank_in_cell = np.arange(len(pts)) - starts[cell_id]
    keep = order[rank_in_cell < max_per_voxel]
    del rank
    return pts[np.sort(keep)]


def voxel_downsample_device(
    pts: jax.Array, valid: jax.Array, voxel: float, table_size: int = 1 << 14
):
    """Device-side approximate voxel downsample via hash-slot election:
    each point hashes its voxel key into a table; one winner per slot.
    Collisions only over-thin (never duplicate), which is acceptable for
    factor generation.  Static shapes: returns (pts, keep_mask)."""
    keys = jnp.floor(pts / voxel).astype(jnp.int32)
    h = (
        keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
    ) % table_size
    n = pts.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    slot_winner = jnp.full((table_size,), n, jnp.int32)
    slot_winner = slot_winner.at[h].min(jnp.where(valid, order, n))
    keep = slot_winner[h] == order
    return pts, keep & valid
