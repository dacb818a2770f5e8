"""Multi-camera rig (extrinsics + per-camera models).

Replaces the reference's `NCameraSystem` (okvis_cv/include/okvis/cameras/
NCameraSystem.hpp).  The rig is a list of `Camera` pytrees plus a stacked
(N, 7) array of sensor-to-camera extrinsics T_SC (pose of camera frame C in
IMU/sensor frame S), so that p_S = T_SC p_C.

Cameras in one rig may have different distortion models (static pytree
structure), so the rig is a plain Python tuple — vmapping across cameras is
only done when models agree; the per-frame pipeline unrolls over the (small,
static) camera count instead, which XLA fuses.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from okvis2x_tpu.cameras.pinhole import Camera
from okvis2x_tpu.core import se3


class CameraRig(NamedTuple):
    cameras: Tuple[Camera, ...]  # static length
    T_SC: jax.Array  # (N, 7) sensor-to-camera extrinsics

    @property
    def num_cameras(self) -> int:
        return len(self.cameras)


def make_rig(cameras: Sequence[Camera], T_SC: Sequence[jax.Array]) -> CameraRig:
    return CameraRig(cameras=tuple(cameras), T_SC=jnp.stack(list(T_SC), axis=0))


def project_world_point(
    rig: CameraRig, cam_idx: int, T_WS: jax.Array, hp_W: jax.Array
):
    """World homogeneous point -> pixel in camera `cam_idx` (static index).

    p_C = T_SC^-1 T_WS^-1 p_W  — the chain every reprojection factor uses
    (reference: ReprojectionError implementation).
    """
    T_SC = rig.T_SC[cam_idx]
    T_CW = se3.se3_multiply(se3.se3_inverse(T_SC), se3.se3_inverse(T_WS))
    hp_C = se3.se3_apply_homogeneous(T_CW, hp_W)
    from okvis2x_tpu.cameras import pinhole

    return pinhole.project_homogeneous(rig.cameras[cam_idx], hp_C)


def overlap_masks(rig: CameraRig, grid: int = 16):
    """Approximate inter-camera overlap flags via ray-grid reprojection
    (reference computes per-pixel overlap masks in NCameraSystem; a coarse
    grid suffices for the keyframe heuristics)."""
    from okvis2x_tpu.cameras import pinhole

    n = rig.num_cameras
    flags = []
    for i in range(n):
        cam_i = rig.cameras[i]
        us = jnp.linspace(0.0, cam_i.width - 1.0, grid)
        vs = jnp.linspace(0.0, cam_i.height - 1.0, grid)
        uv = jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), axis=-1).reshape(-1, 2)
        ray_i, valid_i = pinhole.back_project(cam_i, uv)
        row = []
        for j in range(n):
            if i == j:
                row.append(True)
                continue
            # assume a nominal depth of 3m along the ray
            p_Ci = ray_i / jnp.maximum(ray_i[..., 2:3], 1e-6) * 3.0
            T_CjCi = se3.se3_multiply(
                se3.se3_inverse(rig.T_SC[j]), rig.T_SC[i]
            )
            p_Cj = se3.se3_apply(T_CjCi, p_Ci)
            _, valid_j = pinhole.project(rig.cameras[j], p_Cj)
            frac = jnp.mean((valid_i & valid_j).astype(jnp.float32))
            row.append(bool(frac > 0.05))
        flags.append(row)
    return flags
