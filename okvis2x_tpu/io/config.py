"""Configuration loader for the okvis2.yaml schema.

Replaces the reference's `ViParametersReader` (okvis_common/src/
ViParametersReader.cpp): reads the same YAML schema (OpenCV FileStorage
flavour — the leading `%YAML:1.0` directive is stripped, the rest is plain
YAML) so existing configs under /root/reference/config/* work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import yaml

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.imu.preintegration import ImuParams

import jax.numpy as jnp

_DIST_NAMES = {
    "radialtangential": dist.RADTAN,
    "radialtangential8": dist.RADTAN8,
    "equidistant": dist.EQUIDISTANT,
    "none": dist.NONE,
    "eucm": "eucm",
}


@dataclasses.dataclass
class CameraConfig:
    T_SC: np.ndarray  # (7,) [t, q_xyzw]
    camera: pinhole.Camera
    slam_use: str = "okvis"
    camera_type: str = "gray"


@dataclasses.dataclass
class FrontendConfig:
    detection_threshold: float = 38.0
    absolute_threshold: float = 150.0
    matching_threshold: float = 60.0
    octaves: int = 0
    max_num_keypoints: int = 700
    keyframe_overlap: float = 0.6


@dataclasses.dataclass
class EstimatorParams:
    num_keyframes: int = 5
    num_loop_closure_frames: int = 3
    num_imu_frames: int = 3
    do_loop_closures: bool = True
    do_final_ba: bool = True
    realtime_min_iterations: int = 3
    realtime_max_iterations: int = 10
    realtime_time_limit: float = 0.035
    full_graph_iterations: int = 15
    p_dbow: float = 0.4
    drift_percentage_heuristic: float = 1.35


@dataclasses.dataclass
class ViConfig:
    cameras: List[CameraConfig]
    imu: ImuParams
    frontend: FrontendConfig
    estimator: EstimatorParams
    T_BS: np.ndarray  # (7,)
    g0: np.ndarray  # initial gyro bias
    a0: np.ndarray  # initial accel bias
    image_delay: float = 0.0


def _T_from_mat44(vals) -> np.ndarray:
    M = np.asarray(vals, dtype=np.float64).reshape(4, 4)
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(M[:3, :3])))
    return np.concatenate([M[:3, 3], q])


def load(path: str, dtype=jnp.float64) -> ViConfig:
    with open(path) as f:
        text = f.read()
    lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
    doc = yaml.safe_load("\n".join(lines))

    cams = []
    for c in doc.get("cameras", []):
        model = _DIST_NAMES[c.get("distortion_type", "none")]
        fx, fy = c["focal_length"]
        cx, cy = c["principal_point"]
        w, h = c["image_dimension"]
        cam = pinhole.make_pinhole(
            fx, fy, cx, cy, w, h, model=model,
            dist_params=c.get("distortion_coefficients", []),
            dtype=dtype,
        )
        cams.append(
            CameraConfig(
                T_SC=_T_from_mat44(c["T_SC"]),
                camera=cam,
                slam_use=c.get("slam_use", "okvis"),
                camera_type=c.get("camera_type", "gray"),
            )
        )

    ip = doc.get("imu_parameters", {})
    imu = ImuParams(
        sigma_g=float(ip.get("sigma_g_c", 12e-4)),
        sigma_a=float(ip.get("sigma_a_c", 8e-3)),
        sigma_gw=float(ip.get("sigma_gw_c", 4e-6)),
        sigma_aw=float(ip.get("sigma_aw_c", 4e-5)),
        g=float(ip.get("g", 9.81007)),
        rate=float(ip.get("rate", 200.0)),
        g_max=float(ip.get("g_max", 7.8)),
        a_max=float(ip.get("a_max", 176.0)),
        sigma_bg=float(ip.get("sigma_bg", 0.03)),
        sigma_ba=float(ip.get("sigma_ba", 0.1)),
    )

    fp = doc.get("frontend_parameters", {})
    frontend = FrontendConfig(
        detection_threshold=float(fp.get("detection_threshold", 38.0)),
        absolute_threshold=float(fp.get("absolute_threshold", 150.0)),
        matching_threshold=float(fp.get("matching_threshold", 60.0)),
        octaves=int(fp.get("octaves", 0)),
        max_num_keypoints=int(fp.get("max_num_keypoints", 700)),
        keyframe_overlap=float(fp.get("keyframe_overlap", 0.6)),
    )

    ep = doc.get("estimator_parameters", {})
    est = EstimatorParams(
        num_keyframes=int(ep.get("num_keyframes", 5)),
        num_loop_closure_frames=int(ep.get("num_loop_closure_frames", 3)),
        num_imu_frames=int(ep.get("num_imu_frames", 3)),
        do_loop_closures=bool(ep.get("do_loop_closures", True)),
        do_final_ba=bool(ep.get("do_final_ba", True)),
        realtime_min_iterations=int(ep.get("realtime_min_iterations", 3)),
        realtime_max_iterations=int(ep.get("realtime_max_iterations", 10)),
        realtime_time_limit=float(ep.get("realtime_time_limit", 0.035)),
        full_graph_iterations=int(ep.get("full_graph_iterations", 15)),
        p_dbow=float(ep.get("p_dbow", 0.4)),
        drift_percentage_heuristic=float(ep.get("drift_percentage_heuristic", 1.35)),
    )

    T_BS = (
        _T_from_mat44(ip["T_BS"]) if "T_BS" in ip
        else np.array([0, 0, 0, 0, 0, 0, 1.0])
    )
    cp = doc.get("camera_parameters", {})
    return ViConfig(
        cameras=cams,
        imu=imu,
        frontend=frontend,
        estimator=est,
        T_BS=T_BS,
        g0=np.asarray(ip.get("g0", [0, 0, 0]), np.float64),
        a0=np.asarray(ip.get("a0", [0, 0, 0]), np.float64),
        image_delay=float(cp.get("image_delay", 0.0)),
    )
