"""IO tests: config parsing (reference okvis2.yaml schema), extended dataset
reader (depth/LiDAR/GPS streams), component save/load, trajectory tools."""

import os

import numpy as np
import pytest

from okvis2x_tpu.io import config as cfg_mod
from okvis2x_tpu.io import synthetic, trajectory_io, xdataset

pytestmark = pytest.mark.smoke


def test_load_reference_euroc_config():
    """Parse the reference's actual EuRoC config unchanged."""
    path = "/root/reference/config/euroc/okvis2.yaml"
    if not os.path.exists(path):
        pytest.skip("reference config not mounted")
    vi = cfg_mod.load(path)
    assert len(vi.cameras) == 2
    cam = vi.cameras[0].camera
    assert cam.width == 752 and cam.height == 480
    np.testing.assert_allclose(
        np.asarray(cam.fxfycxcy), [458.654880721, 457.296696463, 367.215803962, 248.37534061]
    )
    assert cam.model == "radtan"
    assert vi.imu.sigma_g == pytest.approx(20.0e-4)
    assert vi.estimator.num_keyframes == 5
    assert vi.estimator.realtime_max_iterations == 10
    assert vi.frontend.max_num_keypoints == 700
    # T_SC position from the yaml matrix
    np.testing.assert_allclose(
        vi.cameras[0].T_SC[:3], [-0.0216401454975, -0.064676986768, 0.00981073058949]
    )


def test_gps_lidar_output_sections_parse():
    """GPS (gvins) and LiDAR (hilti22) optional sections + camera/output
    parameter groups (≙ ViParametersReader.cpp:224-237,241-263,348-367)."""
    gvins = "/root/reference/config/gvins/okvis2.yaml"
    hilti = "/root/reference/config/hilti22/okvis2-lidar.yaml"
    if not os.path.exists(gvins) or not os.path.exists(hilti):
        pytest.skip("reference configs not mounted")
    vi = cfg_mod.load(gvins)
    assert vi.gps is not None
    assert vi.gps.data_type in ("cartesian", "geodetic", "geodetic-leica")
    assert vi.gps.r_SA.shape == (3,)
    assert vi.lidar is None
    assert isinstance(vi.camera.online_calibration.do_extrinsics, bool)
    assert vi.camera.timestamp_tolerance > 0

    vl = cfg_mod.load(hilti)
    assert vl.lidar is not None
    assert vl.lidar.T_SL.shape == (7,)
    q = vl.lidar.T_SL[3:7]
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
    assert isinstance(vl.output.enable_submapping, bool)
    assert vl.imu_use is True
    assert vl.s_a.shape == (3,)


def test_se2_submap_config():
    """se2.yaml schema → SubMapConfig (≙ config_mapping.hpp:27-106)."""
    path = "/root/reference/config/euroc/se2.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    sc = cfg_mod.load_submap_config(path)
    assert sc.submap_kf_threshold == 20
    assert sc.submap_overlap_ratio == pytest.approx(0.1)
    assert sc.submap_min_frames == 40
    assert sc.num_submap_factors == 200
    assert sc.sensor_error == pytest.approx(0.4)
    assert sc.use_map_to_map_factors and sc.use_map_to_live_factors
    assert sc.map_dim == (25.6, 25.6, 25.6)
    assert sc.map_res == pytest.approx(0.025)
    assert sc.data.log_odd_max == pytest.approx(5.015)
    assert sc.data.uncertainty_model == "quadratic"
    assert sc.near_plane == pytest.approx(0.4)
    # defaults survive on a minimal doc
    assert cfg_mod.SubMapConfig().submap_kf_threshold == 5


def test_more_reference_configs_parse():
    root = "/root/reference/config"
    if not os.path.isdir(root):
        pytest.skip("reference configs not mounted")
    n = 0
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if fn.endswith(".yaml") and "se2" not in fn and "calib" not in fn:
                try:
                    vi = cfg_mod.load(os.path.join(dirpath, fn))
                except Exception:
                    continue  # some are se2/special schemas
                if vi.cameras:
                    n += 1
    assert n >= 5  # most dataset configs parse


def test_xdataset_streams(tmp_path):
    out = str(tmp_path / "ds")
    cam, T_SC, gt = synthetic.generate(
        out, duration=1.2, frame_rate=10.0, width=64, height=48,
        n_points=60, with_gps=True, with_lidar=True,
    )
    ds = xdataset.XDataset(out)
    assert ds.gps is not None and len(ds.gps) > 3
    assert ds.lidar is not None and len(ds.lidar) > 100
    kinds = set()
    n_lidar_pts = 0
    for kind, ev in ds.events():
        kinds.add(kind)
        if kind == "lidar":
            n_lidar_pts += len(ev.pts)
    assert {"imu", "frames", "lidar", "gps"} <= kinds
    assert n_lidar_pts == len(ds.lidar)
    # gps positions live in a transformed frame (offset ~30 m)
    assert np.linalg.norm(ds.gps[0, 1:4]) > 20


def test_geodetic_enu():
    lat0, lon0 = np.radians(47.37), np.radians(8.54)
    enu = xdataset.geodetic_to_enu(
        np.radians(47.3701), np.radians(8.54), 410.0, lat0, lon0, 400.0
    )
    # 0.0001 deg latitude ~ 11.1 m north, 10 m up
    assert abs(enu[1] - 11.1) < 0.2
    assert abs(enu[2] - 10.0) < 0.1
    assert abs(enu[0]) < 0.01


def test_component_roundtrip(tmp_path):
    from okvis2x_tpu.cameras import distortion as dist
    from okvis2x_tpu.cameras import pinhole
    from okvis2x_tpu.graph import EstimatorConfig, FrameState, SlidingWindowEstimator
    from okvis2x_tpu.graph.component import load_component, save_component

    cam = pinhole.make_pinhole(
        fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480,
        model=dist.NONE,
    )
    est = SlidingWindowEstimator(
        EstimatorConfig(cap_frames=6, cap_landmarks=8, cap_obs=16,
                        cap_imu_links=5),
        [cam], np.array([[0, 0, 0, 0, 0, 0, 1.0]]),
    )
    for k in range(3):
        est.frames.append(
            FrameState(fid=k, timestamp=float(k),
                       T_WS=np.array([k, 0, 0, 0, 0, 0, 1.0], float),
                       sb=np.zeros(9), is_keyframe=True)
        )
    est.rel_edges.append(
        dict(i=0, j=1, T_ij=np.array([1, 0, 0, 0, 0, 0, 1.0]),
             sqrt_info=np.eye(6) * 3)
    )
    est.add_landmark(np.array([0.5, 0.5, 3.0, 1.0]))

    path = str(tmp_path / "map.npz")
    save_component(path, est)
    c = load_component(path)
    assert list(c["frame_fids"]) == [0, 1, 2]
    np.testing.assert_allclose(c["frame_T_WS"][1][:3], [1, 0, 0])
    assert len(c["edges"]) == 1
    np.testing.assert_allclose(c["edges"][0]["sqrt_info"], np.eye(6) * 3)
    assert c["lm_hp"].shape == (1, 4)


def test_tum_roundtrip(tmp_path):
    ts = np.array([0.0, 0.1, 0.2])
    T = np.tile(np.array([1.0, 2, 3, 0, 0, 0, 1.0]), (3, 1))
    p = str(tmp_path / "t.tum")
    trajectory_io.write_tum(p, ts, T)
    data = np.loadtxt(p)
    np.testing.assert_allclose(data[:, 0], ts)
    np.testing.assert_allclose(data[:, 1:4], T[:, :3])


def test_save_map_g2o(tmp_path):
    """saveMap parity: .g2o pose graph + text map file
    (≙ ViSlamBackend::saveMap, ViSlamBackend.cpp:2166)."""
    import jax.numpy as jnp

    from okvis2x_tpu.core import se3
    from okvis2x_tpu.graph import component as comp_mod
    from okvis2x_tpu.graph import EstimatorConfig, FrameState, SlidingWindowEstimator
    from okvis2x_tpu.cameras import distortion as dist
    from okvis2x_tpu.cameras import pinhole

    cam = pinhole.make_pinhole(400, 400, 320, 240, 640, 480, model=dist.NONE)
    est = SlidingWindowEstimator(
        EstimatorConfig(cap_frames=4, cap_landmarks=8, cap_obs=16,
                        cap_imu_links=3),
        [cam], np.array([[0, 0, 0, 0, 0, 0, 1.0]]),
    )
    for k in range(3):
        est.archive_frames[k] = FrameState(
            fid=k, timestamp=float(k),
            T_WS=np.array([k, 0, 0, 0, 0, 0, 1.0]), sb=np.zeros(9),
            is_keyframe=True, pose_graph_frame=True,
        )
    est.archive_edges.append(
        dict(i=0, j=1, T_ij=np.array([1, 0, 0, 0, 0, 0, 1.0]),
             sqrt_info=np.eye(6) * 10)
    )
    est.arch_lm[7] = np.array([1.0, 2.0, 3.0, 1.0])

    path = str(tmp_path / "map.csv")
    g2o = comp_mod.save_map(path, est)
    g2o_lines = open(g2o).read().splitlines()
    assert sum(l.startswith("VERTEX_SE3:QUAT") for l in g2o_lines) == 3
    edge = [l for l in g2o_lines if l.startswith("EDGE_SE3:QUAT")]
    assert len(edge) == 1
    parts = edge[0].split()
    assert parts[1:3] == ["0", "1"]
    assert len(parts) == 3 + 7 + 21  # tag+ids, pose, upper-tri info
    txt = open(path).read()
    assert txt.startswith("landmarks:\n7,1.0,2.0,3.0")
    assert "frame: 0, covisibilities: 1" in txt
