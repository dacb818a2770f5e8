"""RGB-D VIO: depth priors + depth-initialised landmarks end to end.

Exercises the DepthErrorT-equivalent wiring (attach_depth_priors /
depth_initialize) through the full pipeline on a rendered synthetic dataset
with a cam0-registered depth stream."""

import numpy as np
import pytest

from okvis2x_tpu.graph import EstimatorConfig
from okvis2x_tpu.io import synthetic, trajectory_io, xdataset
from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline


@pytest.mark.slow
def test_rgbd_vio_on_synthetic_dataset(tmp_path):
    out = str(tmp_path / "synth_rgbd")
    cam, T_SC, gt = synthetic.generate(
        out, duration=2.2, frame_rate=10.0, width=320, height=240,
        with_depth=True,
    )
    ds = xdataset.XDataset(out)
    assert len(ds.depth_frames) > 15

    est_cfg = EstimatorConfig(
        num_keyframes=4, num_imu_frames=3, cap_frames=10,
        cap_landmarks=512, cap_obs=4096, cap_imu_links=9,
        cap_imu_samples=128, max_iterations=5, keypoint_sigma_px=1.0,
    )
    pipe_cfg = PipelineConfig(
        max_keypoints=256, octaves=1, harris_threshold=1e-6,
        keyframe_match_fraction=0.5,
    )
    pipe = VioPipeline([cam, cam], T_SC, est_cfg, pipe_cfg)

    depth_by_t = dict(ds.depth_frames)
    n = 0
    n_depth_priors = 0
    for kind, data in ds.events():
        if kind == "imu":
            pipe.add_imu_measurement(*data)
        elif kind == "frames":
            if not data.paths[0]:
                continue
            images = [ds.load_image(p) for p in data.paths]
            dpath = depth_by_t.get(data.t)
            dimg = ds.load_depth(dpath) if dpath else None
            pipe.process_frame(data.t, images, depth_images=[dimg, None])
            n_depth_priors += int(
                (pipe.est.obs_depth_sigma > 0).sum()
            )
            n += 1

    assert n > 15
    assert n_depth_priors > 50, "depth priors never activated"
    ts = np.array([s[0] for s in pipe.states_log])
    ps = np.array([s[1][:3] for s in pipe.states_log])
    ate = trajectory_io.ate_rmse(ts, ps, gt[:, 0], gt[:, 1:4])
    assert ate < 0.25, f"ATE {ate}"
