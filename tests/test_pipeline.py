"""End-to-end VIO pipeline on a rendered synthetic stereo-inertial dataset.

The integration milestone test: generate an EuRoC-layout dataset (rendered
dot-field scene + analytic IMU), run the full pipeline (detector →
descriptor → matching → triangulation → sliding-window BA →
marginalisation), evaluate ATE against ground truth.
"""

import numpy as np
import pytest

from okvis2x_tpu.graph import EstimatorConfig
from okvis2x_tpu.io import euroc, synthetic, trajectory_io
from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline


@pytest.mark.slow
def test_vio_on_synthetic_dataset(tmp_path):
    out = str(tmp_path / "synth")
    cam, T_SC, gt = synthetic.generate(
        out, duration=3.2, frame_rate=10.0, width=320, height=240
    )
    ds = euroc.EurocDataset(out)
    assert len(ds.frames) > 25
    assert ds.ground_truth is not None

    est_cfg = EstimatorConfig(
        num_keyframes=4,
        num_imu_frames=3,
        cap_frames=10,
        cap_landmarks=512,
        cap_obs=4096,
        cap_imu_links=9,
        cap_imu_samples=128,
        max_iterations=5,
        keypoint_sigma_px=1.0,
    )
    pipe_cfg = PipelineConfig(
        max_keypoints=256,
        octaves=1,
        harris_threshold=1e-6,
        keyframe_match_fraction=0.5,
    )
    pipe = VioPipeline([cam, cam], T_SC, est_cfg, pipe_cfg)

    n_frames = 0
    for kind, data in ds.events():
        if kind == "imu":
            t, gyr, acc = data
            pipe.add_imu_measurement(t, gyr, acc)
        else:
            if not data.paths[0]:
                continue
            images = [ds.load_image(p) for p in data.paths]
            info = pipe.process_frame(data.t, images)
            n_frames += 1

    assert n_frames > 25
    ts = np.array([s[0] for s in pipe.states_log])
    ps = np.array([s[1][:3] for s in pipe.states_log])
    ate = trajectory_io.ate_rmse(ts, ps, gt[:, 0], gt[:, 1:4])
    assert ate is not None
    # bounded drift over a 4 s, ~3 m trajectory
    assert ate < 0.25, f"ATE {ate}"
