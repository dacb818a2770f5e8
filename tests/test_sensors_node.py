"""Dataflow tests for the middleware node core and the fake live-sensor
driver (≙ reference testDataFlow.cpp / testThreading.cpp with mocked
sensors)."""

import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from okvis2x_tpu.graph import EstimatorConfig
from okvis2x_tpu.io import synthetic, euroc
from okvis2x_tpu.io.realsense import FakeRealsense
from okvis2x_tpu.pipeline.vio import PipelineConfig


@pytest.fixture(scope="module")
def synth_ds(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "synth")
    cam, T_SC, gt = synthetic.generate(
        out, duration=1.0, frame_rate=10.0, width=160, height=120,
        n_points=200,
    )
    return cam, T_SC, euroc.EurocDataset(out)


def _small_cfgs():
    est = EstimatorConfig(
        num_keyframes=3, num_imu_frames=2, cap_frames=8,
        cap_landmarks=256, cap_obs=2048, cap_imu_links=7,
        cap_imu_samples=64, max_iterations=3,
    )
    pipe = PipelineConfig(
        max_keypoints=128, octaves=1, harris_threshold=1e-6,
        do_loop_closures=False,
    )
    return est, pipe


def test_node_core_callbacks(synth_ds):
    from apps.okvis2x_node import PipelineNodeCore

    cam, T_SC, ds = synth_ds
    states, lms = [], []
    core = PipelineNodeCore(
        [cam, cam], T_SC, *_small_cfgs(),
        on_state=lambda t, T, sb, info: states.append((t, T.copy())),
        on_landmarks=lambda hp: lms.append(hp.shape[0]),
    )
    n = 0
    for kind, data in ds.events():
        if kind == "imu":
            core.on_imu(*data)
        elif data.paths[0]:
            core.on_images(data.t, [ds.load_image(p) for p in data.paths])
            n += 1
        if n >= 4:
            break
    assert len(states) == 4
    assert all(np.isfinite(T).all() for _, T in states)
    assert lms[-1] > 0


def test_fake_realsense_streams_in_order(synth_ds):
    cam, T_SC, ds = synth_ds
    events = []
    fake = FakeRealsense(ds)
    fake.set_imu_callback(lambda t, g, a: events.append(("imu", t)))
    fake.set_images_callback(lambda t, imgs: events.append(("img", t)))
    fake.start_streaming()
    deadline = time.time() + 30
    while time.time() < deadline and fake._thread.is_alive():
        time.sleep(0.05)
    fake.stop_streaming()
    kinds = {k for k, _ in events}
    assert kinds == {"imu", "img"}
    ts = [t for _, t in events]
    assert all(b >= a - 1e-6 for a, b in zip(ts, ts[1:])), "out of order"
    n_img = sum(1 for k, _ in events if k == "img")
    assert n_img == len([f for f in ds.frames if f.paths[0]])


def test_recorder_mode_roundtrip(tmp_path):
    """--record (≙ okvis_app_realsense_recorder): replay a synthetic dataset
    through the fake driver into DatasetWriter, re-read with EurocDataset."""
    import sys
    import types

    from okvis2x_tpu.io import euroc, synthetic

    src = str(tmp_path / "src")
    synthetic.generate(src, duration=1.0, frame_rate=10.0, width=64, height=48)
    n_src = len(euroc.EurocDataset(src).frames)

    sys.path.insert(0, "apps")
    try:
        import okvis2x_app
    finally:
        sys.path.pop(0)

    out = str(tmp_path / "rec")
    args = types.SimpleNamespace(
        record=out, dataset=src, reader="euroc", max_frames=0
    )
    okvis2x_app.record_mode(args)

    ds = euroc.EurocDataset(out)
    assert len(ds.frames) == n_src  # every replayed frame recorded
    assert len(ds.frames) >= 3
    n_imu = sum(1 for k, _ in ds.events() if k == "imu")
    assert n_imu > 50


def test_constant_velocity_propagator():
    from okvis2x_tpu.api import ConstantVelocityPropagator, State
    import numpy as np

    s = State(id=0, timestamp=1.0,
              T_WS=np.array([1.0, 2.0, 3.0, 0, 0, 0, 1.0]),
              v_W=np.array([1.0, 0, 0]), b_g=np.zeros(3), b_a=np.zeros(3),
              omega_S=np.array([0, 0, 0.1]))
    p = ConstantVelocityPropagator(s)
    s2 = p.propagate(2.0)
    np.testing.assert_allclose(s2.T_WS[:3], [2.0, 2.0, 3.0])
    # yaw advanced by ~0.1 rad
    assert abs(2 * np.arcsin(s2.T_WS[5]) - 0.1) < 1e-6


def test_queued_trajectory_interpolation():
    from okvis2x_tpu.api import QueuedTrajectory
    import numpy as np

    qt = QueuedTrajectory(max_samples=10)
    assert qt.get(0.0) is None
    qt.push(0.0, np.array([0, 0, 0, 0, 0, 0, 1.0]))
    qt.push(1.0, np.array([2.0, 0, 0, 0, 0, 0, 1.0]))
    T = qt.get(0.5)
    np.testing.assert_allclose(T[:3], [1.0, 0, 0], atol=1e-12)
    assert qt.get(2.0) is None


def test_trajectory_propagate_batch():
    from okvis2x_tpu.api import State, Trajectory
    import numpy as np

    tr = Trajectory()
    s = State(id=0, timestamp=0.0,
              T_WS=np.array([0, 0, 0, 0, 0, 0, 1.0]),
              v_W=np.array([1.0, 0, 0]), b_g=np.zeros(3), b_a=np.zeros(3),
              omega_S=np.zeros(3))
    tr.update(s)
    g = 9.81
    for k in range(21):  # 100 Hz hover IMU
        tr.add_imu_measurement(k * 0.01, np.zeros(3), np.array([0, 0, g]))
    ts = np.array([0.05, 0.1, 0.15, 0.02])
    T = tr.propagate_batch(ts)
    # constant velocity 1 m/s in x under hover
    np.testing.assert_allclose(T[:, 0], ts, atol=1e-3)
    np.testing.assert_allclose(T[:, 1:3], 0, atol=1e-6)
