"""Orchestration tests: queues, frame synchroniser, threaded runner,
visualiser, segmentation weights (mirrors testDataFlow.cpp /
FrameSynchronizer_test.cpp / testThreading.cpp intent)."""

import threading
import time

import numpy as np
import pytest

from okvis2x_tpu.pipeline.queues import FrameSynchronizer, Queue, ShutDown, ThreadedRunner


def test_queue_drop_if_full():
    q = Queue(maxsize=2)
    assert q.push_nonblocking_dropping_if_full(1)
    assert q.push_nonblocking_dropping_if_full(2)
    assert not q.push_nonblocking_dropping_if_full(3)  # drops 1
    assert q.pop_blocking() == 2
    assert q.pop_blocking() == 3


def test_queue_blocking_and_shutdown():
    q = Queue(maxsize=1)
    got = []

    def consumer():
        try:
            while True:
                got.append(q.pop_blocking())
        except ShutDown:
            pass

    th = threading.Thread(target=consumer)
    th.start()
    q.push_blocking_if_full("a")
    q.push_blocking_if_full("b")
    time.sleep(0.1)
    q.shutdown()
    th.join(2.0)
    assert not th.is_alive()
    assert got == ["a", "b"]


def test_queue_pop_timeout():
    q = Queue()
    t0 = time.monotonic()
    assert q.pop_timeout(0.15) is None
    assert time.monotonic() - t0 >= 0.14


def test_frame_synchronizer_in_order():
    fs = FrameSynchronizer(2, tolerance=0.005)
    assert fs.add(0, 0.0, "a0") == []
    out = fs.add(1, 0.002, "a1")
    assert len(out) == 1
    assert set(out[0]["images"]) == {0, 1}


def test_frame_synchronizer_missing_and_out_of_order():
    fs = FrameSynchronizer(2, tolerance=0.005)
    fs.add(0, 0.0, "a0")  # cam1 never arrives for t=0
    fs.add(1, 0.1, "b1")  # next bundle, out of order: cam1 first
    out = fs.add(0, 0.101, "b0")
    # the complete t=0.1 bundle emits, and the stale t=0 bundle flushes
    ts = [b["t"] for b in out]
    assert any(abs(t - 0.1) < 0.01 for t in ts)
    assert any(abs(t - 0.0) < 0.01 and len(b["images"]) == 1 for t, b in zip(ts, out))


def test_frame_synchronizer_double_frame():
    fs = FrameSynchronizer(2, tolerance=0.005)
    fs.add(0, 0.0, "first")
    fs.add(0, 0.001, "dup")  # same bundle, replaces cam0
    out = fs.add(1, 0.002, "c1")
    assert len(out) == 1
    assert out[0]["images"][0] == "dup"


def test_threaded_runner_with_fake_pipeline(tmp_path):
    from okvis2x_tpu.io import euroc, synthetic

    out = str(tmp_path / "ds")
    synthetic.generate(out, duration=0.8, frame_rate=10.0, width=48, height=36,
                       n_points=40)
    ds = euroc.EurocDataset(out)

    class FakePipe:
        def __init__(self):
            self.imu = 0
            self.frames = 0

        def add_imu_measurement(self, t, g, a):
            self.imu += 1

        def process_frame(self, t, images):
            self.frames += 1
            assert images[0].ndim == 2
            return dict(t=t)

    pipe = FakePipe()
    runner = ThreadedRunner(ds, pipe, queue_size=4)
    results = runner.run()
    assert pipe.frames >= 4
    assert pipe.imu > 50
    assert len(results) == pipe.frames


def test_visualize_outputs(tmp_path):
    from okvis2x_tpu.utils import visualize

    img = np.random.default_rng(0).uniform(0, 1, (60, 80)).astype(np.float32)
    uv = np.array([[10.0, 10.0], [40.0, 30.0], [70.0, 50.0]])
    rgb = visualize.draw_keypoints(img, uv, matched=np.array([True, False, True]))
    assert rgb.shape == (60, 80, 3)
    # box painted green (centre pixel itself is white)
    assert (rgb[9, 9] == (0, 220, 0)).all()
    assert (rgb[10, 10] == (255, 255, 255)).all()

    canvas = visualize.draw_matches(
        img, uv, img, uv + 2.0, np.array([[0, 1], [1, 2]])
    )
    assert canvas.shape[1] == 160

    tv = visualize.top_view(
        np.array([[0, 0, 0], [1, 1, 0], [2, 0, 0]], float),
        landmarks=np.array([[0.5, 2.0, 0]]),
    )
    assert tv.shape == (600, 600, 3)
    visualize.save_png(str(tmp_path / "tv.png"), tv)


def test_segmentation_weights():
    import jax
    import jax.numpy as jnp

    from okvis2x_tpu.models import segmentation as seg

    # sky heuristic: bright flat upper region
    img = np.full((60, 80), 0.2, np.float32)
    img[:20] = 0.95  # bright flat sky band
    uv = jnp.asarray([[40.0, 5.0], [40.0, 50.0]])
    w = np.asarray(seg.sky_heuristic_weights(jnp.asarray(img), uv))
    assert w[0] == 5.0 and w[1] == 1.0

    # class-based weights
    classes = jnp.asarray([seg.SKY, seg.PERSON, 0])
    np.testing.assert_allclose(
        np.asarray(seg.keypoint_weights_from_classes(classes)), [5.0, 3.0, 1.0]
    )


@pytest.mark.slow
def test_fast_scnn_contract():
    import jax
    import jax.numpy as jnp

    from okvis2x_tpu.models import segmentation as seg

    net, params = seg.init_fast_scnn(jax.random.PRNGKey(0), 64, 96)
    logits = net.apply(params, jnp.zeros((64, 96), jnp.float32))
    assert logits.shape == (64, 96, seg.NUM_CLASSES)
    cls = seg.sample_classes(logits, jnp.asarray([[10.0, 10.0]]))
    assert cls.shape == (1,)


def test_tracking_quality_monitor():
    """Image-coverage quality -> Good/Marginal/Lost
    (≙ the reference's tracking-quality thresholds 0.01/0.3,
    ThreadedSlam.cpp:1042-1048)."""
    import numpy as np

    from okvis2x_tpu.api import TrackingQuality
    from okvis2x_tpu.cameras import distortion as dist
    from okvis2x_tpu.cameras import pinhole
    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.pipeline.vio import FrameData, PipelineConfig, VioPipeline

    cam = pinhole.make_pinhole(100, 100, 64, 48, 128, 96, model=dist.NONE)
    pipe = VioPipeline(
        [cam], np.array([[0, 0, 0, 0, 0, 0, 1.0]]),
        EstimatorConfig(cap_frames=4, cap_landmarks=8, cap_obs=16,
                        cap_imu_links=3),
        PipelineConfig(),
    )

    def fd(n_matched, spread):
        n = 32
        uv = np.random.default_rng(0).uniform([0, 0], spread, (n, 2))
        f = FrameData(uv, np.ones(n), np.zeros(n, int), np.ones(n, bool),
                      np.zeros((n, 12), np.uint32), None)
        f.lid[:n_matched] = np.arange(n_matched)
        return f

    # dense coverage over the full image -> Good
    assert pipe._tracking_quality([fd(32, [128, 96])]) == TrackingQuality.GOOD
    # few matches confined to one corner -> Marginal
    assert (
        pipe._tracking_quality([fd(4, [20, 20])]) == TrackingQuality.MARGINAL
    )
    # no matches -> Lost
    assert pipe._tracking_quality([fd(0, [128, 96])]) == TrackingQuality.LOST


def test_latest_value_publisher():
    """≙ okvis::ThreadedPublisher: slow consumers see only the freshest
    value; all published values are coalesced, none block the producer."""
    import threading
    import time

    from okvis2x_tpu.pipeline.queues import LatestValuePublisher

    seen = []
    gate = threading.Event()

    def slow_cb(v):
        gate.wait(5.0)  # consumer blocked until we open the gate
        seen.append(v)

    pub = LatestValuePublisher(slow_cb)
    for i in range(50):
        pub.publish(i)  # never blocks
    gate.set()
    pub.shutdown(wait=True)
    assert seen, "nothing delivered"
    assert seen[-1] == 49  # freshest value wins
    assert len(seen) < 50  # intermediate values coalesced
    assert pub.n_published == 50
