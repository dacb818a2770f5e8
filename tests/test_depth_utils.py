"""Depth conversion/registration helpers (≙ DepthUtils.hpp)."""

import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras.pinhole import make_pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.pipeline import depth_utils as du


def _cam(w=64, h=48, f=40.0):
    return make_pinhole(
        fx=f, fy=f, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h,
        model="none", dist_params=(),
    )


def test_raw_metric_roundtrip():
    raw = jnp.array([[0, 1000, 65535]], dtype=jnp.uint16)
    m = du.input_depth_to_meters(raw)
    np.testing.assert_allclose(np.asarray(m), [[0.0, 1.0, 65.535]], atol=1e-6)
    back = du.meters_to_input_depth(m)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(raw))


def test_disparity_depth_and_sigma():
    fx, b = 400.0, 0.1
    disp = jnp.array([0.0, 4.0, 40.0])
    z = du.disparity_to_depth(disp, fx, b)
    np.testing.assert_allclose(np.asarray(z), [0.0, 10.0, 1.0], atol=1e-6)
    s = du.depth_sigma_from_disparity(disp, jnp.ones(3), fx, b)
    # sigma_z = z^2/(fx b) sigma_d
    np.testing.assert_allclose(np.asarray(s)[1], 100.0 / 40.0, rtol=1e-5)
    assert float(s[0]) == 0.0


def test_depth_to_points_z_convention():
    cam = _cam()
    depth = jnp.full((cam.height, cam.width), 2.0)
    pts, valid = du.depth_to_points(depth, cam)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0, atol=1e-6)


def test_register_depth_identity():
    cam = _cam()
    depth = jnp.full((cam.height, cam.width), 3.0)
    T_id = se3.se3_identity()
    out = du.register_depth(depth, cam, cam, T_id)
    inner = np.asarray(out)[1:-1, 1:-1]
    filled = inner[inner > 0]
    assert filled.size > 0.9 * inner.size
    np.testing.assert_allclose(filled, 3.0, atol=1e-5)


def test_register_depth_translation_shifts_depth():
    cam = _cam()
    depth = jnp.full((cam.height, cam.width), 3.0)
    # destination camera 1 m closer along the optical axis
    T_dst_src = se3.se3_from_tq(jnp.array([0.0, 0.0, 1.0]), se3.quat_identity())
    out = np.asarray(du.register_depth(depth, cam, cam, T_dst_src))
    filled = out[out > 0]
    np.testing.assert_allclose(filled, 4.0, atol=1e-5)


def test_register_depth_zbuffer_keeps_nearest():
    cam = _cam()
    # two planes: left half at 2 m, right half at 4 m; rotate the source so
    # both halves land on overlapping destination pixels is hard to set up
    # exactly — instead check that a strictly closer duplicate wins by
    # registering a cone: centre pixel closer.
    depth = np.full((cam.height, cam.width), 4.0, np.float32)
    depth[cam.height // 2, cam.width // 2] = 1.0
    out = np.asarray(du.register_depth(jnp.asarray(depth), cam, cam, se3.se3_identity()))
    assert abs(out[cam.height // 2, cam.width // 2] - 1.0) < 1e-5


def test_sparse_depth_from_landmarks():
    cam = _cam()
    # landmark 2 m in front of the camera at the optical centre
    hp = jnp.array([[0.0, 0.0, 2.0, 1.0], [0.0, 0.0, -1.0, 1.0]])
    valid = jnp.array([True, True])
    out = np.asarray(
        du.sparse_depth_from_landmarks(hp, valid, se3.se3_identity(), cam)
    )
    cy, cx = int(cam.fxfycxcy[3] + 0.5), int(cam.fxfycxcy[2] + 0.5)
    assert abs(out[cy, cx] - 2.0) < 1e-5
    assert (out > 0).sum() == 1  # behind-camera landmark rejected
