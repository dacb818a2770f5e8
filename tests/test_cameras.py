"""Camera model round-trips + Jacobians (mirrors okvis_cv/test/TestPinholeCamera.cpp
and TestEucmCamera.cpp intent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole

pytestmark = pytest.mark.smoke

F64 = jnp.float64

# EuRoC cam0-like calibration
EUROC = dict(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375, width=752, height=480,
)

CASES = [
    (dist.RADTAN, [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]),
    (dist.RADTAN8, [-0.28, 0.07, 0.0002, 1.8e-05, -0.01, 0.001, 0.0005, -0.0001]),
    (dist.EQUIDISTANT, [-0.0126, 0.0127, -0.0097, 0.0025]),
    (dist.NONE, []),
]


def _grid_uv(cam, margin=60, n=7):
    us = jnp.linspace(margin, cam.width - margin, n)
    vs = jnp.linspace(margin, cam.height - margin, n)
    return jnp.stack(jnp.meshgrid(us, vs, indexing="xy"), -1).reshape(-1, 2).astype(F64)


@pytest.mark.parametrize("model,params", CASES, ids=[c[0] for c in CASES])
def test_project_backproject_roundtrip(model, params):
    cam = pinhole.make_pinhole(**EUROC, model=model, dist_params=params)
    uv = _grid_uv(cam)
    ray, valid_bp = pinhole.back_project(cam, uv)
    # scale rays to a range of depths and reproject
    for depth in [0.5, 3.0, 40.0]:
        p_C = ray / ray[..., 2:3] * depth
        uv2, valid = pinhole.project(cam, p_C)
        ok = np.asarray(valid_bp & valid)
        assert ok.mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(uv2)[ok], np.asarray(uv)[ok], atol=1e-6
        )


def test_eucm_roundtrip():
    cam = pinhole.make_pinhole(
        fx=380.0, fy=380.0, cx=376.0, cy=240.0, width=752, height=480,
        model="eucm", dist_params=[0.6, 1.1],
    )
    uv = _grid_uv(cam)
    ray, bp_ok = pinhole.back_project(cam, uv)
    p_C = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True) * 2.5
    uv2, valid = pinhole.project(cam, p_C)
    ok = np.asarray(bp_ok & valid)
    assert ok.mean() > 0.9
    np.testing.assert_allclose(np.asarray(uv2)[ok], np.asarray(uv)[ok], atol=1e-5)


def test_behind_camera_invalid():
    cam = pinhole.make_pinhole(**EUROC, model=dist.RADTAN, dist_params=CASES[0][1])
    p = jnp.array([[0.1, 0.1, -1.0], [0.0, 0.0, 1.0]], dtype=F64)
    uv, valid = pinhole.project(cam, p)
    assert not bool(valid[0])
    assert bool(valid[1])
    assert np.isfinite(np.asarray(uv)).all()


def test_projection_jacobian_finite_diff():
    cam = pinhole.make_pinhole(**EUROC, model=dist.RADTAN, dist_params=CASES[0][1])
    p0 = jnp.array([0.3, -0.2, 2.0], dtype=F64)

    f = lambda p: pinhole.project(cam, p)[0]
    J = jax.jacfwd(f)(p0)
    eps = 1e-7
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        num = (np.asarray(f(p0 + d)) - np.asarray(f(p0 - d))) / (2 * eps)
        np.testing.assert_allclose(J[:, i], num, rtol=1e-5, atol=1e-5)


def test_batch_project_vmap_jit():
    cam = pinhole.make_pinhole(**EUROC, model=dist.RADTAN, dist_params=CASES[0][1])
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3), F64) * jnp.array(
        [1.0, 1.0, 0.1]
    ) + jnp.array([0.0, 0.0, 3.0])
    uv, valid = jax.jit(pinhole.project)(cam, pts)
    assert uv.shape == (256, 2)
    assert bool(valid.sum() > 200)


def test_numpy_camera_twin_matches_jax():
    """cameras/pinhole_np.py must agree with cameras/pinhole.py for every
    distortion model (host-path projection gating uses the numpy twin)."""
    import numpy as np
    import jax.numpy as jnp
    from okvis2x_tpu.cameras import pinhole, pinhole_np

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1, (64, 3)) * [0.3, 0.3, 1.0] + [0, 0, 3.0]
    cams = [
        pinhole.make_pinhole(400, 400, 320, 240, 640, 480, model="radtan",
                             dist_params=[-0.28, 0.07, 1e-4, -2e-5]),
        pinhole.make_pinhole(400, 400, 320, 240, 640, 480, model="radtan8",
                             dist_params=[-0.28, 0.07, 1e-4, -2e-5, 0.01,
                                          -0.1, 0.03, 0.002]),
        pinhole.make_pinhole(380, 380, 320, 240, 640, 480, model="equidistant",
                             dist_params=[-0.01, 0.02, -0.01, 0.002]),
        pinhole.make_pinhole(400, 400, 320, 240, 640, 480, model="none"),
        pinhole.make_pinhole(450, 450, 320, 240, 640, 480, model="eucm",
                             dist_params=[0.6, 1.1]),
    ]
    for cam in cams:
        ncam = pinhole_np.to_numpy(cam)
        uv_j, v_j = pinhole.project(cam, jnp.asarray(pts))
        uv_n, v_n = pinhole_np.project(ncam, pts)
        np.testing.assert_allclose(uv_n, np.asarray(uv_j), atol=1e-9,
                                   err_msg=cam.model)
        np.testing.assert_array_equal(v_n, np.asarray(v_j))
        uv_in = uv_n[v_n]
        r_j, bv_j = pinhole.back_project(cam, jnp.asarray(uv_in))
        r_n, bv_n = pinhole_np.back_project(ncam, uv_in)
        np.testing.assert_allclose(r_n, np.asarray(r_j), atol=1e-6,
                                   err_msg=cam.model)
        np.testing.assert_array_equal(bv_n, np.asarray(bv_j))
        # homogeneous round trip incl. negative w
        hp = np.concatenate([pts, np.ones((64, 1))], axis=1)
        hp[::3] *= -1
        uvh_j, vh_j = pinhole.project_homogeneous(cam, jnp.asarray(hp))
        uvh_n, vh_n = pinhole_np.project_homogeneous(ncam, hp)
        np.testing.assert_allclose(uvh_n, np.asarray(uvh_j), atol=1e-9)
        np.testing.assert_array_equal(vh_n, np.asarray(vh_j))
